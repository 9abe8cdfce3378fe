"""Unit tests for operators/graph.py — graph analytics over edge-list
DataFrames (the query layer downstream of KG triple materialization).

Hand-checkable graphs throughout: ranks/hops/triangle counts are
verified against values computed independently (numpy power iteration,
enumerated paths, brute-force triangle enumeration)."""

import itertools

import pytest
from pyspark.sql import functions as F

from informers_spark.operators.graph import (
    degrees,
    k_hop,
    pagerank,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_degrees_counts_both_directions(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")])
    rows = {r["node"]: r for r in degrees(e).collect()}
    assert rows["a"].asDict() == {"node": "a", "out_deg": 2, "in_deg": 1, "degree": 3}
    assert rows["c"].asDict() == {"node": "c", "out_deg": 0, "in_deg": 2, "degree": 2}
    assert rows["d"].asDict() == {"node": "d", "out_deg": 1, "in_deg": 0, "degree": 1}


def _pagerank_reference(pairs, iterations, damping, weights=None):
    """Independent dense power iteration with dangling redistribution;
    `weights` aligns with `pairs` (None = classic unweighted)."""
    ws = weights or [1.0] * len(pairs)
    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0.0] * n
    for (s, _), w in zip(pairs, ws):
        out[idx[s]] += w
    rank = [1.0 / n] * n
    for _ in range(iterations):
        contrib = [0.0] * n
        for (s, d), w in zip(pairs, ws):
            contrib[idx[d]] += rank[idx[s]] * w / out[idx[s]]
        dangling = sum(r for i, r in enumerate(rank) if out[i] == 0)
        rank = [
            (1.0 - damping) / n + damping * (c + dangling / n) for c in contrib
        ]
    return dict(zip(nodes, rank))


def test_pagerank_matches_dense_power_iteration(spark):
    # c is dangling; a is the hub
    pairs = [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("d", "a")]
    got = {r["node"]: r["rank"] for r in pagerank(_edges(spark, pairs), iterations=4).collect()}
    want = _pagerank_reference(pairs, iterations=4, damping=0.85)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)


def test_pagerank_weighted_matches_dense_power_iteration(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("d", "a")]
    weights = [3.0, 1.0, 2.0, 5.0, 4.0]
    e = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(pairs, weights)],
        "src string, dst string, w double",
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=4, weight="w").collect()}
    want = _pagerank_reference(pairs, iterations=4, damping=0.85, weights=weights)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    # uniform weights must reproduce the classic unweighted ranks exactly
    ones = e.withColumn("w", F.lit(1.0))
    a = sorted((r.node, r.rank) for r in pagerank(ones, iterations=4, weight="w").collect())
    b = sorted((r.node, r.rank) for r in pagerank(e.drop("w"), iterations=4).collect())
    assert a == b


def test_pagerank_mass_conserved_and_deterministic(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    pairs = [(s, d) for s, d in pairs if s != d]
    e = _edges(spark, pairs)
    m = {}
    r1 = pagerank(e, iterations=6, metrics=m).collect()
    assert sum(r["rank"] for r in r1) == pytest.approx(1.0, abs=1e-9)
    assert m == {"iterations": 6, "n_nodes": len({n for p in pairs for n in p})}
    r2 = pagerank(e, iterations=6).collect()
    assert sorted((r["node"], r["rank"]) for r in r1) == sorted(
        (r["node"], r["rank"]) for r in r2
    )


def test_pagerank_empty_edges(spark):
    e = _edges(spark, []).filter("src IS NOT NULL")
    assert pagerank(e, iterations=3).count() == 0


def test_k_hop_min_hops_and_early_exit(spark):
    # chain a->b->c->d plus a shortcut a->c: c must report hops=1 (min), not 2
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    seeds = spark.createDataFrame([("a",)], "node string")
    m = {}
    got = {r["node"]: r["hops"] for r in k_hop(e, seeds, k=2, metrics=m).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    assert m["hops_expanded"] == 2


def test_k_hop_frontier_exhausts_before_k(spark):
    e = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",)], "node string")
    m = {}
    got = {r["node"]: r["hops"] for r in k_hop(e, seeds, k=10, metrics=m).collect()}
    assert got == {"a": 0, "b": 1}
    assert m["hops_expanded"] == 1  # early-exited, did not run 10 rounds


def test_k_hop_unreachable_nodes_absent(spark):
    e = _edges(spark, [("a", "b"), ("x", "y")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"] for r in k_hop(e, seeds, k=3).collect()}
    assert got == {"a", "b"}


def _brute_triangles(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({n for p in und for n in p})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )


def test_triangle_count_matches_bruteforce(spark):
    # K4 on a..d (4 triangles) plus a pendant and a duplicate/reverse/self edge
    pairs = (
        [(x, y) for x, y in itertools.combinations("abcd", 2)]
        + [("d", "e"), ("b", "a"), ("a", "b"), ("e", "e")]
    )
    row = triangle_count(_edges(spark, pairs)).collect()[0]
    assert row["n_triangles"] == _brute_triangles(pairs) == 4
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7  # 6 K4 edges + d-e, dupes/self collapsed


def test_triangle_count_hub_graph(spark):
    # star hub h-.. with one rim edge: exactly 1 triangle; exercises the
    # degree-orientation path where the hub's raw degree is large
    pairs = [("h", f"r{i}") for i in range(12)] + [("r0", "r1")]
    row = triangle_count(_edges(spark, pairs)).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 13


def test_triangle_count_no_triangles(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]  # path graph
    row = triangle_count(_edges(spark, pairs)).collect()[0]
    assert row["n_triangles"] == 0


def test_triangle_wedge_join_is_equi_join(spark):
    """The adjacency-attach joins must plan as hash equi-joins, never a
    nested-loop, and the per-edge closing counts must sum to the exact
    triangle count."""
    from informers_spark.operators.graph import _und_degrees, _wedge_close

    pairs = [(x, y) for x, y in itertools.combinations("abcde", 2)]
    und = _edges(spark, pairs).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    tri = _wedge_close(und, _und_degrees(und))
    plan = tri._sc._jvm.PythonSQLUtils.explainString(
        tri._jdf.queryExecution(), "formatted"
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert tri.agg(F.sum("c")).collect()[0][0] == 10  # C(5,3) triangles on K5


def _lpa_reference(pairs, iterations):
    """Independent synchronous LPA with (max count, min label) pick."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(set)
    for s, d in pairs:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    labels = {n: n for n in nbrs}
    for _ in range(iterations):
        nxt = {}
        for n in nbrs:
            cnt = Counter(labels[m] for m in nbrs[n])
            # tie-break: max count, then MIN label (string order)
            top = max(cnt.values())
            nxt[n] = min(l for l, c in cnt.items() if c == top)
        labels = nxt
    return labels


def test_label_propagation_two_communities(spark):
    from informers_spark.operators.graph import label_propagation

    # two triangles joined by one bridge: LPA should settle into two
    # communities matching the independent reference implementation
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    e = _edges(spark, pairs)
    m = {}
    got = {r.node: r.label for r in label_propagation(e, iterations=3, metrics=m).collect()}
    assert got == _lpa_reference(pairs, 3)
    assert m == {"iterations": 3}
    # the two triangle cores agree internally
    assert got["a"] == got["b"] == got["c"] or len({got["a"], got["b"], got["c"]}) <= 2


def test_label_propagation_star_absorbs_min_label(spark):
    from informers_spark.operators.graph import label_propagation

    # star: after iter1 every rim node takes the hub's label ("h"),
    # hub takes min rim label; matches reference exactly
    pairs = [("h", f"r{i}") for i in range(5)]
    got = {r.node: r.label for r in label_propagation(_edges(spark, pairs), iterations=2).collect()}
    assert got == _lpa_reference(pairs, 2)


def test_label_propagation_deterministic_across_partitionings(spark):
    from informers_spark.operators.graph import label_propagation

    pairs = [(f"n{i}", f"n{(i * 5 + 2) % 23}") for i in range(40)]
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(7)
    a = sorted((r.node, r.label) for r in label_propagation(e1, iterations=3).collect())
    b = sorted((r.node, r.label) for r in label_propagation(e2, iterations=3).collect())
    assert a == b


def _ppr_reference(pairs, seeds, iterations, damping):
    """Independent dense personalized power iteration."""
    nodes = sorted({n for p in pairs for n in p} | set(seeds))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0] * n
    for s, _ in pairs:
        out[idx[s]] += 1
    sv = [1.0 / len(set(seeds)) if x in set(seeds) else 0.0 for x in nodes]
    rank = list(sv)
    for _ in range(iterations):
        contrib = [0.0] * n
        for s, d in pairs:
            contrib[idx[d]] += rank[idx[s]] / out[idx[s]]
        dangling = sum(r for i, r in enumerate(rank) if out[i] == 0)
        rank = [
            (1.0 - damping) * sv[i] + damping * (contrib[i] + dangling * sv[i])
            for i in range(n)
        ]
    return dict(zip(nodes, rank))


def test_personalized_pagerank_matches_dense_reference(spark):
    from informers_spark.operators.graph import personalized_pagerank

    # a->b->c chain reachable from the seed, x->y disconnected,
    # plus an isolated seed node "s2" not present in the edges
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    e = _edges(spark, pairs)
    seeds = spark.createDataFrame([("a",), ("s2",)], "node string")
    m = {}
    got = {
        r.node: r.rank
        for r in personalized_pagerank(e, seeds, iterations=4, metrics=m).collect()
    }
    want = _ppr_reference(pairs, ["a", "s2"], iterations=4, damping=0.85)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    assert m == {"iterations": 4, "n_seeds": 2}
    # mass conserved; nodes unreachable from the seeds are EXACTLY zero
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["s2"] > 0  # isolated seed keeps its teleport share


def test_personalized_pagerank_empty_seeds_raises(spark):
    from informers_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [("a", "b")])
    empty = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError):
        personalized_pagerank(e, empty, iterations=2)


def _sssp_reference(pairs, weights, seeds, k):
    """Independent bounded Bellman-Ford."""
    dist = {s: 0.0 for s in seeds}
    for _ in range(k):
        nxt = dict(dist)
        for (s, d), w in zip(pairs, weights):
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_shortest_paths_weighted_matches_bellman_ford(spark):
    from informers_spark.operators.graph import shortest_paths

    # diamond: a->b->d (1+1=2) vs a->c->d (5+0.5=5.5); plus unreachable z
    pairs = [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"), ("y", "z")]
    weights = [1.0, 1.0, 5.0, 0.5, 2.0]
    e = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(pairs, weights)],
        "src string, dst string, w double",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    m = {}
    got = {r.node: r.dist for r in shortest_paths(e, seeds, k=3, weight="w", metrics=m).collect()}
    assert got == _sssp_reference(pairs, weights, ["a"], 3)
    assert got["d"] == 2.0  # shorter 2-hop path wins over heavier direct-ish one
    assert "z" not in got  # unreachable absent
    assert m["rounds"] == 2  # third round improves nothing -> early exit


def test_shortest_paths_unweighted_equals_hop_counts(spark):
    from informers_spark.operators.graph import k_hop, shortest_paths

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    e = _edges(spark, pairs)
    seeds = spark.createDataFrame([("a",)], "node string")
    dists = {r.node: r.dist for r in shortest_paths(e, seeds, k=3).collect()}
    hops = {r.node: float(r.hops) for r in k_hop(e, seeds, k=3).collect()}
    assert dists == hops  # unit weights: distance == min-hop count


def test_shortest_paths_rejects_negative_weights(spark):
    from informers_spark.operators.graph import shortest_paths

    e = spark.createDataFrame([("a", "b", -1.0)], "src string, dst string, w double")
    seeds = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        shortest_paths(e, seeds, k=2, weight="w")
