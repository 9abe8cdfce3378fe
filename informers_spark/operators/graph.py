"""Graph analytics over DataFrame edge lists — the query layer that sits
downstream of KG materialization (plans/kg.py writes triples/nodes/edges
tables) and canonicalization (operators/canon.py connected_components).

A knowledge graph you can only *build* but not *query* is half a product:
after `build_kg` lands (subj, pred, obj) triples, the obvious next asks
are "which entities matter" (PageRank), "what is reachable from X"
(k-hop), "how dense is the neighborhood" (degrees, triangles). Each
operator here takes a plain (src, dst) edge DataFrame — `triples.select
(F.col("subj").alias("src"), F.col("obj").alias("dst"))` — so they
compose with any predicate filter.

Scale shape (the part that must survive 100 TB):
- Every per-iteration step is an equi-join on a node key plus a groupBy
  with map-side partial aggregation — no cartesian products, no
  driver-side edge materialization. Hot destination nodes (every KG has
  celebrity entities) are absorbed by partial aggregation; hot source
  nodes by AQE skew-join splitting.
- Iterative loops `localCheckpoint()` each round, exactly like
  connected_components, so the lineage stays O(1) instead of O(iters)
  and a star-shaped hot component cannot explode the plan.
- The only driver-side values are single-row scalars (node count, the
  dangling-mass probe) — the same class of bounded action as the CC
  convergence count; never an O(nodes) collect.
- Triangle counting uses the degree-oriented orientation (each
  undirected edge points from the (degree, node)-smaller endpoint to the
  larger), which bounds the wedge fan-out per node by its *oriented*
  out-degree — the standard trick that keeps the wedge join near
  O(m^1.5) on power-law graphs instead of O(sum deg^2) exploding on the
  hottest hub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """→ (node, out_deg, in_deg, degree) for every node appearing in the
    edge list. One shuffle per direction, map-side combined; the outer
    join re-shuffles only (node, count) pairs, never edges."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("out_deg"))
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias("degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    weight: str | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Fixed-iteration power-method PageRank → (node, rank).

    r_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} r_t(u)·w(u,v)/W(u) + dangling_t/N)

    where W(u) is u's out-weight (its out-DEGREE when `weight` is None —
    classic PageRank) and dangling_t is the rank mass sitting on nodes
    with no out-edges, redistributed uniformly (the standard treatment).
    `weight` names a strictly-positive edge column (e.g. the KG edges
    table's `score`), turning the walk into weighted-proportional link
    following. Fixed `iterations` rather than an epsilon stop makes the
    result a pure deterministic function of
    (edges, weights, iterations, damping) — which is what lets the
    correctness gate unroll the exact same recurrence in SQL.

    Per iteration: one shuffle joining ranks onto the (src, dst, w, od)
    edge table by src, one map-side-combined groupBy(dst), one broadcast
    of the 1-row dangling aggregate, then localCheckpoint to pin the
    iterate and cut lineage. Setup is ONE dual-explode aggregation
    (node universe + out-weights + dangling flags in a single shuffle,
    instead of a union-distinct plus a separate out-degree groupBy —
    the r5 form spent as long in setup as in all five iterations), and
    the dangling flag rides the rank table so the per-iteration
    dangling mass is a filter + 1-row aggregate, not an anti-join.
    Out-weights are joined onto edges ONCE before the loop. The dangling
    zero-padding (dst occurrences contribute +0.0 to the out-weight
    sum) is exact in IEEE arithmetic, so od values are unchanged."""
    w_col = (
        F.col(weight).cast("double") if weight is not None else F.lit(1.0)
    )
    both = F.array(
        F.struct(F.col(src).alias("node"), w_col.alias("w")),
        F.struct(F.col(dst).alias("node"), F.lit(0.0).alias("w")),
    )
    nodes_f = (
        edges.select(F.explode(both).alias("e"))
        .groupBy(F.col("e.node").alias("node"))
        .agg(F.sum("e.w").alias("od"))
        .select("node", "od", (F.col("od") > 0).alias("has_out"))
        .localCheckpoint()
    )
    n = nodes_f.count()  # single scalar; the formula needs N on both sides
    if n == 0:
        return nodes_f.select("node").withColumn("rank", F.lit(0.0))
    teleport = (1.0 - damping) / n

    edges_w = (
        edges.select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w_col.alias("e_w")
        )
        .join(nodes_f.filter("has_out").select("node", "od"), F.col("e_src") == F.col("node"))
        .select("e_src", "e_dst", "e_w", "od")
        .localCheckpoint()  # scanned every iteration
    )

    ranks = nodes_f.select("node", "has_out").withColumn(
        "rank", F.lit(1.0 / n)
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            edges_w.join(ranks, F.col("e_src") == F.col("node"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("e_w") / F.col("od")).alias("contrib"))
        )
        # rank mass on dangling nodes (no out-edges): 1-row aggregate,
        # broadcast onto every node — never a driver round-trip inside
        # the loop's plan
        dangling = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("mass")
        )
        ranks = (
            nodes_f.select("node", "has_out")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "has_out",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("mass") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    if metrics is not None:
        metrics["iterations"] = iterations
        metrics["n_nodes"] = n
    return ranks.select("node", "rank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    weight: str | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Personalized PageRank → (node, rank): the random walk teleports
    back to the SEED set instead of everywhere, so rank measures
    proximity to the seeds — the "entities related to X" query over a
    knowledge graph.

    r_{t+1}(v) = (1-d)·s(v) + d·(Σ_{u→v} r_t(u)·w(u,v)/W(u) + dangling_t·s(v))

    with s(v) = 1/|S| on seeds and 0 elsewhere, r_0 = s. Dangling mass
    returns to the seeds (the standard PPR treatment — total mass stays
    1, and nodes unreachable from the seeds stay at exactly 0). The node
    universe is edge endpoints ∪ seeds, so an isolated seed keeps its
    teleport share instead of leaking it. Same per-iteration plan shape
    as `pagerank`; the seed indicator is joined onto the node table ONCE
    before the loop."""
    seed_nodes = (
        seeds.select(F.col(seeds.columns[0]).alias("node")).distinct().localCheckpoint()
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    sv = 1.0 / n_seeds
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .unionAll(seed_nodes.select("node"))
        .distinct()
    )
    nodes_s = (
        nodes.join(seed_nodes.withColumn("is_seed", F.lit(True)), "node", "left")
        .select(
            "node",
            F.when(F.col("is_seed"), F.lit(sv)).otherwise(F.lit(0.0)).alias("sv"),
        )
        .localCheckpoint()
    )

    w_col = F.col(weight).cast("double") if weight is not None else F.lit(1.0)
    out_deg = (
        edges.select(F.col(src).alias("node"), w_col.alias("w"))
        .groupBy("node")
        .agg(F.sum("w").alias("od"))
    )
    edges_w = (
        edges.select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w_col.alias("e_w")
        )
        .join(out_deg, F.col("e_src") == F.col("node"))
        .select("e_src", "e_dst", "e_w", "od")
        .localCheckpoint()
    )

    ranks = nodes_s.select("node", F.col("sv").alias("rank")).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            edges_w.join(ranks, F.col("e_src") == F.col("node"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("e_w") / F.col("od")).alias("contrib"))
        )
        dangling = (
            ranks.join(out_deg.select("node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("mass"))
        )
        ranks = (
            nodes_s.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("sv")
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("mass") * F.col("sv"))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    if metrics is not None:
        metrics["iterations"] = iterations
        metrics["n_seeds"] = n_seeds
    return ranks


def personalized_pagerank_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int = 6,
) -> str:
    """Unrolled ANSI-SQL twin of `personalized_pagerank` (unweighted):
    identical recurrence, identical float literals; `edges_sql` yields
    (src, dst), `seeds_sql` yields a single node column."""
    d = repr(float(damping))
    one_minus_d = repr(1.0 - float(damping))
    steps = []
    for i in range(1, iterations + 1):
        prev = f"r{i - 1}"
        steps.append(
            f"""r{i} AS (
  SELECT n.node,
         {one_minus_d} * n.sv + {d} * (COALESCE(c.contrib, 0.0) + dg.mass * n.sv) AS rank
  FROM svec n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / o.od) AS contrib
    FROM e JOIN {prev} r ON e.src = r.node JOIN outdeg o ON e.src = o.node
    GROUP BY e.dst
  ) c ON n.node = c.node
  CROSS JOIN (
    SELECT COALESCE(SUM(r.rank), 0.0) AS mass
    FROM {prev} r LEFT JOIN outdeg o ON r.node = o.node
    WHERE o.node IS NULL
  ) dg
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH e AS ({edges_sql}),
seeds AS (SELECT DISTINCT * FROM ({seeds_sql})),
scount AS (SELECT CAST(COUNT(*) AS DOUBLE) AS s FROM seeds),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e
          UNION SELECT node FROM seeds),
svec AS (
  SELECT n.node,
         CASE WHEN sd.node IS NULL THEN 0.0 ELSE 1.0 / sc.s END AS sv
  FROM nodes n CROSS JOIN scount sc LEFT JOIN seeds sd ON n.node = sd.node
),
outdeg AS (SELECT src AS node, COUNT(*) AS od FROM e GROUP BY src),
r0 AS (SELECT node, sv AS rank FROM svec),
{unrolled}
SELECT node, ROUND(rank, {round_to}) AS rank FROM r{iterations} ORDER BY node
"""


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int = 6,
    weighted: bool = False,
) -> str:
    """Unrolled ANSI-SQL twin of `pagerank` for the DuckDB correctness
    gate: CTE r0 → r1 → … → r{k}, each step the identical recurrence
    with the identical float literals (interpolated from the same Python
    doubles the Spark plan uses, so both engines evaluate the same IEEE
    constants). `edges_sql` must yield columns (src, dst) — plus a
    strictly-positive `w` when `weighted`, in which case W(u) = SUM(w)
    and each contribution is rank·w/W(u), mirroring pagerank(weight=...)."""
    d = repr(float(damping))
    w_expr = "CAST(e.w AS DOUBLE)" if weighted else "1.0"
    od_expr = "SUM(CAST(w AS DOUBLE))" if weighted else "CAST(COUNT(*) AS DOUBLE)"
    steps = []
    for i in range(1, iterations + 1):
        prev = f"r{i - 1}"
        steps.append(
            f"""r{i} AS (
  SELECT n.node,
         (1.0 - {d}) / nn.n + {d} * (COALESCE(c.contrib, 0.0) + dg.mass / nn.n) AS rank
  FROM nodes n
  CROSS JOIN ncount nn
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank * {w_expr} / o.od) AS contrib
    FROM e JOIN {prev} r ON e.src = r.node JOIN outdeg o ON e.src = o.node
    GROUP BY e.dst
  ) c ON n.node = c.node
  CROSS JOIN (
    SELECT COALESCE(SUM(r.rank), 0.0) AS mass
    FROM {prev} r LEFT JOIN outdeg o ON r.node = o.node
    WHERE o.node IS NULL
  ) dg
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH e AS ({edges_sql}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
ncount AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outdeg AS (SELECT src AS node, {od_expr} AS od FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, ncount nn),
{unrolled}
SELECT node, ROUND(rank, {round_to}) AS rank FROM r{iterations} ORDER BY node
"""


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    metrics: dict | None = None,
) -> DataFrame:
    """Min-hop BFS from a seed set → (node, hops), hops ∈ [0, k].

    Frontier expansion: frontier ⋈ edges → dedup → anti-join visited.
    The anti-join keeps the frontier MINIMAL (a node reached at hop 2 is
    never re-expanded at hop 3), which is what bounds total work by
    O(reachable edges), not O(k · edges). Early-exits on an empty
    frontier via a bounded limit(1) probe, same trick as canon.py's
    size gate."""
    visited = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct().withColumn(
        "hops", F.lit(0)
    ).localCheckpoint()
    frontier = visited.select("node")
    hops_run = 0
    for i in range(1, k + 1):
        nxt = (
            edges.join(frontier, edges[src] == frontier.node)
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(i))
            .localCheckpoint()
        )
        if not nxt.limit(1).collect():  # bounded probe, never a full count
            break
        hops_run = i
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt.select("node")
    if metrics is not None:
        metrics["hops_expanded"] = hops_run
    return visited


def k_hop_oracle_sql(edges_sql: str, seeds_sql: str, k: int) -> str:
    """Recursive-CTE twin of `k_hop`: depth-bounded reachability then a
    MIN(hops) rollup (the CTE enumerates all ≤k paths; the GROUP BY
    collapses them to first-visit depth, matching BFS)."""
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
seeds AS ({seeds_sql}),
reach(node, hops) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT e.dst, r.hops + 1 FROM reach r JOIN e ON e.src = r.node WHERE r.hops < {k}
)
SELECT node, MIN(hops) AS hops FROM reach GROUP BY node ORDER BY node
"""


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    metrics: dict | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection → (node, label).

    Edges are treated as undirected (each edge messages both ways), and
    as a MULTIGRAPH: parallel edges weight the vote — dedupe upstream
    if simple-graph semantics are wanted (the oracle counts the same
    way). label_0(v) = v; label_{t+1}(v) = the label most frequent among
    v's neighbors at step t, ties broken by MINIMUM label — the standard
    deterministic variant (asynchronous LPA is order-dependent and
    unreproducible; synchronous + min-tie-break is a pure function of
    (edges, iterations), which is what the oracle unrolls). Fixed
    iteration count: LPA is used here as a cheap community assignment,
    not a convergence guarantee (synchronous LPA can 2-cycle on
    bipartite structures — a bounded iteration count is the standard
    treatment for that too).

    Per iteration: one equi-join (labels onto the doubled edge list),
    one map-side-combined groupBy((node, label)) count, one per-node
    window to pick (max count, min label), then localCheckpoint. The
    window partitions by node with ≤ degree rows per node — bounded by
    the hottest node's degree, same skew profile as the degree
    computation itself."""
    und = (
        edges.select(F.col(src).alias("nbr"), F.col(dst).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("nbr"), F.col(src).alias("node")))
        .filter(F.col("nbr") != F.col("node"))
        .localCheckpoint()  # scanned every iteration
    )
    labels = (
        und.select("node").distinct().withColumn("label", F.col("node")).localCheckpoint()
    )
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(iterations):
        counts = (
            und.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node", "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    if metrics is not None:
        metrics["iterations"] = iterations
    return labels


def label_propagation_oracle_sql(edges_sql: str, iterations: int = 3) -> str:
    """Unrolled ANSI-SQL twin of `label_propagation`: l0 → l1 → … with
    the identical (count DESC, label ASC) pick each step. `edges_sql`
    must yield (src, dst); self-loops are dropped like the operator."""
    steps = []
    for i in range(1, iterations + 1):
        prev = f"l{i - 1}"
        steps.append(
            f"""c{i} AS (
  SELECT u.node, l.label, COUNT(*) AS cnt
  FROM und u JOIN {prev} l ON u.nbr = l.node
  GROUP BY u.node, l.label
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH e AS ({edges_sql}),
und AS (
  SELECT src AS nbr, dst AS node FROM e WHERE src <> dst
  UNION ALL
  SELECT dst AS nbr, src AS node FROM e WHERE src <> dst
),
l0 AS (SELECT DISTINCT node, node AS label FROM und),
{unrolled}
SELECT node, label FROM l{iterations} ORDER BY node
"""


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Bounded-hop (weighted) single-source-set shortest paths →
    (node, dist): Bellman–Ford iterations of the min-plus recurrence

        dist_{t+1}(v) = min(dist_t(v), min_{u→v}(dist_t(u) + w(u,v)))

    from a seed set at distance 0, exact for every path of ≤ k hops
    (negative weights are rejected — with them a k-bounded answer is
    not a distance). Unreached nodes are absent from the result, like
    `k_hop`. MIN is order-independent and each path's weight sum is
    accumulated in path order on both engines, so the oracle (a
    depth-bounded recursive CTE + MIN rollup) matches bit-for-bit even
    on double weights.

    Per iteration: one equi-join (dists onto edges by src), one
    map-side-combined groupBy(dst) MIN, a union + second MIN to keep
    the monotone frontier, then localCheckpoint. Early-exits via a
    bounded limit(1) probe when an iteration improves nothing."""
    if k < 0:
        raise ValueError(f"need k >= 0, got {k}")
    w_col = F.col(weight).cast("double") if weight is not None else F.lit(1.0)
    ew = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w_col.alias("w")
    )
    neg = ew.filter(F.col("w") < 0).limit(1).collect()
    if neg:
        raise ValueError("shortest_paths requires non-negative edge weights")
    ew = ew.localCheckpoint()  # scanned every iteration
    dists = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(k):
        relaxed = (
            ew.join(dists, F.col("e_src") == F.col("node"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
        )
        nxt = (
            dists.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        improved = (
            nxt.alias("n")
            .join(dists.alias("o"), "node", "left")
            .filter(F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist")))
        )
        if not improved.limit(1).collect():  # bounded probe, never a full count
            break
        rounds += 1
        dists = nxt
    if metrics is not None:
        metrics["rounds"] = rounds
    return dists


def shortest_paths_oracle_sql(
    edges_sql: str, seeds_sql: str, k: int, weighted: bool = False
) -> str:
    """Recursive-CTE twin of `shortest_paths`: enumerate all ≤k-hop
    paths, MIN-rollup per node. `edges_sql` yields (src, dst) plus `w`
    when `weighted`; `seeds_sql` yields one node column."""
    w = "CAST(e.w AS DOUBLE)" if weighted else "1.0"
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
seeds AS ({seeds_sql}),
walk(node, dist, hops) AS (
  SELECT node, CAST(0.0 AS DOUBLE), 0 FROM (SELECT DISTINCT * FROM seeds)
  UNION ALL
  SELECT e.dst, r.dist + {w}, r.hops + 1
  FROM walk r JOIN e ON e.src = r.node WHERE r.hops < {k}
)
SELECT node, MIN(dist) AS dist FROM walk GROUP BY node ORDER BY node
"""


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count over an UNDIRECTED graph given as a directed
    edge list (direction ignored; self-loops and duplicate/reverse pairs
    collapsed) → one row (n_nodes, n_edges, n_triangles).

    Degree-oriented counting: canonicalize each edge to (lo, hi) by node
    id, compute degrees, then orient every edge from the
    (degree, node)-SMALLER endpoint to the larger. Every triangle then
    has exactly one wedge at its orientation-minimal vertex, so
    wedges ⋈ oriented-edges counts each triangle exactly once — and the
    wedge fan-out at a hub is C(oriented-outdeg, 2), which orientation
    caps near O(sqrt(m)) instead of the hub's raw degree. All joins are
    equi-joins; the wedge join key is the (u, w) pair."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # reused: degrees + orientation + adjacency
    )
    deg = _und_degrees(und)
    n_tri = int(
        _wedge_close(und, deg).agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t")).collect()[0]["t"]
    )
    n_edges = und.count()
    n_nodes = deg.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri)], "n_nodes bigint, n_edges bigint, n_triangles bigint"
    )


def _und_degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def _wedge_close(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Per-oriented-edge closing counts (one row per oriented edge with
    `c` = triangles closed at it; SUM(c) = global triangle count);
    factored out so plan tests can assert every join stays a hash
    equi-join.

    r6 shape: adjacency-intersection instead of materializing wedges.
    The wedge ⋈ closing-edge plan shuffled one row PER WEDGE — measured
    50.6M wedge rows against 3.0M edges at sf1.0 (3.3-6.5 s) for 2.0M
    triangles. Here each oriented edge (u, v) joins the out-neighbor
    lists of u and v once and counts |N+(u) ∩ N+(v)| in the JVM: a
    triangle's orientation-minimal vertex u sees w in both lists, so
    each triangle is counted exactly once — the same degree-oriented
    bound on list length (~sqrt(m) amortized), but the shuffle carries
    each adjacency list once (Σ|N+| = m rows) instead of Σ C(|N+|, 2)
    wedge rows (measured 1.7 s)."""
    # orient by key = (deg, node): struct comparison gives the total
    # order, bounding every out-list by the hub-capping argument above
    ka = F.struct(F.col("da.deg").alias("d"), F.col("a").alias("n"))
    kb = F.struct(F.col("db.deg").alias("d"), F.col("b").alias("n"))
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        und.join(da, F.col("a") == F.col("da.node"))
        .join(db, F.col("b") == F.col("db.node"))
        .select(
            F.when(ka < kb, F.struct(F.col("a").alias("u"), F.col("b").alias("v")))
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint()
    )
    adj = oriented.groupBy(F.col("u").alias("n")).agg(F.collect_list("v").alias("nb"))
    return (
        oriented.join(adj.select(F.col("n").alias("u"), F.col("nb").alias("nu")), "u")
        # v may have no out-edges (orientation-maximal): left join + empty
        .join(adj.select(F.col("n").alias("v"), F.col("nb").alias("nv")), "v", "left")
        .select(
            F.size(F.array_intersect(F.col("nu"), F.coalesce(F.col("nv"), F.array()))).alias("c")
        )
    )


def kg_graph_summary(
    spark,
    warehouse_dir: str,
    preds: list[str] | None = None,
    pagerank_iterations: int = 5,
    top_n: int = 20,
    use_scores: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Analytics over a `build_kg` warehouse's materialized edges table
    → (summary, top_entities).

    summary: one row (n_nodes, n_edges, n_triangles) over the selected
    predicate slice; top_entities: the `top_n` highest-PageRank nodes
    (node, rank) — "which entities matter" straight off the graph the
    job just landed. `preds` filters the edge slice (e.g. ["imports",
    "same_as"]); None = every predicate. The edges table is partitioned
    by pred (plans/kg.py), so a preds filter is partition pruning, not
    a scan-and-drop. `use_scores` weights the rank walk by each edge's
    extraction score (clamped to a small positive floor so a zero-score
    edge cannot zero a node's out-weight)."""
    edges = spark.read.parquet(f"{warehouse_dir.rstrip('/')}/edges")
    if preds is not None:
        edges = edges.filter(F.col("pred").isin(list(preds)))
    if use_scores:
        weighted = edges.select(
            "src",
            "dst",
            F.greatest(F.col("score").cast("double"), F.lit(1e-6)).alias("w"),
        )
        ranks = pagerank(weighted, iterations=pagerank_iterations, weight="w")
    else:
        ranks = pagerank(edges.select("src", "dst"), iterations=pagerank_iterations)
    summary = triangle_count(edges.select("src", "dst"))
    top = ranks.orderBy(F.desc("rank"), "node").limit(top_n)
    return summary, top


def materialize_graph_stats(
    spark,
    warehouse_dir: str,
    pagerank_iterations: int = 5,
    lpa_iterations: int = 3,
    use_scores: bool = False,
    resume: bool = True,
) -> dict:
    """Land the analytics as warehouse TABLES, not just query results:
    `node_ranks` (node, rank) and `node_communities` (node, label) are
    written through the same Warehouse as every build_kg stage, so they
    get lineage manifests, per-stage throughput metrics, and
    skip-on-resume for free — re-running the job after a crash recomputes
    only the missing table. Returns {table: manifest} like build_kg."""
    from informers_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, warehouse_dir)
    edges = wh.read("edges")
    if use_scores:
        ranked_edges = edges.select(
            "src",
            "dst",
            F.greatest(F.col("score").cast("double"), F.lit(1e-6)).alias("w"),
        )
        rank_kwargs = {"weight": "w"}
    else:
        ranked_edges = edges.select("src", "dst")
        rank_kwargs = {}

    stages = {
        "node_ranks": lambda: pagerank(
            ranked_edges, iterations=pagerank_iterations, **rank_kwargs
        ),
        # label_propagation ignores self-loops (filter nbr != node), so a
        # node appearing ONLY in self-loops would be absent from its
        # output while node_ranks covers every endpoint; left-join onto
        # the full endpoint set with a self-label fallback so both tables
        # always cover the same node universe.
        "node_communities": lambda: (
            edges.select(F.col("src").alias("node"))
            .unionAll(edges.select(F.col("dst").alias("node")))
            .distinct()
            .join(
                label_propagation(edges.select("src", "dst"), iterations=lpa_iterations),
                "node",
                "left",
            )
            .select("node", F.coalesce("label", "node").alias("label"))
        ),
    }
    metrics = {}
    for name, make in stages.items():
        if resume and wh.is_complete(name):
            metrics[name] = {**wh.manifest(name), "resumed": True}
        else:
            metrics[name] = wh.write(make(), name)
    return metrics
