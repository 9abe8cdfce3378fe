"""Canonicalization: connected components via iterative min-label
propagation on a DataFrame edge list (north-rule contract).

Each iteration: labels ⋈ edges → per-node min neighbor label → keep the
smaller of (own, best neighbor). localCheckpoint() every iteration cuts
the lineage (a star-shaped hot component otherwise explodes the plan —
SURVEY.md §7.4), and the loop stops at fixpoint (0 changed labels) or
max_iter. Convergence is O(graph diameter) iterations; for same_as graphs
(small dense clusters) that is ~2-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_components(edges_rows, node_type, spark) -> "DataFrame":
    """Driver-side union-find for BELOW-CUTOFF edge lists: identical
    output contract to the distributed loop (component = min member),
    at ~1000x less fixed cost (one job vs ~4 shuffles x O(log n) iters).
    The size gate is the same trick AQE uses demoting a sort-merge join
    to a broadcast join when a side turns out tiny."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edges_rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    groups: dict = {}
    for node in parent:
        groups.setdefault(find(node), []).append(node)
    rows = []
    for members in groups.values():
        comp = min(members)
        rows.extend((m, comp) for m in members)
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("component", node_type)]
    )
    return spark.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    require_convergence: bool = True,
    metrics: dict | None = None,
    small_cutoff: int = 65536,
) -> DataFrame:
    """→ (node, component) where component = min node id/label in the
    component (string min = lexicographic).

    Exiting via max_iter with labels still changing means the result is
    WRONG (partially-merged components) — with require_convergence (the
    default) that raises instead of silently emitting bad same_as edges;
    pass require_convergence=False to get the partial labels plus
    metrics['converged']=False. `metrics` (optional dict) also receives
    'iterations' for stage telemetry.

    Size-tiered execution: when the edge list is at most `small_cutoff`
    rows (probed with a limit(cutoff+1).collect(), never a full count),
    labels come from a driver union-find — one Spark job instead of ~4
    shuffles per pointer-jumping iteration, which at sandbox/sf scales is
    pure fixed cost. Above the cutoff (any real KG run) the distributed
    loop runs unchanged; both paths emit the identical (node,
    component=min member) contract and are equality-tested against each
    other. small_cutoff=0 forces the distributed path."""
    if small_cutoff:
        probe = edges.select(src, dst).limit(small_cutoff + 1).collect()
        if len(probe) <= small_cutoff:
            if metrics is not None:
                metrics["iterations"] = 0
                metrics["converged"] = True
                metrics["path"] = "driver_union_find"
            return _union_find_components(
                [(r[0], r[1]) for r in probe],
                edges.schema[src].dataType,
                edges.sparkSession,
            )
    if metrics is not None:
        metrics["path"] = "distributed_pointer_jumping"
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # joined EVERY iteration: without this the edge scan + union +
        # full-shuffle distinct re-execute once per pointer-jumping round
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    converged = False
    iterations = 0
    for _ in range(max_iter):
        iterations += 1
        # 1) hook: take the min label over neighbors
        prop = (
            sym.join(labels, sym.u == labels.node)
            .select(F.col("v").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        hooked = labels.join(prop, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
            F.col("component").alias("old"),
        )
        # 2) pointer-jump: component := label(component). Labels only
        #    shrink and every label is a node id, so this is total; it
        #    turns O(diameter) convergence into O(log n) — a 10^6-long
        #    chain resolves in ~20 iterations instead of 10^6.
        parent = labels.select(
            F.col("node").alias("component"), F.col("component").alias("jump")
        )
        new_labels = (
            hooked.join(parent, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("jump"), F.col("component"))
                ).alias("component"),
                "old",
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("component") != F.col("old")).limit(1).count()
        labels = new_labels.drop("old")
        if changed == 0:
            converged = True
            break
    if metrics is not None:
        metrics["iterations"] = iterations
        metrics["converged"] = converged
    if not converged and require_convergence:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "(labels still changing) — the component labels would be silently "
            "wrong; raise max_iter (pointer-jumping needs ~log2(diameter) "
            "iterations) or pass require_convergence=False to accept partial labels"
        )
    return labels
