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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """→ (node, component) where component = min node id/label in the
    component (string min = lexicographic)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
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
            break
    return labels
