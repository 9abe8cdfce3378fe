"""Entity linking: two-stage blocked join (north-rule contract).

Stage 1 (blocking / candidate generation): character-shingle MinHash
signatures on the distinct surface forms → LSH band buckets → self-join
within buckets. This avoids the O(n²) cross join: at 10^12 scale only
near-duplicate surfaces collide in a band.

Stage 2 (scoring): cosine over sentence-embedding vectors of the surface
forms (mean-pooled transformer outputs, reference pipeline semantics via
informers_spark.pipelines.embed) ∧ threshold → same_as edges; per-surface
best match kept with a window.

Skew guard: band buckets larger than `max_bucket` are dropped (a band key
shared by millions of surfaces generates a quadratic pair explosion —
standard LSH practice; those pairs are re-findable with more bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from informers_spark.functions.similarity import (
    cosine,
    minhash_bands,
    minhash_signature,
)
from informers_spark.pipelines.embed import embed


def _char_shingle_fps(col, n: int = 3):
    """Portable fingerprints of character n-grams of lower(col) —
    hashed with the SHARED rolling-hash helper (similarity._fp_str), so
    one definition of the portable fingerprint exists repo-wide (the
    previous inline fold also folded split()'s trailing empty string,
    silently diverging from the shared values)."""
    from informers_spark.functions.similarity import _fp_str

    s = F.lower(col)
    cnt = F.greatest(F.length(s) - (n - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), cnt), lambda i: F.substring(s, i, n))
    return F.array_distinct(F.transform(grams, _fp_str))


def candidate_pairs(
    surfaces: DataFrame,
    surface_col: str = "surface",
    k: int = 16,
    bands: int = 8,
    max_bucket: int = 1000,
    small_cutoff: int = 1024,
) -> DataFrame:
    """Candidate pairs (a, b) with a < b over distinct surface forms.

    Size-tiered: at most `small_cutoff` surfaces (probed with a
    limit-count, never a full count) → EXACT all-pairs via a broadcast
    self-join (≤ ~0.5M pairs — trivial, and a recall superset of LSH),
    skipping the minhash fold, localCheckpoint and band shuffle that are
    pure fixed cost on tiny inputs. Above the cutoff the MinHash/LSH
    blocking below runs unchanged — that is the only path that exists at
    10^12 scale. small_cutoff=0 forces LSH."""
    if small_cutoff:
        n = surfaces.limit(small_cutoff + 1).count()
        if n <= small_cutoff:
            a = surfaces.select(F.col(surface_col).alias("sa"))
            b = surfaces.select(F.col(surface_col).alias("sb"))
            return a.crossJoin(F.broadcast(b)).filter(F.col("sa") < F.col("sb"))
    rows = k // bands
    sig = surfaces.select(
        F.col(surface_col).alias("surface"),
        minhash_signature(_char_shingle_fps(F.col(surface_col)), k=k).alias("sig"),
    )
    # materialize once: the skew-guard aggregate and both self-join sides
    # would otherwise each recompute the per-char shingle fold
    banded = (
        sig.select(
            "surface", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bk")
        )
        .select("surface", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        .localCheckpoint()
    )

    # skew guard: drop pathological buckets before the self-join — a
    # window count over the (band, key) partitioning costs ONE shuffle
    # (vs groupBy + re-join = two) and the self-join below reuses the
    # same partitioning
    banded = (
        banded.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("band", "key"))
        )
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.surface") < F.col("b.surface"))
        .select(F.col("a.surface").alias("sa"), F.col("b.surface").alias("sb"))
        .distinct()
    )
    return pairs


def link_entities(
    surfaces: DataFrame,
    surface_col: str = "surface",
    threshold: float = 0.8,
    backend: str = "auto",
    k: int = 16,
    bands: int = 8,
) -> DataFrame:
    """same_as edges (src, dst, score) between surface forms.

    surfaces: DataFrame with one distinct surface form per row.
    """
    distinct = surfaces.select(F.col(surface_col).alias("surface")).distinct()
    pairs = candidate_pairs(distinct, "surface", k=k, bands=bands)

    # embed each distinct surface once, then join vectors onto the pairs
    vecs = embed(distinct.withColumnRenamed("surface", "text"), text_col="text",
                 backend=backend).select(
        F.col("text").alias("surface"), F.col("embedding")
    )
    va = vecs.select(F.col("surface").alias("sa"), F.col("embedding").alias("ea"))
    vb = vecs.select(F.col("surface").alias("sb"), F.col("embedding").alias("eb"))
    scored = (
        pairs.join(va, "sa").join(vb, "sb")
        .withColumn("score", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("score") >= threshold)
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"), "score")
    )
    # keep each surface's best match (stage-2 top-1, SURVEY.md §7.1.5)
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return scored.withColumn("rk", F.row_number().over(w)).filter("rk = 1").drop("rk")
