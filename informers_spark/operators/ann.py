"""Similarity search over embedding columns.

- brute-force cosine top-k: the correctness baseline. The query set is
  broadcast (small side) against the corpus scan; per-query top-k via
  window. O(|Q|·N) work but one scan, no shuffle of the corpus.
- hyperplane-sign LSH buckets: the scale path. Deterministic INTEGER
  plane weights w[i][j] = ((i*37 + j*101) % 19) - 9 keep the arithmetic
  exactly reproducible in ANSI SQL (DuckDB oracle parity) — at real
  scale these would be seeded gaussian planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from informers_spark.functions.similarity import cosine


def plane_weights(n_planes: int, dim: int) -> list[list[int]]:
    return [[((i * 37 + j * 101) % 19) - 9 for j in range(dim)] for i in range(n_planes)]


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """LSH bucket id: bit i = (Σ_j w[i][j]·v[j] > 0)."""
    w = plane_weights(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        dot_i = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x).cast("double") for x in w[i]]),
                lambda v, p: v.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_i > 0, F.lit(2**i)).otherwise(F.lit(0)).cast("long")
    return bucket


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self-matches
    excluded). → (query_id, neighbor_id, rank, cos_sim). The query side
    is broadcast; ties broken by neighbor id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only within the query's LSH bucket —
    the candidate join is an equi-join on bucket, not a cross join."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid: posexplode → per-(group, dim) mean → re-assemble.
    Map-side partial aggregation makes this one shuffle of (group, dim)
    keys — scales to any corpus size. → (label, dim, mean_val)."""
    return (
        df.select(F.col(group_col).alias("label"), F.posexplode(F.col(vec_col)).alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mean_val"))
    )
