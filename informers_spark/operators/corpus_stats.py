"""Corpus-statistics and sampling operators for training-data curation:
n-gram heavy hitters, grouped quantile sketches, and deterministic
stratified sampling.

These are the "shape the mix" half of a 100-TB data pipeline (the dedup
operators are the "drop the garbage" half): before training you need the
corpus's n-gram distribution (contamination / boilerplate checks), its
per-slice length quantiles (packing and truncation budgets), and a
reproducible way to downsample each slice to a target rate.

Scale posture:
- `ngram_topk` is explode -> partial-aggregated groupBy: the shuffle
  carries (gram, partial_count) pairs, never documents, and the final
  top-k is a single ordered limit.
- `quantile_sketch` uses percentile_approx (Greenwald-Khanna style
  sketch agg in the JVM): mergeable partial state per partition, rank
  error <= 1/accuracy; nothing is ever collected or fully sorted.
- `stratified_sample` is map-only: a portable md5-prefix bucket hash
  (reproducible bit-for-bit in ANSI SQL, see the oracle twins in
  queries.py) compared against a per-stratum rate. Deterministic under
  any partitioning/retry — the same row always lands on the same side
  of the cut, unlike rand()-based sampling.
- `contamination` broadcasts the benchmark's distinct n-gram set (eval
  suites are small by definition) against a map-side explode of the
  corpus: the only shuffle is the per-doc hit count, carrying
  (doc_id, partial_count) — never text, never a corpus self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from informers_spark.functions.similarity import word_shingles
from informers_spark.rebalance import spread_scan


def ngram_topk(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 20
) -> DataFrame:
    """Top-k word n-grams by corpus frequency -> (gram, cnt), ties broken
    by gram ascending (deterministic). Uses the shared word-shingle
    definition (texts shorter than n tokens contribute one shingle of
    all their tokens, matching the MinHash/Jaccard paths)."""
    grams = spread_scan(df.select(text_col)).select(
        F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram"))
        .limit(k)
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ps: tuple[float, ...] = (0.5, 0.9),
    accuracy: int = 1000,
) -> DataFrame:
    """Per-group approximate quantiles -> (group, n, q_<p> ...). The
    production path is percentile_approx only — a mergeable sketch whose
    rank error is bounded by 1/accuracy; the exact-percentile comparison
    lives in the gate query (queries.q_quantile_sketch), not here, because
    exact percentiles buffer every group value and do not scale."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in ps:
        aggs.append(
            F.percentile_approx(F.col(value_col), F.lit(p), F.lit(accuracy)).alias(
                f"q_{str(p).replace('.', '_')}"
            )
        )
    return df.groupBy(group_col).agg(*aggs)


def sample_bucket(key: Column, buckets: int = 10_000, seed: str = "") -> Column:
    """Deterministic portable bucket in [0, buckets): the integer value
    of the first 15 hex digits of md5(seed || key) mod buckets. One JVM
    hash call per row; bit-identical in ANSI SQL as
    ('0x' || substring(md5(s), 1, 15))::ubigint % buckets — 15 hex digits
    = 60 bits, so the intermediate fits signed 64-bit on both engines."""
    s = F.concat(F.lit(seed), key.cast("string")) if seed else key.cast("string")
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % F.lit(buckets)
    ).cast("int")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
    buckets: int = 10_000,
    seed: str = "",
) -> DataFrame:
    """Deterministic stratified downsample: keep a row iff its bucket
    hash falls under its stratum's rate. `rates` maps stratum value ->
    keep-rate in [0,1]; strata not listed keep `default_rate`. Map-only,
    idempotent, partition-independent — re-running the pipeline (or one
    retried task) selects the identical sample."""
    cut = F.lit(int(round(default_rate * buckets)))
    for value, rate in rates.items():
        cut = F.when(F.col(strata_col) == value, F.lit(int(round(rate * buckets)))).otherwise(cut)
    return df.filter(sample_bucket(F.col(key_col), buckets, seed) < cut)


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    max_ratio: float = 0.05,
    keep_flagged: bool = False,
) -> DataFrame:
    """Drop (or flag) documents whose duplicated-n-gram fraction exceeds
    `max_ratio` — the Gopher repetition rule as a corpus filter. Map-only
    column math over the scan; `keep_flagged=True` returns every row with
    a `rep_ratio` column instead of filtering (audit mode).

    Plan note: in filter mode Catalyst pushes the predicate below the
    spread exchange into the scan stage — at real scale that is exactly
    right (rows are dropped before any shuffle); on a single-row-group
    bench file it serializes the shingle math onto one core, so
    throughput-sensitive audits should use keep_flagged=True (the ratio
    Project stays above the exchange and parallelizes)."""
    from informers_spark.functions.text import repetition_ratio

    ratio = repetition_ratio(F.col(text_col), n)
    flagged = spread_scan(df).withColumn("rep_ratio", ratio)
    if keep_flagged:
        return flagged
    return flagged.filter(F.col("rep_ratio") <= max_ratio).drop("rep_ratio")


def contamination(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
    clean: bool = False,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark-contamination check: find training documents that share
    >= `min_overlap` DISTINCT word n-grams with a benchmark/eval set
    (the pre-training decontamination rule: any doc overlapping the
    eval suite's n-grams leaks test answers into training).

    Returns (id_col, overlap_cnt) for contaminated docs; `clean=True`
    instead returns the decontaminated corpus (anti-join on the flagged
    ids, original columns intact).

    Scale posture: the benchmark side is exploded to distinct grams and
    BROADCAST (eval suites are ~10^5 grams even for large benchmark
    batteries — set `broadcast_bench=False` to let AQE pick if yours is
    not). The corpus side is a map-only explode of per-doc DISTINCT
    shingles joined against the broadcast, then one partial-aggregated
    groupBy(id): the shuffle carries (id, partial_count) pairs only.
    No corpus self-join exists at any size; cost is O(corpus grams).
    Shingles use the shared `word_shingles` definition (one shingle
    vocabulary repo-wide: MinHash, Jaccard, repetition, this)."""
    from pyspark.sql.functions import broadcast as B

    def grams(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col),
            F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("gram"),
        )

    bench_grams = grams(bench).select("gram").distinct()
    if broadcast_bench:
        bench_grams = B(bench_grams)
    hits = (
        grams(spread_scan(df))
        .join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap_cnt"))
        .filter(F.col("overlap_cnt") >= min_overlap)
    )
    if clean:
        return df.join(hits.select(id_col), id_col, "left_anti")
    return hits
