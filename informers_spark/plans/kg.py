"""End-to-end KG construction plan (the flagship job; north-rule contract).

Stages, each checkpointed to the warehouse with a lineage manifest so a
re-run resumes without recompute (kill at any stage → rerun → identical
output):

  1. files        — input corpus + content_sha256 (per-row invariant)
  2. mentions     — NER pipeline (entity_group/word/score/start/end)
  3. embeddings   — embedding pipeline over content
  4. triples_raw  — structural (defines/imports) ∪ mention triples
  5. same_as      — two-stage entity linking over mention surfaces
  6. components   — connected-components canonicalization
  7. triples/nodes/edges — final partitioned graph materialization

Scale design: the heavy stages (2,3) run on the scan partitioning (no
shuffle); the only shuffles are the distincts/joins in 4-6, keyed by
triple / surface / band — all high-cardinality uniform keys. Hot-repo
skew is neutralized with an explicit salt on the repartition before
inference so one giant repo cannot serialize a single task, plus AQE
skew-join for the joins.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from informers_spark.operators.canon import connected_components
from informers_spark.operators.extract import (
    extract_structural_triples,
    mention_triples_from_mentions,
    mentions_table,
)
from informers_spark.operators.link import link_entities
from informers_spark.pipelines.embed import embed
from informers_spark.sources.warehouse import Warehouse

TRIPLE_COLS = ["subj", "pred", "obj", "score", "src_sha256"]


def salt_partition(
    df: DataFrame,
    partitions: int | None,
    *keys: str,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Repartition by (keys..., salt) — explicit skew-neutralizer: a hot
    key's rows spread over up to `salt_buckets` tasks instead of one.
    salt_buckets defaults to 2× the cluster's default parallelism so the
    fan-out tracks cluster size (a hard-coded 64 would cap a hot repo at
    64 tasks on a 1000-executor cluster). The salt MUST be
    (a) row-distinct, not a function of the keys alone (hashing the keys
    again yields exactly the distribution of repartition(keys) — a no-op),
    and (b) DETERMINISTIC: a nondeterministic shuffle key (rand,
    monotonically_increasing_id) re-routes rows differently when a map
    task is recomputed after a fetch failure, duplicating rows in some
    reducers and losing them from others (the SPARK-23207 class of bug).
    xxhash64 over every column satisfies both: identical duplicate rows
    co-locate (bounded, rare), everything else spreads. The partition
    COUNT is left to AQE (user-fixed counts disable adaptive coalescing,
    which blows up output file counts at high core counts and
    under-splits at scale); pass `partitions` only to override."""
    if salt_buckets is None:
        salt_buckets = df.sparkSession.sparkContext.defaultParallelism * 2
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(int(salt_buckets))),
    )
    if partitions:
        out = salted.repartition(partitions, *keys, "_salt")
    else:
        out = salted.repartition(*keys, "_salt")
    return out.drop("_salt")


def build_kg(
    spark: SparkSession,
    files: DataFrame,
    warehouse_root: str,
    backend: str = "auto",
    link_threshold: float = 0.75,
    resume: bool = True,
    partitions: int | None = None,
    salt_buckets: int | None = None,
) -> dict:
    """Run (or resume) the full KG job. Returns stage metrics."""
    wh = Warehouse(spark, warehouse_root)
    metrics: dict[str, dict] = {}

    def stage(name: str, make, partition_by=None, rebalance=True):
        t0 = time.time()
        if resume and wh.is_complete(name):
            metrics[name] = {**(wh.manifest(name) or {}), "resumed": True}
            return wh.read(name)
        df = make()
        m = wh.write(df, name, partition_by=partition_by, rebalance=rebalance)
        m["stage_wall_sec"] = round(time.time() - t0, 3)
        metrics[name] = m
        return wh.read(name)

    # 1. files — carry content_sha256 from here through every stage
    if "content_sha256" not in files.columns:
        files = files.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    # the salt repartition distributes the generation/extract compute
    # (hot-repo spreading); skipping the REBALANCE avoids a second full
    # shuffle of the content column. Trade-off: with partitionBy(lang),
    # mixed-lang tasks emit ~|langs| files each (tasks x langs) — at the
    # sandbox's measured commit costs the extra shuffle lost more than
    # the file-count saved; on a 1000-executor cluster with a metadata-
    # bound committer, flip rebalance=True so tasks hold one-lang slices
    files_t = stage(
        "files",
        lambda: salt_partition(files, partitions, "repo", "path", salt_buckets=salt_buckets),
        partition_by=["lang"],
        rebalance=False,
    )

    # 2+3. mentions (NER) and embeddings — both map-only inference over
    # files_t with no dependency on each other, so they run from two
    # driver threads (guide §2.6: actions are only sequential because
    # the driver calls them sequentially): the second job's tasks
    # back-fill executors as the first one's tail drains. No shuffle
    # before OR after either stage: the UDF output inherits the scan's
    # split sizing, so a pre-write REBALANCE would only add a full
    # shuffle of the data. Same thread pattern as the nodes/edges
    # materialization below.
    import threading

    errors: list[BaseException] = []
    stage_out: dict[str, DataFrame] = {}

    def run_stage(name, make, partition_by=None, rebalance=True):
        try:
            stage_out[name] = stage(
                name, make, partition_by=partition_by, rebalance=rebalance
            )
        except BaseException as e:  # surface thread failures to the caller
            errors.append(e)

    def _join_threads(threads, what):
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if len(errors) == 1:
            raise errors[0]
        if errors:
            raise ExceptionGroup(f"parallel {what} stages failed", errors)

    def make_embeddings():
        return embed(
            files_t.select(
                "repo", "path", "commit", "content_sha256",
                F.col("content").alias("text"),
            ),
            text_col="text",
            backend=backend,
        ).drop("text")

    _join_threads(
        [
            threading.Thread(
                target=run_stage,
                args=("mentions", lambda: mentions_table(files_t, backend=backend)),
                kwargs={"rebalance": False},
            ),
            threading.Thread(
                target=run_stage,
                args=("embeddings", make_embeddings),
                kwargs={"rebalance": False},
            ),
        ],
        "mentions/embeddings",
    )
    mentions = stage_out["mentions"]
    embeddings = stage_out["embeddings"]  # noqa: F841  (read for resume parity)

    # 4. raw triples: structural ∪ mentions
    def make_raw():
        structural = extract_structural_triples(files_t)
        mention_triples = mention_triples_from_mentions(mentions)
        # deterministic dedup: dropDuplicates keeps an ARBITRARY
        # score/src_sha256 per key (varies with partitioning/timing,
        # breaking the rerun-identical-output contract); aggregate to the
        # max score + min sha instead
        return (
            structural.unionAll(mention_triples)
            .groupBy("subj", "pred", "obj")
            .agg(
                F.max("score").alias("score"),
                F.min("src_sha256").alias("src_sha256"),
            )
        )

    # 5. entity linking over distinct mention surfaces — SAME typed-group
    # filter as the mention triples in stage 4: linking (and embedding)
    # a surface that can never appear in the graph wastes inference and
    # emits orphan same_as components
    def make_same_as():
        surfaces = (
            mentions.filter(F.col("entity_group").isin("PER", "ORG", "LOC"))
            .select(F.col("word").alias("surface"))
            .distinct()
        )
        return link_entities(surfaces, threshold=link_threshold, backend=backend)

    # 4 ∥ (5 → 6): triples_raw needs only mentions; the linking →
    # canonicalization chain needs only mentions too and is the longer
    # leg — overlapping them hides the shorter write entirely (same
    # guide §2.6 back-fill rationale as above).
    # triples_raw rebalance=False: the stage ENDS in a shuffle
    # aggregate, so AQE's coalescing already sizes the output
    # partitions to the advisory target — the REBALANCE hint only
    # appends a second exchange after the agg (measured 2x the stage
    # wall at n=4M: 32.1s -> 16.9s). The hint earns its cost only on
    # map-only stages, where without it every scan task writes its own
    # file. same_as ends in a window over a shuffle — AQE-sized; skip
    # rebalance there too.
    cc_metrics: dict = {}

    def run_link_chain():
        try:
            same_as = stage("same_as", make_same_as, rebalance=False)
            # 6. canonicalization (convergence surfaces in stage
            # metrics; a non-converged run raises inside the operator
            # rather than emitting silently-wrong same_as labels)
            stage_out["components"] = stage(
                "components", lambda: connected_components(same_as, metrics=cc_metrics)
            )
        except BaseException as e:
            errors.append(e)

    _join_threads(
        [
            threading.Thread(
                target=run_stage,
                args=("triples_raw", make_raw),
                kwargs={"rebalance": False},
            ),
            threading.Thread(target=run_link_chain),
        ],
        "triples_raw/linking",
    )
    triples_raw = stage_out["triples_raw"]
    components = stage_out["components"]
    if cc_metrics:
        metrics["components"].update(cc_metrics)

    # 7. materialize — one logical phase, three tables. The triples write
    # commits first (nodes/edges derive from its stored output, keeping
    # per-table resume exact); nodes and edges then write CONCURRENTLY
    # from separate driver threads — they are independent projections of
    # the same stored table, and serializing them only added their
    # commit latencies together (the tail of the job is commit-bound at
    # small N; at 100 TB the same overlap hides one table's write behind
    # the other's).
    def make_triples():
        canon_triples = (
            components.filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias("subj"),
                F.lit("same_as").alias("pred"),
                F.col("component").alias("obj"),
                F.lit(1.0).cast("float").alias("score"),
                F.lit(None).cast("string").alias("src_sha256"),
            )
        )
        return triples_raw.select(*TRIPLE_COLS).unionAll(canon_triples)

    triples = stage("triples", make_triples, partition_by=["pred"])

    def make_nodes():
        return (
            triples.select(F.col("subj").alias("node_id"))
            .unionAll(triples.select(F.col("obj").alias("node_id")))
            .distinct()
            .withColumn(
                "kind",
                F.when(F.col("node_id").contains("/"), "repo").otherwise("entity"),
            )
            .withColumn("label", F.col("node_id"))
        )

    def make_edges():
        return triples.select(
            F.col("subj").alias("src"), F.col("obj").alias("dst"), "pred", "score"
        )

    _join_threads(
        [
            # nodes ends in a shuffle (distinct) — AQE sizing applies,
            # skip the redundant rebalance exchange (same reasoning as
            # triples_raw)
            threading.Thread(
                target=run_stage, args=("nodes", make_nodes), kwargs={"rebalance": False}
            ),
            threading.Thread(target=run_stage, args=("edges", make_edges, ["pred"])),
        ],
        "nodes/edges",
    )
    return metrics
