"""Physical-plan regression checks: filters reach the parquet scan,
column pruning applies, small dims broadcast, inference UDFs run at full
cluster parallelism (one conditional round-robin rebalance over an
under-partitioned scan, nothing more). These guard the 100-TB posture —
a plan that silently loses pushdown or broadcast still passes row-count
tests but dies at scale."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_to_udf(plan: str) -> str:
    """Tree segment from the INNERMOST MapInPandas down to the scan.

    Formatted explain prints the tree root-first, so anything upstream of
    the UDF (closer to the scan) appears AFTER the 'MapInPandas' token —
    `plan.split("MapInPandas")[0]` inspects the downstream side and can
    never catch a shuffle inserted before the UDF."""
    tree = plan.split("\n\n")[0]
    return tree[tree.rfind("MapInPandas"):]


def _exchange_args(plan: str, seg: str) -> list[str]:
    """Arguments line of every Exchange node in the tree segment `seg`
    (the formatted tree shows only 'Exchange (N)'; the partitioning kind
    lives in the per-node detail block '(N) Exchange\\n...Arguments:')."""
    import re

    args = []
    for node_id in re.findall(r"Exchange \((\d+)\)", seg):
        m = re.search(
            rf"^\({node_id}\) Exchange\n(?:.+\n)*?Arguments: (.+)$",
            plan,
            re.MULTILINE,
        )
        args.append(m.group(1) if m else "")
    return args


SF = "/root/testdata/sf0.001"


def test_filter_pushdown_to_parquet(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .select("l_returnflag", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = _plan(df)
    # ReadSchema must not include unprojected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema
    assert "l_extendedprice" not in read_schema


def test_q3_broadcasts_customer(spark):
    from informers_spark.queries import q3_top_revenue_orders

    plan = _plan(q3_top_revenue_orders(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dims(spark):
    from informers_spark.queries import q5_revenue_by_nation

    plan = _plan(q5_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2


def test_inference_udf_spreads_underpartitioned_scan(spark):
    # embed over a single-row-group scan: the ONLY exchange between scan
    # and UDF is the conditional spread_scan round-robin rebalance (the
    # sf parquet files are one row group → a bare scan would serialize
    # the whole inference chain onto one core); an input that is already
    # parallel gets NO additional exchange (spread_scan no-ops on
    # derived plans)
    from informers_spark.pipelines.embed import embed

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = _plan(embed(docs, backend="hash"))
    seg = _scan_to_udf(plan)
    assert "Scan parquet" in seg
    args = _exchange_args(plan, seg)
    assert len(args) == 1 and "RoundRobinPartitioning" in args[0]

    par = spark.sparkContext.defaultParallelism
    seg2 = _scan_to_udf(_plan(embed(docs.repartition(par), backend="hash")))
    # exactly the caller's own repartition — no second exchange stacked on
    assert seg2.count("Exchange") == 1


def test_knn_broadcasts_queries(spark):
    from informers_spark.queries import q_knn_bruteforce

    plan = _plan(q_knn_bruteforce(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_structural_extraction_is_jvm_only(spark):
    # no Python evaluation nodes in the regex triple extractor
    from informers_spark.operators.extract import extract_structural_triples
    from informers_spark.sources.corpus import generate_files

    plan = _plan(extract_structural_triples(generate_files(spark, n=10)))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_embedding_neardup_no_cartesian(spark):
    # banded LSH blocking must plan as an equi-join on (band, bucket) —
    # a CartesianProduct here is the 100-TB death sentence
    from informers_spark.operators.dedup import embedding_neardup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(embedding_neardup(emb, threshold=0.3))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_knn_lsh_broadcasts_query_blocks(spark):
    from informers_spark.queries import q_knn_lsh

    plan = _plan(q_knn_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # query side is broadcast


def test_generate_udf_spreads_underpartitioned_scan(spark):
    from informers_spark.pipelines.generate import generate_text

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = _plan(generate_text(docs, backend="hash"))
    seg = _scan_to_udf(plan)
    assert "Scan parquet" in seg
    # one round-robin rebalance (spread_scan) and nothing else
    args = _exchange_args(plan, seg)
    assert len(args) == 1 and "RoundRobinPartitioning" in args[0]


def test_vision_query_prunes_scan_and_avoids_exchange(spark):
    # the media pipeline must read ONLY doc_id from the documents scan
    # (media is synthesized from the id; dragging text along would 100x
    # the scan bytes) and stack its two mapInPandas stages with no
    # shuffle between scan and UDFs
    from informers_spark.queries import q_image_classify_all

    plan = _plan(q_image_classify_all(spark, SF))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema
    assert "text" not in read_schema
    # innermost UDF down to the scan: ONE round-robin rebalance under the
    # media gen + classify mapInPandas pair (spread_scan spreads the
    # single-row-group id scan before synthesis; the classify stage sees
    # a derived input and adds nothing; the orderBy's range Exchange sits
    # above the UDFs, outside this segment)
    seg = _scan_to_udf(plan)
    assert "Scan parquet" in seg
    args = _exchange_args(plan, seg)
    assert len(args) == 1 and "RoundRobinPartitioning" in args[0]


def test_knn_ivf_assignment_is_map_only_and_broadcasts_queries(spark):
    # IVF cell assignment must be a pure projection over the corpus scan
    # (inline literal centroids — no join/exchange between scan and the
    # cell equi-join), and the probe side must broadcast
    from informers_spark.queries import q_knn_ivf

    plan = _plan(q_knn_ivf(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # exactly the joins we expect: cell equi-join (broadcast); no
    # shuffle join anywhere in candidate generation
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_salt_buckets_knob_reaches_repartition_expression(spark):
    # the KG hot-repo salt fan-out must track the requested bucket count
    # (default: 2x cluster parallelism), not a hard-coded constant — at
    # 1000 executors a fixed 64 caps a hot repo at 64 tasks
    from informers_spark.plans.kg import salt_partition

    df = spark.range(0, 100).select(
        F.col("id").cast("string").alias("repo"), F.col("id").alias("path")
    )
    for buckets in (7, 256):
        plan = _plan(salt_partition(df, None, "repo", salt_buckets=buckets))
        assert f"pmod(xxhash64(repo" in plan and f", {buckets})" in plan, plan
    # default: 2x defaultParallelism
    default = spark.sparkContext.defaultParallelism * 2
    plan = _plan(salt_partition(df, None, "repo"))
    assert f", {default})" in plan, plan
    # salt is dropped before output: same rows either way
    assert salt_partition(df, None, "repo", salt_buckets=7).columns == ["repo", "path"]


def test_skew_guard_is_broadcast_anti_join(spark):
    # the two-phase bucket-cap guard: over-limit keys come from a
    # groupBy count (map-side partial agg — a hot cell never lands in
    # one task) and are removed with a BROADCAST anti-join. A window
    # count here would shuffle the entire pathological cell into a
    # single window task just to drop it.
    from informers_spark.operators.dedup import drop_oversized_buckets

    blocks = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 3).alias("band"), (F.col("id") % 17).alias("key")
    )
    plan = _plan(drop_oversized_buckets(blocks, ["band", "key"], 10))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "Window" not in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    # co-located join: two tables bucketed on the same key with the same
    # bucket count must sort-merge join with NO Exchange on either side
    # (the 100-TB layout that removes the shuffle from every join on the
    # bucket key); results must equal the plain shuffled join
    import pyspark.sql.functions as F

    from informers_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    left = spark.range(0, 2000).select(
        F.concat(F.lit("sha"), F.col("id")).alias("content_sha256"),
        (F.col("id") % 7).alias("x"),
    )
    right = spark.range(0, 2000, 2).select(
        F.concat(F.lit("sha"), F.col("id")).alias("content_sha256"),
        (F.col("id") % 5).alias("y"),
    )
    for name, df in [("bk_mentions", left), ("bk_embeddings", right)]:
        m = wh.write_bucketed(
            df, name, ["content_sha256"], n_buckets=8, sort_cols=["content_sha256"]
        )
        assert m["n_buckets"] == 8
    a, b = wh.read_table("bk_mentions"), wh.read_table("bk_embeddings")
    joined = a.join(b, "content_sha256")
    # at demo sizes the planner (rightly) broadcasts, which bypasses
    # bucketing; disable broadcast to expose the big-table plan shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # NO shuffle on either side: bucket layout replaces the exchange
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        got = {(r.content_sha256, r.x, r.y) for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    want = {(r.content_sha256, r.x, r.y) for r in left.join(right, "content_sha256").collect()}
    assert got == want and len(got) == 1000
    spark.sql("DROP TABLE IF EXISTS bk_mentions")
    spark.sql("DROP TABLE IF EXISTS bk_embeddings")


def test_embed_pooling_none_runs_on_spread_scan(spark):
    # the token-level feature-extraction path (pooling "none") is one
    # mapInPandas over the (conditionally rebalanced) scan — exactly the
    # spread_scan round-robin exchange, no hash shuffle
    from informers_spark.pipelines.embed import embed

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = _plan(embed(docs, pooling="none", do_normalize=False, backend="hash"))
    seg = _scan_to_udf(plan)
    assert "Scan parquet" in seg
    args = _exchange_args(plan, seg)
    assert len(args) == 1 and "RoundRobinPartitioning" in args[0]
