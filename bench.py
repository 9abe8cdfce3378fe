"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship KG
job (generate corpus → build_kg → triples/sec, the BASELINE.md metric),
and prints ONE JSON line.

Extra env knobs:
  SPARK_GRAFT_KG_N       corpus size for the KG throughput run (default 20000)
  SPARK_GRAFT_SKIP_KG=1  headline queries only
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "q_cube_lineitem",
    "q_asof_join",
    "q_window_top_orders",
    "q_events_sessionize",
    "q_token_count",
    "q_exact_dedup",
    "q_quality_score",
    "q_minhash_pairs",
    "q_minhash_pairs_fast",
    "q_simhash",
    "q_knn_bruteforce",
    "q_lsh_buckets",
    "q_centroids",
    "q_cc_components",
    "q_embed_docs",
    "q_generate_docs",
    "q_simhash_neardup",
    "q_classify_docs",
    "q_zero_shot_docs",
    "q_ner_docs",
    "q_image_classify_all",
    "q_audio_classify",
    # new in r3
    "q_knn_ivf",
    "q_generate_penalized",
    # new in r4
    "q_knn_ivf_df",
    # new in r5
    "q_embed_tokens_docs",
    "q_repetition_filter",
    "q_ngram_topk",
    "q_quantile_sketch",
    "q_sample_stratified",
    "q_contamination",
    "q_pii_scrub",
    "q_pack_chunk",
    "q_temperature_sample",
    "q_chunk_docs",
    "q_shuffle_shard",
    # new in r5: graph analytics over materialized KG edges
    "q_pagerank_entities",
    "q_triangles_coparts",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    kg_n = int(os.environ.get("SPARK_GRAFT_KG_N", "20000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from informers_spark.queries import QUERIES
    from informers_spark.session import get_spark

    spark = get_spark(app_name="informers_spark_bench", cores=cores)
    spark.range(1).count()  # JVM warmup outside the measurements

    # warm Python UDF workers (imports + backend singleton): executors on
    # a real cluster are long-lived; don't measure cold start
    def _noop(it):
        from informers_spark.backend.base import get_backend

        get_backend("hash")
        for p in it:
            yield p

    spark.range(0, cores * 4, numPartitions=cores * 2).mapInPandas(_noop, "id long").count()

    # min-of-k per query: this host has bursty foreign-tenant load and
    # hypervisor CPU steal (BENCH/BASELINE.md) — a single run mixes our
    # cost with neighbor noise (observed 3.6x run-to-run spread on q1)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    # host-noise canary: one single-shot q1 before and after the sweep.
    # On a quiet host the two agree within ~20%; a large spread means the
    # snapshot overlapped foreign-tenant load / hypervisor steal and
    # per-query numbers should be read against same-session minima only.
    def _canary():
        t0 = time.time()
        QUERIES["q1_pricing_summary"](spark, sf_dir).count()
        return round(time.time() - t0, 3)

    # steady-state the canary query first: its first execution pays
    # one-time costs (parquet file listing, footer reads, codegen) of
    # ~2 s that would masquerade as host noise in canary_first
    _canary()

    canary_first = _canary()

    queries: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best, n = None, 0
        for _ in range(reps):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        queries[name] = round(best, 3)
        print(f"  {name}: {queries[name]}s min-of-{reps} ({n} rows)", file=sys.stderr)

    canary_last = _canary()

    result = {
        "metric": "total_headline_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cores": cores,
        "canary": {
            "q1_first": canary_first,
            "q1_last": canary_last,
            "spread": round(
                max(canary_first, canary_last) / max(min(canary_first, canary_last), 1e-9), 2
            ),
        },
    }

    if not os.environ.get("SPARK_GRAFT_SKIP_KG"):
        from informers_spark.plans.kg import build_kg
        from informers_spark.sources.corpus import generate_files

        # min-of-k for the KG job as well — same host-noise rationale
        wall, metrics, triples = None, None, 0
        for _ in range(reps):
            out = tempfile.mkdtemp(prefix="kg_bench_")
            try:
                t0 = time.time()
                m = build_kg(
                    spark, generate_files(spark, n=kg_n), out, backend="hash", resume=False
                )
                w = time.time() - t0
                triples = spark.read.parquet(f"{out}/triples").count()
                if wall is None or w < wall:
                    wall, metrics = w, m
            finally:
                shutil.rmtree(out, ignore_errors=True)
        # extracted (pre-dedup) triple volume = work performed: the
        # extractor emits 2 defines + 2 imports + 3 mentions per file
        extracted = 7 * kg_n
        result["kg"] = {
            "n_files": kg_n,
            "triples_distinct": triples,
            "triples_extracted": extracted,
            "wall_sec": round(wall, 3),
            "triples_per_sec": round(extracted / wall, 2),
            "files_per_sec": round(kg_n / wall, 2),
            "stage_sec": {
                k: v.get("stage_wall_sec") for k, v in metrics.items()
            },
        }
        print(f"  kg_build: {wall:.1f}s min-of-{reps}, {triples} distinct triples", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
