"""spark-submit entry point for the KG construction job (north rule:
"launched via spark-submit --py-files on multi-executor clusters").

Usage:
    tools/package.sh                      # builds dist/informers_spark.zip
    spark-submit --py-files dist/informers_spark.zip \
        tools/run_kg_job.py --input <files-table-or-synth:N> \
        --warehouse <dir> [--backend auto] [--link-threshold 0.75]

On a cluster the SparkSession comes from spark-submit's conf (master,
executor counts, memory); this script only adds job-level SQL conf.
Local smoke: spark-submit --master 'local[8]' ...
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="path to a files parquet table, or 'synth:N' for the deterministic corpus")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--backend", default="auto")
    p.add_argument("--link-threshold", type=float, default=0.75)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--graph-stats", action="store_true",
                   help="after the build, run graph analytics over the materialized "
                        "edges (triangle/degree summary + top PageRank entities) and "
                        "include them in the emitted metrics JSON")
    p.add_argument("--materialize-graph-stats", action="store_true",
                   help="write node_ranks and node_communities as warehouse tables "
                        "(manifest-tracked, skip-on-resume like every build stage)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("informers_spark_kg")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .getOrCreate()
    )

    from informers_spark.plans.kg import build_kg
    from informers_spark.sources.corpus import generate_files

    if args.input.startswith("synth:"):
        files = generate_files(spark, n=int(args.input.split(":", 1)[1]))
    else:
        files = spark.read.parquet(args.input)

    metrics = build_kg(
        spark,
        files,
        args.warehouse,
        backend=args.backend,
        link_threshold=args.link_threshold,
        resume=not args.no_resume,
    )
    if args.materialize_graph_stats:
        from informers_spark.operators.graph import materialize_graph_stats

        metrics["graph_tables"] = materialize_graph_stats(
            spark, args.warehouse, resume=not args.no_resume
        )
    if args.graph_stats:
        from informers_spark.operators.graph import kg_graph_summary

        summary, top = kg_graph_summary(spark, args.warehouse)
        metrics["graph"] = {
            **summary.collect()[0].asDict(),
            "top_pagerank": [
                {"node": r.node, "rank": r.rank} for r in top.collect()
            ],
        }
    print(json.dumps(metrics, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
