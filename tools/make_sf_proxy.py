"""Generate an sf1.0-scale PROXY dataset by unioning K perturbed copies
of an existing sf directory (default sf0.1 x 10).

The driver escalated its r5 measurement to a self-generated sf1.0
(BENCH_r05.json: "sf": "1.0") that we cannot reproduce exactly; this
proxy matches its row counts and join-key fan-out so that relative
before/after timings at driver scale are meaningful. It is NOT used by
bench.py, the oracle gate, or any query path — measurement scaffolding
only (OPTIMIZATION_r06.md cites it explicitly as a proxy).

Keys are offset per copy so primary keys stay distinct and foreign keys
stay consistent (copy i joins copy i). Document/event text gets a
per-copy suffix token so near-dup structure is preserved (copies are
near-duplicates of each other -> heavy candidate-pair load, the
worst-case shape for the dedup operators).

Usage: python tools/make_sf_proxy.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

# key columns to offset per copy, per table (suffix-matched)
OFFSETS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["id"],
}
TEXT_SUFFIX = {"documents": "text"}
SMALL = {"region", "nation"}  # fixed dimension tables: copy once


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_proxy_1.0"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from informers_spark.session import get_spark

    spark = get_spark(app_name="make_sf_proxy", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    os.makedirs(dst, exist_ok=True)

    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[: -len(".parquet")]
        df = spark.read.parquet(os.path.join(src, fname))
        if name in SMALL:
            df.write.mode("overwrite").parquet(os.path.join(dst, fname))
            print(f"  {name}: copied as-is")
            continue
        n = df.count()
        # offset stride: far above any key value in the source
        stride = 1 << 33
        parts = []
        for i in range(copies):
            c = df
            for col in OFFSETS.get(name, []):
                if col in c.columns:
                    c = c.withColumn(col, (F.col(col) + F.lit(i * stride)).cast("long"))
            tcol = TEXT_SUFFIX.get(name)
            if tcol and tcol in c.columns and i > 0:
                c = c.withColumn(tcol, F.concat(F.col(tcol), F.lit(f" copyvariant{i}")))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dst, fname))
        print(f"  {name}: {n} -> {n * copies}")
    print(f"proxy written to {dst}")


if __name__ == "__main__":
    main()
