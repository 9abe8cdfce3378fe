"""Extra benchmarks for the optimization rounds (guide §1.4): per-query
isolation with the noop sink, configurable reps, and optional
.explain("formatted") capture.

bench.py is FROZEN (driver contract); this file is the builder-side
harness whose numbers OPTIMIZATION_r06.md cites.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--noop] [--plans OUTDIR] q1 q2 ...
  (no query names = every HEADLINE query from bench.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="time with the noop sink instead of count()")
    ap.add_argument("--plans", default=None, help="directory to write <query>.txt explain('formatted') into")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE
    from informers_spark.queries import QUERIES
    from informers_spark.session import get_spark

    names = args.queries or HEADLINE
    spark = get_spark(app_name="informers_spark_bench_extra", cores=args.cpus)
    spark.range(1).count()

    def _warm(it):
        from informers_spark.backend.base import get_backend

        get_backend("hash")
        for p in it:
            yield p

    spark.range(0, args.cpus * 4, numPartitions=args.cpus * 2).mapInPandas(_warm, "id long").count()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    out = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            import contextlib
            import io

            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.reps == 0:
            out[name] = {"min": None, "samples": []}
            print(f"  {name}: plan captured", file=sys.stderr)
            continue
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"  {name}: min={min(samples)} {samples}", file=sys.stderr)

    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "noop": args.noop, "queries": out}))


if __name__ == "__main__":
    main()
