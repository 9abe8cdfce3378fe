"""One-off r6 probe: simhash distribution stats at a given sf — distinct
hash count, identical-hash cluster sizes, 4-band bucket histogram, true
candidate-pair volume of the banded join, and the combinatorial-block
candidate volume the r6 fast path would produce.

Usage: python tools/probe_simhash_r6.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from informers_spark.operators.dedup import simhash_table  # noqa: E402
from informers_spark.queries import _t  # noqa: E402
from informers_spark.session import get_spark  # noqa: E402


def comb(n, k):
    import math

    return math.comb(n, k)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = _t(spark, sf_dir, "documents")
    sh = simhash_table(docs).localCheckpoint()
    n = sh.count()
    clusters = sh.groupBy("simhash").count().localCheckpoint()
    n_distinct = clusters.count()
    top = clusters.orderBy(F.desc("count")).limit(10).collect()
    print(f"docs={n} distinct_sh={n_distinct}")
    print("top identical-hash clusters:", [(r["simhash"], r["count"]) for r in top])

    # exact pair volume C(m,2) summed over identical-hash clusters
    ident_pairs = clusters.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
    ).collect()[0]["p"]
    print(f"identical-hash pairs (lower bound on output): {ident_pairs}")

    # 4-band bucket histogram + banded candidate volume (current scheme)
    width = 8
    for bands, w in ((4, 8),):
        tot = 0
        mx = 0
        for i in range(bands):
            b = (
                sh.select((F.shiftright("simhash", i * w).bitwiseAND(F.lit((1 << w) - 1))).alias("k"))
                .groupBy("k")
                .count()
            )
            agg = b.agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
                F.max("count").alias("mx"),
            ).collect()[0]
            tot += agg["pairs"]
            mx = max(mx, agg["mx"])
        print(f"banded({bands}x{w}bit): candidate pairs={tot:.0f} max_bucket={mx}")

    # combinatorial scheme candidate volume, computed on DISTINCT hashes
    # (the fast path enumerates over clusters): nb blocks, d allowed to differ
    bits, d = 31, 2
    nb = 8
    widths = [bits // nb + (1 if i < bits % nb else 0) for i in range(nb)]
    starts = [sum(widths[:i]) for i in range(nb)]
    masks = [((1 << widths[i]) - 1) << starts[i] for i in range(nb)]
    import itertools

    tot_c = 0
    mx_c = 0
    for combo in itertools.combinations(range(nb), d):
        drop = 0
        for i in combo:
            drop |= masks[i]
        keep = ((1 << bits) - 1) & ~drop
        b = (
            clusters.select((F.col("simhash").bitwiseAND(F.lit(keep))).alias("k"))
            .groupBy("k")
            .count()
        )
        agg = b.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
            F.max("count").alias("mx"),
        ).collect()[0]
        tot_c += agg["pairs"]
        mx_c = max(mx_c, agg["mx"])
    print(
        f"combinatorial(nb={nb},d={d}, {comb(nb, d)} combos over {n_distinct} distinct): "
        f"candidate sh-pairs={tot_c:.0f} max_bucket={mx_c}"
    )


if __name__ == "__main__":
    main()
