"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set on a real cluster: AQE with
skew-join handling on, shuffle partitions sized to the parallelism level,
Arrow enabled for the pandas-UDF inference path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "informers_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: parallelism level (local[N]); default $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: defaults to max(cores, 32) — on a real cluster this
    would be ~2-3x total executor cores; AQE coalesces the excess.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 32)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # per-task output commit (v2): avoids the driver-side sequential
        # rename storm at job commit — with many writer tasks the v1
        # committer serializes on metadata ops (measured 3x write slowdown
        # at local[32] vs local[8])
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # 16m parquet row groups: scan splits can't cut inside a row
        # group, so big row groups silently cap downstream parallelism
        # (measured: UDF stages ran 4-6 of 16 workers with 128m groups)
        .config("spark.hadoop.parquet.block.size", str(16 * 1024 * 1024))
        # zstd parquet: ~1.7x fewer stored bytes than snappy on the text
        # corpus, and the byte volume through the (shared) storage path is
        # what caps scaling on this box — measured n=2M/8-core KG build
        # 183s (snappy) -> 112s (zstd): files stage 54->17s, triples_raw
        # 35->10.5s. Decode cost rises slightly but is per-core and
        # scales; shuffle stays lz4 (zstd shuffle measured neutral: 117s)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
