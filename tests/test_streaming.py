"""Structured Streaming: incremental triple extraction with exactly-once
file-source semantics, and watermarked windowed aggregation."""

import os

from pyspark.sql import functions as F

from informers_spark.sources.corpus import generate_files
from informers_spark.streaming.ingest import (
    stream_extract_triples,
    stream_files,
    windowed_event_counts,
)


def test_stream_extract_matches_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    files = generate_files(spark, n=40)
    # two arrival batches
    files.filter("file_id < 20").write.parquet(landing)
    files.filter("file_id >= 20").write.mode("append").parquet(landing)

    q = stream_extract_triples(stream_files(spark, landing), sink, ckpt)
    assert q.awaitTermination(300), "triple-extract drain did not finish"

    from informers_spark.operators.extract import extract_structural_triples

    batch = extract_structural_triples(files).select("subj", "pred", "obj")
    streamed = spark.read.parquet(sink).select("subj", "pred", "obj")
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0

    # restart on the same checkpoint: no reprocessing (exactly-once)
    q2 = stream_extract_triples(stream_files(spark, landing), sink, ckpt)
    assert q2.awaitTermination(300), "restart drain did not finish"
    assert spark.read.parquet(sink).count() == batch.count()


def test_windowed_event_counts_batch_semantics(spark):
    # the transform is stream-agnostic; verify window math on a batch df
    ev = spark.createDataFrame(
        [
            ("2024-01-01 00:01:00", "click", 1.0),
            ("2024-01-01 00:05:00", "click", 2.0),
            ("2024-01-01 00:15:00", "click", 4.0),
        ],
        ["ts", "event_type", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.window_start.minute, r.n, r.sum_value)
        for r in windowed_event_counts(ev, window="10 minutes").collect()
    }
    assert out == {(0, 2, 3.0), (10, 1, 4.0)}


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over a one-batch replay must
    equal the batch gaps-and-islands sessionize (q_events_sessionize)."""
    import uuid

    from informers_spark.queries import q_events_sessionize
    from informers_spark.streaming.ingest import stateful_sessionize

    sf_dir = "/root/testdata/sf0.001"
    landing = str(tmp_path / "ev_landing")
    os.makedirs(landing)
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(landing, "events.parquet"),
    )
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(landing)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts")
    )
    name = "sess_" + uuid.uuid4().hex[:8]
    q = (
        stateful_sessionize(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    exp = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in q_events_sessionize(spark, sf_dir).collect()
    }
    # What this test pins is stream/batch PARITY, not self-termination:
    # poll the update sink until it reaches the batch answer (a loaded
    # host can stretch the drain well past a fixed awaitTermination).
    import time as _time

    deadline = _time.time() + 300
    got = {}
    while _time.time() < deadline:
        q.awaitTermination(10)
        got = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in spark.table(name).collect()
        }
        if got == exp:
            break
    q.stop()
    assert got == exp


def test_stream_dedup_exact_across_microbatches(spark, tmp_path):
    # duplicates split across TWO micro-batches must still collapse:
    # dropDuplicates state persists between batches
    from informers_spark.streaming.ingest import stream_dedup

    landing = str(tmp_path / "dd_landing")
    rows1 = [(i, f"k{i % 5}") for i in range(10)]      # keys k0..k4, dups
    rows2 = [(i + 10, f"k{i % 8}") for i in range(16)]  # k0..k7 (3 new)
    spark.createDataFrame(rows1, ["id", "key"]).write.parquet(landing)
    spark.createDataFrame(rows2, ["id", "key"]).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema("id long, key string")
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .parquet(landing)
        .select("key")
    )
    spark.catalog.dropTempView("dd_sink")
    q = (
        stream_dedup(stream, ["key"])
        .writeStream.format("memory")
        .queryName("dd_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # under a loaded host the availableNow drain can exceed a short wait;
    # stopping early truncates the sink, so require real termination
    finished = q.awaitTermination(300)
    q.stop()
    assert finished, "stream_dedup drain did not finish in 300s"
    got = sorted(r.key for r in spark.table("dd_sink").collect())
    assert got == [f"k{i}" for i in range(8)]  # each key exactly once


def test_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    # watermarked variant: duplicates inside the watermark horizon are
    # dropped across micro-batches; the plan carries the
    # dropDuplicatesWithinWatermark stateful operator (bounded state)
    from informers_spark.streaming.ingest import stream_dedup

    landing = str(tmp_path / "ddw_landing")
    spark.createDataFrame(
        [("2024-01-01 00:00:00", "a"), ("2024-01-01 00:01:00", "b")],
        ["ts", "key"],
    ).write.parquet(landing)
    spark.createDataFrame(
        [("2024-01-01 00:02:00", "a"), ("2024-01-01 00:03:00", "c")],
        ["ts", "key"],
    ).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema("ts string, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .select(F.col("ts").cast("timestamp").alias("ts"), "key")
    )
    deduped = stream_dedup(stream, ["key"], event_time_col="ts", watermark="1 hour")
    spark.catalog.dropTempView("ddw_sink")
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddw_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    q.stop()
    assert finished, "watermarked drain did not finish in 300s"
    got = sorted(r.key for r in spark.table("ddw_sink").collect())
    assert got == ["a", "b", "c"]  # the batch-2 'a' dup is dropped
