"""Structured Streaming: incremental KG ingestion and event analytics.

The reference has no streaming at all (SURVEY.md §2.g); this is engine
surface the reference's users get for free by moving to Spark. The key
design point: extraction/pipeline transforms are pure DataFrame →
DataFrame functions, so the SAME code runs batch and streaming — a
micro-batch of newly-landed files flows through the identical
extract_structural_triples / ner transforms and appends to the triples
sink with exactly-once file-source + checkpoint semantics.

At cluster scale: file source with maxFilesPerTrigger bounds micro-batch
size; the sink partitions by pred like the batch warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILES_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
    ]
)


def stream_files(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 100
) -> DataFrame:
    """Streaming scan of a landing directory of parquet file batches."""
    return (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_extract_triples(
    files_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental structural-triple extraction: the batch transform
    applied to a stream, appended to a pred-partitioned parquet sink.
    Returns the StreamingQuery (caller awaits termination)."""
    from informers_spark.operators.extract import extract_structural_triples

    triples = extract_structural_triples(files_stream)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("pred")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact deduplication on `keys` — the streaming half of
    the dedup family (operators/dedup.py is the batch half).

    With `event_time_col` set: dropDuplicatesWithinWatermark — state is
    evicted once the watermark passes a key's event time, so memory
    stays BOUNDED on an infinite stream (the 100-TB ingest path); a
    duplicate arriving later than the watermark re-emits, the standard
    at-least-once trade for bounded state. Without it: dropDuplicates —
    exact global dedup whose state grows with distinct keys; right for
    finite backfills/replays where exactness is gated.

    Emission is first-occurrence-wins, which is nondeterministic across
    micro-batch orderings for NON-key columns — project the stream to
    the key columns first when downstream comparisons need determinism
    (q_stream_dedup does exactly this)."""
    if event_time_col is not None:
        return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)


def stateful_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Custom stateful streaming operator: per-user session counting with
    applyInPandasWithState — the arbitrary-state surface windowed aggs
    can't express (session identity depends on the PREVIOUS event's
    timestamp, not a fixed grid). State per user = (last event ts,
    running session/event counts); each micro-batch folds its rows into
    the state in event-time order and emits the user's updated totals.
    State expires on processing-time timeout so it stays bounded.

    Timeout semantics (explicit contract): expiry DROPS the counters —
    the final totals were already emitted with the user's last update, so
    a sink keyed on user_id holds them; but if the user RETURNS after
    expiry, counting restarts at (1, 1) and the next update REGRESSES
    the sink row. Downstream consumers that need lifetime totals must
    aggregate updates (sum of per-expiry maxima) or persist the final
    row on timeout; with timeouts disabled (timeout_minutes large) the
    stream matches the batch gaps-and-islands sessionize exactly.

    → stream of (user_id, n_sessions, n_events) updates. Same semantics
    as the batch gaps-and-islands sessionize (q_events_sessionize) when
    events arrive in order."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_sessions", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_us", T.LongType()),
            T.StructField("n_sessions", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return iter(())
        last_us, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        # a group's rows arrive as SEVERAL Arrow chunks in arbitrary
        # shuffle-fetch order — collect all timestamps first and sort ONCE
        # across the whole micro-batch (per-chunk sorting would fold
        # later-fetched earlier events against a regressed last_us and
        # mis-count sessions). Normalized to int64 MICROSECONDS regardless
        # of the pandas datetime unit the Arrow bridge picked (ns vs us).
        all_us: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                all_us.extend(
                    pdf["ts"].values.astype("datetime64[us]").astype("int64").tolist()
                )
        for u in sorted(all_us):
            if last_us is None or u - last_us > gap_us:
                n_sessions += 1
            n_events += 1
            last_us = u
        state.update((last_us, n_sessions, n_events))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation over an event
    stream (ts, event_type, value): count + sum(value) per window/type.
    Late rows beyond the watermark are dropped — state stays bounded."""
    win = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )
