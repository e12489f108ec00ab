"""Streaming event pipeline: windowed counts, dictionary enrichment, and
session windows over a stream of events(ts, user_id, event_type, value).

Batch/stream parity: each function takes ANY DataFrame — batch (from
catalog.load) or streaming (spark.readStream) — because they are pure
logical-plan builders; Structured Streaming's incrementalization is decided
by the sink, not the transform. Tests drive them both ways (batch frames +
a file-source stream with availableNow trigger).

Scale notes: watermarks bound state; tumbling-window counts are partial-
aggregated per micro-batch; session_window state is per-key and pruned at
watermark expiry. At 100 TB/day you shard by user_id hash (the default
shuffle on the agg key) and size the watermark to the real late-data tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Late-data bound; required for append-mode windowed aggregations.

    Event time must be TIMESTAMP (with timezone) — Spark rejects
    TIMESTAMP_NTZ watermarks — so ts is cast first (session TZ is UTC, so
    wall-clock values are preserved). On a batch frame withWatermark is a
    documented no-op, which keeps transforms batch/stream agnostic.
    """
    return events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", delay
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event type (streaming form of the
    monthly-trend batch query q03)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (streaming form of the batch sessionization
    q16): per-user sessions closed after `gap` of inactivity."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def enriched_counts(events: DataFrame, category_dim: DataFrame) -> DataFrame:
    """Stream-to-static broadcast join (streaming form of q13): events
    enriched with the dictionary dimension, counted per category."""
    return (
        events.join(F.broadcast(category_dim), "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, trigger_available_now: bool = True
):
    """Execute a streaming frame into an in-memory sink (test/debug surface;
    production sinks are parquet/kafka via the same writeStream call)."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_agg(stream_df) else "append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().logical().toString()
