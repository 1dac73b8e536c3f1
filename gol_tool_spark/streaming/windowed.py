"""Event-time windowed streaming aggregation with watermarks.

The reference has no event-time semantics (SURVEY.md §2-I) — this is part
of the engine's training-pipeline surface: streaming ingestion of event/
telemetry tables with late-data handling, the standard Structured Streaming
shape (readStream -> withWatermark -> window agg -> writeStream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def windowed_counts(
    spark: SparkSession,
    path: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window per-type counts over a JSON file stream."""
    stream = spark.readStream.schema(EVENT_SCHEMA).json(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


def run_to_memory(spark: SparkSession, path: str, name: str = "windowed", **kw):
    """Drain all available files into an in-memory sink (tests/demos)."""
    q = (
        windowed_counts(spark, path, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    return q


def session_counts(
    spark: SparkSession,
    path: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows: per-user event sessions closed after `gap` of
    inactivity (F.session_window — the streaming twin of the batch
    sessionize query in __spark_entry__)."""
    stream = spark.readStream.schema(EVENT_SCHEMA).json(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("s_start"), F.col("w.end").alias("s_end"),
            "user_id", "n_events", "sum_value",
        )
    )


def run_sessions_to_memory(spark: SparkSession, path: str, name: str = "sessions", **kw):
    q = (
        session_counts(spark, path, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    return q
