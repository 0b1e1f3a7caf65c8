"""Streaming-shaped event operators, written mode-agnostically: each
takes a DataFrame that may be a batch table or a ``readStream`` source
and returns the transformed frame — the Structured Streaming contract
(same logical plan, incrementalized by the engine).

The reference's bulk loop is an incremental pipeline without event time
(SURVEY §2.7); these are the event-time operators a web-crawl ingest
actually needs: tumbling-window rollups (with watermark for late data)
and gap sessionization via ``session_window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str | None = None) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Pass ``watermark``
    (e.g. "2 hours") in streaming mode to bound state and admit late
    rows up to that delay."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    e = e.withWatermark("ts", watermark) if watermark else e
    return (e.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value_r4"))
            .select(F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss'Z'")
                    .alias("win_start"), "event_type", "n", "sum_value_r4"))


def session_window_agg(events: DataFrame, gap: str = "30 minutes",
                       watermark: str | None = None) -> DataFrame:
    """Gap-based sessions per user via the built-in session_window
    (streaming-native stateful sessionization)."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    e = e.withWatermark("ts", watermark) if watermark else e
    return (e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss'Z'")
                    .alias("session_start"),
                    "n_events"))


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         mode: str = "complete"):
    """writeStream → in-memory sink; returns the StreamingQuery. Caller
    awaits processAllAvailable() then reads ``spark.table(query_name)``."""
    return (stream_df.writeStream.format("memory")
            .queryName(query_name).outputMode(mode).start())
