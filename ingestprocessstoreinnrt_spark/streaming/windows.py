"""Watermarked event-time windowed aggregation — Structured Streaming's
native replacement for the reference's processing-time-only micro-batch
folds (SURVEY 2.9: "late/out-of-order data: no handling").

Late rows within the watermark are folded into their event-time window;
rows later than the watermark are dropped deterministically.  State is
bounded: the store evicts windows older than (max event time seen -
watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.scalars import dsum


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window aggregate (same shape as the batch twin
    operators.windows.tumbling_hourly)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windowed_counts_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming session windows (F.session_window): dynamic gap-based
    windows maintained in the state store — the streaming twin of the
    batch sessionization in operators/windows.py:user_sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


def run_windowed_to_memory(
    agg: DataFrame, name: str, trigger_once: bool = True
) -> StreamingQuery:
    """Complete-mode memory sink for tests/debugging of windowed aggs."""
    w = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
