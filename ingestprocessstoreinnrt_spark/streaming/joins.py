"""Stream-stream interval join — the remaining Structured Streaming
join mode: two unbounded sides, each watermarked, joined on an equi-key
plus an event-time range.  The watermarks bound BOTH state stores (each
side buffers only rows newer than the other side's watermark minus the
interval), so the join runs indefinitely in fixed memory — the property
the reference's processing-time folds cannot offer at all.

Semantics here: every purchase joins the clicks of the same user in
the preceding `interval` (click.ts <= purchase.ts <= click.ts +
interval) — the attribution-window join, the streaming counterpart of
operators.asof (which keeps only the LATEST prior click; this keeps
them all within the window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "30 minutes"
WATERMARK = "2 hours"


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """In-stream exact dedup: emit the first arrival per key, drop
    redelivered duplicates for as long as the key can still legally
    reappear.  dropDuplicatesWithinWatermark bounds the state store by
    the watermark (keys older than it are evicted), which is what makes
    exactly-once dedup of an at-least-once source runnable forever —
    the streaming counterpart of operators.dedup.exact_dedup."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """(purchase_id, user_id, purchase_ts_us, click_id, click_ts_us) for
    every click within `window` before the purchase.  Works identically
    on two streaming frames (state-bounded by the watermarks) and on
    two batch frames (the test oracle)."""
    c = (
        (
            clicks.withWatermark("ts", watermark)
            if clicks.isStreaming
            else clicks
        )
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    p = (
        (
            purchases.withWatermark("ts", watermark)
            if purchases.isStreaming
            else purchases
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"interval {window}")),
    ).select(
        "purchase_id",
        "user_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        "click_id",
        F.unix_micros("c_ts").alias("click_ts_us"),
    )
