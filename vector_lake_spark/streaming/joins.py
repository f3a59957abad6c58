"""Stream-stream interval join — Structured Streaming's hardest primitive.

Both sides are unbounded, so each must carry a watermark AND the join
condition must bound event-time distance; together they let Spark evict
buffered rows (state is ~watermark+interval of each stream, not the
stream itself). This is the streaming form of the batch
``operators/interval`` / ``ev_funnel`` attribution shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Attribute each purchase to same-user clicks within the preceding
    ``attribution`` interval. Returns
    (user_id, click_id, purchase_id, click_ts, purchase_ts).

    State bound: each side buffers ~(watermark + attribution) of data;
    rows older than that are evicted because the time-bound join
    condition proves they can never match a future row."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    cond = (
        (c.user_id == p.p_user_id)
        & (p.purchase_ts > c.click_ts)
        & (p.purchase_ts <= c.click_ts + F.expr(f"INTERVAL {attribution}"))
    )
    return c.join(p, cond).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"
    )
