"""Stream-stream interval join: purchases correlated to the same user's
clicks within a trailing window — the two-sided stateful join box of
Structured Streaming (state bounded by the watermark + time-range
condition; without them a stream-stream join buffers forever).

Shared-transformation shape: the same function drives batch frames (for
the equivalence test / oracle) and streaming frames (watermarks applied
only when streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_purchase(
    purchases: DataFrame,
    clicks: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner interval join: every (purchase, click) pair of the same user
    with ``purchase.ts - window <= click.ts <= purchase.ts``."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("p_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    return p.join(
        c,
        (p["user_id"] == c["c_user_id"])
        & (c["c_ts"] >= p["p_ts"] - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (c["c_ts"] <= p["p_ts"]),
        "inner",
    ).select("purchase_id", "user_id", "p_ts", "click_id", "c_ts")
