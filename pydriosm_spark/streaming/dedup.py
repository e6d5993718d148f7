"""Streaming exact dedup: first-seen-wins key dedup over an event
stream — the ingestion-side dedup a training-data pipeline runs before
anything lands (the batch analogue is operators/dedup.dedup_exact).

``dropDuplicates`` over Structured Streaming keeps per-key state and
emits only the first arrival; with a watermark the state is bounded (a
key reappearing after the watermark horizon would re-emit — the right
trade at web scale, where duplicate bursts are temporally close).
Shared-transformation shape as the rest of pydriosm_spark.streaming:
the same function drives batch and stream, and the test asserts the
streaming output's key set equals the batch distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_first_seen(
    events: DataFrame,
    key_cols: tuple = ("user_id", "event_type"),
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """One row per key: the first arrival (streaming) / any single row
    per key (batch, set-equal by construction)."""
    src = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts, watermark)
    return src.dropDuplicates(list(key_cols))
