"""Structured Streaming surface: watermarked tumbling-window aggregation
over the events stream.

The reference has no streaming at all (SURVEY.md §2.8); this module adds
the streaming form of the batch ``rel_event_windows`` query so late data
and incremental execution are covered.  The same aggregation expression
is shared with the batch query, and the test drives the stream with an
``availableNow`` trigger over the events parquet (file source, bounded)
and asserts the final windowed counts equal the batch result — the
batch/streaming equivalence contract Structured Streaming is built on.

At scale this runs against a real log stream; watermark 1 hour bounds
state, and the sink would be the same partition-checkpointed table as
the batch path (plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Shared transformation: works on both batch and streaming frames."""
    # parquet lands ts as TIMESTAMP_NTZ; watermarks require TIMESTAMP
    # (session TZ is pinned to UTC so the cast is value-preserving)
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", "1 hour").getField("start").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
    )


def run_stream_available_now(
    spark: SparkSession, events_parquet: str, checkpoint_dir: str, table_name: str = "stream_windows"
):
    """Drive the windowed aggregation as a bounded stream (availableNow)
    into an in-memory sink; returns the completed query."""
    schema = spark.read.parquet(events_parquet).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_parquet)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
