"""Custom stateful streaming operator: gap-based sessionization of the
events stream via ``applyInPandasWithState``.

A session = consecutive events of one user with gaps < ``gap``; emitted
when the watermark passes the session's end + gap (late data handled by
the watermark).  This is the "custom stateful operator" surface the
north rule's streaming story needs beyond built-in windowed aggs; the
batch equivalent (window lag/cumsum over event time) is used as the
differential oracle in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long, sum_value_c long"
STATE_SCHEMA = "start long, end long, n long, sv long"

GAP_SECONDS = 30 * 60


def sessionize_batch(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Batch oracle: gap-based sessions via lag + cumulative session ids.
    Deterministic; used to check the stateful streaming operator."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > gap_seconds, 1
        ).otherwise(0)
    )
    e = e.withColumn("__new", gap).withColumn(
        "__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return e.groupBy("user_id", "__sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
    ).drop("__sid")


def _sessionize_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Stateful kernel: merge incoming events into the open session,
    emitting closed sessions.  State = (start, end, n, sum_cents)."""
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
    out = []

    if state.exists:
        start, end, n, sv = state.get
    else:
        start = end = n = sv = None

    gap_us = GAP_SECONDS * 1_000_000
    for ts, value in zip(rows["ts"], rows["value"]):
        t = int(pd.Timestamp(ts).value // 1_000)  # microseconds
        cents = int(round(float(value) * 100))
        if start is None:
            start, end, n, sv = t, t, 1, cents
        elif t - end > gap_us:
            out.append((user_id, start, end, n, sv))
            start, end, n, sv = t, t, 1, cents
        else:
            end, n, sv = t, n + 1, sv + cents

    if state.hasTimedOut:
        if start is not None:
            out.append((user_id, start, end, n, sv))
        state.remove()
    else:
        state.update((start, end, n, sv))
        state.setTimeoutTimestamp(end // 1000 + GAP_SECONDS * 1000)

    if out:
        df = pd.DataFrame(out, columns=["user_id", "s", "e", "n_events", "sum_value_c"])
        yield pd.DataFrame(
            {
                "user_id": df["user_id"],
                "session_start": pd.to_datetime(df["s"], unit="us"),
                "session_end": pd.to_datetime(df["e"], unit="us"),
                "n_events": df["n_events"],
                "sum_value_c": df["sum_value_c"],
            }
        )


def sessionize_stream(events_stream: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Streaming sessionization: watermark + per-user state with
    event-time timeouts.  Sessions emit once no on-time event can extend
    them."""
    e = events_stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", f"{gap_seconds} seconds"
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
