"""As-of (point-in-time) join: each left row matched to the latest right
row of the same key with ``right_ts <= left_ts``.

Spark has no built-in as-of join; the scalable plan is the classic
union-merge: tag both sides, union, sort within the key partition by
(ts, side) with right rows ordered before left rows at equal timestamps,
and carry the last seen right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window —
ONE shuffle on the key, no range join, no per-key loop.  (A sort-merge
range join would be O(n·m) per key; the union-merge is O((n+m) log).)

The DuckDB oracle uses the engine's native ``ASOF JOIN`` — a fully
independent implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join.  ``right_payload``: right columns carried onto
    each left row (as ``asof_<name>``, plus ``asof_ts``).  ``tie_break``:
    optional right column making equal-timestamp rights deterministic
    (rows ordered by it ascending; the LAST wins)."""
    right_payload = right_payload or []

    lt = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    # ts + payload travel as ONE struct so last(ignorenulls) can never mix
    # fields from different right rows (a NULL payload value in the matched
    # row must surface as NULL, not fall back to an older row's value —
    # DuckDB ASOF semantics).  The struct itself is non-null for every right
    # row and absent (null) for left rows, which is what ignorenulls keys on.
    rt = right.select(
        F.col(key),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("ts"),
            *[F.col(c).alias(c) for c in right_payload],
        ).alias("__r"),
        *([F.col(tie_break).alias("__tb")] if tie_break else []),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)

    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if tie_break:
        order.append(F.col("__tb").asc_nulls_first())
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    carried = u.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    carried = carried.withColumn("asof_ts", F.col("__last_r.ts"))
    for c in right_payload:
        carried = carried.withColumn(f"asof_{c}", F.col(f"__last_r.{c}"))

    out = carried.filter(F.col("__side") == 1).drop("__ts", "__side", "__r", "__last_r")
    if tie_break:
        out = out.drop("__tb")
    return out
