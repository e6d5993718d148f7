"""Deterministic distinct-count sketch: KMV (k-minimum-values).

The classic streaming/distributed cardinality estimator (Bar-Yossef et
al.): hash every value uniformly, keep the k smallest distinct hashes;
if the k-th smallest is ``h_k`` on a hash range of size ``R``, the
distinct count is ~ ``(k-1) * R / h_k``.  Unlike HyperLogLog
implementations (whose register layouts differ per engine), KMV built
on md5-derived integer hashes is EXACTLY reproducible in any engine —
so the estimate itself carries a DuckDB oracle.

Scale shape: the heavy step is ``distinct-hash -> k smallest``, which
Spark executes as per-partition top-k + single merge
(TakeOrderedAndProject) after a map-side-combined distinct — no full
sort, shuffle bounded by distinct hashes.  Merging two KMV sketches =
union + re-take-k, so the operator is algebraic (partitionable) by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hash range: top 30 bits of the 60-bit md5 prefix (integer arithmetic
#: stays well inside int64 for any k)
HASH_BITS = 30
HASH_RANGE = 1 << HASH_BITS


def hash30_sql(value: str, dialect: str) -> str:
    """Uniform 30-bit integer hash of ``value`` — same text semantics in
    both dialects (md5 hex -> 60-bit int -> top 30 bits)."""
    if dialect == "spark":
        return f"(CAST(conv(substr(md5({value}), 1, 15), 16, 10) AS BIGINT) >> {HASH_BITS})"
    return f"((('0x' || substr(md5({value}), 1, 15))::BIGINT) >> {HASH_BITS})"


def kmv_distinct_estimate(values: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame (k, kth_hash, est_distinct) estimating the
    number of distinct ``value_col`` values.  All-integer arithmetic:
    ``est = (k-1) * HASH_RANGE DIV kth_hash`` (or the exact count when
    fewer than k distinct hashes exist)."""
    hs = (
        values.select(F.expr(hash30_sql(value_col, "spark")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = hs.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        F.col("kth").cast("long").alias("kth_hash"),
        F.expr(
            f"CAST(CASE WHEN n < {k} THEN n "
            f"ELSE CAST({(k - 1) * HASH_RANGE} AS BIGINT) DIV kth END AS BIGINT)"
        ).alias("est_distinct"),
    )
