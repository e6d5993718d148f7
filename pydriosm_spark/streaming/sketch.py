"""Streaming KMV distinct-count sketch — bounded-state cardinality over
an unbounded stream.

The batch sketch (operators/sketch.py) is algebraic: merging two KMV
states = union + re-take-k.  Streaming therefore shards the hash space
into ``n_buckets`` keys, keeps each shard's bottom-k distinct hashes in
``applyInPandasWithState`` (state is <= k longs per shard — bounded
forever, no watermark needed for an accumulating sketch), and the
reader merges shard states into the global estimate.  Because the
hashes are md5-derived integers, the streaming estimate is EXACTLY the
batch estimate on the same data — equivalence-tested, not eyeballed.

At 10^12 rows the shard count spreads state across executors and the
per-micro-batch work is a hash + a per-shard set union; the merge reads
``n_buckets`` tiny rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pydriosm_spark.operators.sketch import HASH_RANGE, hash30_sql


def streaming_kmv_states(
    stream: DataFrame, value_sql: str, k: int = 256, n_buckets: int = 32
) -> DataFrame:
    """(bucket, mins) updating stream: each shard's bottom-k distinct
    30-bit hashes of ``value_sql``."""
    hashed = stream.select(
        F.expr(hash30_sql(value_sql, "spark")).alias("h")
    ).withColumn("bucket", (F.col("h") % n_buckets).cast("int"))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            prev_mins, prev_upd = state.get
            mins = set(prev_mins)
        else:
            mins, prev_upd = set(), 0
        for pdf in pdfs:
            mins.update(int(x) for x in pdf["h"])
        best = sorted(mins)[:k]
        upd = prev_upd + 1  # monotonic per shard: readers keep max(upd)
        state.update((best, upd))
        yield pd.DataFrame(
            {"bucket": [int(key[0])], "upd": [upd], "mins": [best]}
        )

    return hashed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket int, upd int, mins array<long>",
        stateStructType="mins array<long>, upd int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_kmv_states(states: pd.DataFrame, k: int = 256) -> dict:
    """Driver-side merge of the (bucket, mins) table -> the SAME
    (k, kth_hash, est_distinct) row operators/sketch.py computes in
    batch: union all shard mins, take the k smallest distinct."""
    mins = sorted({int(h) for row in states["mins"] for h in row})[:k]
    n = len(mins)
    kth = mins[-1] if mins else 0
    est = n if n < k else (k - 1) * HASH_RANGE // kth
    return {"k": k, "kth_hash": kth, "est_distinct": int(est)}


def streaming_quantile_states(
    stream: DataFrame,
    value_sql: str,
    key_sql: str,
    k: int = 2048,
    n_buckets: int = 32,
) -> DataFrame:
    """Streaming bottom-k-by-hash quantile SAMPLE (operators/sketch.py's
    sampled_quantiles, streaming form): shards keep their bottom-k
    distinct (h, v) pairs ordered by (h, v) — sharding on h keeps every
    pair of one hash in one shard, so the merged global bottom-k is
    EXACTLY the batch sample.  State <= k pairs per shard, bounded
    forever."""
    hashed = stream.select(
        F.expr(hash30_sql(key_sql, "spark")).alias("h"),
        F.expr(value_sql).cast("long").alias("v"),
    ).withColumn("bucket", (F.col("h") % n_buckets).cast("int"))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            hs, vs, prev_upd = state.get
            pairs = set(zip(hs, vs))
        else:
            pairs, prev_upd = set(), 0
        for pdf in pdfs:
            pairs.update(zip((int(x) for x in pdf["h"]), (int(x) for x in pdf["v"])))
        best = sorted(pairs)[:k]
        upd = prev_upd + 1
        state.update(([h for h, _ in best], [v for _, v in best], upd))
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "upd": [upd],
                "hs": [[h for h, _ in best]],
                "vs": [[v for _, v in best]],
            }
        )

    return hashed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket int, upd int, hs array<long>, vs array<long>",
        stateStructType="hs array<long>, vs array<long>, upd int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_quantile_states(
    states: pd.DataFrame, qs_permille: tuple = (500, 900, 990), k: int = 2048
) -> pd.DataFrame:
    """Merge shard samples -> (q_permille, value) rows, the SAME
    arithmetic as the batch operator: global bottom-k by (h, v), rank by
    (v, h), target ranks ceil(q*k/1000) clamped to the sample size."""
    pairs = sorted(
        {(int(h), int(v)) for _i, row in states.iterrows() for h, v in zip(row["hs"], row["vs"])}
    )[:k]
    ranked = sorted(pairs, key=lambda p: (p[1], p[0]))
    n = len(ranked)
    out = []
    for q in qs_permille:
        r = min((q * k + 999) // 1000, n)
        if r >= 1:
            out.append((q, ranked[r - 1][1]))
    return pd.DataFrame(out, columns=["q_permille", "value"])
