"""kNN join via cell-disk expansion (plus a brute-force baseline).

Both operate on integer planar coordinates (units of 1e-5 degree in our
fixtures) so distances are exact integers — ``d2 = (u-pu)^2 + (v-pv)^2``
— and results are bit-stable across engines and parallelism levels.
Ties break deterministically on ``(d2, place_id)``.

``knn_bruteforce`` — broadcast cross join + window top-k.  Optimal when
the place side is small; the right plan for |places| up to ~10^4 even at
100 TB of points (broadcast nested-loop + one shuffle for the window).

``knn_cell`` — the scale path for large place sets, exact, in TWO joins
(no per-ring driver loop):

1. **Disk probe** — bucket places into coarse grid cells of size S;
   each point explodes the (2R+1)^2 cell-offset array of its Chebyshev
   R-disk and equi-joins the place buckets.  A point is *certified* if
   it found >= k candidates whose k-th distance <= (R*S)^2 — every
   unseen place sits in cell-ring > R, hence at distance > R*S.
2. **Fallback** — the (rare) uncertified points go through the
   brute-force path.  Exactness is unconditional; R only tunes how much
   traffic takes the cheap path.

At 100 TB the disk probe is a broadcast (or bucket-shuffle) equi-join
with explode factor (2R+1)^2 ~ 25; the fallback handles density holes
without a correctness cliff.  Skew: points concentrate in hot cells but
the join key is the *place* bucket — replicating the small side per salt
(operators/skew.py) applies when the place side shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _topk(cand: DataFrame, point_keys: list[str], k: int) -> DataFrame:
    w = Window.partitionBy(*point_keys).orderBy(F.col("d2").asc(), F.col("place_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*point_keys, "rank", "place_id", "d2")
    )


def _with_d2(df: DataFrame, u: str, v: str) -> DataFrame:
    return df.withColumn(
        "d2",
        (F.col(u) - F.col("pu")) * (F.col(u) - F.col("pu"))
        + (F.col(v) - F.col("pv")) * (F.col(v) - F.col("pv")),
    )


def knn_bruteforce(
    points: DataFrame,
    places: DataFrame,
    k: int = 3,
    point_keys: list[str] | None = None,
    u: str = "u",
    v: str = "v",
    broadcast: bool = True,
) -> DataFrame:
    """``broadcast=False`` drops the broadcast hint so the cross join
    runs as a block-partitioned CartesianProduct instead of shipping the
    whole place side to every executor — required when |places| exceeds
    executor memory (knn_cell's uncertified-point fallback threads its
    ``broadcast_places`` flag here so a >2M-place side is never
    broadcast, ADVICE r3)."""
    point_keys = point_keys or ["doc_id", "mention_idx"]
    placed = F.broadcast(places) if broadcast else places
    cand = _with_d2(points.crossJoin(placed), u, v)
    return _topk(cand, point_keys, k)


def knn_cell(
    spark: SparkSession,
    points: DataFrame,
    places: DataFrame,
    k: int = 3,
    cell_size: int = 4000,
    disk_radius: int = 2,
    point_keys: list[str] | None = None,
    u: str = "u",
    v: str = "v",
    broadcast_places: bool = True,
) -> DataFrame:
    """Exact kNN join: disk-probe equi-join + brute-force fallback.

    ``broadcast_places=False`` drops the broadcast hint so the disk
    probe runs as a shuffle join on the derived cell keys — required
    once the place side outgrows an executor (the equality condition
    ``cx + dx == pcx`` is key-extractable, so Catalyst plans a regular
    hash/sort-merge join; equivalence-tested against the broadcast
    form).  The flag threads into the uncertified-point fallback too:
    ``knn_bruteforce(..., broadcast=False)`` runs the residual cross
    join as a partitioned CartesianProduct rather than broadcasting a
    place side the flag says is too big (ADVICE r3)."""
    point_keys = point_keys or ["doc_id", "mention_idx"]
    S, R = int(cell_size), int(disk_radius)

    placed = places.select(
        "place_id", "pu", "pv",
        F.floor(F.col("pu") / S).alias("pcx"),
        F.floor(F.col("pv") / S).alias("pcy"),
    )

    pts = points.select(
        *point_keys,
        F.col(u).alias("__u"),
        F.col(v).alias("__v"),
        F.floor(F.col(u) / S).alias("__cx"),
        F.floor(F.col(v) / S).alias("__cy"),
    )

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-R, R + 1)
            for dy in range(-R, R + 1)
        ]
    )
    probe = pts.withColumn("__o", F.explode(offsets))
    placed_side = F.broadcast(placed) if broadcast_places else placed
    cand = _with_d2(
        probe.join(
            placed_side,
            (F.col("__cx") + F.col("__o.dx") == F.col("pcx"))
            & (F.col("__cy") + F.col("__o.dy") == F.col("pcy")),
            "inner",
        ).select(*point_keys, F.col("__u").alias(u), F.col("__v").alias(v), "place_id", "pu", "pv"),
        u,
        v,
    )

    # Certification without a second window pass: a point is certified
    # iff it has >= k candidates STRICTLY inside the ball of radius R*S
    # (anything unseen is outside the R-disk, hence at distance > R*S) —
    # and then its true top-k is a subset of those in-ball candidates.
    # Strict < at the boundary: a candidate at exactly R*S cannot be
    # proven to beat an unseen place's (d2, place_id) tie-break, so such
    # points take the exact brute-force fallback instead.  One
    # repartition on the point key serves both the certifying count
    # (map-side partial agg) and the top-k window.
    bound = (R * S) * (R * S)
    bc = cand.filter(F.col("d2") < bound).repartition(*[F.col(c) for c in point_keys])
    counts = bc.groupBy(*point_keys).agg(F.count(F.lit(1)).alias("__n_ball"))
    certified = counts.filter(F.col("__n_ball") >= k).select(*point_keys)

    w = Window.partitionBy(*point_keys).orderBy(F.col("d2").asc(), F.col("place_id").asc())
    fast = (
        bc.join(certified, point_keys, "left_semi")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*point_keys, "rank", "place_id", "d2")
    )

    slow_pts = points.join(certified, point_keys, "left_anti")
    slow = knn_bruteforce(
        slow_pts, places, k=k, point_keys=point_keys, u=u, v=v,
        broadcast=broadcast_places,
    )
    return fast.unionByName(slow)


def knn_auto(
    spark: SparkSession,
    points: DataFrame,
    places: DataFrame,
    k: int = 3,
    broadcast_nlj_threshold: int = 4096,
    **kw,
) -> DataFrame:
    """Adaptive dispatch: for a small place side the broadcast
    nested-loop + WindowGroupLimit brute force beats the cell path (no
    explode, no extra shuffle); the disk-probe plan takes over once the
    place side is big enough that |points| x |places| dominates; and
    past ~2M places the probe join stops broadcasting entirely (shuffle
    join on the derived cell keys).  The thresholds are |places|-driven."""
    n_places = places.count()
    if n_places <= broadcast_nlj_threshold:
        return knn_bruteforce(points, places, k=k, **{k_: v for k_, v in kw.items() if k_ in ("point_keys", "u", "v")})
    kw.setdefault("broadcast_places", n_places <= 2_000_000)
    return knn_cell(spark, points, places, k=k, **kw)


# Backwards-compatible name used by the query registry / bench.
def knn_ring(spark: SparkSession, points: DataFrame, places: DataFrame, k: int = 3, **kw) -> DataFrame:
    return knn_cell(spark, points, places, k=k, **kw)
