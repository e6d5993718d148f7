"""Grid-density clustering (DBSCAN-style) over point sets.

The classic distributed approximation of density clustering at web
scale: rasterize points onto a fine grid, keep cells with >= ``min_pts``
points (the "core" cells), connect 8-adjacent core cells, and label the
connected components.  Every stage is an existing engine primitive:

    rasterize (operators/tiling.py)
      -> adjacency self-join (offset explode + equi-join)
      -> connected_components (operators/dedup.py label propagation)
      -> point assignment (equi-join on the cell key)

Deterministic cluster ids = the minimum cell key in each component.
Cost: one aggregation bounded by |cells|, a cell-level self-join, the
O(diameter) CC loop over cells (not points), and one broadcast-scale
join back to the points — no pairwise point distances anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydriosm_spark.operators import tiling
from pydriosm_spark.operators.dedup import connected_components

#: packs (rx, ry) into one integer key: rx * MULT + (ry + OFF).  The OFF
#: shift makes the packing injective for ry in [-MULT/2, MULT/2) — without
#: it, (rx=1, ry=-1) and (rx=0, ry=MULT-1) collide.  rx range is bounded by
#: 2^63 / MULT.  The oracle (queries.py) uses the same constants.
CELL_KEY_MULT = 1_000_000
CELL_KEY_OFF = CELL_KEY_MULT // 2


def grid_cluster(
    points: DataFrame,
    cell_size: int,
    min_pts: int,
    u: str = "u",
    v: str = "v",
    point_keys: list[str] | None = None,
) -> DataFrame:
    """-> (point_keys..., cluster) for points in dense cells (others are
    noise and drop, DBSCAN-style)."""
    point_keys = point_keys or ["doc_id", "mention_idx"]

    raster = tiling.rasterize(points, cell_size, u=u, v=v)
    dense = raster.filter(F.col("n") >= min_pts).select(
        (F.col("rx") * CELL_KEY_MULT + F.col("ry") + CELL_KEY_OFF).alias("cell_key"),
        "rx",
        "ry",
    )

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = dense.withColumn("__o", F.explode(offs)).select(
        F.col("cell_key").alias("id_a"),
        (
            (F.col("rx") + F.col("__o.dx")) * CELL_KEY_MULT
            + (F.col("ry") + F.col("__o.dy"))
            + CELL_KEY_OFF
        ).alias("id_b"),
    )
    # keep edges whose neighbor is itself dense; the dx=dy=0 self-loop
    # keeps isolated dense cells in the vertex set
    edges = probe.join(
        dense.select(F.col("cell_key").alias("id_b")), "id_b", "left_semi"
    )

    comp = connected_components(edges).select(
        F.col("doc_id").alias("cell_key"), F.col("component").alias("cluster")
    )

    pts = points.withColumn(
        "cell_key",
        tiling.cell_coord(u, cell_size) * CELL_KEY_MULT
        + tiling.cell_coord(v, cell_size)
        + CELL_KEY_OFF,
    )
    # no broadcast hint: |comp| = |dense cells|, which grows with the
    # covered area (10^8+ at planet scale / fine cells) — AQE broadcasts
    # when the runtime size allows and shuffles otherwise
    return pts.join(comp, "cell_key", "inner").select(*point_keys, "cluster")
