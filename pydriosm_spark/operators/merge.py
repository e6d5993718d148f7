"""Multi-region layer merge (reference U3: merge_layer_shps,
/root/reference/pydriosm/reader/parser.py:1186-1365): one layer's data
from several regions unioned into a single frame, grouped/partitioned by
geometry type on write — re-expressed as ``unionByName`` over region
frames + ``write.partitionBy('geom_type')`` (the reference writes one
shapefile per geometry-type group, parser.py:1097-1106).

At 100 TB the regions are Iceberg partitions and this merge is a
partition-pruned multi-path scan — a metadata operation, zero shuffle;
the geometry-type partitioned write is the only data movement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_layer_frames(frames: list[DataFrame], region_names: list[str] | None = None) -> DataFrame:
    """Union per-region layer frames by name, tagging provenance —
    the region-prefixed temp-copy step of the reference (parser.py:1259+)
    becomes a plain provenance column."""
    if region_names is not None:
        frames = [
            df.withColumn("region", F.lit(name)) for df, name in zip(frames, region_names)
        ]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def write_by_geom_type(df: DataFrame, out_dir: str, geom_type_col: str = "geom_type") -> None:
    """One output partition per geometry type (reference: one shapefile
    per Point/LineString/Polygon group, parser.py:1097-1106)."""
    df.write.mode("overwrite").partitionBy(geom_type_col).parquet(out_dir)


def write_by_feature_class(df: DataFrame, out_dir: str, fclass_col: str = "fclass") -> None:
    """Per-feature-class sink (reference K2: data.groupby(fclass) -> one
    shapefile per class, parser.py:870-903)."""
    df.write.mode("overwrite").partitionBy(fclass_col).parquet(out_dir)
