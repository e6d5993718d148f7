"""Synthesis of OSM-style geometry layers (the reference's data model).

One row per feature across the five PBF layers the reference's reader
emits (/root/reference/pydriosm/reader/parser.py:1387-1393), derived
deterministically from the ``documents`` table so the DuckDB oracle can
reproduce every value:

* ``layer``     = LAYERS[doc_id % 5]
* geometry      = GeoJSON built from the canonical mention coordinates
  p_j = (lon(u(doc_id, j)), lat(v(doc_id, j))) for j = 0, 1, 2
  (sources/synth.py arithmetic), with a **degenerate 2-point ring** for
  multipolygon features with doc_id % 10 == 3 — exercising the
  reference's ``point_as_polygon`` cleaning rule (transformer.py:33-78)
* ``other_tags_raw`` = hstore string from (lang, source) plus a ``<br>``
  case every 7th feature (transformer.py:373 semantics)
* ``fclass``    = vocabulary cycle (FIXTURES.md §3), feeding the
  feature-class filter (parser.py:1016-1020) and per-fclass grouping
  (parser.py:888)

The GeoJSON is assembled as a JSON *string* with native column exprs;
downstream parsing happens in the vectorized transform UDFs — mirroring
the reference's GDAL ``ExportToJson`` handoff shape (parser.py:1638).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydriosm_spark.sources import synth

LAYERS = ["points", "lines", "multilinestrings", "multipolygons", "other_relations"]
FCLASS_VOCAB = ["rail", "subway", "tram", "bus", "ferry", "road", "path"]


def _pt(i: str, j: int, dialect: str) -> tuple[str, str]:
    """(lon_str, lat_str) SQL for point j of feature i."""
    return (
        synth.lon_str_sql(synth.u_sql(i, str(j)), dialect),
        synth.lat_str_sql(synth.v_sql(i, str(j)), dialect),
    )


def _geojson_sql(i: str, dialect: str) -> str:
    """CASE expression building the feature's GeoJSON string by layer."""
    (x0, y0), (x1, y1), (x2, y2) = (_pt(i, j, dialect) for j in range(3))

    def arr(x, y):
        return f"'[' || {x} || ',' || {y} || ']'"

    point = f"'{{\"type\":\"Point\",\"coordinates\":' || {arr(x0, y0)} || '}}'"
    line = (
        f"'{{\"type\":\"LineString\",\"coordinates\":[' || {arr(x0, y0)} || ',' || "
        f"{arr(x1, y1)} || ']}}'"
    )
    mls = (
        f"'{{\"type\":\"MultiLineString\",\"coordinates\":[[' || {arr(x0, y0)} || ',' || "
        f"{arr(x1, y1)} || '],[' || {arr(x1, y1)} || ',' || {arr(x2, y2)} || ']]}}'"
    )
    ring = f"'[' || {arr(x0, y0)} || ',' || {arr(x1, y1)} || ',' || {arr(x2, y2)} || ']'"
    ring_degen = f"'[' || {arr(x0, y0)} || ',' || {arr(x0, y0)} || ']'"
    mpoly = (
        f"(CASE WHEN ({i}) % 10 = 3 "
        f"THEN '{{\"type\":\"MultiPolygon\",\"coordinates\":[[' || {ring_degen} || ']]}}' "
        f"ELSE '{{\"type\":\"MultiPolygon\",\"coordinates\":[[' || {ring} || ']]}}' END)"
    )
    gc = (
        f"'{{\"type\":\"GeometryCollection\",\"geometries\":["
        f"{{\"type\":\"Point\",\"coordinates\":' || {arr(x0, y0)} || '}},"
        f"{{\"type\":\"Point\",\"coordinates\":' || {arr(x1, y1)} || '}}]}}'"
    )
    return (
        f"(CASE ({i}) % 5 WHEN 0 THEN {point} WHEN 1 THEN {line} WHEN 2 THEN {mls} "
        f"WHEN 3 THEN {mpoly} ELSE {gc} END)"
    )


def _hstore_sql(i: str, lang: str, source: str) -> str:
    base = f"'\"lang\"=>\"' || {lang} || '\",\"source\"=>\"' || {source} || '\"'"
    return f"(CASE WHEN ({i}) % 7 = 0 THEN {base} || ',\"note\"=>\"a<br>b\"' ELSE {base} END)"


def layer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    layer_case = "(CASE doc_id % 5 " + " ".join(
        f"WHEN {k} THEN '{name}'" for k, name in enumerate(LAYERS)
    ) + " END)"
    fclass_case = "(CASE doc_id % 7 " + " ".join(
        f"WHEN {k} THEN '{name}'" for k, name in enumerate(FCLASS_VOCAB)
    ) + " END)"
    return d.select(
        F.col("doc_id").alias("id"),
        F.expr(layer_case).alias("layer"),
        F.expr(_geojson_sql("doc_id", "spark")).alias("geojson"),
        F.expr(_hstore_sql("doc_id", "lang", "source")).alias("other_tags_raw"),
        F.expr(fclass_case).alias("fclass"),
    )
