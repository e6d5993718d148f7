"""The SQL surface: every scalar primitive as a SQL-DEFINED function.

``register_sql_functions(spark)`` creates ``CREATE OR REPLACE TEMPORARY
FUNCTION`` definitions (Spark 4 SQL scalar UDFs) whose bodies are the
SAME arithmetic the DataFrame surface uses — pure built-in expressions,
inlined by Catalyst at plan time, so ``spark.sql`` users get the full
engine vocabulary with zero Python and zero custom Catalyst rules (the
optional SQL surface SURVEY.md §7 deferred).

Functions:

* ``qc_cell(lon, lat, res)``        point -> packed quadcell id
* ``qc_res(cell)`` / ``qc_x`` / ``qc_y``   id -> components
* ``qc_parent(cell, parent_res)``   ancestor at a coarser resolution
* ``qc_bounds(cell)``               struct(min_lon, min_lat, max_lon, max_lat)
* ``osm_ntokens(text)``             whitespace token count
* ``osm_bpe_tokens(text)``          BPE-ish pre-token count
* ``osm_fingerprint(text)``         normalized-content md5
* ``osm_langid(text)``              stopword-vote language id
* ``osm_slug(name)``                table-name slug (60 + '..' rule)

The quadcell bodies generalize the fixed-res expression builders
(cells/quadcell.py: res baked at build time) to a runtime ``res``
argument via ``shiftleft`` — equality with the builders and the numpy
kernels is pytest-gated.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pydriosm_spark.cells.quadcell import _RES_SHIFT, _X_SHIFT
from pydriosm_spark.functions import text as T

_RES_MULT = 1 << _RES_SHIFT
_X_MULT = 1 << _X_SHIFT
_RES_RANGE = 1 << (_RES_SHIFT - _X_SHIFT)


def _defs() -> list:
    n = "shiftleft(CAST(1 AS BIGINT), res)"
    x = f"greatest(CAST(0 AS BIGINT), least({n} - 1, CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT)))"
    y = f"greatest(CAST(0 AS BIGINT), least({n} - 1, CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT)))"

    # component accessors over the packed id
    c_res = f"(cell DIV {_RES_MULT})"
    c_x = f"((cell DIV {_X_MULT}) % {_RES_RANGE})"
    c_y = f"(cell % {_X_MULT})"
    dr = f"shiftleft(CAST(1 AS BIGINT), CAST({c_res} - parent_res AS INT))"

    bn = f"CAST(shiftleft(CAST(1 AS BIGINT), CAST({c_res} AS INT)) AS DOUBLE)"

    return [
        (
            "qc_cell",
            "lon DOUBLE, lat DOUBLE, res INT",
            "BIGINT",
            f"CAST(res AS BIGINT) * {_RES_MULT} + ({x}) * {_X_MULT} + ({y})",
        ),
        ("qc_res", "cell BIGINT", "BIGINT", c_res),
        ("qc_x", "cell BIGINT", "BIGINT", c_x),
        ("qc_y", "cell BIGINT", "BIGINT", c_y),
        (
            "qc_parent",
            "cell BIGINT, parent_res INT",
            "BIGINT",
            f"CAST(parent_res AS BIGINT) * {_RES_MULT}"
            f" + ({c_x} DIV {dr}) * {_X_MULT} + ({c_y} DIV {dr})",
        ),
        (
            "qc_bounds",
            "cell BIGINT",
            "STRUCT<min_lon: DOUBLE, min_lat: DOUBLE, max_lon: DOUBLE, max_lat: DOUBLE>",
            "named_struct("
            f"'min_lon', CAST({c_x} AS DOUBLE) * 360.0 / {bn} - 180.0, "
            f"'min_lat', CAST({c_y} AS DOUBLE) * 180.0 / {bn} - 90.0, "
            f"'max_lon', CAST({c_x} + 1 AS DOUBLE) * 360.0 / {bn} - 180.0, "
            f"'max_lat', CAST({c_y} + 1 AS DOUBLE) * 180.0 / {bn} - 90.0)",
        ),
        (
            "qc_children",
            "cell BIGINT",
            "ARRAY<BIGINT>",
            f"array("
            + ", ".join(
                f"CAST({c_res} + 1 AS BIGINT) * {_RES_MULT}"
                f" + ({c_x} * 2 + {dx}) * {_X_MULT} + ({c_y} * 2 + {dy})"
                for dx in (0, 1)
                for dy in (0, 1)
            )
            + ")",
        ),
        (
            "osm_ntokens",
            "text STRING",
            "BIGINT",
            f"CAST({T.ntokens_sql('text', 'spark')} AS BIGINT)",
        ),
        (
            "osm_bpe_tokens",
            "text STRING",
            "BIGINT",
            f"CAST({T.bpe_token_count_sql('text', 'spark')} AS BIGINT)",
        ),
        (
            "osm_fingerprint",
            "text STRING",
            "STRING",
            T.fingerprint_sql("text", "spark"),
        ),
        (
            "osm_langid",
            "text STRING",
            "STRING",
            T.langid_sql("text", "spark"),
        ),
        (
            "osm_slug",
            "name STRING",
            "STRING",
            # naming.sanitize_table_name semantics: punctuation (except
            # _ and -) -> space, whitespace runs -> '_', >63 chars ->
            # first 60 + '..'
            "CASE WHEN length(regexp_replace(trim(regexp_replace(name, "
            "'[^A-Za-z0-9 _-]', ' ')), '\\\\s+', '_')) > 63 "
            "THEN concat(substring(regexp_replace(trim(regexp_replace(name, "
            "'[^A-Za-z0-9 _-]', ' ')), '\\\\s+', '_'), 1, 60), '..') "
            "ELSE regexp_replace(trim(regexp_replace(name, "
            "'[^A-Za-z0-9 _-]', ' ')), '\\\\s+', '_') END",
        ),
    ]


def register_sql_functions(spark: SparkSession) -> list:
    """Create all SQL-defined functions in the session; returns names."""
    names = []
    for name, params, ret, body in _defs():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
