"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial-join pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator with
its DuckDB differential oracle (pydriosm_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: extraction -> tiling -> compact-cover broadcast
    join -> ray-cast PIP refine, on /root/testdata/sf0.001."""
    from pydriosm_spark import queries

    return queries.q_zone_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pydriosm_spark import queries as q

    return {name: fn for name, (fn, _sql) in q.registry().items()}


def oracle_sql() -> dict[str, str]:
    from pydriosm_spark import queries as q

    return {name: sql for name, (_fn, sql) in q.registry().items() if sql is not None}
