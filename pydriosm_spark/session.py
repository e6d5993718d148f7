"""SparkSession factory tuned for the spatial-join + tiling workload.

Local-mode settings mirror what we would set on a real multi-executor
cluster (AQE, adaptive skew join, Arrow for pandas UDFs, sensible shuffle
partition counts).  On a 1000-executor cluster the same builder is used
with ``master`` unset (taken from spark-submit) and shuffle partitions
sized ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "pydriosm_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Parameters
    ----------
    parallelism:
        Local-mode core count (``local[N]``).  ``None`` → value of
        ``$SPARK_GRAFT_CPUS`` or 32.  On a cluster, pass ``None`` and set
        master via spark-submit instead.
    shuffle_partitions:
        Defaults to ``2 * parallelism`` — small enough to avoid tiny-task
        overhead at test scale, and AQE coalesces further at runtime.  At
        100 TB this would be sized ~2-3x total executor cores and AQE
        handles the rest.
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * parallelism)

    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        # AQE: runtime coalescing + skew-join backstop (we also salt
        # explicitly; AQE is the safety net, not the plan).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF exchange; large batches amortize
        # serialization of the vectorized geometry kernels.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Broadcast threshold: geometry/dimension sides are small relative
        # to the webpages fact side; keep the default 10MB but make it
        # explicit that we rely on it.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # Timestamps: keep parquet round-trip stable across engines.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # the SQL surface (qc_* / osm_* SQL-defined functions) and the two
    # DataSource formats register per session — both are cheap catalog
    # entries, so every get_spark() session speaks the full vocabulary.
    # Registrations are INDEPENDENT try blocks (ADVICE r4): a regression
    # in one surface must not silently disable the others, and a genuine
    # failure is logged, never swallowed into an invisible no-op.
    def _register(what, fn):
        try:
            fn()
        except Exception as e:  # pragma: no cover - version-dependent
            import warnings

            warnings.warn(
                f"pydriosm_spark: {what} registration skipped: {type(e).__name__}: {e}",
                RuntimeWarning,
                stacklevel=2,
            )

    def _sqlfns():
        from pydriosm_spark.sqlfns import register_sql_functions

        register_sql_functions(spark)

    def _pbf_ds():
        from pydriosm_spark.sources.pbf_datasource import OsmPbfDataSource

        spark.dataSource.register(OsmPbfDataSource)

    def _shp_ds():
        from pydriosm_spark.sources.shp_datasource import OsmShpDataSource

        spark.dataSource.register(OsmShpDataSource)

    _register("SQL functions", _sqlfns)
    _register("osmpbf DataSource", _pbf_ds)
    _register("osmshp DataSource", _shp_ds)
    return spark
