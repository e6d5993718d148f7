from pydriosm_spark.sources import synth  # noqa: F401
