#!/usr/bin/env python
"""Example continuous-ingest job: validate -> stream-decode -> commit,
the engine's end-to-end replacement for the reference's
download-then-import loop (files land in storage; no network):

    python package.py
    spark-submit --master local[8] \
        --py-files dist/pydriosm_spark.zip examples/ingest_job.py \
        /path/to/pbf_landing_dir /tmp/ingest_out

1. ``pbf_validate`` quarantines corrupt extracts (framing walk on
   executors) — a bad file becomes a quarantine row, not a dead job.
2. The registered ``osmpbf`` DataSource (or the streaming reader, for a
   long-running watcher) decodes the valid files' points layer with
   per-file + intra-file parallelism.
3. The output lands partitioned by source file; ``table_column_info`` /
   ``table_column_stats`` answer what landed.
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(landing: str, out_dir: str) -> None:
    spark = SparkSession.builder.appName("pbf_ingest_job").getOrCreate()

    from pydriosm_spark.sources import pbf
    from pydriosm_spark.sources.pbf_datasource import OsmPbfDataSource

    verdicts = pbf.pbf_validate(spark, landing).cache()
    bad = verdicts.filter(~F.col("valid"))
    n_bad = bad.count()
    if n_bad:
        bad.write.mode("overwrite").json(os.path.join(out_dir, "_quarantine"))

    good = [r["path"] for r in verdicts.filter("valid").collect()]
    verdicts.unpersist()
    if not good:
        print('{"files": 0, "quarantined": %d, "rows": 0}' % n_bad)
        return

    import json

    spark.dataSource.register(OsmPbfDataSource)
    # the validated subset feeds decode directly — a quarantined file
    # never reaches a stripe task
    points = (
        spark.read.format("osmpbf")
        .option("layer", "points")
        .option("n_tasks", "8")
        .option("paths", json.dumps(good))
        .load()
    )
    points = points.withColumn(
        "src", F.element_at(F.split("src_file", "/"), -1)
    )
    points.write.mode("overwrite").partitionBy("src").parquet(
        os.path.join(out_dir, "points")
    )
    n = spark.read.parquet(os.path.join(out_dir, "points")).count()
    print('{"files": %d, "quarantined": %d, "rows": %d}' % (len(good), n_bad, n))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
