#!/usr/bin/env python
"""Example production job: extraction -> tile -> spatial join -> counts,
shipped exactly as the engine deploys on a cluster:

    python package.py
    spark-submit --master local[8] \
        --py-files dist/pydriosm_spark.zip examples/join_job.py \
        /root/testdata/sf0.001 /tmp/join_out

On a real cluster only --master changes. The job writes the join output
partitioned by zone and prints a one-line summary.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str, out_dir: str) -> None:
    spark = SparkSession.builder.appName("geotile_join_job").getOrCreate()

    from pydriosm_spark.functions import extract
    from pydriosm_spark.operators.spatial_join import spatial_join_points_polygons
    from pydriosm_spark.sources import synth

    web = synth.webpages(spark, sf_dir)
    mentions = extract.extract_mentions(web)
    joined = spatial_join_points_polygons(spark, mentions, synth.zone_features(), res=17)
    joined.write.mode("overwrite").partitionBy("feature_id").parquet(out_dir)

    n = spark.read.parquet(out_dir).count()
    zones = spark.read.parquet(out_dir).select("feature_id").distinct().count()
    print(f"JOIN_JOB_RESULT rows={n} zones={zones}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
