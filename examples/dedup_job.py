#!/usr/bin/env python
"""Example production job: the training-data dedup pipeline — MinHash-LSH
near-dup pairs -> connected components -> canonical keep-list — shipped
the same way as the join job:

    python package.py
    spark-submit --master local[8] \
        --py-files dist/pydriosm_spark.zip examples/dedup_job.py \
        /root/testdata/sf0.001 /tmp/dedup_out

Writes the per-document verdict (doc_id, component, is_canonical) and
prints a one-line summary.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str, out_dir: str) -> None:
    spark = SparkSession.builder.appName("geotile_dedup_job").getOrCreate()

    from pydriosm_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_e6_min=100_000)
    comp = dedup.connected_components(pairs)
    verdict = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("component"))
    )
    verdict.write.mode("overwrite").parquet(out_dir)

    out = spark.read.parquet(out_dir)
    n = out.count()
    kept = out.filter("is_canonical").count()
    print(f"DEDUP_JOB_RESULT docs={n} kept={kept} dropped={n - kept}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
