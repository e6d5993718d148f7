#!/usr/bin/env python
"""Example production job: the multimodal feature pipeline — validate ->
quarantine split -> per-kind features — shipped the same way as the
other jobs:

    python package.py
    spark-submit --master local[8] \
        --py-files dist/pydriosm_spark.zip examples/media_job.py \
        /root/testdata/sf0.001 /tmp/media_out

Decode goes through the AUTO codec seam (``multimodal.codecs``): fake
container payloads, real PNG, and real WAV all decode in the same run;
JPEG / real video pick up PIL / pyav automatically when installed.
Writes one parquet table per media kind and prints a one-line summary.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str, out_dir: str) -> None:
    spark = SparkSession.builder.appName("geotile_media_job").getOrCreate()

    from pydriosm_spark.multimodal import codecs, media

    table = media.media_table(spark, sf_dir)

    # 1. container validation -> quarantine split (corrupt blobs must
    #    route, never crash a 10^12-object ingest).  cache(): the
    #    verdict feeds FOUR write actions below (three semi-joins + the
    #    quarantine table) — without it the validation kernel re-scans
    #    every payload byte once per write (same pattern as
    #    examples/ingest_job.py).
    verdict = media.media_validate(table).cache()
    ok_ids = verdict.filter("valid").select("media_id")
    quarantined = verdict.filter("NOT valid")
    clean = table.join(ok_ids, "media_id", "left_semi")

    # 2. per-kind features through the auto codec seam
    img = media.image_features(clean, decode=codecs.decode_image_auto)
    aud = media.audio_features(clean, decode=codecs.decode_audio_auto)
    vid = media.video_frame_sample(clean, decode=codecs.decode_video_auto)

    img.write.mode("overwrite").parquet(f"{out_dir}/image_features")
    aud.write.mode("overwrite").parquet(f"{out_dir}/audio_features")
    vid.write.mode("overwrite").parquet(f"{out_dir}/video_frames")
    quarantined.write.mode("overwrite").parquet(f"{out_dir}/quarantine")

    ni = spark.read.parquet(f"{out_dir}/image_features").count()
    na = spark.read.parquet(f"{out_dir}/audio_features").count()
    nv = spark.read.parquet(f"{out_dir}/video_frames").count()
    nq = spark.read.parquet(f"{out_dir}/quarantine").count()
    print(f"MEDIA_JOB_RESULT images={ni} audio={na} video_frames={nv} quarantined={nq}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
