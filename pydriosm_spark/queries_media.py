"""Multimodal queries (rows-only driver checks: binary kernels are
pytest-gated against direct numpy recomputation instead of SQL —
tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pydriosm_spark.multimodal import media as M


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_features(M.media_table(spark, sf_dir))


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.audio_features(M.media_table(spark, sf_dir))


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.video_frame_sample(M.media_table(spark, sf_dir), every=2)


def registry() -> dict:
    return {
        "media_image_features": (q_image_features, None),
        "media_audio_features": (q_audio_features, None),
        "media_video_frames": (q_video_frame_sample, None),
    }
