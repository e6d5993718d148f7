"""Multimodal queries.  The feature kernels are rows-only driver checks
(binary decode pytest-gated against direct numpy recomputation —
tests/test_multimodal.py); the MANIFEST query is fully oracled: DuckDB
reconstructs every payload's byte stream in SQL (magic + little-endian
int32 headers + the md5 counter stream) and matches the engine's
md5-over-hex of the actual binary column, pinning the payload bytes
cross-engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydriosm_spark.multimodal import media as M


def q_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, kind, n_bytes, payload_md5hex): the typed-metadata +
    content-address manifest a lakehouse keeps per media object."""
    return M.media_table(spark, sf_dir).select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.expr("md5(lower(hex(payload)))").alias("payload_md5hex"),
    )


def _i32le_hex(v: str) -> str:
    """DuckDB SQL: int expression -> 4-byte little-endian lowercase hex."""
    bs = [f"({v}) % 256", f"(({v}) // 256) % 256", f"(({v}) // 65536) % 256",
          f"(({v}) // 16777216) % 256"]
    return " || ".join(f"lower(lpad(to_hex({b}), 2, '0'))" for b in bs)


#: fixed md5-block count covering the largest payload of any kind
#: (audio: (256+127)*2 bytes -> 48 blocks); DuckDB's range() cannot take
#: a per-row (lateral) bound, so the stream is over-generated and cut
_STREAM_BLOCKS = 48


def _stream_hex(key_expr: str, nbytes: str) -> str:
    """DuckDB SQL scalar subquery: first ``nbytes`` bytes of the md5
    counter stream for ``key_expr``, as lowercase hex (mirrors
    media._stream_bytes)."""
    return (
        f"substr((SELECT string_agg(md5({key_expr} || ':' || r.i), '' ORDER BY r.i) "
        f"FROM range(0, {_STREAM_BLOCKS}) r(i)), 1, ({nbytes}) * 2)"
    )


def oracle_media_manifest() -> str:
    img_n = "( (8 + doc_id % 9) * (6 + doc_id % 7) * 3 )"
    aud_n = "( (256 + doc_id % 128) * 2 )"
    vid_n = "( 8 * 6 * (4 + doc_id % 5) )"
    img_hex = (
        "'46494d47' || " + _i32le_hex("8 + doc_id % 9") + " || "
        + _i32le_hex("6 + doc_id % 7")
        + " || " + _stream_hex("'img' || doc_id", img_n)
    )
    aud_hex = (
        "'46415544' || " + _i32le_hex("8000") + " || "
        + _i32le_hex("256 + doc_id % 128")
        + " || " + _stream_hex("'aud' || doc_id", aud_n)
    )
    vid_hex = (
        "'46564944' || " + _i32le_hex("8") + " || " + _i32le_hex("6") + " || "
        + _i32le_hex("4 + doc_id % 5")
        + " || " + _stream_hex("'vid' || doc_id", vid_n)
    )
    return f"""
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(CASE doc_id % 3 WHEN 0 THEN 12 + {img_n}
            WHEN 1 THEN 12 + {aud_n}
            ELSE 16 + {vid_n} END AS BIGINT) AS n_bytes,
       CASE doc_id % 3 WHEN 0 THEN md5({img_hex})
            WHEN 1 THEN md5({aud_hex})
            ELSE md5({vid_hex}) END AS payload_md5hex
FROM documents"""


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_features(M.media_table(spark, sf_dir))


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.audio_features(M.media_table(spark, sf_dir))


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.video_frame_sample(M.media_table(spark, sf_dir), every=2)


def registry() -> dict:
    return {
        "media_manifest": (q_media_manifest, oracle_media_manifest()),
        "media_image_features": (q_image_features, None),
        "media_audio_features": (q_audio_features, None),
        "media_video_frames": (q_video_frame_sample, None),
    }
