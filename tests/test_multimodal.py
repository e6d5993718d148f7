"""Multimodal plumbing: schemas, determinism, fan-out shapes, and kernel
correctness against direct numpy recomputation."""

import hashlib

import numpy as np

from pydriosm_spark.multimodal import media as M
from tests.conftest import SF_SMOKE


def test_media_table_schema_and_determinism(spark):
    t = M.media_table(spark, SF_SMOKE)
    assert t.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,meta_w:int,meta_h:int,meta_sr:int,meta_n:int>"
    )
    a = {r["media_id"]: bytes(r["payload"]) for r in t.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in M.media_table(spark, SF_SMOKE).collect()}
    assert a == b  # byte-identical across runs
    kinds = {r["media_id"] % 3 for r in t.select("media_id").collect()}
    assert kinds == {0, 1, 2}


def test_image_features_match_numpy(spark):
    t = M.media_table(spark, SF_SMOKE)
    feats = {r["media_id"]: r for r in M.image_features(t).collect()}
    # recompute one image independently
    mid = sorted(feats)[0]
    w, h = 8 + mid % 9, 6 + mid % 7
    payload = M.make_image(mid, w, h)
    px = np.frombuffer(payload[12:], dtype=np.uint8).reshape(h, w, 3)
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    want = (sums * 10000) // (w * h)
    got = feats[mid]
    assert (got["width"], got["height"]) == (w, h)
    assert [got["mean_r_e4"], got["mean_g_e4"], got["mean_b_e4"]] == [int(x) for x in want]


def test_image_resize_halves_dims(spark):
    t = M.media_table(spark, SF_SMOKE)
    r = M.image_resize(t, factor=2)
    row = r.orderBy("media_id").first()
    orig = M.media_table(spark, SF_SMOKE).filter(f"media_id = {row['media_id']}").first()
    assert row["width"] == max(1, orig["meta_w"] // 2)
    assert row["height"] == max(1, orig["meta_h"] // 2)
    assert bytes(row["payload"])[:4] == M.IMG_MAGIC


def test_audio_and_video_kernels(spark):
    t = M.media_table(spark, SF_SMOKE)
    a = M.audio_features(t)
    assert a.filter("rms_e4 <= 0 OR n_samples < 256").count() == 0
    v = M.video_frame_sample(t, every=2)
    # fan-out: each video with nf frames yields ceil(nf/2) rows
    one = v.groupBy("media_id").count().orderBy("media_id").first()
    mid = one["media_id"]
    nf = 4 + mid % 5
    assert one["count"] == (nf + 1) // 2

def test_media_kernels_run_on_streams(spark, tmp_path):
    """The multimodal kernels are plain mapInPandas transforms, so the
    same code must run unchanged under Structured Streaming (the
    validate/quarantine path especially — a streaming ingest filters
    corrupt blobs in-flight).  availableNow stream == batch result."""
    from pydriosm_spark.multimodal import media as M

    m = M.media_table(spark, "/root/testdata/sf0.001").filter("media_id < 60")
    src = str(tmp_path / "media_src")
    m.write.mode("overwrite").parquet(src)

    batch = {
        (r["media_id"], r["valid"], r["reason"])
        for r in M.media_validate(spark.read.parquet(src)).collect()
    }

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = M.media_validate(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("media_validate_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["media_id"], r["valid"], r["reason"])
        for r in spark.sql("select * from media_validate_stream").collect()
    }
    assert got == batch and len(got) == 60
