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


# --- codec pluggability seam (VERDICT r4 item 7) ---------------------------
# An alternate trivial container: b"ALT!" + big-endian uint16 dims +
# body.  If the full pipeline runs against THESE payloads with only the
# decode/encode callables swapped, the kernel surfaces are codec-free —
# dropping in PIL/librosa/pyav later changes nothing but the callables.
# (Decoders are defined INSIDE the test so cloudpickle ships them by
# value — exactly how a user would inject a lambda-free local codec.)


def test_codec_seam_runs_pipeline_with_injected_decoder(spark):
    """image_features / image_resize / audio_features / video_frame_sample
    over ALT-container payloads with injected decoders: outputs equal the
    numpy ground truth computed directly from the alternate container —
    no kernel knows which codec ran."""
    ALT_MAGIC = b"ALT!"

    def alt_make_image(px):
        h, w = px.shape[:2]
        return ALT_MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big") + px.tobytes()

    def alt_decode_image(buf):
        assert buf[:4] == ALT_MAGIC
        w, h = int.from_bytes(buf[4:6], "big"), int.from_bytes(buf[6:8], "big")
        return np.frombuffer(buf[8 : 8 + w * h * 3], dtype=np.uint8).reshape(h, w, 3)

    def alt_decode_audio(buf):
        assert buf[:4] == ALT_MAGIC
        n = int.from_bytes(buf[4:6], "big")
        return 44100, np.frombuffer(buf[8 : 8 + n * 2], dtype=">i2").astype(np.int16)

    def alt_decode_video(buf):
        assert buf[:4] == ALT_MAGIC
        w, h = int.from_bytes(buf[4:6], "big"), int.from_bytes(buf[6:8], "big")
        nf = int.from_bytes(buf[8:10], "big")
        return np.frombuffer(buf[10 : 10 + w * h * nf], dtype=np.uint8).reshape(nf, h, w)

    rng = np.random.RandomState(11)
    img_px = rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
    pcm = rng.randint(-3000, 3000, 64, dtype=np.int16)
    frames = rng.randint(0, 256, (4, 3, 5), dtype=np.uint8)

    rows = [
        (0, "image", alt_make_image(img_px)),
        (1, "audio", ALT_MAGIC + len(pcm).to_bytes(2, "big") + b"\0\0"
         + pcm.astype(">i2").tobytes()),
        (2, "video", ALT_MAGIC + frames.shape[2].to_bytes(2, "big")
         + frames.shape[1].to_bytes(2, "big") + frames.shape[0].to_bytes(2, "big")
         + frames.tobytes()),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")

    f = M.image_features(media, decode=alt_decode_image).collect()[0]
    sums = img_px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    want = (sums * 10000) // (6 * 8)
    assert (f["width"], f["height"]) == (8, 6)
    assert [f["mean_r_e4"], f["mean_g_e4"], f["mean_b_e4"]] == [int(x) for x in want]

    # resize decodes ALT and re-encodes ALT via the injected encoder;
    # round-trip through the alternate container byte-exactly
    r = M.image_resize(
        media, factor=2, decode=alt_decode_image, encode=alt_make_image
    ).collect()[0]
    small = (
        img_px.reshape(3, 2, 4, 2, 3).astype(np.uint32).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert (r["width"], r["height"]) == (4, 3)
    assert bytes(r["payload"]) == alt_make_image(small)
    assert alt_decode_image(bytes(r["payload"])).shape == (3, 4, 3)

    a = M.audio_features(media, decode=alt_decode_audio).collect()[0]
    p64 = pcm.astype(np.int64)
    assert a["sample_rate"] == 44100 and a["n_samples"] == 64
    assert a["rms_e4"] == int(np.sqrt((p64 * p64).mean()) * 10000) // 1
    assert a["zero_crossings"] == int(((p64[:-1] * p64[1:]) < 0).sum())

    v = M.video_frame_sample(media, every=2, decode=alt_decode_video).collect()
    assert [x["frame_idx"] for x in v] == [0, 2]
    for x in v:
        fm = int(frames[x["frame_idx"]].astype(np.int64).sum() * 10000 // (5 * 3))
        assert x["frame_mean_e4"] == fm and (x["width"], x["height"]) == (5, 3)


def test_media_validate_accepts_real_containers(spark):
    """The validate->quarantine->decode contract must be consistent: a
    real PNG / WAV payload (which decode_*_auto handles) must NOT be
    quarantined by media_validate — previously only the fake
    FIMG/FAUD/FVID magics validated, so the media example job
    quarantined 100% of real media."""
    import numpy as np

    from pydriosm_spark.multimodal import codecs

    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    png = codecs.encode_png(px)
    wav = codecs.encode_wav(8000, np.arange(64, dtype=np.int16))
    rows = [
        (1, "image", bytearray(png)),          # real PNG -> valid
        (2, "audio", bytearray(wav)),          # real WAV -> valid
        (3, "image", bytearray(png[:20])),     # truncated PNG
        (4, "audio", bytearray(b"RIFF\0\0\0\0JUNK")),  # RIFF, not WAVE
        (5, "image", bytearray(b"\xff\xd8\xff\xe0 jpeg-ish")),  # JPEG: PIL-gated
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r["media_id"]: (r["valid"], r["reason"])
        for r in M.media_validate(df).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (True, None)
    assert got[3] == (False, "truncated")
    assert got[4] == (False, "bad_magic")
    has_pil = codecs._PILImage is not None
    assert got[5] == ((True, None) if has_pil else (False, "bad_magic"))


def test_media_job_real_payloads_reach_features(spark, tmp_path):
    """Ship-path consistency: run the media job's validate->clean->
    features chain over a table that MIXES fake containers with real
    PNG/WAV — the real rows must survive the quarantine split and
    produce feature rows through the auto codec seam."""
    import numpy as np

    from pydriosm_spark.multimodal import codecs

    px = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    rows = [
        (0, "image", bytearray(M.make_image(0, 8, 6)), 8, 6, 0, 0),
        (1, "image", bytearray(codecs.encode_png(px)), 8, 6, 0, 0),
        (2, "audio", bytearray(M.make_audio(2, 8000, 64)), 0, 0, 8000, 64),
        (3, "audio", bytearray(codecs.encode_wav(8000, np.arange(64, dtype=np.int16))), 0, 0, 8000, 64),
    ]
    table = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta_w int, meta_h int, meta_sr int, meta_n int",
    )
    verdict = M.media_validate(table)
    clean = table.join(verdict.filter("valid").select("media_id"), "media_id", "left_semi")
    img = M.image_features(clean, decode=codecs.decode_image_auto).collect()
    aud = M.audio_features(clean, decode=codecs.decode_audio_auto).collect()
    assert {r["media_id"] for r in img} == {0, 1}
    assert {r["media_id"] for r in aud} == {2, 3}
