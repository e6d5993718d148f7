"""Real-codec plug-ins for the media seam (VERDICT r4 item 5): PNG
(PIL when importable, from-scratch stdlib decoder otherwise) and WAV
(stdlib) payloads run through the SAME operators as the fake-codec
container, auto-dispatched by magic bytes."""

import numpy as np
import pytest

from pydriosm_spark.multimodal import codecs, media


def _rng_px(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_and_auto_dispatch():
    px = _rng_px(13, 9)
    buf = codecs.encode_png(px)
    assert buf[:8] == codecs.PNG_SIG
    assert np.array_equal(codecs.decode_png(buf), px)
    assert np.array_equal(codecs.decode_image_auto(buf), px)
    # FIMG still routes to the fake codec
    fimg = media.make_image(42, 8, 6)
    assert codecs.decode_image_auto(fimg).shape == (6, 8, 3)


def test_png_all_filter_types_decode():
    """Hand-build a PNG whose rows use filters 0..4 (our encoder only
    emits 0); the decoder must invert Sub/Up/Average/Paeth exactly."""
    import struct
    import zlib

    px = _rng_px(5, 7, seed=3)
    h, w = px.shape[:2]
    ch, stride = 3, w * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            a = int(line[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ftype]
            raw.append((int(line[i]) - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(buf), px)


def test_png_gray_and_rgba_variants():
    import struct
    import zlib

    # grayscale (color 0) replicates to 3 channels
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    rows = b"".join(b"\x00" + g[y].tobytes() for y in range(3))
    buf = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
        + codecs._png_chunk(b"IDAT", zlib.compress(rows))
        + codecs._png_chunk(b"IEND", b"")
    )
    got = codecs.decode_png(buf)
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))
    # RGBA (color 6) drops alpha
    px = _rng_px(3, 4, seed=5)
    rgba = np.dstack([px, np.full((3, 4), 200, dtype=np.uint8)])
    rows = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    buf = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0))
        + codecs._png_chunk(b"IDAT", zlib.compress(rows))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(buf), px)


@pytest.mark.skipif(codecs._PILImage is None, reason="PIL not installed")
def test_png_matches_pil():  # pragma: no cover - sandbox has no PIL
    px = _rng_px(11, 17)
    buf = codecs.encode_png(px)
    import io

    with codecs._PILImage.open(io.BytesIO(buf)) as im:
        want = np.asarray(im.convert("RGB"), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(buf), want)


def test_image_features_on_real_png_payloads(spark):
    """image_features over REAL PNG byte strings (the production decode
    seam), mixed in one table with fake-codec FIMG rows."""
    pxs = {1: _rng_px(6, 8, seed=1), 2: _rng_px(4, 4, seed=2)}
    rows = [(mid, "image", bytearray(codecs.encode_png(px))) for mid, px in pxs.items()]
    rows.append((3, "image", bytearray(media.make_image(3, 8, 6))))
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r["media_id"]: r.asDict()
        for r in media.image_features(df, decode=codecs.decode_image_auto).collect()
    }
    assert set(got) == {1, 2, 3}
    for mid, px in pxs.items():
        h, w = px.shape[:2]
        sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
        want = (sums * 10000) // (w * h)
        r = got[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert [r["mean_r_e4"], r["mean_g_e4"], r["mean_b_e4"]] == list(want)
    assert got[3]["width"] == 8 and got[3]["height"] == 6


def test_wav_roundtrip_and_audio_features(spark):
    sr, n = 16000, 500
    rng = np.random.RandomState(11)
    pcm = rng.randint(-3000, 3000, size=n).astype(np.int16)
    buf = codecs.encode_wav(sr, pcm)
    got_sr, got_pcm = codecs.decode_wav(buf)
    assert got_sr == sr and np.array_equal(got_pcm, pcm)
    got_sr, got_pcm = codecs.decode_audio_auto(buf)
    assert got_sr == sr and np.array_equal(got_pcm, pcm)
    # FAUD passthrough
    assert codecs.decode_audio_auto(media.make_audio(9, 8000, 64))[0] == 8000

    df = spark.createDataFrame(
        [(1, "audio", bytearray(buf)), (2, "audio", bytearray(media.make_audio(2, 8000, 64)))],
        "media_id long, kind string, payload binary",
    )
    got = {
        r["media_id"]: r.asDict()
        for r in media.audio_features(df, decode=codecs.decode_audio_auto).collect()
    }
    p64 = pcm.astype(np.int64)
    assert got[1]["sample_rate"] == sr and got[1]["n_samples"] == n
    assert got[1]["rms_e4"] == int(np.sqrt((p64 * p64).mean()) * 10000)
    assert got[1]["zero_crossings"] == int(((p64[:-1] * p64[1:]) < 0).sum())
    assert got[2]["sample_rate"] == 8000


def test_video_auto_guard():
    fvid = media.make_video(5, 8, 6, 3)
    assert codecs.decode_video_auto(fvid).shape == (3, 6, 8)
    if codecs._pyav is None:
        with pytest.raises(ImportError, match="pyav"):
            codecs.decode_video_auto(b"\x00\x00\x00\x20ftypisom" + b"\0" * 64)


def test_image_auto_guard_unknown_magic():
    if codecs._PILImage is None:
        with pytest.raises(ImportError, match="PIL"):
            codecs.decode_image_auto(codecs.JPEG_SIG + b"\0" * 32)
