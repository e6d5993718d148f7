"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Large-scale training pipelines carry media as binary columns; the engine
must provide decode / feature-extract / resize / frame-sample operators
with real Spark plumbing — schema, partitioning, Arrow batch shape —
regardless of which codec library is present.  This container has no
image/audio libs, so payloads use a documented deterministic container
format ("fake codec") and the decode kernels parse those bytes for real:

    image:  b"FIMG" | w:int32 | h:int32 | w*h*3 bytes (RGB, row-major)
    audio:  b"FAUD" | sample_rate:int32 | n:int32 | n int16 PCM samples
    video:  b"FVID" | w:int32 | h:int32 | n_frames:int32 | frames of w*h
            grayscale bytes

Payload bytes are generated from md5 streams keyed by media_id —
deterministic across engines, runs, and parallelism.  Swapping in PIL /
librosa / pyav later only replaces the numpy body of each kernel; the
DataFrame surface (operator signatures and output schemas) is final.

All kernels run in ``mapInPandas`` over Arrow batches; per-row numpy
``frombuffer`` views — no per-element Python.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FIMG", b"FAUD", b"FVID"


# ---------------------------------------------------------------------------
# deterministic payload synthesis (driver/test side)
# ---------------------------------------------------------------------------

def _stream_bytes(key: str, n: int) -> bytes:
    """n pseudo-random bytes from an md5 counter stream (deterministic)."""
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.md5(f"{key}:{c}".encode()).digest()
        c += 1
    return bytes(out[:n])


def make_image(media_id: int, w: int, h: int) -> bytes:
    return (
        IMG_MAGIC
        + np.int32(w).tobytes()
        + np.int32(h).tobytes()
        + _stream_bytes(f"img{media_id}", w * h * 3)
    )


def make_audio(media_id: int, sr: int, n: int) -> bytes:
    pcm = np.frombuffer(_stream_bytes(f"aud{media_id}", n * 2), dtype=np.int16)
    return AUD_MAGIC + np.int32(sr).tobytes() + np.int32(n).tobytes() + pcm.tobytes()


def make_video(media_id: int, w: int, h: int, n_frames: int) -> bytes:
    return (
        VID_MAGIC
        + np.int32(w).tobytes()
        + np.int32(h).tobytes()
        + np.int32(n_frames).tobytes()
        + _stream_bytes(f"vid{media_id}", w * h * n_frames)
    )


def media_table(spark: SparkSession, sf_dir: str, kinds: tuple | None = None) -> DataFrame:
    """Synthesize the media table from documents (deterministic): one
    media object per doc, kind cycling image/audio/video, dimensions
    derived from doc_id arithmetic.

    ``kinds`` (r6, guide §4.1 column/row pruning at the opaque boundary):
    Catalyst cannot push a ``kind`` filter below the generation
    ``mapInPandas``, so a single-kind consumer (the feature kernels)
    passes the kinds it needs and the generator skips synthesizing the
    rest — the table contents for the surviving kinds are identical."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    schema = "media_id long, kind string, payload binary, meta_w int, meta_h int, meta_sr int, meta_n int"
    want = kinds if kinds is not None else ("image", "audio", "video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w_img, w_aud, w_vid = ("image" in want), ("audio" in want), ("video" in want)
        for b in batches:
            rows = []
            for i in b["doc_id"].to_numpy():
                i = int(i)
                k = i % 3
                if k == 0:
                    if w_img:
                        w, h = 8 + i % 9, 6 + i % 7
                        rows.append((i, "image", make_image(i, w, h), w, h, 0, 0))
                elif k == 1:
                    if w_aud:
                        sr, n = 8000, 256 + (i % 128)
                        rows.append((i, "audio", make_audio(i, sr, n), 0, 0, sr, n))
                elif w_vid:
                    w, h, nf = 8, 6, 4 + i % 5
                    rows.append((i, "video", make_video(i, w, h, nf), w, h, 0, nf))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "meta_w", "meta_h", "meta_sr", "meta_n"],
            )

    return docs.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# codec seam
# ---------------------------------------------------------------------------
#
# Every operator below takes an optional ``decode`` (and, for resize, an
# ``encode``) callable — the ONLY codec-specific code.  The defaults
# parse the documented fake-codec container; swapping in PIL / librosa /
# pyav means passing (or defaulting) a different callable with the same
# numpy contract, with zero change to the DataFrame surface.  The seam
# is proven by tests/test_multimodal.py, which runs the full pipeline
# with an injected alternate container decoder (VERDICT r4 item 7).

def decode_image_default(buf: bytes) -> np.ndarray:
    """FIMG payload -> (h, w, 3) uint8 pixel array."""
    assert buf[:4] == IMG_MAGIC, "not an image payload"
    w = int(np.frombuffer(buf[4:8], dtype=np.int32)[0])
    h = int(np.frombuffer(buf[8:12], dtype=np.int32)[0])
    return np.frombuffer(buf[12 : 12 + w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def encode_image_default(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> FIMG payload."""
    h, w = px.shape[:2]
    return IMG_MAGIC + np.int32(w).tobytes() + np.int32(h).tobytes() + px.tobytes()


def decode_audio_default(buf: bytes) -> tuple:
    """FAUD payload -> (sample_rate, int16 PCM ndarray)."""
    assert buf[:4] == AUD_MAGIC
    sr = int(np.frombuffer(buf[4:8], dtype=np.int32)[0])
    n = int(np.frombuffer(buf[8:12], dtype=np.int32)[0])
    return sr, np.frombuffer(buf[12 : 12 + n * 2], dtype=np.int16)


def decode_video_default(buf: bytes) -> np.ndarray:
    """FVID payload -> (n_frames, h, w) uint8 grayscale frames."""
    assert buf[:4] == VID_MAGIC
    w = int(np.frombuffer(buf[4:8], dtype=np.int32)[0])
    h = int(np.frombuffer(buf[8:12], dtype=np.int32)[0])
    nf = int(np.frombuffer(buf[12:16], dtype=np.int32)[0])
    return np.frombuffer(buf[16 : 16 + w * h * nf], dtype=np.uint8).reshape(nf, h, w)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def image_features(media: DataFrame, decode=decode_image_default) -> DataFrame:
    """Decode images -> (media_id, width, height, mean_r, mean_g, mean_b)
    with channel means scaled to integer e4 (bit-stable)."""
    schema = "media_id long, width int, height int, mean_r_e4 long, mean_g_e4 long, mean_b_e4 long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                px = decode(bytes(payload))
                h, w = px.shape[:2]
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                means_e4 = (sums * 10000) // (w * h)
                out.append((int(mid), w, h, *[int(x) for x in means_e4]))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_r_e4", "mean_g_e4", "mean_b_e4"]
            )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema
    )


def image_resize(
    media: DataFrame,
    factor: int = 2,
    decode=decode_image_default,
    encode=encode_image_default,
) -> DataFrame:
    """Block-mean downsample by ``factor`` -> re-encoded payload + dims."""
    schema = "media_id long, width int, height int, payload binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                px = decode(bytes(payload))
                h, w = px.shape[:2]
                nw, nh = max(1, w // factor), max(1, h // factor)
                px = px[: nh * factor, : nw * factor]
                small = (
                    px.reshape(nh, factor, nw, factor, 3).astype(np.uint32).mean(axis=(1, 3))
                ).astype(np.uint8)
                out.append((int(mid), nw, nh, encode(small)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "payload"])

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema
    )


def image_features_resize(
    media: DataFrame,
    factor: int = 2,
    decode=decode_image_default,
    encode=encode_image_default,
) -> DataFrame:
    """Features AND block-mean resize in ONE decode pass (r6): the merged
    media_image query previously ran two mapInPandas kernels over two
    independent generations of the same source and joined them on
    media_id — one decode now feeds both outputs and the join disappears.
    ``resized_md5hex`` is the md5 of the lowercase hex of the re-encoded
    payload, byte-identical to the SQL ``md5(lower(hex(payload)))`` the
    two-pass shape computed.  Arithmetic is exactly image_features +
    image_resize (both remain public and individually tested)."""
    schema = (
        "media_id long, width int, height int, mean_r_e4 long, mean_g_e4 long, "
        "mean_b_e4 long, resized_width int, resized_height int, resized_md5hex string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                px = decode(bytes(payload))
                h, w = px.shape[:2]
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                means_e4 = (sums * 10000) // (w * h)
                nw, nh = max(1, w // factor), max(1, h // factor)
                cut = px[: nh * factor, : nw * factor]
                small = (
                    cut.reshape(nh, factor, nw, factor, 3).astype(np.uint32).mean(axis=(1, 3))
                ).astype(np.uint8)
                digest = hashlib.md5(encode(small).hex().encode()).hexdigest()
                out.append(
                    (int(mid), w, h, *[int(x) for x in means_e4], nw, nh, digest)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "mean_r_e4", "mean_g_e4",
                    "mean_b_e4", "resized_width", "resized_height", "resized_md5hex",
                ],
            )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema
    )


def audio_features(media: DataFrame, decode=decode_audio_default) -> DataFrame:
    """(media_id, sample_rate, n_samples, rms_e4, zero_crossings)."""
    schema = "media_id long, sample_rate int, n_samples int, rms_e4 long, zero_crossings long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                sr, pcm = decode(bytes(payload))
                pcm = pcm.astype(np.int64)
                n = len(pcm)
                rms_e4 = int(np.sqrt((pcm * pcm).mean()) * 10000) // 1
                zc = int(((pcm[:-1] * pcm[1:]) < 0).sum())
                out.append((int(mid), sr, n, rms_e4, zc))
            yield pd.DataFrame(
                out, columns=["media_id", "sample_rate", "n_samples", "rms_e4", "zero_crossings"]
            )

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        kernel, schema
    )


def video_frame_sample(
    media: DataFrame, every: int = 2, decode=decode_video_default
) -> DataFrame:
    """Sample every k-th frame -> one row per sampled frame with the frame
    bytes re-wrapped as a grayscale FIMG payload (exploded fan-out)."""
    schema = "media_id long, frame_idx int, width int, height int, frame_mean_e4 long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                frames = decode(bytes(payload))
                nf, h, w = frames.shape
                for fi in range(0, nf, every):
                    fm = int(frames[fi].astype(np.int64).sum() * 10000 // (w * h))
                    out.append((int(mid), fi, w, h, fm))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "width", "height", "frame_mean_e4"]
            )

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        kernel, schema
    )


#: real-container signatures the auto codec seam (codecs.py) decodes;
#: media_validate accepts them so validate->quarantine->decode is one
#: consistent contract — a real PNG/WAV must not be quarantined by the
#: very job whose decode step would have handled it
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SIG = b"\xff\xd8\xff"


def media_validate(media: DataFrame) -> DataFrame:
    """Container validation / quarantine: (media_id, kind, valid, reason)
    from the payload BYTES (magic + header-vs-actual length), one
    vectorized pass.  A 10^12-object ingest cannot crash on a corrupt
    blob — invalid rows route to quarantine, valid ones continue.
    Reasons: 'too_short' (no room for magic+header), 'bad_magic',
    'truncated' (payload shorter than the header promises), NULL (valid;
    trailing bytes are tolerated, matching lenient container readers).

    Accepts every container the AUTO codec seam decodes: the fake
    FIMG/FAUD/FVID containers (full header-vs-length check), real PNG
    (signature + room for IHDR) and RIFF/WAVE (signature + header room)
    always, and JPEG exactly when PIL is importable on the executor —
    mirroring ``codecs.decode_image_auto``'s dispatch, so a payload
    this pass declares valid is one the decode stage can actually open
    (deep validation stays decode-time)."""
    schema = "media_id long, kind string, valid boolean, reason string"
    header = {"image": 12, "audio": 12, "video": 16}
    magic = {"image": IMG_MAGIC, "audio": AUD_MAGIC, "video": VID_MAGIC}

    def body_len(kind: str, buf: bytes) -> int:
        a = np.frombuffer(buf[4:16].ljust(12, b"\0"), dtype=np.int32)
        if kind == "image":
            return int(a[0]) * int(a[1]) * 3
        if kind == "audio":
            return int(a[1]) * 2
        return int(a[0]) * int(a[1]) * int(a[2])

    def real_container(kind: str, buf: bytes, has_pil: bool):
        """(valid, reason) for real-codec containers, None if not one."""
        if kind == "image" and buf[:8] == _PNG_SIG:
            # signature + IHDR chunk (len+type+13 data+crc) = 33 bytes
            return (True, None) if len(buf) >= 33 else (False, "truncated")
        if kind == "image" and buf[:3] == _JPEG_SIG and has_pil:
            return (True, None)
        if kind == "audio" and buf[:4] == b"RIFF":
            if buf[8:12] != b"WAVE":
                return (False, "bad_magic")
            return (True, None) if len(buf) >= 44 else (False, "truncated")
        return None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pydriosm_spark.multimodal import codecs as _codecs

        has_pil = _codecs._PILImage is not None
        for b in batches:
            out = []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                buf = bytes(payload)
                real = real_container(kind, buf, has_pil)
                if real is not None:
                    out.append((int(mid), kind, *real))
                    continue
                hl = header[kind]
                if len(buf) < hl:
                    out.append((int(mid), kind, False, "too_short"))
                elif buf[:4] != magic[kind]:
                    out.append((int(mid), kind, False, "bad_magic"))
                elif len(buf) < hl + body_len(kind, buf):
                    out.append((int(mid), kind, False, "truncated"))
                else:
                    out.append((int(mid), kind, True, None))
            yield pd.DataFrame(out, columns=["media_id", "kind", "valid", "reason"])

    return media.select("media_id", "kind", "payload").mapInPandas(kernel, schema)
