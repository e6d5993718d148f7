"""Real-codec plug-ins for the media operator seam (VERDICT r4 item 5).

The media operators (:mod:`pydriosm_spark.multimodal.media`) take decode /
encode callables; this module provides AUTO-DISPATCHING callables that
route each payload by its magic bytes:

* ``FIMG`` / ``FAUD`` / ``FVID``  -> the documented fake-codec container
  (what the deterministic test/bench tables carry);
* PNG (``\\x89PNG``)              -> PIL when importable, else a
  from-scratch stdlib decoder (zlib inflate + PNG un-filtering) so the
  real-codec path runs even in codec-less sandboxes;
* JPEG (``\\xff\\xd8``) and other raster formats -> PIL (ImportError
  with a clear message when absent);
* WAV (``RIFF..WAVE``)            -> stdlib ``wave`` (16-bit PCM);
* video containers                -> pyav when importable (guarded).

Contract is the seam's numpy contract: images decode to ``(h, w, 3)``
uint8 (grayscale replicated, alpha dropped — PIL ``convert("RGB")``
semantics for the formats we parse ourselves), audio to ``(sample_rate,
int16 ndarray)``, video to ``(n_frames, h, w)`` uint8.

Usage::

    from pydriosm_spark.multimodal import codecs, media
    feats = media.image_features(df, decode=codecs.decode_image_auto)

The registry/bench queries keep the fake-codec defaults (cross-engine
deterministic oracles); these callables are the production on-ramp for
real lakes.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

from pydriosm_spark.multimodal.media import (
    AUD_MAGIC,
    IMG_MAGIC,
    VID_MAGIC,
    decode_audio_default,
    decode_image_default,
    decode_video_default,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8\xff"

try:  # optional; absent in this sandbox
    from PIL import Image as _PILImage  # type: ignore
except Exception:  # pragma: no cover - import guard
    _PILImage = None

try:  # optional; absent in this sandbox
    import av as _pyav  # type: ignore
except Exception:  # pragma: no cover - import guard
    _pyav = None


# ---------------------------------------------------------------------------
# from-scratch PNG (stdlib zlib only): 8-bit gray / gray+alpha / RGB /
# RGBA, non-interlaced — the common web/training-data cases.  PIL is the
# production decoder when importable; this keeps the real-codec path
# testable without it.
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 (alpha dropped, gray replicated)."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG byte string")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace}); install PIL for full coverage"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if ftype == 0:  # None
            rec = line.copy()
        elif ftype == 2:  # Up
            rec = line + prev
        else:  # Sub / Average / Paeth need the left neighbor: sequential
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                rec[i] = (int(line[i]) + pred) & 0xFF
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:  # gray + alpha: replicate gray, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA minus alpha


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (filter 0 rows, one zlib stream)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(rows))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV via stdlib wave (16-bit PCM; first channel)
# ---------------------------------------------------------------------------

def decode_wav(buf: bytes) -> tuple:
    """WAV bytes -> (sample_rate, int16 PCM ndarray of channel 0)."""
    import wave

    with wave.open(io.BytesIO(buf), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        sr = f.getframerate()
        nch = f.getnchannels()
        pcm = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    return sr, pcm[::nch] if nch > 1 else pcm


def encode_wav(sr: int, pcm: np.ndarray) -> bytes:
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.asarray(pcm, dtype=np.int16).tobytes())
    return bio.getvalue()


# ---------------------------------------------------------------------------
# auto-dispatch seam callables
# ---------------------------------------------------------------------------

def decode_image_auto(buf: bytes) -> np.ndarray:
    """Magic-byte dispatch: FIMG -> fake codec; PNG -> PIL else the
    stdlib decoder above; anything else -> PIL (guarded)."""
    buf = bytes(buf)
    if buf[:4] == IMG_MAGIC:
        return decode_image_default(buf)
    if _PILImage is not None:
        with _PILImage.open(io.BytesIO(buf)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    if buf[:8] == PNG_SIG:
        return decode_png(buf)
    head = buf[:4].hex()
    raise ImportError(
        f"payload with magic 0x{head} needs PIL (pip install pillow); "
        "only FIMG and PNG decode without it"
    )


def decode_audio_auto(buf: bytes) -> tuple:
    """FAUD -> fake codec; RIFF/WAVE -> stdlib wave; else guarded."""
    buf = bytes(buf)
    if buf[:4] == AUD_MAGIC:
        return decode_audio_default(buf)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return decode_wav(buf)
    raise ValueError(
        f"payload with magic {buf[:4]!r} is neither FAUD nor WAV; "
        "plug a librosa/soundfile-backed callable into the decode seam"
    )


def decode_video_auto(buf: bytes) -> np.ndarray:
    """FVID -> fake codec; real containers -> pyav (guarded): frames
    converted to grayscale uint8 (n_frames, h, w)."""
    buf = bytes(buf)
    if buf[:4] == VID_MAGIC:
        return decode_video_default(buf)
    if _pyav is None:
        raise ImportError(
            "real video containers need pyav (pip install av); "
            "only FVID decodes without it"
        )
    with _pyav.open(io.BytesIO(buf)) as container:  # pragma: no cover
        frames = [
            np.asarray(f.to_image().convert("L"), dtype=np.uint8)
            for f in container.decode(video=0)
        ]
    return np.stack(frames)
