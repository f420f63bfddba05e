"""Self-contained video writer: Motion-JPEG in an AVI (RIFF) container.

The reference writes its traversal/planning videos as mp4 via
torchvision→ffmpeg (reference test.py:15-16). This image has no ffmpeg,
and H.264 needs one — but the AVI container + per-frame JPEG needs only
a JPEG encoder (PIL, present) and ~100 lines of RIFF bookkeeping. MJPEG
AVI plays in every mainstream player (VLC, browsers via conversion,
QuickTime), so the video artifact family survives without the GIF
quality/size compromise. Format reference: the public AVI RIFF spec
(MainAVIHeader / AVIStreamHeader / BITMAPINFOHEADER layouts).
"""

from __future__ import annotations

import io
import struct

import numpy as np

__all__ = ["write_mjpeg_avi"]


def _jpeg_bytes(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_mjpeg_avi(path: str, frames: np.ndarray, fps: float = 4.0,
                    quality: int = 90) -> None:
    """frames: [T, H, W, 3] uint8 (RGB). Writes a standard
    AVI 1.0 file with an idx1 index (every frame a keyframe)."""
    frames = np.asarray(frames)
    assert frames.dtype == np.uint8 and frames.ndim == 4, \
        (frames.dtype, frames.shape)
    t, h, w, _ = frames.shape
    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    # rate/scale pair: fps = rate / scale, kept integral for fractional fps
    scale = 1000
    rate = int(round(fps * scale))

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(round(1e6 / fps)),          # dwMicroSecPerFrame
        int(max_size * fps),            # dwMaxBytesPerSec
        0,                              # dwPaddingGranularity
        0x10 | 0x100,                   # AVIF_HASINDEX | AVIF_ISINTERLEAVED
        t, 0, 1,                        # frames, initial frames, streams
        max_size, w, h, 0, 0, 0, 0)     # buffer, dims, reserved[4]
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0, 0, 0, 0,                     # flags, priority, language, initial
        scale, rate, 0, t,              # scale, rate, start, length
        max_size, 10000, 0,             # buffer, quality, sample size
        0, 0, np.int16(w), np.int16(h))  # rcFrame
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG",       # BITMAPINFOHEADER
        w * h * 3, 0, 0, 0, 0)

    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl",
                         _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_payload = b"movi"
    index = b""
    offset = 4                          # from start of 'movi' list payload
    for j in jpegs:
        frame_chunk = _chunk(b"00dc", j)
        movi_payload += frame_chunk
        index += struct.pack("<4sIII", b"00dc", 0x10, offset, len(j))
        offset += len(frame_chunk)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", index)

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload))
                + riff_payload)
