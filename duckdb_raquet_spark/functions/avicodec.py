"""Minimal AVI (RIFF) container codec for MJPEG video.

The reference pipes every raster format through GDAL
(/root/reference/src/raster/band_decoder.cpp:129-154); this engine's
video leg decodes animated GIF from scratch (imagecodec.py). AVI with
the MJPG fourcc — Motion JPEG, every frame an independent baseline
JPEG — is the second moving-picture container that is hand-rollable,
because the frame payloads are exactly what :mod:`jpegcodec` already
decodes. mp4/webm (H.264/VP9 entropy coding) stay out of scope, same
argument as lossy VP8 in webpcodec.py.

Format (Microsoft "AVI RIFF File Reference", public spec):
    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' 56-byte main header (frame count, dims, stream count)
        LIST 'strl' — 'strh' (fccType 'vids', handler 'MJPG') + 'strf'
          (BITMAPINFOHEADER, biCompression 'MJPG')
      LIST 'movi'
        '00dc' <size> <jpeg bytes>   (one chunk per frame, word-aligned)
      'idx1' index (offset/length per frame chunk)

Chunks are word-aligned: an odd-sized chunk is followed by one pad
byte that is NOT counted in its size field. The decoder is a plain
RIFF walk — it recurses into LISTs inside 'movi' (some muxers wrap
frames in 'rec ' groups) and accepts any '##dc'/'##db' stream chunk.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(
    frames: np.ndarray | list, *, fps: int = 10, quality: int = 90
) -> bytes:
    """(n, H, W) / (n, H, W, 1) grayscale or (n, H, W, 3) RGB uint8
    frames -> MJPEG-in-AVI bytes (each frame an independent baseline
    JPEG from :func:`jpegcodec.encode_jpeg`)."""
    from . import jpegcodec as jc

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[..., None]
    n, h, w = frames.shape[:3]
    if n == 0:
        raise ValueError("need at least one frame")
    payloads = [
        jc.encode_jpeg(frames[k, ..., 0] if frames.shape[3] == 1 else frames[k])
        for k in range(n)
    ]
    max_len = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_len * fps,             # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        n,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_len,                   # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, max(fps, 1), 0, n,
                      max_len, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_items, idx, off = [], [], 4  # offsets count from the 'movi' fourcc
    for p in payloads:
        ck = _chunk(b"00dc", p)
        movi_items.append(ck)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += len(ck)
    movi = _list(b"movi", b"".join(movi_items))
    idx1 = _chunk(b"idx1", b"".join(idx))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    [pos, end); recurses into LIST chunks transparently."""
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            break  # truncated chunk: stop rather than read past the end
        if fourcc == b"LIST":
            yield buf[body:body + 4], body + 4, size - 4
            yield from _walk(buf, body + 4, body + size)
        else:
            yield fourcc, body, size
        pos = body + size + (size % 2)


def decode_avi(payload: bytes) -> tuple[np.ndarray, dict]:
    """MJPEG AVI bytes -> ((n, H, W, C) uint8 frames, metadata).

    Frames must agree on dimensions (MJPEG streams do); non-MJPEG
    video streams (a '00dc' chunk whose body is not a JPEG) raise —
    callers contain that via their on_error mode, the same discipline
    as lossy VP8 in webpcodec.py."""
    from . import jpegcodec as jc

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    n_declared = None
    frames = []
    for fourcc, body, size in _walk(payload, 12, len(payload)):
        if fourcc == b"avih" and size >= 56:
            n_declared = struct.unpack_from("<I", payload, body + 16)[0]
        elif (
            len(fourcc) == 4
            and fourcc[2:4] in (b"dc", b"db")
            and fourcc[:2].isdigit()
            and size > 0
        ):
            arr, _ = jc.decode_jpeg(payload[body:body + size])
            if arr.ndim == 2:
                arr = arr[..., None]
            frames.append(arr)
    if not frames:
        raise ValueError("AVI has no decodable MJPEG frames")
    if len({f.shape for f in frames}) != 1:
        raise ValueError("MJPEG frames disagree on dimensions")
    out = np.stack(frames)
    n, h, w, c = out.shape
    meta = {
        "n_frames": int(n), "width": int(w), "height": int(h),
        "channels": int(c), "format": "avi:mjpeg", "n_bytes": len(payload),
        "n_frames_declared": int(n_declared) if n_declared is not None else None,
    }
    return out, meta
