"""From-scratch RIFF/WAVE PCM codec (public format, no audio libs).

Same honesty contract as :mod:`imagecodec`: a real container parse of
the bytes on disk — WAV is uncompressed PCM, so unlike MP3/AAC the full
sample decode is a header walk + a numpy frombuffer. Scope: RIFF/WAVE,
``fmt `` audio format 1 (integer PCM), 8/16-bit, any channel count.
Compressed formats raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, dict]:
    """WAV bytes -> (int16 samples, meta). Mono returns shape (n,),
    multi-channel (n, ch). 8-bit PCM (unsigned) is centered and widened
    to int16 so the dtype contract is uniform."""
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV (missing fmt or data chunk)")
    audio_format, channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"WAV audio format {audio_format} (only PCM=1)")
    if bits == 16:
        pcm = np.frombuffer(data, dtype="<i2").astype(np.int16)
    elif bits == 8:
        pcm = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise NotImplementedError(f"WAV bit depth {bits} (only 8/16)")
    if channels > 1:
        pcm = pcm[: (len(pcm) // channels) * channels].reshape(-1, channels)
    meta = {
        "sample_rate": int(sample_rate),
        "n_samples": int(pcm.shape[0]),
        "channels": int(channels),
        "format": "wav",
    }
    return pcm, meta


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 (n,) or (n, ch) -> WAV bytes (PCM 16-bit LE)."""
    a = np.asarray(pcm, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
