"""BYTE_STREAM_SPLIT codec for doubles (byte-plane transpose).

Parquet's BYTE_STREAM_SPLIT encoding (parquet-format Encodings.md) for
FLOAT/DOUBLE: scatter the k-th byte of every value into the k-th of 8
contiguous planes, then hand the transposed stream to a general-purpose
compressor. Slowly-varying doubles (sensor series, running scores,
monotone timestamps cast to double) share their sign/exponent/high-
mantissa bytes, so planes 5..7 collapse to near-constant runs that
zlib/zstd squeeze far below what they manage on interleaved IEEE
records — the same effect Gorilla/Chimp (Pelkonen et al. 2015, VLDB;
Liakos et al. 2022, VLDB) chase with per-value XOR bit windows, but
expressible as ONE numpy transpose instead of a per-value bit loop.

Complements codecs/alp.py: ALP wins on decimals-in-disguise (maps to
small integers), BSS wins on full-precision smooth series where no
(e, f) pair round-trips. The selector keeps the smallest of raw-bits /
ALP / BSS, so adding the candidate can only ever shrink a block. The
reference has no floating-point codec at all — its doubles ride gzip
(/root/reference/src/raster/band_encoder.cpp:190-203).

Decode contract: bit-identical doubles (the transpose is a bijection
on bytes; NaN payloads, -0.0 and infinities are untouched).

Payload layout (tag ids.BSS_DOUBLE):
    [tag][uvarint n][u8 comp: 0=raw 1=zlib 2=zstd][compressed planes]
"""

from __future__ import annotations

import zlib

import numpy as np

from . import ids
from .util import read_uvarint, write_uvarint

_RAW, _ZLIB, _ZSTD = 0, 1, 2


def _zstd():
    import pyarrow as pa

    return pa.Codec("zstd", 3)


def encode(vals: np.ndarray, zlib_level: int = 6) -> bytes:
    """float64 vals -> BSS payload (always succeeds; caller keeps the
    smallest candidate)."""
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    n = len(vals)
    planes = vals.view(np.uint8).reshape(n, 8).T.tobytes() if n else b""
    best = (_RAW, planes)
    z = zlib.compress(planes, zlib_level)
    if len(z) < len(best[1]):
        best = (_ZLIB, z)
    s = _zstd().compress(planes, asbytes=True)
    if len(s) < len(best[1]):
        best = (_ZSTD, s)
    out = bytearray([ids.BSS_DOUBLE])
    write_uvarint(out, n)
    out.append(best[0])
    out += best[1]
    return bytes(out)


def decode(buf: bytes) -> np.ndarray:
    """BSS payload -> float64 bit patterns as int64 (the engine's
    bijective double view, selector.py KIND_DOUBLE)."""
    pos = 1
    n, pos = read_uvarint(buf, pos)
    comp = buf[pos]
    pos += 1
    body = buf[pos:]
    if comp == _ZLIB:
        body = zlib.decompress(body)
    elif comp == _ZSTD:
        body = _zstd().decompress(bytes(body), 8 * n, asbytes=True)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    planes = np.frombuffer(body, dtype=np.uint8, count=8 * n).reshape(8, n)
    out = np.ascontiguousarray(planes.T).view(np.float64).reshape(n)
    return np.ascontiguousarray(out).view(np.int64)
