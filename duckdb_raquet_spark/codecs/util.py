"""Low-level byte helpers shared by all codecs: varints, zigzag, bitmaps.

Payload convention (mirrors the reference's "every BLOB is a
self-describing compressed chunk" rule — its codec dispatch reads a
compression id recorded next to the payload,
/root/reference/src/raster/band_decoder.cpp:300-373): every encoded
payload starts with a 1-byte codec id followed by a codec-specific body;
nested payloads are themselves tagged, so decode is a recursive dispatch.
"""

from __future__ import annotations

import numpy as np


def write_uvarint(out: bytearray, v: int) -> None:
    v = int(v)
    if v < 0:
        raise ValueError("uvarint requires non-negative")
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def read_uvarint(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def zigzag(v: int) -> int:
    v = int(v)
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_svarint(out: bytearray, v: int) -> None:
    write_uvarint(out, zigzag(v))


def read_svarint(buf, pos: int) -> tuple[int, int]:
    u, pos = read_uvarint(buf, pos)
    return unzigzag(u), pos


def pack_bitmap(valid: np.ndarray) -> bytes:
    """bool array -> LSB-first packed bitmap (Arrow validity layout)."""
    return np.packbits(valid.astype(np.uint8), bitorder="little").tobytes()


def unpack_bitmap(buf: bytes, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little")
    return bits[:n].astype(bool)
