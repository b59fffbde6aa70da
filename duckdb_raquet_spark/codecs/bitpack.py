"""Vectorized bit-packing of unsigned integers (numpy, no Python loops
over values — only over bit positions, bounded by 64).

The Spark-side analog of the reference widening every stored dtype to
double on decode (/root/reference/src/include/band_decoder.hpp:116-175):
we store at the minimal width and widen to int64 on decode.
"""

from __future__ import annotations

import numpy as np


def width_for(max_value: int) -> int:
    """Bits needed for values in [0, max_value]."""
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width``-bit little-endian bit stream."""
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if n == 0:
        return b""
    # n x width bit matrix, LSB-first per value, then pack the flat stream
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack` — returns uint64 array of length n."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little")
    bits = bits[: n * width].reshape(n, width).astype(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for i in range(width):
        out |= bits[:, i] << np.uint64(i)
    return out
