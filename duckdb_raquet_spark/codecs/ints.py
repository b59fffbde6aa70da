"""Integer codecs: PLAIN, frame-of-reference+bitpack, DELTA, RLE.

All arithmetic is modular uint64 so round-trips are exact for the full
int64 domain (the analog of the reference's clamp/round-exact integer
encode, /root/reference/src/raster/band_encoder.cpp:48-63, but lossless:
decode(encode(x)) == x bit-for-bit for every int64 input).

Vectorized numpy throughout; Python loops only over runs-of-runs
metadata, never over values.
"""

from __future__ import annotations

import numpy as np

from . import bitpack, ids
from .util import read_svarint, read_uvarint, write_svarint, write_uvarint

_U64 = np.uint64


def _to_u64(values: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(values, dtype=np.int64)
    return v.view(_U64)


def _zigzag_vec(d: np.ndarray) -> np.ndarray:
    """Vectorized zigzag on int64 bit patterns (bijective, exact)."""
    s = d.view(np.int64)
    return ((s << np.int64(1)) ^ (s >> np.int64(63))).view(_U64)


def _unzigzag_vec(u: np.ndarray) -> np.ndarray:
    u = u.astype(_U64, copy=False)
    return (u >> _U64(1)) ^ (~(u & _U64(1)) + _U64(1))  # modular -(u&1)


# ------------------------------------------------------------- PLAIN ----


def encode_plain(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    out = bytearray([ids.INT_PLAIN])
    write_uvarint(out, len(v))
    out += v.astype("<i8").tobytes()
    return bytes(out)


def _decode_plain(buf: bytes, pos: int) -> np.ndarray:
    n, pos = read_uvarint(buf, pos)
    return np.frombuffer(buf, dtype="<i8", count=n, offset=pos).astype(np.int64)


# --------------------------------------------------------------- FOR ----


def _for_body(u: np.ndarray) -> tuple[int, int, np.ndarray]:
    """(ref, width, shifted) for unsigned-modular frame of reference."""
    if len(u) == 0:
        return 0, 0, u
    ref = int(u.view(np.int64).min())  # signed min <= all values
    shifted = u - _U64(ref & 0xFFFFFFFFFFFFFFFF)  # modular, exact
    width = bitpack.width_for(int(shifted.max()))
    return ref, width, shifted


def encode_for(values: np.ndarray) -> bytes:
    u = _to_u64(values)
    ref, width, shifted = _for_body(u)
    out = bytearray([ids.INT_FOR])
    write_uvarint(out, len(u))
    write_svarint(out, ref)
    out.append(width)
    out += bitpack.pack(shifted, width)
    return bytes(out)


def _decode_for(buf: bytes, pos: int) -> np.ndarray:
    n, pos = read_uvarint(buf, pos)
    ref, pos = read_svarint(buf, pos)
    width = buf[pos]
    pos += 1
    u = bitpack.unpack(buf[pos:], n, width)
    return (u + _U64(ref & 0xFFFFFFFFFFFFFFFF)).view(np.int64).astype(np.int64)


# ------------------------------------------------------------- DELTA ----


def encode_delta(values: np.ndarray) -> bytes:
    """first + zigzag(deltas) FoR+bitpacked — ideal for sorted timestamps.

    The webtext analog of small per-domain crawl-time deltas; exact for
    any int64 sequence via modular arithmetic.
    """
    u = _to_u64(values)
    out = bytearray([ids.INT_DELTA])
    write_uvarint(out, len(u))
    if len(u) == 0:
        return bytes(out)
    write_svarint(out, int(u[:1].view(np.int64)[0]))
    if len(u) > 1:
        deltas = u[1:] - u[:-1]  # modular
        zz = _zigzag_vec(deltas)
        ref, width, shifted = _for_body(zz)
        write_svarint(out, ref)
        out.append(width)
        out += bitpack.pack(shifted, width)
    return bytes(out)


def _decode_delta(buf: bytes, pos: int) -> np.ndarray:
    n, pos = read_uvarint(buf, pos)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    first, pos = read_svarint(buf, pos)
    out = np.empty(n, dtype=_U64)
    out[0] = _U64(first & 0xFFFFFFFFFFFFFFFF)
    if n > 1:
        ref, pos = read_svarint(buf, pos)
        width = buf[pos]
        pos += 1
        zz = bitpack.unpack(buf[pos:], n - 1, width) + _U64(ref & 0xFFFFFFFFFFFFFFFF)
        deltas = _unzigzag_vec(zz)
        out[1:] = deltas
        out = np.cumsum(out, dtype=_U64)  # modular cumsum restores values
    return out.view(np.int64).astype(np.int64)


# --------------------------------------------------------------- RLE ----


def run_starts(values: np.ndarray) -> np.ndarray:
    """Indices where a new run begins (vectorized np.diff run finding —
    the block-local analog of a Window over pos, see SURVEY.md §2.5)."""
    v = np.asarray(values)
    if len(v) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))


def encode_rle(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    starts = run_starts(v)
    run_values = v[starts]
    run_lengths = np.diff(np.concatenate((starts, [len(v)])))
    out = bytearray([ids.INT_RLE])
    write_uvarint(out, len(v))
    vp = encode_for(run_values)
    write_uvarint(out, len(vp))
    out += vp
    out += encode_for(run_lengths)
    return bytes(out)


def _decode_rle(buf: bytes, pos: int) -> np.ndarray:
    n, pos = read_uvarint(buf, pos)
    vlen, pos = read_uvarint(buf, pos)
    run_values = decode_ints(buf[pos : pos + vlen])
    run_lengths = decode_ints(buf[pos + vlen :])
    out = np.repeat(run_values, run_lengths)
    assert len(out) == n, f"RLE decode length {len(out)} != {n}"
    return out


# ------------------------------------------------------------ dispatch ----


def encode_int_best(values: np.ndarray, *, try_rle: bool | None = None) -> bytes:
    """Smallest of the applicable integer encodings (exact sizes).

    The per-block, per-column analog of the reference's codec selection —
    but measured, not configured. RLE is only attempted when the run
    profile suggests it (cheap np.diff probe), mirroring the sampled-stats
    selection idea of band_stats_v01.cpp.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    cands = [encode_for(v)]
    if len(v) > 1:
        cands.append(encode_delta(v))
        if try_rle is None:
            try_rle = len(run_starts(v)) <= len(v) // 2
        if try_rle:
            cands.append(encode_rle(v))
    cands.append(encode_plain(v))
    return min(cands, key=len)


def decode_ints(buf: bytes) -> np.ndarray:
    tag = buf[0]
    if tag == ids.INT_PLAIN:
        return _decode_plain(buf, 1)
    if tag == ids.INT_FOR:
        return _decode_for(buf, 1)
    if tag == ids.INT_DELTA:
        return _decode_delta(buf, 1)
    if tag == ids.INT_RLE:
        return _decode_rle(buf, 1)
    raise ValueError(f"not an integer payload: tag 0x{tag:02x}")
