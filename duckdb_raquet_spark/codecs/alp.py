"""ALP-style adaptive lossless floating-point codec (doubles).

Most real-world doubles are decimals in disguise: a price, a sensor
reading, a score printed with a handful of digits. ALP (Afroozeh &
Boncz, "ALP: Adaptive Lossless floating-Point Compression", SIGMOD
2024) exploits that by mapping each double to the INTEGER
``round(d * 10^e / 10^f)`` for a per-vector ``(e, f)`` pair, verifying
per value that the mapping round-trips bit-exactly, and shipping the
integers to the ordinary lightweight integer codecs (FoR + bit-pack
here) — values the mapping cannot represent exactly travel as raw
IEEE-754 exceptions. The engine's pre-existing double path (raw bit
pattern view -> int codecs, selector.py KIND_DOUBLE) stays as the
fallback; the selector keeps whichever payload is smaller, so ALP can
only ever shrink a block.

This is a from-scratch implementation of the published scheme (two
exponent parameters, sampled search, exception patching), not a port:
the reference engine has no floating-point codec at all — its doubles
ride gzip (/root/reference/src/raster/band_encoder.cpp:190-203).

Decode contract: bit-identical doubles. The decode expression
``scaled * 10^f / 10^e`` (float64 ops in exactly that order) is the
SAME expression the encoder verified against, value by value, so any
value whose reconstruction would differ by even one ulp was already
demoted to an exception at encode time.

Payload layout (tag ids.ALP_DOUBLE):
    [tag][uvarint n][u8 e][u8 f]
    [uvarint n_exc][n_exc * uvarint position-delta][n_exc * 8B raw bits]
    [inner tagged int payload of the n scaled integers]
"""

from __future__ import annotations

import numpy as np

from . import ids
from .util import read_uvarint, write_uvarint

# int64-safe magnitude for the scaled integers: float64 can only
# represent integers exactly up to 2^53; stay a bit under it so the
# verify multiply/divide below never sees a rounded integer.
_MAX_SCALED = float(1 << 51)

_MAX_E = 14  # 10^14 < 2^51; larger exponents cannot help under _MAX_SCALED
_MAX_F = 4
_SAMPLE = 64


def _reconstruct(scaled: np.ndarray, e: int, f: int) -> np.ndarray:
    """THE decode expression — float64 ops in this exact order.

    Both powers of ten up to 10^14 are exactly representable in
    float64, so the expression is deterministic IEEE-754 arithmetic on
    every platform; the encoder uses this same function to decide
    exceptions."""
    return (scaled.astype(np.float64) * (10.0 ** f)) / (10.0 ** e)


def _scale_exact(vals: np.ndarray, e: int, f: int):
    """-> (scaled int64, exact bool mask) for candidate pair (e, f)."""
    with np.errstate(invalid="ignore", over="ignore"):
        x = vals * (10.0 ** e) / (10.0 ** f)
        ok = np.isfinite(x) & (np.abs(x) < _MAX_SCALED)
        x = np.where(ok, x, 0.0)
        scaled = np.rint(x).astype(np.int64)
        exact = ok & (
            _reconstruct(scaled, e, f).view(np.int64) == vals.view(np.int64)
        )
    return scaled, exact


def _pick_pair(vals: np.ndarray) -> tuple[int, int]:
    """Sampled (e, f) search: most exact hits wins; ties prefer the
    smaller max |scaled| (tighter FoR width), then the smaller e."""
    n = len(vals)
    if n > _SAMPLE:
        idx = np.linspace(0, n - 1, _SAMPLE).astype(np.int64)
        sample = vals[idx]
    else:
        sample = vals
    best = (-1, float("inf"), 0, 0)  # (-hits, width, e, f) minimized
    best_ef = (0, 0)
    for e in range(_MAX_E + 1):
        for f in range(min(e, _MAX_F) + 1):
            scaled, exact = _scale_exact(sample, e, f)
            hits = int(exact.sum())
            width = float(np.abs(scaled[exact]).max()) if hits else 0.0
            key = (-hits, width, e, f)
            if key < best:
                best = key
                best_ef = (e, f)
    return best_ef


def try_encode(
    vals: np.ndarray, encode_ints, *, max_exc_frac: float = 0.2
) -> bytes | None:
    """Encode float64 ``vals`` as an ALP payload, or None when the data
    is not decimal-like (too many exceptions) and the caller should
    keep its raw-bits fallback. ``encode_ints`` is the integer codec
    entry (selector.encode_int_auto) — injected to keep this module
    free of selector imports."""
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    n = len(vals)
    if n == 0:
        return None
    e, f = _pick_pair(vals)
    scaled, exact = _scale_exact(vals, e, f)
    n_exc = int(n - exact.sum())
    if n_exc > max_exc_frac * n:
        return None
    exc_pos = np.flatnonzero(~exact)
    if n_exc:
        # park exceptions on an in-range filler so they never widen the
        # FoR frame (the paper's trick); their real bits ride alongside
        fill = scaled[exact].min() if n_exc < n else 0
        scaled = scaled.copy()
        scaled[exc_pos] = fill
    out = bytearray([ids.ALP_DOUBLE])
    write_uvarint(out, n)
    out.append(e)
    out.append(f)
    write_uvarint(out, n_exc)
    prev = 0
    for p in exc_pos.tolist():
        write_uvarint(out, p - prev)
        prev = p
    if n_exc:
        out += vals[exc_pos].tobytes()
    out += encode_ints(scaled)
    return bytes(out)


def decode(buf: bytes, decode_any) -> np.ndarray:
    """ALP payload -> float64 bit patterns as int64 (the engine's
    bijective double view, selector.py KIND_DOUBLE). ``decode_any`` is
    the registry's recursive dispatcher (injected: registry imports
    this module)."""
    pos = 1
    n, pos = read_uvarint(buf, pos)
    e = buf[pos]
    f = buf[pos + 1]
    pos += 2
    n_exc, pos = read_uvarint(buf, pos)
    exc_pos = np.empty(n_exc, dtype=np.int64)
    acc = 0
    for i in range(n_exc):
        d, pos = read_uvarint(buf, pos)
        acc += d
        exc_pos[i] = acc
    if n_exc:
        exc_bits = np.frombuffer(buf, dtype=np.float64, count=n_exc, offset=pos)
        pos += 8 * n_exc
    scaled = decode_any(buf[pos:])
    if not isinstance(scaled, np.ndarray):
        raise ValueError("ALP inner payload must be a non-null int payload")
    out = _reconstruct(scaled, e, f)
    if n_exc:
        out[exc_pos] = exc_bits
    return np.ascontiguousarray(out).view(np.int64)
