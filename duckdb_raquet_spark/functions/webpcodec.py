"""From-scratch WebP lossless (VP8L) codec.

No image library ships in this environment, so this implements the
public WebP Lossless Bitstream Specification (RFC 9649 §4; also
https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification)
directly — the same move as the repo's PNG/GIF/JPEG codecs and as the
reference, which links libwebp for its webp band codec
(/root/reference/src/raster/band_encoder.cpp:303-331,
/root/reference/src/raster/band_decoder.cpp:129-154) where we hand-roll.

Decoder scope (the full VP8L feature set):
  * canonical prefix codes, both "simple" and code-length-coded forms;
  * LZ77 backward references incl. the 120-entry 2D neighborhood
    distance-code table and overlapping copies;
  * color cache (hash-indexed recent-pixel dictionary);
  * meta prefix codes (per-tile entropy code selection);
  * all four transforms, inverted in reverse stream order: predictor
    (14 modes, spec border rules), color (signed 3.5 fixed-point
    cross-channel deltas), subtract-green, color-indexing incl.
    sub-byte pixel bundling for palettes <= 16 entries.
Lossy VP8 payloads are rejected with ValueError (header parse still
reports their dimensions); VP8X containers are searched for a VP8L
chunk.

Encoder scope (enough to produce real, spec-valid, compressed files
for fixtures and the multimodal pipeline): literal mode with optional
subtract-green transform, optional color cache, run-length LZ77
(distance-1 copies), and palette (color-indexing) mode with pixel
bundling; per-stream canonical prefix codes (simple where 1-2 symbols,
else full code-length-coded Huffman, length-limited and complete).

Everything here is pure Python + numpy over small web images (the
multimodal layer feeds thumbnails through mapInPandas batch-side), so
clarity wins over micro-optimization — same trade as the GIF LZW and
JPEG Huffman paths.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code read order (RFC 9649 §4.6.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LITERAL = 256
_NUM_LENGTH = 24
_NUM_DIST = 40
_CACHE_MUL = 0x1E35A7BD


def _dist_table() -> list[tuple[int, int]]:
    """The 120-entry (dx, dy) close-neighbor table: all offsets with
    dy in [0,7], dx in [-7,8] strictly above/left-of the current pixel,
    ordered by squared distance, then larger dy, then larger dx — this
    generation reproduces the table listed in RFC 9649 §4.5.2.3."""
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    cands.sort(key=lambda t: (t[0] * t[0] + t[1] * t[1], -t[1], -t[0]))
    assert len(cands) == 120
    return cands


_DIST = _dist_table()


# ----------------------------------------------------------- bit I/O ----


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("d", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.d):
                raise ValueError("vp8l: bitstream truncated")
            self.acc |= self.d[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.d):
                raise ValueError("vp8l: bitstream truncated")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.nbits = 8
        v = self.acc & 1
        self.acc >>= 1
        self.nbits -= 1
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        # prefix-code bits go out MSB of the code first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# ----------------------------------------------- canonical prefix codes ----


class _PrefixCode:
    """Canonical prefix decoder. ``single`` short-circuits the VP8L
    zero-bit one-symbol code; otherwise a (length, code)->symbol map is
    walked bit by bit (codes are read MSB-first, DEFLATE-style)."""

    __slots__ = ("single", "table", "max_len", "explicit")

    def __init__(self, single=None, table=None, max_len=0, explicit=None):
        self.single = single
        self.table = table
        self.max_len = max_len
        self.explicit = explicit  # simple 2-symbol codes: stream order

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.explicit is not None:
            return self.explicit[br.read_bit()]
        code = 0
        length = 0
        table = self.table
        while length <= self.max_len:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code in stream")


def _canonical_table(lengths: list[int]) -> _PrefixCode:
    used = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if not used:
        raise ValueError("vp8l: empty prefix code")
    if len(used) == 1:
        return _PrefixCode(single=used[0][1])
    max_len = max(l for l, _ in used)
    bl_count = [0] * (max_len + 1)
    for l, _ in used:
        bl_count[l] += 1
    # completeness (Kraft equality) — strict per spec
    kraft = sum(n << (max_len - l) for l, n in enumerate(bl_count) if l)
    if kraft != (1 << max_len):
        raise ValueError("vp8l: prefix code is not complete")
    code = 0
    next_code = [0] * (max_len + 2)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    table = {}
    for sym, l in enumerate(lengths):
        if l:
            table[(l, next_code[l])] = sym
            next_code[l] += 1
    return _PrefixCode(table=table, max_len=max_len)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder, same assignment."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        if num_symbols == 1:
            return _PrefixCode(single=sym0)
        sym1 = br.read(8)
        return _PrefixCode(explicit=(sym0, sym1))
    # code-length-coded
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _canonical_table(cl_lengths)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_ops = 2 + br.read(length_nbits)
    else:
        max_ops = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_ops == 0:
            break
        max_ops -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _canonical_table(lengths)


# ------------------------------------------------------------- decode ----


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _lz_prefix_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST[code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


def _decode_stream(br: _BitReader, w: int, h: int, level0: bool):
    """DecodeImageStream: returns (argb uint32 list, transforms) —
    transforms only at level 0, already in stream order."""
    transforms = []
    seen = set()
    if level0:
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color
                bits = br.read(3) + 2
                sw, sh = _div_round_up(w, bits), _div_round_up(h, bits)
                sub, _ = _decode_stream(br, sw, sh, False)
                transforms.append((ttype, bits, sub, w, h))
            elif ttype == 2:  # subtract green
                transforms.append((2, 0, None, w, h))
            else:  # color indexing
                psize = br.read(8) + 1
                praw, _ = _decode_stream(br, psize, 1, False)
                # palette entries are componentwise delta-coded
                pal = np.cumsum(
                    np.array(praw, dtype=np.uint32).view(np.uint8).reshape(-1, 4),
                    axis=0,
                    dtype=np.uint32,
                ).astype(np.uint8)
                pal = pal.view(np.uint32).reshape(-1)
                if psize <= 2:
                    wbits = 3
                elif psize <= 4:
                    wbits = 2
                elif psize <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, wbits, pal, w, h))
                # the remaining stream is decoded at the bundled width
                w = _div_round_up(w, wbits)
    cache_bits = br.read(4) if br.read_bit() else 0
    if cache_bits > 11:
        raise ValueError("vp8l: color cache too large")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0

    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw, mh = _div_round_up(w, meta_bits), _div_round_up(h, meta_bits)
        meta, _ = _decode_stream(br, mw, mh, False)
        meta = [(p >> 8) & 0xFFFF for p in meta]
        n_groups = max(meta) + 1

    green_size = _NUM_LITERAL + _NUM_LENGTH + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, _NUM_LITERAL),
                _read_prefix_code(br, _NUM_LITERAL),
                _read_prefix_code(br, _NUM_LITERAL),
                _read_prefix_code(br, _NUM_DIST),
            )
        )

    n = w * h
    data = [0] * n
    pos = 0
    mrow_w = _div_round_up(w, meta_bits) if meta is not None else 0
    g_code, r_code, b_code, a_code, d_code = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = meta[(y >> meta_bits) * mrow_w + (x >> meta_bits)]
            g_code, r_code, b_code, a_code, d_code = groups[gi]
        s = g_code.decode(br)
        if s < _NUM_LITERAL:
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            data[pos] = px
            pos += 1
            if cache_bits:
                cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> cache_shift] = px
        elif s < _NUM_LITERAL + _NUM_LENGTH:
            length = _lz_prefix_value(br, s - _NUM_LITERAL)
            dcode = _lz_prefix_value(br, d_code.decode(br))
            dist = _plane_dist(dcode, w)
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: backward reference out of range")
            if cache_bits:
                for _ in range(length):
                    px = data[pos - dist]
                    data[pos] = px
                    cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> cache_shift] = px
                    pos += 1
            else:
                for _ in range(length):
                    data[pos] = data[pos - dist]
                    pos += 1
        else:
            if not cache_bits:
                raise ValueError("vp8l: cache symbol without color cache")
            data[pos] = cache[s - _NUM_LITERAL - _NUM_LENGTH]
            pos += 1
    return data, transforms


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return l if p_l < p_t else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        # C truncating division by 2
        c = _clamp(a + (d // 2 if d >= 0 else -((-d) // 2)))
        out |= c << sh
    return out


def _predict(mode: int, data: list[int], pos: int, w: int) -> int:
    L = data[pos - 1]
    T = data[pos - w]
    TL = data[pos - w - 1] if pos % w else data[pos - w]
    # TR: pos - w + 1 — for the rightmost column this lands on the
    # leftmost (already decoded) pixel of the CURRENT row, exactly the
    # spec's addressing exception
    TR = data[pos - w + 1]
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(L, T, TL)
    if mode == 12:
        return _clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _clamp_add_sub_half(L, T, TL)
    raise ValueError(f"vp8l: predictor mode {mode} out of range")


def _add_pixels(residual: int, pred: int) -> int:
    return (
        ((((residual >> 24) + (pred >> 24)) & 0xFF) << 24)
        | ((((residual >> 16) + (pred >> 16)) & 0xFF) << 16)
        | ((((residual >> 8) + (pred >> 8)) & 0xFF) << 8)
        | (((residual + pred) & 0xFF))
    )


def _inv_predictor(data: list[int], w: int, h: int, bits: int, sub: list[int]):
    sw = _div_round_up(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = data[pos - 1]  # L
        elif x == 0:
            pred = data[pos - w]  # T
        else:
            mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
            pred = _predict(mode, data, pos, w)
        data[pos] = _add_pixels(data[pos], pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inv_color_transform(data: list[int], w: int, h: int, bits: int, sub):
    sw = _div_round_up(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        cte = sub[(y >> bits) * sw + (x >> bits)]
        r2b = (cte >> 16) & 0xFF
        g2b = (cte >> 8) & 0xFF
        g2r = cte & 0xFF
        px = data[pos]
        green = (px >> 8) & 0xFF
        red = (((px >> 16) & 0xFF) + _ct_delta(g2r, green)) & 0xFF
        blue = ((px & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
        data[pos] = (px & 0xFF00FF00) | (red << 16) | blue


def _inv_subtract_green(arr: np.ndarray) -> np.ndarray:
    # arr is uint32 argb; vectorized add of green into red/blue
    g = (arr >> 8) & 0xFF
    r = (((arr >> 16) & 0xFF) + g) & 0xFF
    b = ((arr & 0xFF) + g) & 0xFF
    return (arr & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(data: list[int], w: int, h: int, wbits: int, pal):
    psize = len(pal)
    if wbits == 0:
        out = np.zeros(w * h, dtype=np.uint32)
        idx = np.array([(p >> 8) & 0xFF for p in data], dtype=np.int64)
        ok = idx < psize
        out[ok] = pal[idx[ok]]
        return out
    # unbundle: each packed green byte carries (1 << wbits) indices of
    # (8 >> wbits) bits, lowest bits = leftmost pixel
    packed_w = _div_round_up(w, wbits)
    per = 1 << wbits
    ibits = 8 >> wbits
    mask = (1 << ibits) - 1
    out = np.zeros(w * h, dtype=np.uint32)
    for y in range(h):
        row = data[y * packed_w : (y + 1) * packed_w]
        x = 0
        for packed in row:
            gbyte = (packed >> 8) & 0xFF
            for k in range(per):
                if x >= w:
                    break
                i = (gbyte >> (k * ibits)) & mask
                out[y * w + x] = pal[i] if i < psize else 0
                x += 1
    return out


def decode_vp8l(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a raw VP8L chunk payload -> ((H, W, 4) RGBA uint8, meta)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"vp8l: unsupported version {version}")
    data, transforms = _decode_stream(br, w, h, True)
    # invert transforms in reverse stream order
    for ttype, bits, sub, tw, th in reversed(transforms):
        if ttype == 3:
            data = list(_inv_color_indexing(data, tw, th, bits, sub))
        elif ttype == 2:
            data = list(_inv_subtract_green(np.array(data, dtype=np.uint32)))
        elif ttype == 1:
            _inv_color_transform(data, tw, th, bits, sub)
        else:
            _inv_predictor(data, tw, th, bits, sub)
    arr32 = np.array(data, dtype=np.uint32)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = ((arr32 >> 16) & 0xFF).reshape(h, w)
    rgba[..., 1] = ((arr32 >> 8) & 0xFF).reshape(h, w)
    rgba[..., 2] = (arr32 & 0xFF).reshape(h, w)
    rgba[..., 3] = ((arr32 >> 24) & 0xFF).reshape(h, w)
    return rgba, {
        "width": w,
        "height": h,
        "channels": 4,
        "format": "webp",
        "alpha_hint": bool(alpha_hint),
    }


def _find_vp8l_chunk(payload: bytes) -> bytes:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return body
        if tag == b"VP8 ":
            raise ValueError("lossy VP8 webp not supported (VP8L only)")
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk found")


# ------------------------ optional lossy-VP8 path (system libwebp) ----
#
# The from-scratch VP8L decoder above stays the PRIMARY path. Lossy
# VP8 needs RFC 6386's ~1,100 probability/dequant constants, which
# this offline sandbox cannot source — so, exactly like the reference
# (which decodes ALL webp through libwebp,
# /root/reference/src/raster/band_decoder.cpp:129-154), we bind the
# SYSTEM libwebp when it exists and keep the counted-skip containment
# (`image_features(on_error='mark')`, `media_coverage`) when it does
# not. Import-try gated: no hard dependency, no behavior change on
# hosts without the library.


def _load_libwebp():
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("webp") or "libwebp.so.7"
    try:
        lib = ctypes.CDLL(name)
        lib.WebPDecodeRGBA.restype = ctypes.c_void_p
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        if hasattr(lib, "WebPFree"):
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "WebPEncodeRGBA"):
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
            ]
        return lib
    except Exception:
        return None


_LIBWEBP = _load_libwebp()


def _webp_free(ptr: int) -> None:
    import ctypes

    if hasattr(_LIBWEBP, "WebPFree"):
        _LIBWEBP.WebPFree(ctypes.c_void_p(ptr))
    else:  # pre-0.5 libwebp: buffers come from malloc
        ctypes.CDLL(None).free(ctypes.c_void_p(ptr))


def decode_vp8_lossy(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a lossy-VP8 (or any) WebP file via the system libwebp —
    the whole RIFF container goes to ``WebPDecodeRGBA``. Raises the
    same 'not supported' ValueError as before when the library is
    absent, so containment semantics are unchanged on hosts without
    it."""
    if _LIBWEBP is None:
        raise ValueError(
            "lossy VP8 webp not supported (VP8L only; system libwebp "
            "not found)"
        )
    import ctypes

    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = _LIBWEBP.WebPDecodeRGBA(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    )
    if not ptr:
        raise ValueError("libwebp: decode failed")
    try:
        n = w.value * h.value * 4
        buf = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * n)).contents
        arr = (
            np.frombuffer(buf, dtype=np.uint8)
            .reshape(h.value, w.value, 4)
            .copy()
        )
    finally:
        _webp_free(ptr)
    return arr, {
        "width": w.value,
        "height": h.value,
        "channels": 4,
        "format": "webp",
        "lossy": True,
    }


def encode_vp8_lossy(rgba: np.ndarray, quality: float = 75.0) -> bytes:
    """Encode (H, W, 4) RGBA uint8 as a LOSSY VP8 WebP via the system
    libwebp (fixture/support twin of :func:`decode_vp8_lossy`)."""
    if _LIBWEBP is None or not hasattr(_LIBWEBP, "WebPEncodeRGBA"):
        raise ValueError("system libwebp (with WebPEncodeRGBA) not found")
    import ctypes

    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_vp8_lossy needs (H, W, 4) uint8")
    h, w = rgba.shape[:2]
    out = ctypes.c_void_p()
    size = _LIBWEBP.WebPEncodeRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4,
        float(quality), ctypes.byref(out),
    )
    if not size or not out.value:
        raise ValueError("libwebp: encode failed")
    try:
        data = ctypes.string_at(out.value, size)
    finally:
        _webp_free(out.value)
    return data


def decode_webp(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a WebP file: lossless VP8L (from-scratch decoder, incl.
    inside VP8X) with lossy VP8 routed to the system libwebp when
    present."""
    try:
        arr, meta = decode_vp8l(_find_vp8l_chunk(payload))
    except ValueError as e:
        if "lossy VP8" in str(e) and _LIBWEBP is not None:
            arr, meta = decode_vp8_lossy(payload)
        else:
            raise
    meta["n_bytes"] = len(payload)
    return arr, meta


def parse_webp_header(payload: bytes) -> dict | None:
    """Header-only dims for VP8L, lossy VP8, and VP8X containers."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    tag = payload[12:16]
    d = payload[20:]
    if tag == b"VP8L" and len(d) >= 5 and d[0] == 0x2F:
        b0, b1, b2, b3 = d[1], d[2], d[3], d[4]
        w = ((b1 & 0x3F) << 8 | b0) + 1
        h = ((b3 & 0x0F) << 10 | b2 << 2 | b1 >> 6) + 1
        return {
            "width": w,
            "height": h,
            "channels": 4,
            "format": "webp",
            "n_bytes": len(payload),
        }
    if tag == b"VP8 " and len(d) >= 10 and d[3:6] == b"\x9d\x01\x2a":
        (w,) = struct.unpack_from("<H", d, 6)
        (h,) = struct.unpack_from("<H", d, 8)
        return {
            "width": w & 0x3FFF,
            "height": h & 0x3FFF,
            "channels": 3,
            "format": "webp",
            "n_bytes": len(payload),
        }
    if tag == b"VP8X" and len(d) >= 10:
        w = int.from_bytes(d[4:7], "little") + 1
        h = int.from_bytes(d[7:10], "little") + 1
        return {
            "width": w,
            "height": h,
            "channels": 4,
            "format": "webp",
            "n_bytes": len(payload),
        }
    return None


# ------------------------------------------------------------- encode ----


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Complete, length-limited canonical Huffman lengths for >= 2
    used symbols (Kraft sum repaired to exactly 1)."""
    import heapq

    items = sorted(freqs.items())
    heap = [(f, s, (s,)) for s, f in items]
    heapq.heapify(heap)
    depth = {s: 0 for s, _ in items}
    while len(heap) > 1:
        f1, t1, m1 = heapq.heappop(heap)
        f2, t2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), m1 + m2))
    # clamp and repair Kraft
    lens = {s: min(l, max_len) for s, l in depth.items()}
    unit = 1 << max_len

    def kraft():
        return sum(unit >> l for l in lens.values())

    k = kraft()
    if k > unit:
        # lengthen cheapest symbols until under budget
        for s, _ in sorted(items, key=lambda t: t[1]):
            while k > unit and lens[s] < max_len:
                k -= (unit >> lens[s]) - (unit >> (lens[s] + 1))
                lens[s] += 1
            if k <= unit:
                break
    if k < unit:
        # shorten the longest codes while staying within budget
        for s in sorted(lens, key=lambda s: -lens[s]):
            while lens[s] > 1 and k + (unit >> lens[s]) <= unit:
                k += unit >> lens[s]
                lens[s] -= 1
            if k == unit:
                break
    if k != unit:
        raise AssertionError("huffman repair failed")
    return lens


def _write_prefix_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Write one prefix code; return symbol -> (code, length)."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) == 1 and used[0] <= 255:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # 1 symbol
        s = used[0]
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
        return {s: (0, 0)}
    if len(used) == 2 and used[1] <= 255:
        bw.write(1, 1)
        bw.write(1, 1)  # 2 symbols
        s0, s1 = used
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # full code-length-coded form
    lens_map = _huffman_lengths({s: freqs.get(s, 0) or 0 for s in used}, 15)
    lengths = [0] * alphabet_size
    for s, l in lens_map.items():
        lengths[s] = l
    # RLE the length sequence into code-length symbols
    ops: list[tuple[int, int, int]] = []  # (symbol, extra_val, extra_bits)
    i = 0
    while i < alphabet_size:
        l = lengths[i]
        if l == 0:
            run = 1
            while i + run < alphabet_size and lengths[i + run] == 0:
                run += 1
            i += run
            # NOTE: trailing zeros are NOT implicit — without an
            # explicit max_symbol the reader decodes ops until every
            # entry is filled, so the tail zero-run must be written out
            while run >= 11:
                r = min(run, 138)
                ops.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                ops.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                ops.append((0, 0, 0))
        else:
            run = 1
            while i + run < alphabet_size and lengths[i + run] == l:
                run += 1
            i += run
            ops.append((l, 0, 0))
            run -= 1
            while run >= 3:
                r = min(run, 6)
                ops.append((16, r - 3, 2))
                run -= r
            for _ in range(run):
                ops.append((l, 0, 0))
    cl_freqs: dict[int, int] = {}
    for s, _, _ in ops:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    if len(cl_freqs) == 1:
        # degenerate: give the single used cl symbol + a dummy length 1
        only = next(iter(cl_freqs))
        partner = 0 if only != 0 else 1
        cl_lens = {only: 1, partner: 1}
    else:
        cl_lens = _huffman_lengths(cl_freqs, 7)
    cl_lengths = [0] * 19
    for s, l in cl_lens.items():
        cl_lengths[s] = l
    num_codes = max(
        4, max(i + 1 for i in range(19) if cl_lengths[_CL_ORDER[i]] > 0)
    )
    bw.write(0, 1)  # not simple
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    for s, extra, ebits in ops:
        c, l = cl_codes[s]
        bw.write_code(c, l)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def _lz_prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_val, extra_bits); inverse of
    _lz_prefix_value."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    if rest < (1 << (nbits - 1)):
        return 2 * nbits, rest, nbits - 1
    return 2 * nbits + 1, rest - (1 << (nbits - 1)), nbits - 1


def _to_argb(arr: np.ndarray) -> tuple[np.ndarray, int, int]:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    a32 = arr.astype(np.uint32)
    if c == 1:
        argb = (
            np.uint32(0xFF) << 24
            | a32[..., 0] << 16
            | a32[..., 0] << 8
            | a32[..., 0]
        )
    elif c == 3:
        argb = np.uint32(0xFF) << 24 | a32[..., 0] << 16 | a32[..., 1] << 8 | a32[..., 2]
    elif c == 4:
        argb = a32[..., 3] << 24 | a32[..., 0] << 16 | a32[..., 1] << 8 | a32[..., 2]
    else:
        raise ValueError(f"webp: unsupported channel count {c}")
    return argb.reshape(-1), w, h


def _tokenize(
    argb: np.ndarray, cache_bits: int, use_lz77: bool
) -> tuple[list, dict, dict, dict, dict, dict, int]:
    """Pixel stream -> (ops, per-stream frequency dicts, cache_size).
    LZ77 here is a distance-1 run coder (exercises overlapping copies);
    the color cache replays the decoder's insertion rule exactly."""
    n = len(argb)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    fg: dict[int, int] = {}
    fr: dict[int, int] = {}
    fb: dict[int, int] = {}
    fa: dict[int, int] = {}
    fd: dict[int, int] = {}
    ops = []
    # distance 1 -> neighborhood code: (1, 0) is _DIST[1] -> code 2
    dist1_code = _DIST.index((1, 0)) + 1
    i = 0
    vals = argb.tolist()
    while i < n:
        px = vals[i]
        if use_lz77 and i > 0 and px == vals[i - 1]:
            run = 1
            while i + run < n and vals[i + run] == px and run < 4096:
                run += 1
            lcode, lextra, lbits = _lz_prefix_encode(run)
            dcode, dextra, dbits = _lz_prefix_encode(dist1_code)
            ops.append(("copy", lcode, lextra, lbits, dcode, dextra, dbits))
            fg[256 + lcode] = fg.get(256 + lcode, 0) + 1
            fd[dcode] = fd.get(dcode, 0) + 1
            if cache_bits:
                h = ((_CACHE_MUL * px) & 0xFFFFFFFF) >> shift
                cache[h] = px
            i += run
            continue
        if cache_bits:
            h = ((_CACHE_MUL * px) & 0xFFFFFFFF) >> shift
            if cache[h] == px:
                sym = 280 + h
                ops.append(("cache", sym))
                fg[sym] = fg.get(sym, 0) + 1
                i += 1
                continue
            cache[h] = px
        a, r, g, b = (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF
        ops.append(("lit", g, r, b, a))
        fg[g] = fg.get(g, 0) + 1
        fr[r] = fr.get(r, 0) + 1
        fb[b] = fb.get(b, 0) + 1
        fa[a] = fa.get(a, 0) + 1
        i += 1
    return ops, fg, fr, fb, fa, fd, cache_size


def _write_image_stream(
    bw: _BitWriter,
    argb: np.ndarray,
    *,
    cache_bits: int,
    use_lz77: bool,
    level0: bool,
) -> None:
    """Entropy-coded image (shared by main image and sub-images).
    Stream order per spec: cache flag, then (level 0 only) the
    meta-prefix flag, then the prefix codes, then pixels."""
    ops, fg, fr, fb, fa, fd, cache_size = _tokenize(argb, cache_bits, use_lz77)
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix codes
    green_size = _NUM_LITERAL + _NUM_LENGTH + cache_size
    gc = _write_prefix_code(bw, fg, green_size)
    rc = _write_prefix_code(bw, fr, _NUM_LITERAL)
    bc = _write_prefix_code(bw, fb, _NUM_LITERAL)
    ac = _write_prefix_code(bw, fa, _NUM_LITERAL)
    dc = _write_prefix_code(bw, fd, _NUM_DIST)
    for op in ops:
        if op[0] == "lit":
            _, g, r, b, a = op
            bw.write_code(*gc[g])
            bw.write_code(*rc[r])
            bw.write_code(*bc[b])
            bw.write_code(*ac[a])
        elif op[0] == "copy":
            _, lcode, lextra, lbits, dcode, dextra, dbits = op
            bw.write_code(*gc[256 + lcode])
            if lbits:
                bw.write(lextra, lbits)
            bw.write_code(*dc[dcode])
            if dbits:
                bw.write(dextra, dbits)
        else:
            bw.write_code(*gc[op[1]])


def _sub_image_stream(bw: _BitWriter, argb: np.ndarray) -> None:
    """Sub-resolution image (palette/entropy/transform images): no
    transform bits, no meta bit — just cache flag + prefix codes."""
    _write_image_stream(bw, argb, cache_bits=0, use_lz77=False, level0=False)


def encode_webp(
    arr: np.ndarray,
    *,
    mode: str = "auto",
    subtract_green: bool = True,
    cache_bits: int = 0,
    use_lz77: bool = True,
) -> bytes:
    """Encode (H, W[, C]) uint8 -> lossless WebP (VP8L) bytes.

    mode: 'auto' picks palette when <= 256 distinct colors (with pixel
    bundling for <= 16), else literal; 'literal' / 'palette' force.
    """
    argb, w, h = _to_argb(arr)
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("webp: dimensions exceed VP8L's 14-bit limit")
    uniq = np.unique(argb)
    if mode == "auto":
        mode = "palette" if len(uniq) <= 256 else "literal"
    if mode == "palette" and len(uniq) > 256:
        raise ValueError("webp: palette mode needs <= 256 distinct colors")

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    has_alpha = int(np.any((argb >> 24) != 0xFF))
    bw.write(has_alpha, 1)
    bw.write(0, 3)  # version

    if mode == "palette":
        psize = len(uniq)
        pal = uniq  # sorted ascending — deterministic
        lut = {int(c): i for i, c in enumerate(pal.tolist())}
        idx = np.array([lut[int(p)] for p in argb.tolist()], dtype=np.uint32)
        if psize <= 2:
            wbits = 3
        elif psize <= 4:
            wbits = 2
        elif psize <= 16:
            wbits = 1
        else:
            wbits = 0
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(psize - 1, 8)
        # palette sub-image: componentwise delta from previous entry
        pal8 = pal.astype(np.uint32).view(np.uint8).reshape(-1, 4).astype(np.int16)
        deltas = np.empty_like(pal8)
        deltas[0] = pal8[0]
        deltas[1:] = (pal8[1:] - pal8[:-1]) % 256
        pal_argb = deltas.astype(np.uint8).reshape(-1).view("<u4").astype(np.uint32)
        _sub_image_stream(bw, pal_argb)
        if wbits:
            per = 1 << wbits
            ibits = 8 >> wbits
            packed_w = _div_round_up(w, wbits)
            packed = np.zeros(packed_w * h, dtype=np.uint32)
            grid = idx.reshape(h, w)
            for y in range(h):
                for px_i in range(packed_w):
                    byte = 0
                    for k in range(per):
                        x = px_i * per + k
                        if x < w:
                            byte |= int(grid[y, x]) << (k * ibits)
                    packed[y * packed_w + px_i] = (0xFF << 24) | (byte << 8)
            main = packed
        else:
            main = (np.uint32(0xFF) << 24) | (idx << 8)
        bw.write(0, 1)  # no more transforms
        _write_image_stream(
            bw, main, cache_bits=cache_bits, use_lz77=use_lz77, level0=True
        )
    else:
        if subtract_green:
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) - g) & 0xFF
            b = ((argb & 0xFF) - g) & 0xFF
            argb = (argb & np.uint32(0xFF00FF00)) | (r << 16) | b
            bw.write(1, 1)
            bw.write(2, 2)  # subtract-green (no data)
        bw.write(0, 1)  # no (more) transforms
        _write_image_stream(
            bw, argb, cache_bits=cache_bits, use_lz77=use_lz77, level0=True
        )

    body = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
