"""From-scratch baseline JPEG (ITU T.81 sequential DCT) codec.

Decoder: baseline SOF0, 8-bit, 1 or 3 components, sampling factors 1-2
(covers grayscale, 4:4:4 and 4:2:0), canonical Huffman tables from DHT
(BITS/HUFFVAL), byte-stuffing, DRI/RSTn restart intervals, dequantize ->
de-zigzag -> exact matrix IDCT (numpy) -> chroma upsample -> JFIF
YCbCr->RGB. Progressive (SOF2), arithmetic coding, and 12-bit raise
NotImplementedError.

Encoder: the verification twin — level shift -> FDCT -> quantize
(ramp quantization table emitted in DQT, scaled by ``quality``) ->
zigzag -> run/size symbols entropy-coded with a per-image CANONICAL
single-length Huffman table (valid JPEG: the table ships in DHT, so no
spec-table recall is involved; fixed-length codes trade a few percent
of size for simplicity). Grayscale and 4:4:4 / 4:2:0 color.

Lossy by nature, so tests verify round-trip PSNR, not bit identity —
the engine's COLUMN codecs stay lossless; this codec serves the
multimodal (media payload) layer only.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_c = np.ones(8)
_c[0] = 1.0 / np.sqrt(2.0)
_x = np.arange(8)
# orthogonal 8-point DCT-II matrix: IDCT(FDCT(b)) == b to float precision
_M = 0.5 * _c[:, None] * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


def _quant_table(quality: int) -> np.ndarray:
    """Textbook ramp table Q[u,v] = 1 + (1+u+v)*scale — any table is
    valid JPEG since DQT ships it; scale maps quality 1..100."""
    scale = max(1, int(round(50.0 / max(1, min(100, quality)) * 4)))
    u, v = np.ogrid[0:8, 0:8]
    return np.clip(1 + (1 + u + v) * scale, 1, 255).astype(np.uint8)


# ------------------------------------------------------------- decoder ----


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def align_restart(self):
        """Consume an RSTn marker (byte-aligned)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # marker (EOI / RSTn seen mid-read): feed zeros
                    self.pos -= 1
                    self.acc = 0
                    self.nbits = 8
                    return 0
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_map(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG entropy stream (no Huffman match)")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, dict]:
    """Baseline JPEG -> (H, W, 3) RGB (or (H, W, 1) grayscale) uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> map
    comps = None  # list of (cid, hsamp, vsamp, qid)
    w = h = 0
    restart = 0
    scan_comp = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while payload[pos + 1] == 0xFF and pos + 4 <= len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, sp + 1).astype(np.int32)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                huff[(tc, th)] = _huff_map(bits, seg[sp + 17 : sp + 17 + n])
                sp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit JPEG")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, samp, q = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 15, q))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("progressive/extended JPEG not supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comp = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comp.append((cid, tabs >> 4, tabs & 15))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if comps is None or scan_comp is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")
    if len(scan_comp) != len(comps):
        raise NotImplementedError(
            "non-interleaved (multi-scan) baseline JPEG not supported"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, hs, vs, _q in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
    r = _BitReader(payload, pos)
    pred = {cid: 0 for cid, *_ in comps}
    tab_of = {cid: (dc, ac) for cid, dc, ac in scan_comp}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                r.align_restart()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, qid in comps:
                dc_t = huff[(0, tab_of[cid][0])]
                ac_t = huff[(1, tab_of[cid][1])]
                q = qt[qid]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(r, dc_t)
                        diff = _extend(r.bits(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        px = _idct(coef.reshape(8, 8)) + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample each component to full resolution and crop
    full = []
    for cid, hs, vs, _q in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[..., None]
        ch = 1
    else:
        y, cb, cr = full
        rch = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.clip(np.round(np.stack([rch, g, b], axis=-1)), 0, 255).astype(
            np.uint8
        )
        ch = 3
    meta = {
        "width": int(w),
        "height": int(h),
        "channels": ch,
        "format": "jpeg",
        "n_bytes": len(payload),
    }
    return out, meta


# ------------------------------------------------------------- encoder ----


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v else 0


def _fixed_huff(symbols: set[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Single-length canonical Huffman over the symbols actually used —
    valid JPEG (ships in DHT), avoids the all-ones code by sizing
    2^L >= n+1. Returns (BITS, HUFFVAL, {sym: (code, length)})."""
    vals = sorted(symbols)
    n = len(vals)
    L = max(1, n.bit_length())  # 2^L >= n+1, so the all-ones code is free
    bits = [0] * 16
    bits[L - 1] = n
    codes = {v: (i << 0, L) for i, v in enumerate(vals)}
    return bits, bytes(vals), codes


def _encode_component_blocks(blocks: list[np.ndarray], q: np.ndarray):
    """blocks -> list of (dc_sym, dc_bits, [(ac_sym, ac_bits), ...])."""
    out = []
    pred = 0
    qf = q.astype(np.float64).reshape(8, 8)
    for b in blocks:
        coef = _fdct(b.astype(np.float64) - 128.0)
        # zz[i] = coefficient at zigzag position i = raster position ZIGZAG[i]
        zz = np.round(coef / qf).astype(np.int32).reshape(64)[ZIGZAG]
        dc = int(zz[0])
        diff = dc - pred
        pred = dc
        t = _category(diff)
        dc_bits = (diff if diff >= 0 else diff + (1 << t) - 1, t)
        acs = []
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k]:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                if run == 16:
                    acs.append((0xF0, (0, 0)))  # ZRL
                    run = 0
                continue
            s = _category(v)
            acs.append(((run << 4) | s, (v if v >= 0 else v + (1 << s) - 1, s)))
            run = 0
        if last_nz < 63:
            acs.append((0x00, (0, 0)))  # EOB
        out.append((t, dc_bits, acs))
    return out


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 85, subsample: bool = False
) -> bytes:
    """uint8 (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB -> baseline
    JPEG. ``subsample=True`` writes 4:2:0 (Y at 2x2, chroma at 1x1)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[..., 0]
    gray = a.ndim == 2
    h, w = a.shape[:2]
    q = _quant_table(quality)
    if gray:
        planes = [(1, 1, 1, a.astype(np.float64))]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                hh = (h + 1) // 2 * 2
                ww = (w + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
                return (
                    pp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
                )

            planes = [(1, 2, 2, y), (2, 1, 1, down(cb)), (3, 1, 1, down(cr))]
        else:
            planes = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its MCU grid and slice into per-MCU block lists
    comp_blocks: list[list[np.ndarray]] = []
    for _cid, hs, vs, p in planes:
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        pp = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        blocks = []
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blocks.append(pp[y0 : y0 + 8, x0 : x0 + 8])
        comp_blocks.append(blocks)
    encoded = [
        _encode_component_blocks(bl, q) for bl in comp_blocks
    ]
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    for enc in encoded:
        for t, _dc, acs in enc:
            dc_syms.add(t)
            for sym, _ in acs:
                ac_syms.add(sym)
    dc_bits_spec, dc_vals, dc_codes = _fixed_huff(dc_syms)
    ac_bits_spec, ac_vals, ac_codes = _fixed_huff(ac_syms)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(q.reshape(64)[ZIGZAG]))  # DQT is zigzag-ordered
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for cid, hs, vs, _p in planes:
        sof += bytes([cid, (hs << 4) | vs, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(dc_bits_spec) + dc_vals)
    seg(0xC4, bytes([0x10]) + bytes(ac_bits_spec) + ac_vals)
    sos = bytes([nc])
    for cid, *_ in planes:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    # interleave per MCU: each component contributes hs*vs blocks
    idx = [0] * len(planes)
    for _m in range(mcux * mcuy):
        for ci, (_cid, hs, vs, _p) in enumerate(planes):
            for _ in range(hs * vs):
                t, (dv, dn), acs = encoded[ci][idx[ci]]
                idx[ci] += 1
                code, ln = dc_codes[t]
                bw.write(code, ln)
                if dn:
                    bw.write(dv, dn)
                for sym, (av, an) in acs:
                    code, ln = ac_codes[sym]
                    bw.write(code, ln)
                    if an:
                        bw.write(av, an)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
