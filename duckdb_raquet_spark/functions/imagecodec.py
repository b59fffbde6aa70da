"""From-scratch PNG/BMP image codec + JPEG/GIF header parsing.

No image library ships in this environment, so the decoders are
implemented directly from the public format specs (PNG: RFC 2083 /
https://www.w3.org/TR/png-3/; BMP: BITMAPINFOHEADER; JPEG: ISO 10918
marker scan; GIF89a header) — the same move as the reference, which
hand-rolls its PNG writer instead of linking libpng
(/root/reference/src/raster/band_encoder.cpp:205-249).

Scope (enough for real web-crawl thumbnails/logos, honest errors
otherwise):
  * PNG decode: bit depth 8; color types 0 (gray), 2 (RGB), 3
    (palette), 4 (gray+alpha), 6 (RGBA); all five row filters;
    non-interlaced. Interlaced/16-bit raise ValueError.
  * PNG encode: uint8 (H, W) / (H, W, C) arrays, per-row filter
    selection (default 0; pass a callable for e.g. y % 5 to exercise
    every unfilter path in tests).
  * BMP decode: uncompressed 24/32-bit BITMAPINFOHEADER, bottom-up or
    top-down.
  * Header-only parse (no pixel decode): PNG, BMP, JPEG (SOFn scan),
    GIF — for `image_metadata` over formats we don't rasterize.

The per-row unfilter hot path is numpy (`up` fully vectorized, `sub`
via per-channel cumsum mod 256); only `average`/`paeth` walk bytes, and
rows using them are the exception in real encoders' output.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    if payload.startswith(PNG_SIG):
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# ------------------------------------------------------------------ PNG ----


def _png_chunks(payload: bytes):
    pos = len(PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 1:  # Sub: cumsum per channel offset, mod 256
            r = row.reshape(w, ch).astype(np.int64)
            out[y] = (np.cumsum(r, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up: fully vectorized
            out[y] = row + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average: sequential in x
            cur = out[y]
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                cur[x] = (int(row[x]) + ((int(a) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth: sequential in x
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                cur[x] = (int(row[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} in row {y}")
    return out.reshape(h, w, ch)


def decode_png(payload: bytes) -> tuple[np.ndarray, dict]:
    """PNG -> (H, W, C) uint8 + metadata. C is the color type's channel
    count (palette images expand to RGB)."""
    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    w, h, depth, ctype_id, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if ctype_id not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype_id}")
    ch = _PNG_CHANNELS[ctype_id]
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG pixel data length mismatch")
    arr = _unfilter(raw, h, w, ch)
    fmt = "png"
    if ctype_id == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        arr = plte[arr[..., 0]]
        ch = 3
    meta = {
        "width": int(w),
        "height": int(h),
        "channels": int(ch),
        "format": fmt,
        "n_bytes": len(payload),
    }
    return arr, meta


def _filter_row(
    row: np.ndarray, prev: np.ndarray, ftype: int, ch: int
) -> bytes:
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    a = np.zeros_like(r)
    a[ch:] = r[:-ch]
    c = np.zeros_like(p)
    c[ch:] = p[:-ch]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - a
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - ((a + p) >> 1)
    elif ftype == 4:
        pr = a + p - c
        pa, pb, pc = np.abs(pr - a), np.abs(pr - p), np.abs(pr - c)
        pred = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, p, c)
        )
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return bytes([ftype]) + (out % 256).astype(np.uint8).tobytes()


def encode_png(arr: np.ndarray, *, filters=0, level: int = 6) -> bytes:
    """uint8 (H, W) or (H, W, C in {1,2,3,4}) -> PNG bytes.

    ``filters`` is an int applied to every row, or a callable
    ``y -> int`` for per-row choice (tests use ``y % 5`` to cover every
    unfilter path)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[..., None]
    h, w, ch = a.shape
    ctype_id = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    pick = filters if callable(filters) else (lambda y: filters)
    rows = []
    flat = a.reshape(h, w * ch)
    zero = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        rows.append(
            _filter_row(flat[y], flat[y - 1] if y > 0 else zero, int(pick(y)), ch)
        )
    raw = zlib.compress(b"".join(rows), level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_id, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ BMP ----


def decode_bmp(payload: bytes) -> tuple[np.ndarray, dict]:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP -> (H, W, 3|4) RGB(A)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = []
    for y in range(h):
        off = data_off + y * stride
        rows.append(np.frombuffer(payload, np.uint8, count=w * nch, offset=off))
    img = np.stack(rows).reshape(h, w, nch)
    if h_signed > 0:  # bottom-up storage
        img = img[::-1]
    img = img[..., [2, 1, 0] + ([3] if nch == 4 else [])]  # BGR(A) -> RGB(A)
    meta = {
        "width": int(w),
        "height": int(h),
        "channels": int(nch),
        "format": "bmp",
        "n_bytes": len(payload),
    }
    return np.ascontiguousarray(img), meta


# --------------------------------------------------------- header parse ----


def parse_image_header(payload: bytes) -> dict | None:
    """Dims/channels from the container header only (no pixel decode) —
    covers JPEG/GIF too, where we don't rasterize. None if unknown."""
    fmt = sniff_format(payload)
    if fmt == "png":
        for ctype, data in _png_chunks(payload):
            if ctype == b"IHDR":
                w, h, _d, ct, _c, _f, _i = struct.unpack(">IIBBBBB", data)
                return {
                    "width": int(w),
                    "height": int(h),
                    "channels": int(_PNG_CHANNELS.get(ct, 0)) or None,
                    "format": "png",
                    "n_bytes": len(payload),
                }
        return None
    if fmt == "bmp":
        w, h = struct.unpack_from("<ii", payload, 18)
        (bpp,) = struct.unpack_from("<H", payload, 28)
        return {
            "width": int(w),
            "height": abs(int(h)),
            "channels": int(bpp // 8),
            "format": "bmp",
            "n_bytes": len(payload),
        }
    if fmt == "jpeg":
        # scan markers for SOF0/1/2 (baseline/extended/progressive)
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                pos += 1
                continue
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                nch = payload[pos + 9]
                return {
                    "width": int(w),
                    "height": int(h),
                    "channels": int(nch),
                    "format": "jpeg",
                    "n_bytes": len(payload),
                }
            pos += 2 + seg_len
        return None
    if fmt == "gif":
        w, h = struct.unpack_from("<HH", payload, 6)
        return {
            "width": int(w),
            "height": int(h),
            "channels": 3,
            "format": "gif",
            "n_bytes": len(payload),
        }
    return None


def decode_image(payload: bytes) -> tuple[np.ndarray, dict]:
    """Dispatch on magic bytes -> (H, W, C) uint8 + metadata."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt in ("jpeg", "gif"):
        raise NotImplementedError(
            f"{fmt} pixel decode not implemented (header parse only; "
            "entropy-coded formats need a DCT/LZW stage)"
        )
    raise ValueError("unknown image format (no PNG/BMP/JPEG/GIF magic)")
