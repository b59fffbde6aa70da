"""String codecs, generic wrappers, and the recursive payload dispatcher.

Logical value model: a column chunk is either an int64 vector (numpy) or
a byte-string vector (pyarrow large_binary, offsets+data — Arrow's native
layout, so Arrow-batch UDFs encode/decode zero-copy). Timestamps travel
as epoch-microsecond int64; text/url/lang/html travel as raw bytes so
invalid-UTF8 and surrogate-free 4-byte sequences round-trip bit-exactly
(SURVEY.md §7 "encode text as bytes, not str").

Decode is ``decode_any(buf)`` — a recursive 1-byte-tag dispatch, the
analog of the reference's codec dispatch in
/root/reference/src/raster/band_decoder.cpp:300-373.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import fsst, ids, ints
from .util import pack_bitmap, read_uvarint, unpack_bitmap, write_uvarint

_I64 = np.int64

# ----------------------------------------------------------- str parts ----


def _canonical(arr: pa.Array) -> pa.Array:
    """Normalize to a zero-offset large_binary array with filled nulls."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    return arr


def str_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(lengths int64, concatenated data bytes) of a no-null binary array."""
    arr = _canonical(arr)
    if arr.null_count:
        raise ValueError("str_parts requires no nulls (wrap with NULLABLE)")
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data_buf = arr.buffers()[2]
    data = data_buf[offsets[0] : offsets[-1]].to_pybytes() if data_buf else b""
    lengths = np.diff(offsets).astype(_I64)
    return lengths, data


def str_parts_view(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """(lengths int64, zero-copy memoryview of the concatenated bytes).

    The view variant of :func:`str_parts` — the encode hot path feeds
    compressors straight from the Arrow buffer; materializing the column
    as a Python ``bytes`` (and again as the plain payload) made the
    kernel memory-bound, which is what stops scaling on bandwidth-starved
    hosts long before CPU does."""
    arr = _canonical(arr)
    if arr.null_count:
        raise ValueError("str_parts_view requires no nulls (wrap with NULLABLE)")
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data_buf = arr.buffers()[2]
    data = (
        memoryview(data_buf)[offsets[0] : offsets[-1]]
        if data_buf is not None
        else memoryview(b"")
    )
    lengths = np.diff(offsets).astype(_I64)
    return lengths, data


def plain_header(n: int, lengths: np.ndarray) -> bytes:
    """STR_PLAIN tag + row count + encoded lengths — everything of the
    plain payload except the data bytes themselves."""
    out = bytearray([ids.STR_PLAIN])
    write_uvarint(out, n)
    lp = ints.encode_int_best(lengths)
    write_uvarint(out, len(lp))
    out += lp
    return bytes(out)


def encode_zlib_stream(header: bytes, data, level: int = 6) -> bytes:
    """zlib(header || data) without materializing the concatenation."""
    c = zlib.compressobj(level)
    return b"".join((bytes([ids.ZLIB]), c.compress(header), c.compress(data), c.flush()))


def encode_bz2_stream(header: bytes, data, level: int | None = None) -> bytes:
    """bz2(header || data) without materializing the concatenation."""
    import bz2

    if level is None:
        total = len(header) + len(data)
        level = min(9, max(1, total // 100_000 + 1))
    c = bz2.BZ2Compressor(level)
    return b"".join((bytes([ids.BZ2]), c.compress(header), c.compress(data), c.flush()))


def str_from_parts(
    lengths: np.ndarray, data: bytes, validity: np.ndarray | None = None
) -> pa.Array:
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    bufs = [
        pa.py_buffer(pack_bitmap(validity)) if validity is not None else None,
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(data),
    ]
    null_count = int(n - validity.sum()) if validity is not None else 0
    return pa.Array.from_buffers(pa.large_binary(), n, bufs, null_count=null_count)


# ------------------------------------------------------------ STR_PLAIN ----


def encode_str_plain(arr: pa.Array) -> bytes:
    lengths, data = str_parts(arr)
    out = bytearray([ids.STR_PLAIN])
    write_uvarint(out, len(lengths))
    lp = ints.encode_int_best(lengths)
    write_uvarint(out, len(lp))
    out += lp
    out += data
    return bytes(out)


def _decode_str_plain(buf: bytes, pos: int) -> pa.Array:
    n, pos = read_uvarint(buf, pos)
    lplen, pos = read_uvarint(buf, pos)
    lengths = ints.decode_ints(buf[pos : pos + lplen])
    data = bytes(buf[pos + lplen :])
    return str_from_parts(lengths, data)


# ------------------------------------------------------------- STR_DICT ----


def encode_str_dict(arr: pa.Array, dict_encoder=None) -> bytes:
    """Dictionary codec: unique values + integer codes.

    The string analog of the reference's colortable pattern — an int code
    resolved through a lookup table
    (/root/reference/src/raster/st_png_colormap.cpp:203-215).
    ``dict_encoder`` encodes the dictionary payload (default: smallest of
    plain/zlib/fsst via :func:`encode_str_best_of`).
    """
    arr = _canonical(arr)
    dct = pc.dictionary_encode(arr)
    codes = dct.indices.to_numpy(zero_copy_only=False).astype(_I64)
    dictionary = dct.dictionary
    enc_dict = (
        dict_encoder(dictionary) if dict_encoder else encode_str_best_of(
            dictionary, allow_dict=False
        )
    )
    out = bytearray([ids.STR_DICT])
    write_uvarint(out, len(arr))
    write_uvarint(out, len(enc_dict))
    out += enc_dict
    out += ints.encode_int_best(codes)
    return bytes(out)


def _decode_str_dict(buf: bytes, pos: int) -> pa.Array:
    n, pos = read_uvarint(buf, pos)
    dlen, pos = read_uvarint(buf, pos)
    dictionary = decode_any(buf[pos : pos + dlen])
    codes = ints.decode_ints(buf[pos + dlen :])
    return dictionary.take(pa.array(codes))


# ------------------------------------------------------------- STR_FSST ----


def encode_str_fsst(arr: pa.Array, table: list[bytes] | None = None) -> bytes:
    lengths, data = str_parts(arr)
    if table is None:
        table = fsst.build_table(data)
    enc = fsst.compress(data, table)
    out = bytearray([ids.STR_FSST])
    write_uvarint(out, len(lengths))
    lp = ints.encode_int_best(lengths)
    write_uvarint(out, len(lp))
    out += lp
    tb = fsst.serialize_table(table)
    write_uvarint(out, len(tb))
    out += tb
    out += enc
    return bytes(out)


def _decode_str_fsst(buf: bytes, pos: int) -> pa.Array:
    n, pos = read_uvarint(buf, pos)
    lplen, pos = read_uvarint(buf, pos)
    lengths = ints.decode_ints(buf[pos : pos + lplen])
    pos += lplen
    tlen, pos = read_uvarint(buf, pos)
    table, _ = fsst.deserialize_table(buf[pos : pos + tlen])
    pos += tlen
    data = fsst.decompress(bytes(buf[pos:]), table)
    return str_from_parts(lengths, data)


# ----------------------------------------------------------------- CONST ----


def encode_const(value: bytes, n: int) -> bytes:
    out = bytearray([ids.CONST])
    write_uvarint(out, n)
    out += value
    return bytes(out)


def _decode_const(buf: bytes, pos: int) -> pa.Array:
    n, pos = read_uvarint(buf, pos)
    value = bytes(buf[pos:])
    lengths = np.full(n, len(value), dtype=_I64)
    return str_from_parts(lengths, value * n)


# ------------------------------------------------------------------ ZLIB ----


def encode_zlib(inner: bytes, level: int = 6) -> bytes:
    """zlib wrapper — the reference's baseline codec
    (/root/reference/src/raster/band_encoder.cpp:190-203)."""
    return bytes([ids.ZLIB]) + zlib.compress(inner, level)


def _decode_zlib(buf: bytes, pos: int):
    return decode_any(zlib.decompress(bytes(buf[pos:])))


# ------------------------------------------------------------------- BZ2 ----


def encode_bz2(inner: bytes, level: int | None = None) -> bytes:
    """bz2 wrapper — the BWT block (level x 100 KB) catches cross-row
    boilerplate repeats far beyond zlib's 32 KB match window, which is
    what dominates webtext blocks (many rows share per-domain template
    text). ~4x zlib CPU, so the selector sample-gates it; level defaults
    to the payload size so the whole payload fits one BWT block."""
    import bz2

    if level is None:
        level = min(9, max(1, len(inner) // 100_000 + 1))
    return bytes([ids.BZ2]) + bz2.compress(inner, level)


def _decode_bz2(buf: bytes, pos: int):
    import bz2

    return decode_any(bz2.decompress(bytes(buf[pos:])))


# ------------------------------------------------------------------ ZSTD ----

ZSTD_LEVEL = 3  # measured knee on webtext: ~zlib-6 size at ~7x its speed


def _zstd(level: int | None = None) -> "pa.Codec":
    return pa.Codec("zstd", level)


def encode_zstd(inner: bytes, level: int = ZSTD_LEVEL) -> bytes:
    """zstd wrapper via pyarrow's bundled codec (no extra dependency).
    The frame stores the raw length — zstd decompress requires it."""
    out = bytearray([ids.ZSTD])
    write_uvarint(out, len(inner))
    out += _zstd(level).compress(inner, asbytes=True)
    return bytes(out)


def encode_zstd_stream(header: bytes, data, level: int = ZSTD_LEVEL) -> bytes:
    """zstd(header || data); pa.Codec has no incremental API, so this is
    one join copy (memcpy ~10x the compressor's speed: ~10% of the pass,
    vs the 7x win over the zlib pass it replaces)."""
    return encode_zstd(b"".join((header, data)), level)


def _decode_zstd(buf: bytes, pos: int):
    raw_len, pos = read_uvarint(buf, pos)
    return decode_any(_zstd().decompress(bytes(buf[pos:]), raw_len, asbytes=True))


# -------------------------------------------------------------- NULLABLE ----


def encode_nullable(validity: np.ndarray, inner: bytes) -> bytes:
    """Validity bitmap + payload of valid values only.

    NULL semantics carry-over from the reference's NODATA handling
    (nodata -> NULL, /root/reference/src/raster/st_raster_value.cpp:432-435)
    — but explicit, not sentinel-valued.
    """
    out = bytearray([ids.NULLABLE])
    write_uvarint(out, len(validity))
    out += pack_bitmap(np.asarray(validity, dtype=bool))
    out += inner
    return bytes(out)


def _decode_nullable(buf: bytes, pos: int) -> pa.Array:
    n, pos = read_uvarint(buf, pos)
    nbytes = (n + 7) // 8
    validity = unpack_bitmap(bytes(buf[pos : pos + nbytes]), n)
    inner = decode_any(buf[pos + nbytes :])
    if isinstance(inner, np.ndarray):  # nullable ints
        full = np.zeros(n, dtype=_I64)
        full[validity] = inner
        return pa.Array.from_buffers(
            pa.int64(),
            n,
            [pa.py_buffer(pack_bitmap(validity)), pa.py_buffer(full.tobytes())],
            null_count=int(n - validity.sum()),
        )
    # nullable strings: scatter valid lengths, nulls get length 0
    lengths_v, data = str_parts(inner)
    lengths = np.zeros(n, dtype=_I64)
    lengths[validity] = lengths_v
    return str_from_parts(lengths, data, validity)


# ----------------------------------------------------------------- GROUP ----

_GROUP_STORE, _GROUP_ZLIB, _GROUP_BZ2, _GROUP_ZSTD = 0, 1, 2, 3


def encode_group(
    inners: list[bytes], zlib_level: int = 6, effort: str = "max"
) -> bytes:
    """Column-group payload: k member payloads compressed as ONE stream —
    the interleave_bands analog (/root/reference/src/raster/
    band_encoder.cpp:333-352). Correlated columns share a single
    compression window (cross-column redundancy zlib/bz2 can exploit)
    and a single Parquet fetch for co-accessed columns. Members are the
    cheap structural payloads (plain/FoR), so decode is: decompress
    once, slice, per-member tagged decode. The zstd frame needs no
    stored raw length — decode recovers it as sum(member lens)."""
    concat = b"".join(inners)
    cands = [(bytes([_GROUP_STORE]), concat)]
    z = zlib.compress(concat, zlib_level)
    cands.append((bytes([_GROUP_ZLIB]), z))
    cands.append(
        (bytes([_GROUP_ZSTD]), _zstd(ZSTD_LEVEL).compress(concat, asbytes=True))
    )
    if effort != "fast" and len(concat) >= 1 << 17:
        import bz2 as _bz2

        level = min(9, max(1, len(concat) // 100_000 + 1))
        cands.append((bytes([_GROUP_BZ2]), _bz2.compress(concat, level)))
    comp_tag, blob = min(cands, key=lambda t: len(t[1]))
    out = bytearray([ids.GROUP])
    write_uvarint(out, len(inners))
    out += comp_tag
    for p in inners:
        write_uvarint(out, len(p))
    out += blob
    return bytes(out)


def decode_group(buf: bytes) -> list[bytes]:
    """GROUP payload -> list of member payloads (each decode_any-able)."""
    if buf[0] != ids.GROUP:
        raise ValueError(f"not a GROUP payload (tag 0x{buf[0]:02x})")
    k, pos = read_uvarint(buf, 1)
    comp_tag = buf[pos]
    pos += 1
    lens = []
    for _ in range(k):
        ln, pos = read_uvarint(buf, pos)
        lens.append(ln)
    blob = bytes(buf[pos:])
    if comp_tag == _GROUP_ZLIB:
        concat = zlib.decompress(blob)
    elif comp_tag == _GROUP_BZ2:
        import bz2 as _bz2

        concat = _bz2.decompress(blob)
    elif comp_tag == _GROUP_ZSTD:
        concat = _zstd().decompress(blob, sum(lens), asbytes=True)
    else:
        concat = blob
    out = []
    off = 0
    for ln in lens:
        out.append(concat[off : off + ln])
        off += ln
    return out


def group_codec_name(payload: bytes) -> str:
    comp = {
        _GROUP_STORE: "store",
        _GROUP_ZLIB: "zlib",
        _GROUP_BZ2: "bz2",
        _GROUP_ZSTD: "zstd",
    }
    k, pos = read_uvarint(payload, 1)
    return f"group[{k}]({comp.get(payload[pos], '?')})"


# -------------------------------------------------------------- dispatch ----

_INT_TAGS = {ids.INT_PLAIN, ids.INT_FOR, ids.INT_DELTA, ids.INT_RLE}


def decode_any(buf: bytes):
    """Recursive tagged-payload decode.

    Returns ``np.ndarray[int64]`` for non-null int payloads, else a
    ``pyarrow.Array`` (large_binary, or int64-with-nulls for NULLABLE
    int payloads).
    """
    tag = buf[0]
    if tag in _INT_TAGS:
        return ints.decode_ints(buf)
    if tag == ids.STR_PLAIN:
        return _decode_str_plain(buf, 1)
    if tag == ids.STR_DICT:
        return _decode_str_dict(buf, 1)
    if tag == ids.STR_FSST:
        return _decode_str_fsst(buf, 1)
    if tag == ids.CONST:
        return _decode_const(buf, 1)
    if tag == ids.ZLIB:
        return _decode_zlib(buf, 1)
    if tag == ids.BZ2:
        return _decode_bz2(buf, 1)
    if tag == ids.ZSTD:
        return _decode_zstd(buf, 1)
    if tag == ids.NULLABLE:
        return _decode_nullable(buf, 1)
    if tag == ids.ALP_DOUBLE:
        from . import alp  # lazy: alp's inner decode recurses through here

        return alp.decode(buf, decode_any)
    if tag == ids.BSS_DOUBLE:
        from . import bss  # lazy, mirroring ALP

        return bss.decode(buf)
    raise ValueError(f"unknown codec tag 0x{tag:02x}")


# --------------------------------------------------------- best-of entry ----


def encode_str_best_of(
    arr: pa.Array,
    *,
    allow_dict: bool = True,
    allow_fsst: bool = True,
    zlib_level: int = 6,
    candidates: list[str] | None = None,
) -> bytes:
    """Measured best-of string encoding; always includes the zlib baseline
    so the chosen payload is never larger than the reference codec's.
    """
    arr = _canonical(arr)
    n = len(arr)
    outs: list[bytes] = []
    uniq = 0
    if n > 0:
        uniq = pc.count_distinct(arr).as_py()
        if uniq == 1:
            return encode_const(arr[0].as_py(), n)
    plain = encode_str_plain(arr)
    outs.append(plain)
    outs.append(encode_zlib(plain, zlib_level))
    outs.append(encode_zstd(plain))
    want = candidates or []
    if (allow_dict and n and uniq <= max(2, n // 2)) or "dict" in want:
        outs.append(encode_str_dict(arr))
    if (allow_fsst and n) and ("fsst" in want or not want):
        lengths, data = str_parts(arr)
        if 0 < len(data) <= (1 << 22):  # FSST worth trying below ~4MB
            outs.append(encode_str_fsst(arr))
    return min(outs, key=len)
