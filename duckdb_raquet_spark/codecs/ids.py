"""Codec id registry — 1-byte tags at the head of every encoded payload.

The per-column codec id stored with each block mirrors the reference
recording its compression name in the manifest and dispatching decode on
it (/root/reference/src/raster/band_decoder.cpp:300-373 dispatches
gzip/jpeg/webp/none; /root/reference/src/include/raquet_metadata.hpp
carries the codec id). Lossy codecs are deliberately absent: webtext
decode must be bit-identical.
"""

INT_PLAIN = 0x00   # raw little-endian int64
INT_FOR = 0x01     # frame-of-reference + bit-pack
INT_DELTA = 0x02   # first value + zigzag deltas (FoR+bit-packed)
INT_RLE = 0x03     # run values + run lengths, each FoR+bit-packed
ALP_DOUBLE = 0x04  # ALP decimal-scaled doubles: (e, f) + exceptions +
                   #   inner int payload of round(d * 10^e / 10^f)
                   #   (Afroozeh & Boncz, SIGMOD 2024; codecs/alp.py)
BSS_DOUBLE = 0x05  # BYTE_STREAM_SPLIT doubles: byte-plane transpose +
                   #   zlib/zstd (Parquet Encodings.md; codecs/bss.py)
STR_PLAIN = 0x10   # lengths payload + concatenated bytes
STR_DICT = 0x11    # dictionary payload + integer codes payload
STR_FSST = 0x12    # FSST symbol table + compressed concat + lengths
ZLIB = 0x20        # zlib-wrapped inner payload (the reference's codec,
                   #   /root/reference/src/raster/band_encoder.cpp:190-203)
BZ2 = 0x21         # bz2-wrapped inner payload — 900 KB block-sort window
                   #   catches cross-row boilerplate repeats that zlib's
                   #   32 KB window cannot; sample-gated (selector.py)
ZSTD = 0x22        # zstd-wrapped inner payload (pyarrow's bundled codec):
                   #   ~zlib-6 size at ~7x zlib encode / ~4x zlib decode
                   #   speed on webtext — the fast-effort workhorse. Framed
                   #   with the raw length (zstd decompress needs it)
NULLABLE = 0x30    # validity bitmap + inner payload of valid values only
CONST = 0x31       # single repeated value (strings or ints)
GROUP = 0x32       # k member payloads compressed as ONE stream — the
                   #   interleaved column-group layout (the reference's
                   #   interleave_bands, band_encoder.cpp:333-352):
                   #   correlated columns share one compression window
                   #   and one fetch

NAMES = {
    INT_PLAIN: "plain",
    INT_FOR: "for+bitpack",
    INT_DELTA: "delta+for+bitpack",
    INT_RLE: "rle",
    ALP_DOUBLE: "alp",
    BSS_DOUBLE: "bss",
    STR_PLAIN: "str_plain",
    STR_DICT: "dict",
    STR_FSST: "fsst",
    ZLIB: "zlib",
    BZ2: "bz2",
    ZSTD: "zstd",
    NULLABLE: "nullable",
    CONST: "const",
    GROUP: "group",
}


def codec_name(payload: bytes) -> str:
    """Human-readable codec chain of a tagged payload (for metrics/JSON)."""
    if not payload:
        return "empty"
    tag = payload[0]
    name = NAMES.get(tag, f"0x{tag:02x}")
    if tag in (ZLIB, BZ2, ZSTD):
        return NAMES[tag]
    if tag == NULLABLE:
        # nullable header: n varint + bitmap, then inner payload
        from .util import read_uvarint

        n, pos = read_uvarint(payload, 1)
        pos += (n + 7) // 8
        return f"nullable({codec_name(payload[pos:])})"
    return name
