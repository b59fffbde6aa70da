"""Pure numpy/pyarrow codec kernels — no Spark dependency.

Mirrors the reference's codec layer being pure inverse functions over
byte buffers (/root/reference/src/raster/band_encoder.cpp /
band_decoder.cpp), re-expressed for webtext columns: dictionary, RLE,
FSST symbol tables, frame-of-reference + bit-packing, delta, zlib
baseline, bz2 (sample-gated), zstd (pyarrow's bundled codec), plus
NULLABLE/CONST wrappers and interleaved column GROUPs.
``decode_any(encode(x)) == x`` bit-for-bit is the layer's contract
(tests/test_codecs.py).
"""

from . import bitpack, fsst, ids, ints, registry, util  # noqa: F401
from .ids import codec_name  # noqa: F401
from .ints import decode_ints, encode_delta, encode_for, encode_int_best, encode_plain, encode_rle  # noqa: F401
from .registry import (  # noqa: F401
    decode_any,
    encode_bz2,
    encode_const,
    encode_nullable,
    encode_str_best_of,
    encode_str_dict,
    encode_str_fsst,
    encode_str_plain,
    encode_zlib,
    encode_zstd,
    str_from_parts,
    str_parts,
)
