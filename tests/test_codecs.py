"""Codec layer tests — literal-byte goldens + bit-exact round-trip
properties, mirroring the reference codec suite style
(/root/reference/test/sql/raster.test:13-42 asserts known bytes; our
FIXTURES.md F2 is the webtext translation)."""

import zlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_raquet_spark.codecs import (
    bitpack,
    decode_any,
    decode_ints,
    encode_const,
    encode_delta,
    encode_for,
    encode_int_best,
    encode_nullable,
    encode_plain,
    encode_rle,
    encode_str_best_of,
    encode_str_dict,
    encode_str_fsst,
    encode_str_plain,
    encode_zlib,
    fsst,
    ids,
)


def bins(vals) -> pa.Array:
    return pa.array(vals, type=pa.large_binary())


# ------------------------------------------------------------- goldens ----


def test_bitpack_golden_bytes():
    # values [1,2,3,4] at width 3, LSB-first: 001 010 011 100 -> bits
    # 1,0,0,0,1,0,1,1,0,0,0,1 -> bytes 0xD1 0x08
    out = bitpack.pack(np.array([1, 2, 3, 4], dtype=np.uint64), 3)
    assert out == bytes([0b11010001, 0b00001000])
    assert np.array_equal(
        bitpack.unpack(out, 4, 3), np.array([1, 2, 3, 4], dtype=np.uint64)
    )


def test_for_golden_bytes():
    # [100, 101, 103]: ref=100 (zigzag varint C8 01), width=2; shifted
    # values 0,1,3 LSB-first -> bit stream 00 10 11 -> byte 0b00110100
    buf = encode_for(np.array([100, 101, 103], dtype=np.int64))
    assert buf == bytes([ids.INT_FOR, 3, 0xC8, 0x01, 2, 0b00110100])


def test_rle_golden_small():
    buf = encode_rle(np.array([7, 7, 7, 9, 9], dtype=np.int64))
    assert buf[0] == ids.INT_RLE
    assert np.array_equal(decode_ints(buf), np.array([7, 7, 7, 9, 9]))


def test_const_golden():
    buf = encode_const(b"en", 4)
    assert buf == bytes([ids.CONST, 4]) + b"en"
    assert decode_any(buf).to_pylist() == [b"en"] * 4


def test_stats_reference_values():
    # the reference's Welford golden: [10,20,30,40] -> stddev 12.9099
    arr = np.array([10.0, 20.0, 30.0, 40.0])
    assert arr.sum() == 100 and arr.mean() == 25
    assert abs(np.std(arr, ddof=1) - 12.9099) < 1e-4


# ---------------------------------------------------------- round trips ----


CASES_INT = [
    np.array([], dtype=np.int64),
    np.array([0], dtype=np.int64),
    np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, -1, 0, 1], dtype=np.int64),
    np.sort(np.random.default_rng(1).integers(0, 2**62, 4000)),
    np.repeat(np.arange(5, dtype=np.int64), 1000),
]


@pytest.mark.parametrize("arr", CASES_INT, ids=range(len(CASES_INT)))
@pytest.mark.parametrize(
    "enc", [encode_plain, encode_for, encode_delta, encode_rle, encode_int_best]
)
def test_int_round_trip(arr, enc):
    assert np.array_equal(decode_ints(enc(arr.astype(np.int64))), arr)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_int_round_trip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(decode_ints(encode_int_best(arr)), arr)


CASES_STR = [
    [],
    [b""],
    [b"", b"", b""],
    [b"a", b"bb", b"ccc" * 100],
    [b"\xff" * 9, b"\x00", bytes(range(256))],
    [b"same"] * 50,
    [f"https://d{i % 7}.example.com/p/{i}".encode() for i in range(500)],
]


@pytest.mark.parametrize("vals", CASES_STR, ids=range(len(CASES_STR)))
@pytest.mark.parametrize(
    "enc",
    [encode_str_plain, encode_str_dict, encode_str_fsst, encode_str_best_of],
)
def test_str_round_trip(vals, enc):
    arr = bins(vals)
    back = decode_any(enc(arr))
    assert back.cast(pa.large_binary()).equals(arr)


@given(st.lists(st.binary(max_size=200), max_size=80))
@settings(max_examples=60, deadline=None)
def test_str_round_trip_property(vals):
    arr = bins(vals)
    back = decode_any(encode_str_best_of(arr))
    assert back.cast(pa.large_binary()).equals(arr)


def test_nullable_round_trips():
    validity = np.array([True, False, True, False, True])
    sbuf = encode_nullable(validity, encode_str_plain(bins([b"x", b"yy", b""])))
    assert decode_any(sbuf).to_pylist() == [b"x", None, b"yy", None, b""]
    ibuf = encode_nullable(
        validity, encode_int_best(np.array([5, 6, 7], dtype=np.int64))
    )
    assert decode_any(ibuf).to_pylist() == [5, None, 6, None, 7]


def test_zlib_wrapper_is_reference_codec():
    arr = bins([b"hello world " * 50] * 20)
    buf = encode_zlib(encode_str_plain(arr))
    assert buf[0] == ids.ZLIB
    # body after tag is a raw zlib stream, like the reference's blobs
    assert zlib.decompress(buf[1:])[0] == ids.STR_PLAIN
    assert decode_any(buf).equals(arr)


def test_bz2_wrapper_round_trip():
    import bz2 as _bz2

    from duckdb_raquet_spark.codecs import encode_bz2

    arr = bins([b"per-domain template text, repeated " * 30] * 40)
    buf = encode_bz2(encode_str_plain(arr))
    assert buf[0] == ids.BZ2
    assert _bz2.decompress(buf[1:])[0] == ids.STR_PLAIN
    assert decode_any(buf).equals(arr)


def test_bz2_gate_picks_bz2_on_big_boilerplate_payloads():
    """Blocks of webtext with cross-row template repeats beyond zlib's
    32 KB window: the selector's sampled estimate must commit to bz2 and
    the chosen payload must beat the zlib baseline."""
    from duckdb_raquet_spark import selector

    rng = np.random.default_rng(42)
    words = [f"w{i}" for i in range(4000)]
    rows = []
    for i in range(400):
        body = " ".join(words[j % 4000] for j in rng.integers(0, 4000, 120))
        rows.append((f"welcome to d{i % 7:04d} official page terms privacy " + body).encode())
    arr = bins(rows)
    payload = selector.encode_str_auto(arr)
    assert payload[0] == ids.BZ2
    baseline = encode_zlib(encode_str_plain(arr))
    assert len(payload) < len(baseline)
    assert decode_any(payload).equals(arr)


# ---------------------------------------------------------------- fsst ----


def test_fsst_round_trip_with_escapes():
    data = b"\xff\xffabc\xff" + bytes(range(256)) * 3
    table = fsst.build_table(data)
    assert fsst.decompress(fsst.compress(data, table), table) == data


def test_fsst_compresses_urls_and_is_deterministic():
    urls = b"".join(
        f"https://domain{i % 9}.example.com/path/to/page/{i}".encode()
        for i in range(800)
    )
    t1 = fsst.build_table(urls)
    t2 = fsst.build_table(urls)
    assert t1 == t2  # deterministic build (seeded-sample analog)
    enc = fsst.compress(urls, t1)
    assert len(enc) < len(urls) / 2
    assert fsst.decompress(enc, t1) == urls


def test_best_of_never_worse_than_zlib_baseline():
    rng = np.random.default_rng(42)
    tables = [
        bins([rng.choice([b"en", b"de", b"fr"]) for _ in range(2000)]),
        bins([bytes(rng.integers(0, 256, 300, dtype=np.uint8)) for _ in range(50)]),
        bins([b"boilerplate sentence. " * 40 + f"{i}".encode() for i in range(200)]),
    ]
    for arr in tables:
        best = encode_str_best_of(arr)
        baseline = encode_zlib(encode_str_plain(arr))
        assert len(best) <= len(baseline)


# ---------------------------------------------------------------- zstd ----


def test_zstd_wrapper_round_trip():
    import pyarrow as _pa

    from duckdb_raquet_spark.codecs import encode_zstd
    from duckdb_raquet_spark.codecs.util import read_uvarint

    arr = bins([b"zstd wraps the plain payload " * 20] * 30)
    inner = encode_str_plain(arr)
    buf = encode_zstd(inner)
    assert buf[0] == ids.ZSTD
    # frame after the tag: uvarint raw length + a raw zstd frame
    raw_len, pos = read_uvarint(buf, 1)
    assert raw_len == len(inner)
    assert (
        bytes(_pa.Codec("zstd").decompress(buf[pos:], raw_len, asbytes=True))
        == inner
    )
    assert decode_any(buf).equals(arr)
    assert ids.codec_name(buf) == "zstd"


def test_zstd_forced_override_and_nullable():
    from duckdb_raquet_spark import selector

    arr = pa.array(
        [b"row %d body text" % i for i in range(200)], type=pa.large_binary()
    )
    payload = selector.encode_str_auto(arr, force="zstd")
    assert payload[0] == ids.ZSTD
    assert decode_any(payload).equals(arr)

    vals = [b"x" * 50, None] * 100
    nullable = pa.array(vals, type=pa.large_binary())
    p, name, _ = selector.encode_column_arrow(nullable, "binary", force="zstd")
    assert name == "nullable(zstd)"
    assert decode_any(p).cast(pa.large_binary()).to_pylist() == vals


def test_effort_fast_leads_with_zstd_and_skips_zlib_when_clear():
    """On a big low-boilerplate payload where zstd ~ zlib, fast effort
    must still produce a decodable payload no larger than ~the zlib
    baseline; on payloads where zstd clearly wins the sampled estimate
    the zlib confirmation pass is skipped (not observable in the bytes,
    but the chosen codec must then BE zstd)."""
    from duckdb_raquet_spark import selector

    rng = np.random.default_rng(7)
    # web-ish text with heavy repeats: zstd-3's 8 MB window beats
    # zlib's 32 KB horizon decisively -> sampled gate skips zlib
    rows = [
        (b"<div class=nav>home about contact</div>" * 12 + b"%d" % i)
        for i in range(3000)
    ]
    arr = bins(rows)
    payload = selector.encode_str_auto(arr, effort=selector.EFFORT_FAST)
    assert payload[0] in (ids.ZSTD, ids.STR_DICT, ids.ZLIB)
    baseline = encode_zlib(encode_str_plain(arr))
    assert len(payload) <= int(1.03 * len(baseline))
    assert decode_any(payload).equals(arr)
    # high-entropy blob: zstd cannot clearly win -> zlib raced too, and
    # the result still respects the baseline
    blob = bins([bytes(rng.integers(0, 256, 40_000, dtype=np.uint8)) for _ in range(8)])
    p2 = selector.encode_str_auto(blob, effort=selector.EFFORT_FAST)
    assert len(p2) <= len(encode_zlib(encode_str_plain(blob))) + 16
    assert decode_any(p2).equals(blob)


def test_group_zstd_arm_round_trips():
    from duckdb_raquet_spark.codecs.registry import (
        decode_group,
        encode_group,
        group_codec_name,
    )

    inners = [
        encode_str_plain(bins([b"member one text " * 40] * 50)),
        encode_plain(np.arange(50, dtype=np.int64)),
    ]
    buf = encode_group(inners, effort="fast")
    assert decode_group(buf) == inners
    assert group_codec_name(buf).startswith("group[2](")


@given(st.lists(st.binary(max_size=200), min_size=1, max_size=80))
@settings(max_examples=40, deadline=None)
def test_zstd_wrapper_round_trip_property(vals):
    from duckdb_raquet_spark.codecs import encode_zstd

    arr = bins(vals)
    back = decode_any(encode_zstd(encode_str_plain(arr)))
    assert back.cast(pa.large_binary()).equals(arr)


@given(st.lists(st.binary(max_size=150), min_size=1, max_size=60))
@settings(max_examples=30, deadline=None)
def test_effort_fast_round_trip_property(vals):
    from duckdb_raquet_spark import selector

    arr = bins(vals)
    back = decode_any(selector.encode_str_auto(arr, effort=selector.EFFORT_FAST))
    assert back.cast(pa.large_binary()).equals(arr)
