"""BYTE_STREAM_SPLIT double codec (codecs/bss.py): bit-exact round
trips, the selector's three-way double pick (bits-view / ALP / BSS),
and the shrink claim on byte-structured mantissas."""

import numpy as np
import pytest

from duckdb_raquet_spark import selector
from duckdb_raquet_spark.codecs import bss, ids, registry


def _roundtrip(vals: np.ndarray) -> None:
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    out = registry.decode_any(bss.encode(vals))
    assert isinstance(out, np.ndarray) and out.dtype == np.int64
    assert (out == vals.view(np.int64)).all()


def test_roundtrip_smooth_and_random():
    rng = np.random.RandomState(11)
    _roundtrip(np.cumsum(rng.normal(0, 0.001, 2048)) + 1000.0)
    _roundtrip(rng.uniform(-1e9, 1e9, 2048))


def test_roundtrip_specials_bit_exact():
    # NaN payloads, -0.0, infinities, denormals — the transpose is a
    # byte bijection, so every IEEE-754 pattern must survive
    nan_payload = np.frombuffer(
        np.int64(0x7FF8_0000_DEAD_BEEF).tobytes(), dtype=np.float64
    )[0]
    vals = np.array(
        [np.nan, nan_payload, -0.0, 0.0, np.inf, -np.inf, 5e-324, 1.5e-308]
    )
    _roundtrip(vals)


def test_roundtrip_empty_and_single():
    _roundtrip(np.empty(0))
    _roundtrip(np.array([3.14159]))


def test_incompressible_stays_raw_arm():
    # high-entropy planes: neither zlib nor zstd helps, the raw arm
    # keeps overhead to the 1-byte comp id + header
    rng = np.random.RandomState(7)
    vals = rng.uniform(-1e300, 1e300, 512)
    payload = bss.encode(vals)
    assert len(payload) <= 8 * 512 + 16
    _roundtrip(vals)


def test_float32_upcast_shrinks_and_selector_picks_bss():
    # the domain case: embeddings processed in float32 then stored as
    # double — mantissa bytes 0..3 are all zero, so four of the eight
    # planes collapse; the int codecs see 64-bit-wide bit patterns and
    # cannot exploit it (measured -11.6% at 4096 values)
    rng = np.random.RandomState(3)
    vals = rng.normal(0, 0.05, 4096).astype(np.float32).astype(np.float64)
    bits_view = selector.encode_int_auto(vals.view(np.int64).copy(), 6)
    auto = selector.encode_double_auto(vals, 6)
    assert ids.codec_name(auto) == "bss"
    assert len(auto) < 0.95 * len(bits_view)
    out = registry.decode_any(auto)
    assert (out == vals.view(np.int64)).all()


def test_selector_keeps_alp_on_decimals_and_bits_on_walks():
    rng = np.random.RandomState(5)
    decimals = np.round(rng.uniform(0, 5000, 2048), 2)
    assert ids.codec_name(selector.encode_double_auto(decimals, 6)) == "alp"
    walk = np.cumsum(rng.normal(0, 0.001, 2048)) + 1000.0
    assert ids.codec_name(selector.encode_double_auto(walk, 6)).startswith(
        ("delta", "for", "plain", "zlib", "zstd", "rle")
    )


def test_force_plain_skips_bss():
    rng = np.random.RandomState(9)
    vals = rng.normal(0, 0.05, 512).astype(np.float32).astype(np.float64)
    payload = selector.encode_double_auto(vals, 6, force="plain")
    assert ids.codec_name(payload) == "plain"
