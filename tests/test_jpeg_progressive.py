"""Progressive (SOF2) JPEG decode — verified against the baseline twin:
both encoders quantize identically, so the progressive multi-scan
decode must land on bit-identical pixels."""

import numpy as np
import pytest

from duckdb_raquet_spark.functions import jpegcodec as jc
from duckdb_raquet_spark.functions import multimodal as mm


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _grad(h, w):
    y, x = np.ogrid[0:h, 0:w]
    return ((np.sin(x / 8.0) + np.cos(y / 9.0)) * 60 + 128).astype(np.uint8)


def test_progressive_gray_matches_baseline():
    gray = _grad(40, 56)
    base, _ = jc.decode_jpeg(jc.encode_jpeg(gray, quality=90))
    data = jc.encode_jpeg_progressive(gray, quality=90)
    assert b"\xff\xc2" in data  # really SOF2
    prog, meta = jc.decode_jpeg(data)
    assert np.array_equal(base, prog)
    assert _psnr(gray, prog[..., 0]) > 35
    assert (meta["width"], meta["height"]) == (56, 40)


def test_progressive_rgb_matches_baseline():
    y, x = np.ogrid[0:40, 0:56]
    rgb = np.stack(
        [((np.sin(x / 7.0 + c) + np.cos(y / 11.0)) * 50 + 128) for c in range(3)],
        axis=-1,
    ).astype(np.uint8)
    base, _ = jc.decode_jpeg(jc.encode_jpeg(rgb, quality=90))
    prog, _ = jc.decode_jpeg(jc.encode_jpeg_progressive(rgb, quality=90))
    assert np.array_equal(base, prog)
    assert _psnr(rgb, prog) > 30


def test_progressive_deep_al_chain_and_bands():
    """Al=2 gives two refinement scans per band; three spectral bands;
    odd dims exercise block padding/cropping."""
    y, x = np.ogrid[0:37, 0:51]
    rgb = np.stack(
        [((np.sin(x / 7.0 + c) + np.cos(y / 11.0)) * 50 + 128) for c in range(3)],
        axis=-1,
    ).astype(np.uint8)
    base, _ = jc.decode_jpeg(jc.encode_jpeg(rgb, quality=80))
    data = jc.encode_jpeg_progressive(
        rgb, quality=80, bands=((1, 2), (3, 20), (21, 63)), al=2
    )
    prog, _ = jc.decode_jpeg(data)
    assert np.array_equal(base, prog)


def test_progressive_noise_and_flat_extremes():
    """Noise stresses ZRL + refinement correction-bit interleaving;
    flat blocks stress long EOB runs."""
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    base, _ = jc.decode_jpeg(jc.encode_jpeg(noise, quality=60))
    prog, _ = jc.decode_jpeg(jc.encode_jpeg_progressive(noise, quality=60))
    assert np.array_equal(base, prog)
    flat = np.full((17, 19), 77, np.uint8)
    base, _ = jc.decode_jpeg(jc.encode_jpeg(flat, quality=90))
    prog, _ = jc.decode_jpeg(jc.encode_jpeg_progressive(flat, quality=90))
    assert np.array_equal(base, prog)


def test_image_features_decodes_progressive(spark):
    """The multimodal pipeline decodes SOF2 rows for real now — no
    silent skip for the double-digit progressive fraction of a crawl."""
    gray = _grad(16, 16)
    rows = [
        (0, jc.encode_jpeg_progressive(gray, quality=95)),
        (1, jc.encode_jpeg(gray, quality=95)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, img binary")
    got = {r["id"]: r for r in mm.image_features(df, "doc_id", "img").collect()}
    assert sorted(got) == [0, 1]
    # identical quantization -> identical features
    assert got[0]["features"] == got[1]["features"]


def test_arithmetic_and_lossless_still_rejected():
    gray = _grad(16, 16)
    data = bytearray(jc.encode_jpeg(gray))
    i = bytes(data).find(b"\xff\xc0")
    for marker in (0xC3, 0xC9, 0xCA):
        data[i + 1] = marker
        with pytest.raises(NotImplementedError):
            jc.decode_jpeg(bytes(data))


def test_ac_refine_token_torture():
    """Coefficient-level torture for the AC refinement scan pair:
    random sparse bands (long zero runs, history coefficients, newly
    significant ones, EOB runs across blocks) must round-trip exactly
    through _ac_first_scan(al=1) + _ac_refine_scan(al=0) vs the
    decoder. Regression guard for the ZRL/correction-bit interleaving
    (a deferred ZRL after a buffered history bit silently corrupted
    coefficients)."""
    rng = np.random.default_rng(99)
    ss, se = 1, 63
    for trial in range(25):
        nblocks = int(rng.integers(1, 6))
        zz = np.zeros((nblocks, 64), dtype=np.int32)
        for b in range(nblocks):
            for _ in range(int(rng.integers(0, 7))):
                k = int(rng.integers(ss, se + 1))
                zz[b, k] = int(rng.choice([-7, -5, -2, -1, 1, 2, 3, 9]))
        # deliberately include the repro shape sometimes
        if trial % 5 == 0 and nblocks > 0:
            zz[0, :] = 0
            zz[0, ss + 17] = 5
            zz[0, ss + 18] = 1

        def play(tk, dests, ah, al_):
            syms = tk.syms
            if syms:
                bits_spec, vals, _codes = jc._fixed_huff(syms)
                table = jc._huff_map(bits_spec, vals)
                _, _, codes = jc._fixed_huff(syms)
            else:
                table, codes = {}, {}
            bw = jc._BitWriter()
            tk.write(bw, codes)
            bw.flush()
            r = jc._BitReader(bytes(bw.out) + b"\xff\xd9", 0)
            eobrun = 0
            for d in dests:
                if ah == 0:
                    eobrun = jc._ac_first(r, d, table, ss, se, al_, eobrun)
                else:
                    eobrun = jc._ac_refine(r, d, table, ss, se, al_, eobrun)

        got = [np.zeros(64, dtype=np.int64) for _ in range(nblocks)]
        play(jc._ac_first_scan(zz, ss, se, 1), got, 0, 1)
        play(jc._ac_refine_scan(zz, ss, se, 0), got, 1, 0)
        for b in range(nblocks):
            assert list(got[b]) == list(zz[b]), (trial, b)
