"""MJPEG-in-AVI container codec (functions/avicodec.py): RIFF walk,
bit-exact flat-block round trips, containment, and the video kernel /
sniff integration."""

import numpy as np
import pytest

from duckdb_raquet_spark.functions import avicodec as avc
from duckdb_raquet_spark.functions import multimodal as mm


def _block_frames(key: int, n: int, hb: int = 2, wb: int = 3) -> np.ndarray:
    r = np.arange(hb)[:, None]
    c = np.arange(wb)[None, :]
    out = np.empty((n, hb * 8, wb * 8), dtype=np.uint8)
    for k in range(n):
        blocks = ((key * 31 + 17 * k + 5 * r + 3 * c) % 251).astype(np.uint8)
        out[k] = np.kron(blocks, np.ones((8, 8), np.uint8))
    return out


def test_gray_roundtrip_bit_exact():
    # constant 8x8 blocks are DC-only through the JPEG transform and
    # survive quantization exactly — THE property the closed-form
    # mm_video_avi oracle rests on
    fr = _block_frames(42, 5)
    payload = avc.encode_avi(fr, fps=12, quality=90)
    dec, meta = avc.decode_avi(payload)
    assert meta["n_frames"] == 5 and meta["n_frames_declared"] == 5
    assert (meta["height"], meta["width"], meta["channels"]) == (16, 24, 1)
    assert (dec[..., 0] == fr).all()


def test_rgb_roundtrip_bit_exact():
    # gray-valued RGB (R=G=B per block): Y equals the gray value and
    # both chroma planes are the constant 128, all flat blocks
    g = _block_frames(7, 3)
    fr = np.repeat(g[..., None], 3, axis=3)
    dec, meta = avc.decode_avi(avc.encode_avi(fr, quality=85))
    assert meta["channels"] == 3
    assert (dec == fr).all()


def test_odd_sized_chunks_are_padded():
    # force at least one odd-length JPEG payload across keys and check
    # the word-alignment walk still finds every frame
    for key in range(6):
        fr = _block_frames(key, 2 + key % 4)
        payload = avc.encode_avi(fr)
        dec, meta = avc.decode_avi(payload)
        assert meta["n_frames"] == len(fr)
        assert (dec[..., 0] == fr).all()


def test_not_avi_and_truncated_raise():
    with pytest.raises(ValueError):
        avc.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    payload = avc.encode_avi(_block_frames(1, 3))
    with pytest.raises(ValueError):
        avc.decode_avi(payload[: len(payload) // 3])  # movi cut off


def test_synth_matches_closed_form():
    key = 123
    frames, meta = avc.decode_avi(mm.synth_avi_bytes(key))
    assert meta["n_frames"] == 2 + key % 4
    r = np.arange(2)[:, None]
    c = np.arange(3)[None, :]
    for k in range(meta["n_frames"]):
        blocks = ((key * 31 + 17 * k + 5 * r + 3 * c) % 251).astype(np.uint8)
        assert (frames[k, ..., 0] == np.kron(blocks, np.ones((8, 8), np.uint8))).all()


def test_video_kernel_and_sniff(spark):
    from pyspark.sql import functions as F

    df = spark.range(4).select(F.col("id").cast("long").alias("doc_id"))
    avis = mm.synth_avi_column(df, "doc_id", "avi")
    fmt = avis.select(
        mm.media_format_col(F.col("avi")).alias("fmt")
    ).distinct().collect()
    assert [row.fmt for row in fmt] == ["avi"]

    rows = mm.video_frame_sample(avis, "doc_id", "avi", stride=4).collect()
    by_id = {}
    for row in rows:
        by_id.setdefault(row.id, []).append(row)
    for key, rws in by_id.items():
        n = 2 + key % 4
        assert sorted(r.frame_idx for r in rws) == list(range(0, n, 4))
        for r in rws:
            blocks = (
                key * 31 + 17 * r.frame_idx
                + 5 * np.arange(2)[:, None] + 3 * np.arange(3)[None, :]
            ) % 251
            assert r.chan0_sum == 64 * int(blocks.sum())
            assert r.n_pixels == 384 and r.n_frames == n
