"""Perceptual video hash (multimodal.video_ahash / video_dup_pairs):
container invariance, majority-vote robustness, containment."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_raquet_spark.functions import avicodec as avc
from duckdb_raquet_spark.functions import imagecodec as ic
from duckdb_raquet_spark.functions import multimodal as mm


def _block_frames(key: int, n: int) -> np.ndarray:
    r = np.arange(2)[:, None]
    c = np.arange(3)[None, :]
    out = np.empty((n, 16, 24), dtype=np.uint8)
    for k in range(n):
        blocks = ((key * 31 + 17 * k + 5 * r + 3 * c) % 251).astype(np.uint8)
        out[k] = np.kron(blocks, np.ones((8, 8), np.uint8))
    return out


def _hash_of(spark, payloads: list[bytes]) -> list[int]:
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "id long, v binary",
    )
    rows = mm.video_ahash(df, "id", "v").orderBy("id").collect()
    return [r.vhash for r in rows]


def test_gif_and_avi_of_same_frames_hash_identically(spark):
    # block-constant frames survive MJPEG bit-exactly AND GIF is
    # lossless, so the two containers decode to identical pixels —
    # the signature must not see the container
    fr = _block_frames(9, 4)
    gif = ic.encode_gif(fr)
    avi = avc.encode_avi(fr, quality=90)
    h = _hash_of(spark, [gif, avi])
    assert h[0] == h[1]


def test_majority_survives_reorder_and_frame_drop(spark):
    fr = _block_frames(3, 5)
    base = avc.encode_avi(fr)
    reordered = avc.encode_avi(fr[::-1])
    dropped = avc.encode_avi(fr[:4])  # drop the last frame
    h = _hash_of(spark, [base, reordered, dropped])
    assert h[0] == h[1]  # majority is order-insensitive
    # dropping one of five frames can flip only bits where the vote
    # was 3-2; on this pattern it stays within a few bits
    assert bin((h[0] ^ h[2]) & ((1 << 64) - 1)).count("1") <= 3


def test_mark_mode_and_pairs(spark):
    fr = _block_frames(5, 4)
    good = avc.encode_avi(fr)
    df = spark.createDataFrame(
        [
            (0, bytearray(good)),
            (1, bytearray(good)),  # exact dup
            (2, bytearray(b"\x00garbage")),
            (3, None),
        ],
        "id long, v binary",
    )
    # deterministic=False: non-GIF/AVI payloads raise (and are marked)
    # instead of falling back to the legacy seeded fake
    sig = (
        mm.video_ahash(df, "id", "v", deterministic=False, on_error="mark")
        .orderBy("id")
        .collect()
    )
    assert [r.vhash is None for r in sig] == [False, False, True, True]
    pairs = mm.video_dup_pairs(
        df, "id", "v", max_hamming=3, deterministic=False
    ).collect()
    assert [(p.a, p.b, p.hamming) for p in pairs] == [(0, 1, 0)]


def test_strict_majority_ties_clear():
    # 2 frames with opposite bit patterns -> every vote ties 1-1 ->
    # strict majority clears every bit
    a = np.zeros((8, 8), dtype=np.uint8)
    a[:4] = 255  # top half bright: top cells above mean
    b = 255 - a
    gif = ic.encode_gif(np.stack([a, b]))
    # replicate the kernel math directly (no Spark needed)
    frames, _ = ic.decode_gif(gif)
    gray = frames.astype(np.int64).sum(axis=-1)
    cells = gray.reshape(2, 64)
    bits = cells * 64 > cells.sum(axis=1, keepdims=True)
    maj = 2 * bits.sum(axis=0) > 2
    assert not maj.any()


def test_media_dedup_keeps_first_and_corrupt_rows(spark):
    fr_a = _block_frames(11, 4)
    fr_b = 255 - fr_a  # inverse pattern: every threshold bit flips
    dup_a = avc.encode_avi(fr_a)        # ids 0, 1: exact dups
    uniq = avc.encode_avi(fr_b)         # id 2: unique
    df = spark.createDataFrame(
        [
            (0, bytearray(dup_a)),
            (1, bytearray(dup_a)),
            (2, bytearray(uniq)),
            (3, bytearray(b"not a video")),  # corrupt: must be KEPT
        ],
        "id long, v binary",
    )
    kept = mm.media_dedup(
        df, "id", "v", kind="video", deterministic=False, on_error="skip"
    )
    assert sorted(r.id for r in kept.collect()) == [0, 2, 3]
    with pytest.raises(ValueError):
        mm.media_dedup(df, "id", "v", kind="gifs")
