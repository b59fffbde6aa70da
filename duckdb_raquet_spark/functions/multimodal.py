"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video/html exactly as the engine treats encoded block
payloads — `binary` columns moved through Arrow in vectorized batches,
never per-row Python objects in the hot loop. The actual media decoding
(PIL/ffmpeg/etc.) is NOT available in this environment, so the decode
kernels are explicitly stubbed: `deterministic=True` substitutes a
seeded, content-derived fake (stable across runs, so tests and oracles
hold), otherwise they raise NotImplementedError. The Spark-side surface
— schemas, mapInPandas batch shapes, partition sizing — is real and
tested; swapping in a real decoder touches only the `_decode_*_kernel`
functions.

The reference's analogous layer is its per-band BLOB decode dispatch
(/root/reference/src/raster/band_decoder.cpp:300-373: codec id ->
gzip/jpeg/webp kernel), where lossy media codecs already live behind the
same interface as the lossless ones.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "width int, height int, channels int, format string, n_bytes long"
)
AUDIO_META_SCHEMA = "sample_rate int, n_samples long, channels int, format string"


def _seed_of(payload: bytes) -> int:
    return int.from_bytes(hashlib.md5(payload).digest()[:4], "little")


def _decode_image_kernel(
    payload: bytes, deterministic: bool
) -> tuple[np.ndarray, dict]:
    """STUB: payload -> (H, W, C) uint8 array + metadata.

    Real implementation would dispatch on magic bytes to a JPEG/PNG/WebP
    decoder; this container has no image libs, so `deterministic=True`
    yields a content-derived fake: dims and fill value come from md5 hex
    slices (width = 8 + hex[0:8] % 25, height = 8 + hex[8:16] % 25,
    fill v = hex[16:24] % 254; channel c holds v + c). Closed-form on
    purpose — any ANSI engine with md5 can predict the downstream
    features exactly, so the whole mapInPandas plumbing is
    oracle-checkable even though the decode is fake."""
    if not deterministic:
        raise NotImplementedError("image decoding requires PIL/libvips (not bundled)")
    hx = hashlib.md5(payload).hexdigest()
    w = 8 + int(hx[0:8], 16) % 25
    h = 8 + int(hx[8:16], 16) % 25
    v = int(hx[16:24], 16) % 254
    arr = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        arr[..., c] = v + c
    meta = {
        "width": int(w),
        "height": int(h),
        "channels": 3,
        "format": "fake",
        "n_bytes": len(payload),
    }
    return arr, meta


def _decode_audio_kernel(
    payload: bytes, deterministic: bool
) -> tuple[np.ndarray, dict]:
    """STUB: payload -> float32 PCM + metadata (same contract as above)."""
    if not deterministic:
        raise NotImplementedError("audio decoding requires ffmpeg/soundfile (not bundled)")
    rng = np.random.default_rng(_seed_of(payload))
    n = 256 + int(rng.integers(0, 1024))
    return rng.standard_normal(n).astype(np.float32), {
        "sample_rate": 16000,
        "n_samples": n,
        "channels": 1,
        "format": "fake",
    }


def image_metadata(
    df: DataFrame, binary_col: str, *, deterministic: bool = True
) -> DataFrame:
    """Attach typed image metadata to every row — mapInPandas over Arrow
    batches; the per-row loop touches only the binary payloads of one
    batch at a time (bounded memory per task at any table size)."""
    cols = df.columns
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols]
        + ["img_meta struct<" + IMAGE_META_SCHEMA.replace(", ", ",").replace(" ", ":") + ">"]
    )

    def fn(batches):
        for pdf in batches:
            metas = [
                _decode_image_kernel(bytes(p), deterministic)[1]
                if p is not None
                else None
                for p in pdf[binary_col]
            ]
            pdf = pdf.copy()
            pdf["img_meta"] = metas
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)


def image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    resize: tuple[int, int] = (4, 4),
    deterministic: bool = True,
) -> DataFrame:
    """Decode -> resize -> per-channel mean feature vector.

    The feature math (nearest-neighbor resize + channel means) is real
    numpy over whatever the decode kernel yields; only the decode is
    stubbed. Output: (id, features array<float>, width, height)."""
    rh, rw = resize

    def fn(batches):
        for pdf in batches:
            ids, feats, ws, hs = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    continue
                arr, meta = _decode_image_kernel(bytes(p), deterministic)
                yi = np.linspace(0, arr.shape[0] - 1, rh).astype(int)
                xi = np.linspace(0, arr.shape[1] - 1, rw).astype(int)
                small = arr[np.ix_(yi, xi)]
                feats.append(
                    (small.reshape(-1, small.shape[-1]).mean(axis=0) / 255.0)
                    .astype(np.float32)
                    .tolist()
                )
                ids.append(i)
                ws.append(meta["width"])
                hs.append(meta["height"])
            yield pd.DataFrame(
                {"id": ids, "features": feats, "width": ws, "height": hs}
            )

    return df.mapInPandas(
        fn, schema="id long, features array<float>, width int, height int"
    )


def audio_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    frame: int = 256,
    hop: int = 128,
    deterministic: bool = True,
) -> DataFrame:
    """Decode audio -> framed RMS energies (the frame-sample pattern for
    av payloads). Output: (id, frame_idx, rms) — one row per frame, so
    downstream ops stay relational."""

    def fn(batches):
        for pdf in batches:
            ids, idxs, rms = [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    continue
                pcm, _ = _decode_audio_kernel(bytes(p), deterministic)
                n_frames = max(0, 1 + (len(pcm) - frame) // hop)
                for fidx in range(n_frames):
                    seg = pcm[fidx * hop : fidx * hop + frame]
                    ids.append(i)
                    idxs.append(fidx)
                    rms.append(float(np.sqrt(np.mean(seg * seg))))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "rms": rms})

    return df.mapInPandas(fn, schema="id long, frame_idx int, rms double")


def binary_stats_col(binary_col: str | Column) -> list[Column]:
    """Cheap JVM-side binary profiling (no decode, no Python): size, a
    64-bit hash, and a 128-bit md5 — exact-dup detection over media.

    Grouping on (n_bytes, content_hash, content_md5) is 192 bits of
    digest: a 64-bit hash alone collides at the ~2^32 birthday bound,
    i.e. with certainty at 10^12 media payloads; the composite is
    collision-free for any non-adversarial corpus, and an engineered md5
    collision still differs in xxhash64."""
    c = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    return [
        F.length(c).alias("n_bytes"),
        F.xxhash64(c).alias("content_hash"),
        F.md5(c).alias("content_md5"),
    ]


def _decode_video_kernel(
    payload: bytes, deterministic: bool
) -> tuple[np.ndarray, dict]:
    """STUB: payload -> (n_frames, H, W, C) uint8 + metadata. A real
    implementation would demux/decode via ffmpeg/pyav (not bundled);
    the deterministic fake extends the image stub with a time axis:
    n_frames = 4 + hex[24:28] % 13, frame k filled with (v + k) % 254
    (+ channel index) — closed-form on md5, so frame sampling has an
    exact SQL oracle."""
    if not deterministic:
        raise NotImplementedError("video decoding requires ffmpeg/pyav (not bundled)")
    hx = hashlib.md5(payload).hexdigest()
    w = 8 + int(hx[0:8], 16) % 25
    h = 8 + int(hx[8:16], 16) % 25
    v = int(hx[16:24], 16) % 254
    n = 4 + int(hx[24:28], 16) % 13
    frames = np.empty((n, h, w, 3), dtype=np.uint8)
    for k in range(n):
        base = (v + k) % 254
        for c in range(3):
            frames[k, ..., c] = base + c
    meta = {
        "n_frames": int(n), "width": int(w), "height": int(h),
        "channels": 3, "format": "fake", "n_bytes": len(payload),
    }
    return frames, meta


def video_frame_sample(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    stride: int = 4,
    deterministic: bool = True,
) -> DataFrame:
    """Frame sampling over video payloads — the third leg of the
    multimodal plumbing (image features / audio frames / video frame
    sampling): decode (stubbed), keep every ``stride``-th frame, emit
    one relational row per sampled frame with its channel-0 mean.
    Arrow-batched mapInPandas; the per-frame loop is numpy over the
    decoded array, never per-pixel Python."""
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def fn(batches):
        for pdf in batches:
            ids, idxs, chan0, nfs = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    continue
                frames, meta = _decode_video_kernel(bytes(p), deterministic)
                n = meta["n_frames"]
                for k in range(0, n, stride):
                    ids.append(i)
                    idxs.append(k)
                    chan0.append(int(frames[k, ..., 0].mean().round()))
                    nfs.append(n)
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "chan0": chan0, "n_frames": nfs}
            )

    return df.mapInPandas(
        fn, schema="id long, frame_idx int, chan0 int, n_frames int"
    )
