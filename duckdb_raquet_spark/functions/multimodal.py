"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video/html exactly as the engine treats encoded block
payloads — `binary` columns moved through Arrow in vectorized batches,
never per-row Python objects in the hot loop.

Decode support is REAL where the format permits a from-scratch decoder:
  * images — PNG (all five row filters, palette) and 24/32-bit BMP via
    :mod:`imagecodec`; JPEG header metadata parses (dims/channels)
    without pixel decode;
  * audio — RIFF/WAVE integer PCM via :mod:`audiocodec`, with
    exact-integer RMS framing;
  * video — animated GIF via :mod:`imagecodec` (from-scratch LZW +
    frame composition), driving real frame sampling.
JPEG pixels / MP3 / mp4-webm containers are out of scope without a
codec library; those paths raise NotImplementedError (or skip per row
with ``on_error="skip"``), and payloads with no media magic keep a
seeded fake under ``deterministic=True`` for plumbing tests.

The reference's analogous layer is its per-band BLOB decode dispatch
(/root/reference/src/raster/band_decoder.cpp:300-373: codec id ->
gzip/jpeg/webp kernel) and its hand-rolled PNG writer
(band_encoder.cpp:205-249) — the same no-library move as imagecodec.
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
    """payload -> (H, W, C) uint8 array + metadata.

    REAL decode for every major web image format via the from-scratch
    codecs in :mod:`imagecodec` / :mod:`jpegcodec`: PNG (all five row
    filters, palette), 24/32-bit BMP, GIF (hand-rolled LZW; first
    frame), baseline JPEG (DCT/Huffman, 4:4:4 + 4:2:0). Progressive
    JPEG and corrupt payloads raise (contain with on_error='skip').
    For payloads with NO image magic (e.g. piping an html column
    through the image path), `deterministic=True` keeps the legacy
    md5-seeded fake so plumbing tests hold; `deterministic=False`
    raises."""
    from . import imagecodec as ic

    fmt = ic.sniff_format(payload)
    if fmt in ("png", "bmp", "gif", "jpeg", "webp"):
        # all five major web image formats decode for real (baseline +
        # progressive JPEG via the from-scratch DCT/Huffman codec,
        # lossless WebP via the from-scratch VP8L codec; lossy-VP8 webp
        # raises — contain with on_error='skip'/'mark')
        return ic.decode_image(payload)
    if not deterministic:
        raise NotImplementedError("payload has no known image magic")
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
    """payload -> PCM + metadata.

    REAL decode for RIFF/WAVE PCM via :mod:`audiocodec` (returns int16
    samples — downstream math can then stay in the exact integer
    domain). Payloads without WAV magic keep the legacy seeded-fake
    float32 under ``deterministic=True`` (compressed formats like
    MP3/AAC would need an entropy decoder), else raise."""
    from . import audiocodec as ac

    if ac.sniff_wav(payload):
        return ac.decode_wav(payload)
    if not deterministic:
        raise NotImplementedError("payload has no WAV magic (compressed audio?)")
    rng = np.random.default_rng(_seed_of(payload))
    n = 256 + int(rng.integers(0, 1024))
    return rng.standard_normal(n).astype(np.float32), {
        "sample_rate": 16000,
        "n_samples": n,
        "channels": 1,
        "format": "fake",
    }


def synth_wav_bytes(key: int) -> bytes:
    """Closed-form deterministic WAV: n = 384 + (key % 3) * 128 mono
    int16 samples, sample[i] = ((key*7919 + i*104729) % 65536) - 32768.
    Exactly replayable in SQL, full 16-bit dynamic range."""
    from . import audiocodec as ac

    n = 384 + (key % 3) * 128
    i = np.arange(n, dtype=np.int64)
    pcm = ((key * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
    return ac.encode_wav(pcm, 16000)


def synth_gif_bytes(key: int) -> bytes:
    """Closed-form deterministic animated GIF: n = 2 + key % 4 frames of
    w = 8 + key % 5 by h = 8 + (key // 5) % 4, grayscale identity
    palette, frame k pixel (y, x) = (key + 7k + 3y + 5x) mod 256 — so
    decoded channel values EQUAL the palette indices and every frame
    statistic is predictable in SQL from key alone."""
    from . import imagecodec as ic

    n = 2 + key % 4
    w = 8 + key % 5
    h = 8 + (key // 5) % 4
    k, y, x = np.ogrid[0:n, 0:h, 0:w]
    frames = ((key + 7 * k + 3 * y + 5 * x) % 256).astype(np.uint8)
    return ic.encode_gif(frames)


def synth_gif_column(df: DataFrame, id_col: str, out_col: str = "gif") -> DataFrame:
    """Append a real animated-GIF binary column rendered from the id —
    the video twin of synth_png_column."""
    i = df.columns.index(id_col)
    return _append_column(df, out_col, "binary", lambda row: synth_gif_bytes(int(row[i])))


def synth_avi_bytes(key: int) -> bytes:
    """Closed-form deterministic MJPEG-in-AVI clip: n = 2 + key % 4
    frames of 16x24 grayscale, constant per 8x8 block with block
    (r, c) of frame k valued ``(key*31 + 17k + 5r + 3c) mod 251``.
    A constant 8x8 block is DC-only through the JPEG transform and
    survives quantization bit-exactly (pinned in tests), so REAL
    baseline-JPEG entropy decode of every frame replays closed-form
    in SQL from key alone — the MJPEG twin of synth_gif_bytes."""
    from . import avicodec as avc

    n = 2 + key % 4
    r = np.arange(2)[:, None]
    c = np.arange(3)[None, :]
    frames = np.empty((n, 16, 24), dtype=np.uint8)
    for k in range(n):
        blocks = ((key * 31 + 17 * k + 5 * r + 3 * c) % 251).astype(np.uint8)
        frames[k] = np.kron(blocks, np.ones((8, 8), np.uint8))
    return avc.encode_avi(frames, fps=12, quality=90)


def synth_avi_column(df: DataFrame, id_col: str, out_col: str = "avi") -> DataFrame:
    """Append a real MJPEG-AVI binary column rendered from the id —
    the container-video twin of synth_gif_column."""
    i = df.columns.index(id_col)
    return _append_column(df, out_col, "binary", lambda row: synth_avi_bytes(int(row[i])))


def synth_wav_column(df: DataFrame, id_col: str, out_col: str = "wav") -> DataFrame:
    """Append a real WAV binary column rendered from the id — the audio
    twin of synth_png_column."""
    i = df.columns.index(id_col)
    return _append_column(df, out_col, "binary", lambda row: synth_wav_bytes(int(row[i])))


def _append_column(
    df: DataFrame, out_col: str, out_type: str, cell_fn
) -> DataFrame:
    """Shared mapInPandas scaffolding: append ``out_col`` computed
    per-row by ``cell_fn`` while keeping every input column (Arrow
    batches in, bounded memory per task at any table size)."""
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in df.columns]
        + [f"`{out_col}` {out_type}"]
    )

    def fn(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                cell_fn(row) for row in pdf.itertuples(index=False, name=None)
            ]
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)


def image_metadata(
    df: DataFrame, binary_col: str, *, deterministic: bool = True
) -> DataFrame:
    """Attach typed image metadata to every row.

    Metadata comes from REAL container-header parsing for PNG/BMP/JPEG/
    GIF (no pixel decode — cheap even for large payloads); unknown
    formats fall back to the legacy fake under ``deterministic=True``,
    else yield NULL."""
    from . import imagecodec as ic

    bi = df.columns.index(binary_col)

    def meta_of(row) -> dict | None:
        p = row[bi]
        if p is None:
            return None
        b = bytes(p)
        try:
            m = ic.parse_image_header(b)
        except Exception:
            m = None
        if m is not None:
            return m
        if deterministic:
            return _decode_image_kernel(b, True)[1]
        return None

    return _append_column(
        df,
        "img_meta",
        "struct<" + IMAGE_META_SCHEMA.replace(", ", ",").replace(" ", ":") + ">",
        meta_of,
    )


# deterministic PNG fixture parameters (shared with the SQL oracle):
# dims are drawn from _SYNTH_DIMS so (n-1) is divisible by 3 and the
# 4-point linspace sample grid is exact integers in any engine
_SYNTH_DIMS = (10, 13, 16)


def synth_png_bytes(key: int) -> bytes:
    """Closed-form deterministic PNG: w/h from ``key`` mod tables,
    pixel (y, x, c) = (key + 3y + 5x + 77c) mod 256, row filter y % 5 —
    every PNG unfilter path is exercised, and every downstream pixel
    statistic is predictable in plain SQL from ``key`` alone."""
    from . import imagecodec as ic

    w = _SYNTH_DIMS[key % 3]
    h = _SYNTH_DIMS[(key // 3) % 3]
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    arr = ((key + 3 * y + 5 * x + 77 * c) % 256).astype(np.uint8)
    return ic.encode_png(arr, filters=lambda yy: yy % 5)


def synth_png_column(df: DataFrame, id_col: str, out_col: str = "png") -> DataFrame:
    """Append a real PNG binary column rendered from the id — the
    deterministic multimodal fixture generator (encode happens
    executor-side, nothing is collected)."""
    i = df.columns.index(id_col)
    return _append_column(df, out_col, "binary", lambda row: synth_png_bytes(int(row[i])))


def synth_webp_bytes(key: int) -> bytes:
    """Closed-form deterministic lossless WebP (VP8L): same pixel
    pattern as :func:`synth_png_bytes` — (key + 3y + 5x + 77c) mod 256
    — so the two formats share one SQL oracle; keys divisible by 3
    take the palette path, the rest the literal + subtract-green path,
    exercising both encoder modes through the fixture."""
    from . import webpcodec as wc

    w = _SYNTH_DIMS[key % 3]
    h = _SYNTH_DIMS[(key // 3) % 3]
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    arr = ((key + 3 * y + 5 * x + 77 * c) % 256).astype(np.uint8)
    # the pattern has <= 256 distinct colors (one per base residue), so
    # palette mode is always legal; alternate modes by key
    return wc.encode_webp(arr, mode="palette" if key % 3 == 0 else "literal")


def synth_mixed_image_column(
    df: DataFrame, id_col: str, out_col: str = "img"
) -> DataFrame:
    """Append a mixed-format image column — even ids render PNG, odd
    ids lossless WebP, SAME closed-form pixel pattern either way — so
    one SQL oracle verifies BOTH from-scratch decoders through the
    image pipeline."""
    i = df.columns.index(id_col)

    def cell(row):
        k = int(row[i])
        return synth_png_bytes(k) if k % 2 == 0 else synth_webp_bytes(k)

    return _append_column(df, out_col, "binary", cell)


def synth_webp_column(df: DataFrame, id_col: str, out_col: str = "webp") -> DataFrame:
    """Append a real lossless-WebP binary column rendered from the id —
    the webp twin of synth_png_column."""
    i = df.columns.index(id_col)
    return _append_column(
        df, out_col, "binary", lambda row: synth_webp_bytes(int(row[i]))
    )


def synth_webp_lossy_bytes(key: int) -> bytes:
    """Structurally valid LOSSY (VP8) WebP: correct RIFF container,
    frame tag, 9d 01 2a start code and dims — but an undecodable
    frame body, standing in for real-crawl lossy webp, which this
    engine detects and counts-skips rather than decodes (the VP8
    coefficient-probability tables of RFC 6386 aren't available
    offline; the reference links libwebp instead —
    /root/reference/src/raster/band_decoder.cpp:129-154). Header-only
    metadata (dims, format) still parses, so the payload is fully
    observable even though pixels aren't."""
    import struct as _struct

    w = _SYNTH_DIMS[key % 3]
    h = _SYNTH_DIMS[(key // 3) % 3]
    frame = (
        bytes([0x10 | ((key % 8) << 5), 0x00, 0x00])  # keyframe tag
        + b"\x9d\x01\x2a"
        + _struct.pack("<HH", w, h)
        + bytes((key + i) % 256 for i in range(24))  # opaque body
    )
    if len(frame) % 2:
        frame += b"\x00"
    return (
        b"RIFF"
        + _struct.pack("<I", 12 + len(frame))
        + b"WEBP"
        + b"VP8 "
        + _struct.pack("<I", len(frame))
        + frame
    )


def media_format_col(c: Column) -> Column:
    """Container format of a binary payload from its magic bytes, as a
    pure JVM Column (no Python in the plan): png / jpeg / gif / bmp /
    webp:VP8L (lossless) / webp:VP8 (lossy) / webp:VP8X (extended) /
    wav / missing / unknown. The webp variant matters operationally:
    VP8L decodes from scratch here, VP8 is a documented counted-skip."""
    head4 = F.substring(c, 1, 4)
    return (
        F.when(c.isNull(), F.lit("missing"))
        .when(head4 == F.lit(b"\x89PNG"), F.lit("png"))
        .when(F.substring(c, 1, 3) == F.lit(b"\xff\xd8\xff"), F.lit("jpeg"))
        .when(head4 == F.lit(b"GIF8"), F.lit("gif"))
        .when(
            (head4 == F.lit(b"RIFF"))
            & (F.substring(c, 9, 4) == F.lit(b"WEBP")),
            F.concat(
                F.lit("webp:"),
                F.trim(F.substring(c, 13, 4).cast("string")),
            ),
        )
        .when(
            (head4 == F.lit(b"RIFF"))
            & (F.substring(c, 9, 4) == F.lit(b"WAVE")),
            F.lit("wav"),
        )
        .when(
            (head4 == F.lit(b"RIFF"))
            & (F.substring(c, 9, 4) == F.lit(b"AVI ")),
            F.lit("avi"),
        )
        .when(F.substring(c, 1, 2) == F.lit(b"BM"), F.lit("bmp"))
        .otherwise(F.lit("unknown"))
    )


def media_coverage(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Decoder-coverage report for a crawl's image column: per
    container format (sniffed JVM-side), how many payloads exist, how
    many the from-scratch decoders produced features for, and how many
    were counted-skipped (``image_features`` with ``on_error='mark'``).
    Output: (fmt, n_payloads, n_decoded, n_marked) ordered by fmt.
    This is the operational answer to 'what fraction of the crawl do
    we actually decode' — lossy-VP8 webp shows up as webp:VP8 with
    n_marked == n_payloads, never silently vanishing."""
    fmt = df.select(
        F.col(id_col).alias("id"),
        media_format_col(F.col(binary_col)).alias("fmt"),
    )
    feats = image_features(df, id_col, binary_col, on_error="mark")
    return (
        fmt.join(feats.select("id", "features"), "id", "left")
        .groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.count("features").alias("n_decoded"),
            (F.count(F.lit(1)) - F.count("features")).alias("n_marked"),
        )
        .orderBy("fmt")
    )


def image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    resize: tuple[int, int] = (4, 4),
    deterministic: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Decode (REAL for PNG/BMP) -> resize -> per-channel mean feature
    vector. Output: (id, features array<float>, width, height).

    ``on_error``: ``"raise"`` fails the job on the first undecodable
    payload (lossy-VP8 webp, truncated bytes); ``"skip"`` contains the
    error per ROW and drops that row — the web-crawl setting, where a
    corrupt payload must not abort a 100 TB job; ``"mark"`` emits the
    row with NULL features/width/height instead of dropping it, so the
    skip count is OBSERVABLE in-plan (``count(features IS NULL)``)
    rather than silently vanishing — use it to monitor what fraction
    of a crawl the decoders actually cover."""
    if on_error not in ("raise", "skip", "mark"):
        raise ValueError("on_error must be 'raise', 'skip' or 'mark'")
    rh, rw = resize

    def fn(batches):
        for pdf in batches:
            ids, feats, ws, hs = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    # a missing payload is as observable as an
                    # undecodable one under 'mark'; raise/skip keep
                    # the historical silent-drop for NULLs
                    if on_error == "mark":
                        ids.append(i)
                        feats.append(None)
                        ws.append(None)
                        hs.append(None)
                    continue
                try:
                    arr, meta = _decode_image_kernel(bytes(p), deterministic)
                except Exception:
                    if on_error == "raise":
                        raise
                    if on_error == "mark":
                        ids.append(i)
                        feats.append(None)
                        ws.append(None)
                        hs.append(None)
                    continue
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
            if ids:  # an all-skipped batch yields nothing (an empty
                # float64 column would defeat the list<float> conversion)
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
    on_error: str = "raise",
) -> DataFrame:
    """Decode audio (REAL for WAV PCM) -> framed RMS energies. Output:
    (id, frame_idx, rms) — one row per frame, so downstream ops stay
    relational. ``on_error="skip"`` contains undecodable payloads
    per row instead of aborting the job (see image_features)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def fn(batches):
        for pdf in batches:
            ids, idxs, rms = [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    continue
                try:
                    pcm, _ = _decode_audio_kernel(bytes(p), deterministic)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                if pcm.ndim == 2:
                    pcm = pcm[:, 0]
                exact = np.issubdtype(pcm.dtype, np.integer)
                if exact:
                    # integer PCM: sum of squares is exact in int64
                    # (256 * 32768^2 < 2^53), so sqrt(sumsq/frame)/2^15
                    # is the SAME double in any engine — the RMS rows
                    # are bit-reproducible, not tolerance-matched
                    pcm = pcm.astype(np.int64)
                n_frames = max(0, 1 + (len(pcm) - frame) // hop)
                for fidx in range(n_frames):
                    seg = pcm[fidx * hop : fidx * hop + frame]
                    ids.append(i)
                    idxs.append(fidx)
                    if exact:
                        sumsq = int(np.dot(seg, seg))
                        rms.append(float(np.sqrt(sumsq / frame) / 32768.0))
                    else:
                        rms.append(float(np.sqrt(np.mean(seg * seg))))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "rms": rms})

    return df.mapInPandas(fn, schema="id long, frame_idx int, rms double")


def audio_ahash(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    deterministic: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """64-bit audio fingerprint (the audio twin of :func:`image_ahash`):
    REAL WAV decode -> 64 equal non-overlapping frames spanning the
    clip -> integer frame energy (sum of |sample|, exact in int64) ->
    bit k set iff ``energy_k * 64 > total`` -> one signed 64-bit
    signature. Output: (id, ahash long).

    The threshold compares each frame's SHARE of total energy against
    the mean, so the signature is invariant to positive gain scaling
    (a re-levelled copy of the same clip hashes identically, exactly
    for integer gain) and to container re-encodes — the re-encoded /
    re-mastered duplicate case exact byte dedup misses. Integer-exact
    throughout, so a closed-form PCM pattern replays the hash
    bit-for-bit in SQL. Clips shorter than 64 samples follow
    ``on_error`` ('mark' emits NULL)."""
    if on_error not in ("raise", "skip", "mark"):
        raise ValueError("on_error must be 'raise', 'skip' or 'mark'")

    def fn(batches):
        for pdf in batches:
            ids, hashes = [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    if on_error == "mark":
                        ids.append(i)
                        hashes.append(None)
                    continue
                try:
                    pcm, _meta = _decode_audio_kernel(bytes(p), deterministic)
                    if pcm.ndim == 2:
                        pcm = pcm[:, 0]
                    if len(pcm) < 64:
                        raise ValueError("clip shorter than 64 samples")
                except Exception:
                    if on_error == "raise":
                        raise
                    if on_error == "mark":
                        ids.append(i)
                        hashes.append(None)
                    continue
                seg = len(pcm) // 64
                if np.issubdtype(pcm.dtype, np.integer):
                    arr = np.abs(pcm[: 64 * seg].astype(np.int64))
                else:
                    arr = np.abs(pcm[: 64 * seg].astype(np.float64))
                e = arr.reshape(64, seg).sum(axis=1)
                bits = e * 64 > e.sum()
                h = 0
                for k in np.flatnonzero(bits):
                    h |= 1 << int(k)
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(i)
                hashes.append(h)
            if ids:
                yield pd.DataFrame({"id": ids, "ahash": hashes})

    return df.mapInPandas(fn, schema="id long, ahash long")


def audio_dup_pairs(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    max_hamming: int = 3,
    *,
    deterministic: bool = True,
    on_error: str = "skip",
) -> DataFrame:
    """Audio near-duplicate pairs: :func:`audio_ahash` signatures
    through the shared 4x16 pigeonhole band kernel
    (``dedup.hamming_band_pairs`` — recall guaranteed at <= 3 bits,
    only 8-byte signatures shuffle). Completes the media dedup trio:
    exact bytes (:func:`binary_stats_col`), perceptual image
    (:func:`phash_pairs`), perceptual audio (this). Returns
    (a, b, hamming)."""
    from .dedup import hamming_band_pairs

    sig = audio_ahash(
        df, id_col, binary_col, deterministic=deterministic, on_error=on_error
    ).where(F.col("ahash").isNotNull())
    return hamming_band_pairs(sig, "id", "ahash", max_hamming)


def synth_fp_wav_bytes(key: int) -> bytes:
    """Closed-form WAV for the audio-fingerprint fixtures: 64 frames of
    L = 6 + src%3 samples, frame k's amplitude envelope
    a_k = ((src*73856093) XOR (k*19349663)) mod 251 (the XOR mix that
    keeps unrelated signatures far apart — a flat envelope makes every
    frame energy hug the mean and floods Hamming space), carrier
    sample i = (src*7919 + i*104729) mod 256 - 128, pcm = a * carrier
    (|pcm| <= 32000, int16-safe). Keys with key%10 == 9 render a
    planted near-dup of key-9: frame 0's amplitude shifted +128 mod
    251 — one to three signature bits. The uniform-noise
    :func:`synth_wav_bytes` stays the RMS fixture; this one exists
    because a fingerprint fixture needs per-frame energy VARIANCE."""
    from . import audiocodec as ac

    src = key - 9 if key % 10 == 9 else key
    seg = 6 + (src % 3)
    k = np.arange(64, dtype=np.int64)
    a = ((src * 73856093) ^ (k * 19349663)) % 251
    if key % 10 == 9:
        a = a.copy()
        a[0] = (a[0] + 128) % 251
    i = np.arange(64 * seg, dtype=np.int64)
    inner = (src * 7919 + i * 104729) % 256 - 128
    pcm = (np.repeat(a, seg) * inner).astype(np.int16)
    return ac.encode_wav(pcm, 16000)


def synth_fp_wav_column(
    df: DataFrame, id_col: str, out_col: str = "wav"
) -> DataFrame:
    """Append the fingerprint fixture WAV column (planted near-dups at
    key % 10 == 9) — rendered executor-side."""
    i = df.columns.index(id_col)
    return _append_column(
        df, out_col, "binary", lambda row: synth_fp_wav_bytes(int(row[i]))
    )


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


def image_ahash(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    grid: tuple[int, int] = (8, 8),
    deterministic: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Perceptual average-hash (aHash) per image: REAL decode via the
    from-scratch codecs -> integer grayscale (channel sum) -> gh x gw
    nearest-neighbor grid -> threshold at the grid mean -> one 64-bit
    signature. Output: (id, ahash long).

    Every step is integer-exact (``cell * n_cells > total`` replaces a
    float mean compare), so the hash replays bit-for-bit in plain SQL
    over a closed-form pixel pattern — the property the oracle checks
    ride on. ``on_error`` follows :func:`image_features` ('mark' emits
    NULL ahash). This is the media analog of :func:`dedup.simhash64`:
    near-identical images (re-encodes, minor edits) land within a few
    bits, exact for brightness-preserving pixel noise below the grid
    resolution."""
    if on_error not in ("raise", "skip", "mark"):
        raise ValueError("on_error must be 'raise', 'skip' or 'mark'")
    gh, gw = grid
    if gh * gw != 64:
        raise ValueError("grid must have exactly 64 cells (8x8)")

    def fn(batches):
        for pdf in batches:
            ids, hashes = [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    if on_error == "mark":
                        ids.append(i)
                        hashes.append(None)
                    continue
                try:
                    arr, _meta = _decode_image_kernel(bytes(p), deterministic)
                except Exception:
                    if on_error == "raise":
                        raise
                    if on_error == "mark":
                        ids.append(i)
                        hashes.append(None)
                    continue
                gray = arr.astype(np.int64).sum(axis=-1)
                yi = np.linspace(0, gray.shape[0] - 1, gh).astype(int)
                xi = np.linspace(0, gray.shape[1] - 1, gw).astype(int)
                cells = gray[np.ix_(yi, xi)].reshape(-1)
                bits = cells * 64 > cells.sum()
                h = 0
                for k in np.flatnonzero(bits):
                    h |= 1 << int(k)
                if h >= 1 << 63:  # two's-complement wrap into BIGINT
                    h -= 1 << 64
                ids.append(i)
                hashes.append(h)
            if ids:
                yield pd.DataFrame({"id": ids, "ahash": hashes})

    return df.mapInPandas(fn, schema="id long, ahash long")


def phash_pairs(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    max_hamming: int = 3,
    *,
    deterministic: bool = True,
    on_error: str = "skip",
) -> DataFrame:
    """Image near-duplicate pairs: :func:`image_ahash` signatures fed
    through the same 4x16-bit pigeonhole banding as text SimHash
    (``dedup.hamming_band_pairs`` — recall GUARANTEED for distances
    <= 3, then exact popcount). The image twin of exact media dedup via
    :func:`binary_stats_col`: catches re-encoded / lightly-edited
    copies whose bytes differ but whose perceptual content doesn't.
    Only 8-byte signatures shuffle — payloads never leave their scan
    partition. Returns (a, b, hamming)."""
    from .dedup import hamming_band_pairs

    sig = image_ahash(
        df, id_col, binary_col, deterministic=deterministic, on_error=on_error
    ).where(F.col("ahash").isNotNull())
    return hamming_band_pairs(sig, "id", "ahash", max_hamming)


def synth_phash_png_bytes(key: int) -> bytes:
    """Closed-form 8x8 grayscale-RGB PNG for the pHash fixtures: cell
    value v(src, i) = ((src * 73856093) XOR (i * 19349663)) mod 251 on
    all three channels (XOR mixing keeps unrelated keys' hashes far
    apart — a linear pattern makes every hash a near-rotation of every
    other and floods Hamming space). Keys with key % 10 == 9 render a
    PLANTED NEAR-DUP of key-9: same pattern with cell 0 shifted by
    +128 mod 251 — one to three bits of aHash distance. Row filters
    cycle y % 5 so every PNG unfilter path runs."""
    from . import imagecodec as ic

    src = key - 9 if key % 10 == 9 else key
    i = np.arange(64, dtype=np.int64)
    v = ((src * 73856093) ^ (i * 19349663)) % 251
    if key % 10 == 9:
        v = v.copy()
        v[0] = (v[0] + 128) % 251
    arr = np.repeat(
        v.astype(np.uint8).reshape(8, 8, 1), 3, axis=2
    )
    return ic.encode_png(arr, filters=lambda yy: yy % 5)


def synth_phash_column(
    df: DataFrame, id_col: str, out_col: str = "img"
) -> DataFrame:
    """Append the pHash fixture PNG column (planted near-dups at
    key % 10 == 9) — rendered executor-side."""
    i = df.columns.index(id_col)
    return _append_column(
        df, out_col, "binary", lambda row: synth_phash_png_bytes(int(row[i]))
    )


def video_ahash(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    deterministic: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Perceptual hash per VIDEO: REAL container decode (animated GIF /
    MJPEG-AVI via :func:`_decode_video_kernel`), per-frame 8x8 aHash
    with :func:`image_ahash`'s integer-exact threshold
    (``cell * 64 > frame_total``), then a bitwise MAJORITY vote across
    frames (bit j set iff ``2 * n_set > n_frames``, strict — ties
    clear) into one 64-bit signature. Output: (id, vhash long).

    Majority voting makes the signature robust to frame reordering,
    dropped/duplicated frames and re-muxed containers (a GIF and an
    MJPEG-AVI of the same frames hash identically — pinned in tests),
    while staying integer-exact end to end so a SQL oracle replays
    pixels -> per-frame bits -> majority -> two's-complement wrap
    bit-for-bit. The video member of the media near-dup trio
    (:func:`image_ahash`, :func:`audio_ahash`); pairs go through the
    same shared pigeonhole kernel via :func:`video_dup_pairs`."""
    if on_error not in ("raise", "skip", "mark"):
        raise ValueError("on_error must be 'raise', 'skip' or 'mark'")

    def fn(batches):
        for pdf in batches:
            ids, hashes = [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    if on_error == "mark":
                        ids.append(i)
                        hashes.append(None)
                    continue
                try:
                    frames, _meta = _decode_video_kernel(bytes(p), deterministic)
                except Exception:
                    if on_error == "raise":
                        raise
                    if on_error == "mark":
                        ids.append(i)
                        hashes.append(None)
                    continue
                n, fh, fw = frames.shape[:3]
                gray = frames.astype(np.int64).sum(axis=-1)
                yi = np.linspace(0, fh - 1, 8).astype(int)
                xi = np.linspace(0, fw - 1, 8).astype(int)
                cells = gray[:, yi][:, :, xi].reshape(n, 64)
                bits = cells * 64 > cells.sum(axis=1, keepdims=True)
                maj = 2 * bits.sum(axis=0) > n
                h = 0
                for k in np.flatnonzero(maj):
                    h |= 1 << int(k)
                if h >= 1 << 63:  # two's-complement wrap into BIGINT
                    h -= 1 << 64
                ids.append(i)
                hashes.append(h)
            if ids:
                yield pd.DataFrame({"id": ids, "vhash": hashes})

    return df.select(id_col, binary_col).mapInPandas(fn, schema="id long, vhash long")


def video_dup_pairs(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    max_hamming: int = 3,
    *,
    deterministic: bool = True,
    on_error: str = "skip",
) -> DataFrame:
    """Video near-duplicate pairs: :func:`video_ahash` signatures fed
    through the shared 4x16-bit pigeonhole banding
    (``dedup.hamming_band_pairs`` — recall GUARANTEED for distances
    <= 3, then exact popcount). Only 8-byte signatures shuffle.
    Returns (a, b, hamming)."""
    from .dedup import hamming_band_pairs

    sig = video_ahash(
        df, id_col, binary_col, deterministic=deterministic, on_error=on_error
    ).where(F.col("vhash").isNotNull())
    return hamming_band_pairs(sig, "id", "vhash", max_hamming)


def media_dedup(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    kind: str = "image",
    max_hamming: int = 3,
    deterministic: bool = True,
    on_error: str = "skip",
) -> DataFrame:
    """Keep-first FILTER over perceptual media near-dups — the
    application step the pair primitives exist to feed (detection alone
    never shrinks a corpus; the media twin of :func:`dedup.minhash_dedup`).

    Composition: the kind's signature pairs (:func:`phash_pairs` /
    :func:`audio_dup_pairs` / :func:`video_dup_pairs`, all on the shared
    pigeonhole kernel) -> :func:`dedup.connected_components` (min-label
    + pointer jumping) -> drop every row whose component label is not
    its own id (keep-first = smallest id per near-dup cluster, the
    library-wide convention). Rows whose payload failed to decode carry
    no signature under ``on_error='skip'`` and are therefore always
    KEPT — a corrupt file never silently deletes a document.

    Plan at 10^12 rows: only 8-byte signatures shuffle; the drop list
    holds one id per dropped duplicate and applies as a single
    left-anti join (AQE broadcasts it at realistic dup rates). Returns
    the kept rows of ``df`` (all original columns)."""
    from .dedup import connected_components

    pair_fn = {
        "image": phash_pairs,
        "audio": audio_dup_pairs,
        "video": video_dup_pairs,
    }.get(kind)
    if pair_fn is None:
        raise ValueError("kind must be 'image', 'audio' or 'video'")
    pairs = pair_fn(
        df, id_col, binary_col, max_hamming,
        deterministic=deterministic, on_error=on_error,
    )
    comps = connected_components(pairs, "a", "b")
    drops = comps.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias("_drop_id")
    )
    return df.join(drops, df[id_col] == drops["_drop_id"], "left_anti")


def synth_vhash_gif_bytes(key: int) -> bytes:
    """Closed-form 8x8 animated GIF for the video-hash oracle: n = 2 +
    key % 4 frames, pixel (k, y, x) = ``(key + 7k + 3y + 5x) mod 256``.
    Frames are EXACTLY grid-sized so the 8x8 aHash grid is the identity
    map and the oracle needs no resample replay (the phash-PNG fixture
    discipline, applied to video)."""
    from . import imagecodec as ic

    n = 2 + key % 4
    k, y, x = np.ogrid[0:n, 0:8, 0:8]
    frames = ((key + 7 * k + 3 * y + 5 * x) % 256).astype(np.uint8)
    return ic.encode_gif(frames)


def synth_vhash_gif_column(
    df: DataFrame, id_col: str, out_col: str = "gif"
) -> DataFrame:
    """Append the video-hash fixture GIF column — rendered executor-side."""
    i = df.columns.index(id_col)
    return _append_column(
        df, out_col, "binary", lambda row: synth_vhash_gif_bytes(int(row[i]))
    )


def _decode_video_kernel(
    payload: bytes, deterministic: bool
) -> tuple[np.ndarray, dict]:
    """payload -> (n_frames, H, W, C) uint8 + metadata.

    REAL decode for animated GIF via :mod:`imagecodec` (from-scratch
    LZW + frame composition) and for MJPEG-in-AVI via :mod:`avicodec`
    (RIFF walk + the from-scratch baseline-JPEG decoder) — the two
    entropy-coded moving-picture web formats that are hand-rollable.
    Container formats needing ffmpeg/pyav (mp4/webm) are out of scope;
    payloads without GIF/AVI magic keep the legacy seeded fake under
    ``deterministic=True``, else raise."""
    from . import imagecodec as ic

    if ic.sniff_format(payload) == "gif":
        return ic.decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from . import avicodec as avc

        return avc.decode_avi(payload)
    if not deterministic:
        raise NotImplementedError(
            "payload has no GIF/AVI magic (mp4/webm need ffmpeg)"
        )
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
    on_error: str = "raise",
) -> DataFrame:
    """Frame sampling over video payloads — the third leg of the
    multimodal set (image features / audio frames / video frame
    sampling): decode (REAL for animated GIF), keep every
    ``stride``-th frame, emit one relational row per sampled frame with
    its exact channel-0 pixel SUM (an int64 sum is bit-reproducible in
    any engine, unlike a rounded mean whose half-way ties differ
    between numpy's half-even and SQL's half-away). Arrow-batched
    mapInPandas; the per-frame math is numpy, never per-pixel Python.
    ``on_error="skip"`` contains undecodable payloads per row."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def fn(batches):
        for pdf in batches:
            ids, idxs, sums, npx, nfs = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    continue
                try:
                    frames, meta = _decode_video_kernel(bytes(p), deterministic)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                n = meta["n_frames"]
                for k in range(0, n, stride):
                    ids.append(i)
                    idxs.append(k)
                    sums.append(int(frames[k, ..., 0].astype(np.int64).sum()))
                    npx.append(int(frames.shape[1] * frames.shape[2]))
                    nfs.append(n)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": idxs,
                    "chan0_sum": sums,
                    "n_pixels": npx,
                    "n_frames": nfs,
                }
            )

    return df.mapInPandas(
        fn,
        schema="id long, frame_idx int, chan0_sum long, n_pixels int, n_frames int",
    )
