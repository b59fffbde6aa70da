"""From-scratch PNG/BMP/WAV codec tests: round-trips, goldens,
rejection of unsupported shapes, and the real-decode multimodal path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from duckdb_raquet_spark.functions import audiocodec as ac
from duckdb_raquet_spark.functions import imagecodec as ic
from duckdb_raquet_spark.functions import multimodal as mm


def test_png_roundtrip_all_filters_and_channels():
    rng = np.random.default_rng(0)
    for ch in (1, 2, 3, 4):
        for _ in range(3):
            h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            arr = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
            for filt in (0, 1, 2, 3, 4, lambda y: y % 5):
                dec, meta = ic.decode_png(ic.encode_png(arr, filters=filt))
                assert dec.shape == arr.shape
                assert (dec == arr).all()
                assert (meta["width"], meta["height"]) == (w, h)


def test_png_palette_decode():
    # hand-build a 2x2 palette PNG: indices [[0,1],[1,0]]
    import zlib

    plte = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([1, 0])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        ic.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    arr, meta = ic.decode_png(payload)
    assert meta["channels"] == 3
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [255, 0, 0]


def test_png_rejects_mislabeled_interlace_and_16bit():
    good = ic.encode_png(np.zeros((3, 3, 3), np.uint8))
    # round 4: interlace is SUPPORTED now — but flipping the IHDR
    # interlace byte on sequential data must fail the Adam7 length
    # check, not decode garbage
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="interlaced pixel data"):
        ic.decode_png(bytes(bad))
    bad = bytearray(good)
    bad[8 + 8 + 12] = 2  # unknown interlace method
    with pytest.raises(ValueError, match="interlace method"):
        ic.decode_png(bytes(bad))
    bad = bytearray(good)
    bad[8 + 8 + 8] = 16  # bit depth byte
    with pytest.raises(ValueError, match="bit depth"):
        ic.decode_png(bytes(bad))


def test_bmp_golden_and_header():
    px = (
        bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"
        + bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"
    )
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px), 0, 0, 0, 0)
    )
    arr, meta = ic.decode_bmp(hdr + px)
    assert (meta["width"], meta["height"], meta["channels"]) == (2, 2, 3)
    # bottom-up + BGR->RGB: stored row 0 is the image's bottom row
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [0, 255, 0]
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [255, 255, 255]
    h = ic.parse_image_header(hdr + px)
    assert (h["width"], h["height"], h["format"]) == (2, 2, "bmp")


def test_jpeg_gif_header_parse():
    # minimal JPEG: SOI + SOF0 with dims 31x17, 3 components
    jpeg = (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 8 + 9)
        + bytes([8]) + struct.pack(">HH", 17, 31) + bytes([3, 0, 0, 0, 0, 0, 0, 0, 0])
    )
    h = ic.parse_image_header(jpeg)
    assert (h["width"], h["height"], h["channels"], h["format"]) == (31, 17, 3, "jpeg")
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 5
    h = ic.parse_image_header(gif)
    assert (h["width"], h["height"], h["format"]) == (12, 34, "gif")
    # a header-only JPEG (no SOS/scan data) is truncated, not decodable
    with pytest.raises(ValueError):
        ic.decode_image(jpeg)


def test_gif_lzw_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        data = rng.integers(0, 256, int(rng.integers(1, 4000))).astype(np.uint8).tobytes()
        assert bytes(ic._lzw_decode(ic._lzw_encode(data, 8), 8)) == data
    # low-entropy stream exercises width growth + the 4096 table reset
    data = b"abcd" * 5000
    assert bytes(ic._lzw_decode(ic._lzw_encode(data, 8), 8)) == data


def test_gif_animated_roundtrip_and_header():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (3, 11, 7)).astype(np.uint8)
    gif = ic.encode_gif(frames)
    arr, meta = ic.decode_gif(gif)
    assert arr.shape == (3, 11, 7, 3)
    assert (arr[..., 0] == frames).all()  # grayscale palette: value == index
    assert meta["n_frames"] == 3 and (meta["width"], meta["height"]) == (7, 11)
    h = ic.parse_image_header(gif)
    assert (h["width"], h["height"], h["format"]) == (7, 11, "gif")


def _gif_head(gct):
    return (
        b"GIF89a" + struct.pack("<HH", 2, 2)
        + bytes([0x80 | 0x01, 0, 0]) + gct.astype(np.uint8).tobytes()
    )


def test_gif_local_palette_does_not_recolor_canvas():
    """A later frame's LOCAL color table must not repaint pixels laid
    down by earlier frames (RGB-space composition)."""
    gct = np.zeros((4, 3), np.uint8)
    gct[1] = [255, 0, 0]
    out = bytearray(_gif_head(gct))
    f1 = np.full((2, 2), 1, np.uint8)
    out += (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00" + bytes([2])
        + ic._sub_blocks(ic._lzw_encode(f1.tobytes(), 2))
    )
    lct = np.zeros((2, 3), np.uint8)
    lct[0] = [0, 0, 255]
    out += (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + bytes([0x80]) + lct.tobytes()
        + bytes([2]) + ic._sub_blocks(ic._lzw_encode(b"\x00", 2))
    )
    out += b"\x3b"
    arr, meta = ic.decode_gif(bytes(out))
    assert meta["n_frames"] == 2
    assert arr[1, 0, 0].tolist() == [0, 0, 255]  # painted pixel
    assert arr[1, 1, 1].tolist() == [255, 0, 0]  # untouched pixel keeps color


def test_gif_transparency_preserves_canvas():
    gct = np.zeros((4, 3), np.uint8)
    gct[1] = [255, 0, 0]
    out = bytearray(_gif_head(gct))
    f1 = np.full((2, 2), 1, np.uint8)
    out += (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00" + bytes([2])
        + ic._sub_blocks(ic._lzw_encode(f1.tobytes(), 2))
    )
    out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, 3]) + b"\x00"  # GCE: transp idx 3
    f2 = np.full((2, 2), 3, np.uint8)
    out += (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00" + bytes([2])
        + ic._sub_blocks(ic._lzw_encode(f2.tobytes(), 2))
    )
    out += b"\x3b"
    arr, _ = ic.decode_gif(bytes(out))
    assert arr[1, 0, 0].tolist() == [255, 0, 0]  # fully-transparent frame


def test_jpeg_fill_bytes_before_marker():
    from duckdb_raquet_spark.functions import jpegcodec as jc

    img = np.full((8, 8), 90, np.uint8)
    enc = jc.encode_jpeg(img, quality=90)
    # inject a 0xFF fill byte before the DQT marker (T.81 B.1.1.2)
    i = enc.find(b"\xff\xdb")
    padded = enc[:i] + b"\xff" + enc[i:]
    dec, meta = jc.decode_jpeg(padded)
    assert meta["width"] == 8 and abs(int(dec[0, 0, 0]) - 90) <= 2


def test_synth_gif_fixture_decodes_to_pattern():
    for key in (0, 9, 123):
        arr, meta = ic.decode_gif(mm.synth_gif_bytes(key))
        n, w, h = 2 + key % 4, 8 + key % 5, 8 + (key // 5) % 4
        assert meta["n_frames"] == n and (meta["width"], meta["height"]) == (w, h)
        k, y, x = np.ogrid[0:n, 0:h, 0:w]
        expect = ((key + 7 * k + 3 * y + 5 * x) % 256).astype(np.uint8)
        assert (arr[..., 0] == expect).all()


def test_video_frame_sample_real_gif(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    gifs = mm.synth_gif_column(df, "doc_id", "gif")
    rows = mm.video_frame_sample(gifs, "doc_id", "gif", stride=2).collect()
    assert rows
    for r in rows:
        key, fidx = r["id"], r["frame_idx"]
        w, h = 8 + key % 5, 8 + (key // 5) % 4
        y, x = np.ogrid[0:h, 0:w]
        expect = int(((key + 7 * fidx + 3 * y + 5 * x) % 256).sum())
        assert r["chan0_sum"] == expect and r["n_pixels"] == w * h


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(1)
    mono = rng.integers(-32768, 32768, 500).astype(np.int16)
    pcm, meta = ac.decode_wav(ac.encode_wav(mono, 8000))
    assert (pcm == mono).all()
    assert meta == {"sample_rate": 8000, "n_samples": 500, "channels": 1, "format": "wav"}
    stereo = rng.integers(-32768, 32768, (300, 2)).astype(np.int16)
    pcm, meta = ac.decode_wav(ac.encode_wav(stereo, 44100))
    assert pcm.shape == (300, 2)
    assert (pcm == stereo).all()
    assert meta["channels"] == 2


def test_wav_rejects_compressed():
    b = bytearray(ac.encode_wav(np.zeros(10, np.int16)))
    # audio_format field is the first u16 of the fmt body (offset 20)
    struct.pack_into("<H", b, 20, 85)  # MP3
    with pytest.raises(NotImplementedError):
        ac.decode_wav(bytes(b))


def test_synth_png_fixture_decodes_to_pattern():
    for key in (0, 7, 123):
        arr, meta = ic.decode_png(mm.synth_png_bytes(key))
        w = (10, 13, 16)[key % 3]
        h = (10, 13, 16)[(key // 3) % 3]
        assert (meta["width"], meta["height"]) == (w, h)
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        expect = ((key + 3 * y + 5 * x + 77 * c) % 256).astype(np.uint8)
        assert (arr == expect).all()


def test_image_features_real_decode(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    imgs = mm.synth_png_column(df, "doc_id", "png")
    rows = mm.image_features(imgs, "doc_id", "png").orderBy("id").collect()
    assert len(rows) == 6
    for r in rows:
        key = r["id"]
        assert r["width"] == (10, 13, 16)[key % 3]
        # feature[0] = mean of sampled channel-0 pixels / 255
        w, h = r["width"], r["height"]
        yi = np.linspace(0, h - 1, 4).astype(int)
        xi = np.linspace(0, w - 1, 4).astype(int)
        vals = [(key + 3 * y + 5 * x) % 256 for y in yi for x in xi]
        assert abs(r["features"][0] * 255 - np.mean(vals)) < 1e-3


def test_audio_frames_exact_rms(spark):
    df = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    wavs = mm.synth_wav_column(df, "doc_id", "wav")
    rows = mm.audio_frames(wavs, "doc_id", "wav").collect()
    assert rows
    for r in rows:
        key, fidx = r["id"], r["frame_idx"]
        i = np.arange(fidx * 128, fidx * 128 + 256, dtype=np.int64)
        seg = (key * 7919 + i * 104729) % 65536 - 32768
        expect = float(np.sqrt(int(np.dot(seg, seg)) / 256.0) / 32768.0)
        assert r["rms"] == expect  # bit-exact, not approx


def test_jpeg_roundtrip_psnr():
    from duckdb_raquet_spark.functions import jpegcodec as jc

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)

    y, x = np.ogrid[0:40, 0:56]
    gray = ((np.sin(x / 8.0) + np.cos(y / 9.0)) * 60 + 128).astype(np.uint8)
    dec, meta = jc.decode_jpeg(jc.encode_jpeg(gray, quality=90))
    assert (meta["width"], meta["height"], meta["channels"]) == (56, 40, 1)
    assert psnr(gray, dec[..., 0]) > 35
    rgb = np.stack(
        [((np.sin(x / 7.0 + c) + np.cos(y / 11.0)) * 50 + 128) for c in range(3)],
        axis=-1,
    ).astype(np.uint8)
    for subsample in (False, True):
        dec, meta = jc.decode_jpeg(jc.encode_jpeg(rgb, quality=90, subsample=subsample))
        assert dec.shape == (40, 56, 3)
        assert psnr(rgb, dec) > 30
    # odd dims survive MCU padding/cropping
    odd = rgb[:37, :51]
    dec, _ = jc.decode_jpeg(jc.encode_jpeg(odd, quality=85, subsample=True))
    assert dec.shape == (37, 51, 3)
    # round 4: SOF2 no longer rejects — a (degenerate, full-band) scan
    # under the progressive marker decodes identically to baseline
    base = jc.encode_jpeg(gray)
    ref, _ = jc.decode_jpeg(base)
    bad = bytearray(base)
    i = base.find(b"\xff\xc0")
    bad[i + 1] = 0xC2  # flip SOF0 -> SOF2
    dec2, _ = jc.decode_jpeg(bytes(bad))
    assert np.array_equal(dec2, ref)
    # arithmetic-coded JPEG still rejected honestly
    bad[i + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        jc.decode_jpeg(bytes(bad))


def test_image_features_decodes_jpeg(spark):
    """Baseline JPEG now decodes for real in the image pipeline."""
    from duckdb_raquet_spark.functions import jpegcodec as jc

    fill = np.full((16, 16, 3), 200, np.uint8)
    df = spark.createDataFrame([(0, jc.encode_jpeg(fill, quality=95))],
                               "doc_id long, img binary")
    rows = mm.image_features(df, "doc_id", "img").collect()
    assert len(rows) == 1 and rows[0]["width"] == 16
    # a flat 200-gray image decodes to features ~200/255 in every channel
    assert all(abs(f - 200 / 255) < 0.03 for f in rows[0]["features"])


def test_image_features_on_error_skip(spark):
    """A TRUNCATED payload mixed into the column aborts the job under
    on_error='raise' and is dropped per-row under 'skip'."""
    jpeg = (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 8 + 9)
        + bytes([8]) + struct.pack(">HH", 4, 4) + bytes([3] + [0] * 8)
    )  # header only, no scan data -> ValueError in decode
    rows = [(0, mm.synth_png_bytes(0)), (1, jpeg), (2, mm.synth_png_bytes(2))]
    df = spark.createDataFrame(rows, "doc_id long, img binary")
    got = mm.image_features(df, "doc_id", "img", on_error="skip").collect()
    assert sorted(r["id"] for r in got) == [0, 2]
    with pytest.raises(Exception):
        mm.image_features(df, "doc_id", "img").collect()


def test_synth_webp_fixture_decodes_to_pattern():
    """The webp fixture replays the PNG fixture's closed-form pattern
    through the from-scratch VP8L codec (palette mode for key%3==0,
    literal otherwise)."""
    from duckdb_raquet_spark.functions import webpcodec as wc

    for key in (0, 7, 123):
        arr, meta = wc.decode_webp(mm.synth_webp_bytes(key))
        w = (10, 13, 16)[key % 3]
        h = (10, 13, 16)[(key // 3) % 3]
        assert (meta["width"], meta["height"]) == (w, h)
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        expect = ((key + 3 * y + 5 * x + 77 * c) % 256).astype(np.uint8)
        assert (arr[..., :3] == expect).all()


def test_image_features_decodes_webp(spark):
    """image_features over a mixed PNG + WebP column: both formats
    decode for real and agree on the shared pixel pattern."""
    rows = [(i, mm.synth_webp_bytes(i)) for i in range(3)]
    rows += [(10 + i, mm.synth_png_bytes(10 + i)) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, img binary")
    got = mm.image_features(df, "doc_id", "img").orderBy("id").collect()
    assert len(got) == 6
    for r in got:
        key = r["id"]
        w, h = r["width"], r["height"]
        assert w == (10, 13, 16)[key % 3]
        yi = np.linspace(0, h - 1, 4).astype(int)
        xi = np.linspace(0, w - 1, 4).astype(int)
        vals = [(key + 3 * y + 5 * x) % 256 for y in yi for x in xi]
        assert abs(r["features"][0] * 255 - np.mean(vals)) < 1e-3


def test_image_features_on_error_mark(spark):
    """'mark' keeps undecodable rows with NULL features, making the
    skip count observable in-plan instead of silently dropping rows."""
    import struct as _struct

    jpeg = (
        b"\xff\xd8\xff\xc0" + _struct.pack(">H", 8 + 9)
        + bytes([8]) + _struct.pack(">HH", 4, 4) + bytes([3] + [0] * 8)
    )
    rows = [
        (0, mm.synth_png_bytes(0)),
        (1, jpeg),
        (2, mm.synth_webp_bytes(2)),
        (3, None),  # missing payload is observable under 'mark' too
    ]
    df = spark.createDataFrame(rows, "doc_id long, img binary")
    out = mm.image_features(df, "doc_id", "img", on_error="mark")
    got = {r["id"]: r for r in out.collect()}
    assert sorted(got) == [0, 1, 2, 3]
    assert got[1]["features"] is None and got[1]["width"] is None
    assert got[3]["features"] is None
    assert got[0]["features"] is not None and got[2]["features"] is not None
    n_skipped = out.where("features IS NULL").count()
    assert n_skipped == 2


def test_ivf_kmeans_empty_input(spark):
    from duckdb_raquet_spark.functions import similarity

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.ivf_kmeans_centroids(empty, "vec_id", "embedding", 4) == []
    zeros = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [0.0] * 4)], "vec_id long, embedding array<double>"
    )
    assert similarity.ivf_kmeans_centroids(zeros, "vec_id", "embedding", 4) == []


def test_image_metadata_real_headers(spark):
    df = spark.createDataFrame([(1,), (2,)], "doc_id long")
    imgs = mm.synth_png_column(df, "doc_id", "png")
    rows = mm.image_metadata(imgs, "png").orderBy("doc_id").collect()
    assert rows[0]["img_meta"]["format"] == "png"
    assert rows[0]["img_meta"]["width"] == (10, 13, 16)[1 % 3]


def test_png_adam7_interlace_roundtrip():
    """Adam7: every sub-image filtered independently; odd dims leave
    some passes empty; gray/RGB/RGBA all scatter back exactly."""
    rng = np.random.default_rng(21)
    for shape in ((16, 16, 3), (13, 11), (9, 7, 4), (1, 1), (2, 3, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = ic.encode_png(img, filters=lambda y: y % 5, interlace=True)
        arr, meta = ic.decode_png(data)
        want = img if img.ndim == 3 else img[..., None]
        assert np.array_equal(arr, want), shape
        # header says interlaced; non-interlaced twin decodes equal too
        plain, _ = ic.decode_png(ic.encode_png(img))
        assert np.array_equal(arr, plain)


def test_gif_interlaced_rows_restored():
    rng = np.random.default_rng(22)
    frames = rng.integers(0, 256, (3, 13, 9), dtype=np.uint8)
    inter = ic.encode_gif(frames, interlace=True)
    plain = ic.encode_gif(frames)
    ai, mi = ic.decode_gif(inter)
    ap, _ = ic.decode_gif(plain)
    assert np.array_equal(ai, ap)
    assert mi["n_frames"] == 3
    # identity palette -> channel 0 equals the original indices
    assert np.array_equal(ai[:, :, :, 0], frames)
