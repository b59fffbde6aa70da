"""Key-algebra extensions (siblings/kring), decode-free parent rollups,
multimodal binary plumbing, and the streaming encode path."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_raquet_spark import blockkey as bk

pytestmark = []


def test_siblings():
    k = int(bk.key_from_parts(np.uint64(0x2AAAAAA), np.uint64(0x1555555), 9))
    sibs = bk.key_siblings(k)
    assert k in sibs and len(sibs) == 4
    parents = {int(bk.key_parent(s)) for s in sibs}
    assert len(parents) == 1


def test_kring_interior_and_border():
    res = 4
    shift = bk.COORD_BITS - res
    center = int(
        bk.key_from_parts(np.uint64(5 << shift), np.uint64(7 << shift), res)
    )
    ring = bk.key_kring(center, 1)
    assert center in ring and len(ring) == 9
    for nk in ring:
        dx = abs((int(bk.key_x(nk)) >> shift) - 5)
        dy = abs((int(bk.key_y(nk)) >> shift) - 7)
        assert max(dx, dy) <= 1
    corner = int(bk.key_from_parts(np.uint64(0), np.uint64(0), res))
    assert len(bk.key_kring(corner, 1)) == 4  # clamped at the border


@pytest.mark.spark
def test_rollup_stats(spark, tmp_path):
    from pyspark.sql import functions as F

    from duckdb_raquet_spark import encode, scan, synth

    df = synth.synth_webtext(spark, 600, num_partitions=4)
    path = str(tmp_path / "enc")
    man = encode.encode_to_path(
        spark, df, path, est_rows=600, target_rows_per_block=64
    )
    blocks = scan.read_blocks(spark, path)
    res = man["key"]["resolution"]
    for parent_res in (res, max(0, res - 1), 0):
        roll = scan.rollup_stats(blocks, man, parent_res, "len_text").collect()
        assert sum(r["n_rows"] for r in roll) == 600
        if parent_res == 0:
            assert len(roll) == 1
        for r in roll:
            assert int(bk.key_resolution(r["block"])) == parent_res
    # rollup agrees with the flat decode-free summary
    flat = scan.summary_stats(blocks, "len_text").first()
    top = scan.rollup_stats(blocks, man, 0, "len_text").first()
    assert top["cnt"] == flat["cnt"] and top["sum"] == flat["sum"]
    assert top["min"] == flat["min"] and top["max"] == flat["max"]


@pytest.mark.spark
def test_multimodal_plumbing(spark):
    from pyspark.sql import functions as F

    from duckdb_raquet_spark import synth
    from duckdb_raquet_spark.functions import multimodal as mm

    df = (
        synth.synth_webtext(spark, 80, num_partitions=4)
        .withColumn("id", F.xxhash64("url"))
        .select("id", "html")
    )
    meta = mm.image_metadata(df, "html").collect()
    assert len(meta) == 80
    assert all(
        r["img_meta"]["n_bytes"] == len(r["html"]) and r["img_meta"]["channels"] == 3
        for r in meta
        if r["html"] is not None
    )

    feats = mm.image_features(df, "id", "html", resize=(4, 4)).collect()
    assert len(feats) == 80
    assert all(len(r["features"]) == 3 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["features"])
    # deterministic: same payload -> same features
    again = mm.image_features(df, "id", "html", resize=(4, 4)).collect()
    assert sorted((r["id"], tuple(r["features"])) for r in feats) == sorted(
        (r["id"], tuple(r["features"])) for r in again
    )

    frames = mm.audio_frames(df.limit(10), "id", "html")
    pdf = frames.toPandas()
    assert (pdf.groupby("id")["frame_idx"].min() == 0).all()

    stats = df.select("id", *mm.binary_stats_col("html")).collect()
    assert all(r["n_bytes"] == 0 or r["content_hash"] is not None for r in stats)


@pytest.mark.spark
@pytest.mark.slow
def test_streaming_encode(spark, tmp_path):
    from pyspark.sql import functions as F

    from duckdb_raquet_spark import scan, streaming, synth

    src = str(tmp_path / "src")
    synth.synth_webtext(spark, 300, num_partitions=3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    out = str(tmp_path / "stream_enc")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = streaming.encode_stream(
        stream,
        out,
        resolution=3,
        ts_origin=1704067200,
        bucket_seconds=7 * 86400,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    man = scan.read_manifest(spark, out)
    assert man["num_rows"] == 300
    dec = scan.decode_blocks(scan.read_blocks(spark, out), man, ["url", "text"])
    got = {r["url"]: r["text"] for r in dec.collect()}
    want = {
        r["url"]: r["text"]
        for r in spark.read.parquet(src).select("url", "text").collect()
    }
    assert got == want  # byte-identical text per url through the stream
    lineage = list((tmp_path / "stream_enc" / "_lineage").glob("chunk-*.json"))
    assert len(lineage) >= 1


@pytest.mark.spark
@pytest.mark.slow
def test_streaming_encode_maponly_then_compact(spark, tmp_path):
    """Streaming ingest with shuffle='none' (zero raw-byte shuffle per
    micro-batch), then a background compaction pass to the canonical
    layout — the ingest pattern the module docstring promises."""
    from duckdb_raquet_spark import scan, streaming, synth

    src = str(tmp_path / "src2")
    synth.synth_webtext(spark, 200, num_partitions=2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    out = str(tmp_path / "stream_mo")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = streaming.encode_stream(
        stream, out, resolution=2, ts_origin=1704067200,
        bucket_seconds=7 * 86400, shuffle="none", effort="fast",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(300)
    man = scan.read_manifest(spark, out)
    assert man["num_rows"] == 200
    compacted = str(tmp_path / "stream_mo_c")
    final = scan.compact_to_path(spark, out, compacted)
    assert final["num_rows"] == 200
    man2 = scan.read_manifest(spark, compacted)
    dec = scan.decode_blocks(
        scan.read_blocks(spark, compacted), man2, ["url", "text"]
    )
    got = {r["url"]: r["text"] for r in dec.collect()}
    want = {
        r["url"]: r["text"]
        for r in spark.read.parquet(src).select("url", "text").collect()
    }
    assert got == want
