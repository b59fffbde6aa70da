"""Iceberg-style metadata-only schema evolution: add/drop column over
the chunked layout (encode.evolve_add_column / evolve_drop_column)."""

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_raquet_spark import encode, manifest as mf, scan


@pytest.fixture(scope="module")
def evo_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("evo") / "tbl")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    web = docs.select(
        F.concat(F.lit("https://x/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60).alias("warc_ts"),
        F.col("text"),
        F.col("doc_id"),
    )
    encode.encode_to_path(spark, web, path, chunks=2, target_rows_per_block=32)
    return path, web


def test_add_column_default_and_append(spark, evo_table):
    path, web = evo_table
    man = encode.evolve_add_column(spark, path, "quality", "double", default=0.5)
    assert man["schema_evolved"] is True
    assert man["columns"][-1]["name"] == "quality"
    ok, errors, _ = mf.validate_manifest(man)
    assert ok, errors

    # pre-evolution chunks decode the default
    out = scan.decode_blocks(
        scan.read_blocks(spark, path), man, ["doc_id", "quality"]
    )
    vals = {r["quality"] for r in out.collect()}
    assert vals == {0.5}

    # appended chunk carries real payloads; mixed read sees both
    extra = web.withColumn("doc_id", F.col("doc_id") + 1000).withColumn(
        "quality", F.lit(0.9)
    )
    encode.append_chunk(spark, extra, path)
    man2 = scan.read_manifest(spark, path)
    # evolution annotations survive append's re-finalization
    assert man2["columns"][-1].get("added_snapshot") == 1
    assert man2["columns"][-1].get("default") == 0.5
    out2 = scan.decode_blocks(
        scan.read_blocks(spark, path), man2, ["doc_id", "quality"]
    )
    counts = {
        r["quality"]: r["count"]
        for r in out2.groupBy("quality").count().collect()
    }
    assert counts == {0.5: 80, 0.9: 80}


def test_append_without_added_column_fills_default(spark, evo_table):
    path, web = evo_table
    extra = web.withColumn("doc_id", F.col("doc_id") + 2000)  # no 'quality'
    encode.append_chunk(spark, extra, path)
    man = scan.read_manifest(spark, path)
    out = scan.decode_blocks(scan.read_blocks(spark, path), man, ["doc_id", "quality"])
    n_default = out.where(
        (F.col("quality") == 0.5) & (F.col("doc_id") >= 2000)
    ).count()
    assert n_default == 80


def test_add_column_null_default_and_eq_filter(spark, evo_table):
    path, _ = evo_table
    man = encode.evolve_add_column(spark, path, "review_flag", "string")
    out = scan.decode_blocks(
        scan.read_blocks(spark, path), man, ["doc_id", "review_flag"]
    )
    assert out.where(F.col("review_flag").isNotNull()).count() == 0
    # eq_filter fast path over a default-only column: no row matches,
    # blocks are skipped without touching other payloads
    filt = scan.decode_blocks(
        scan.read_blocks(spark, path),
        man,
        ["doc_id", "quality"],
        eq_filter=("quality", 0.9),
    )
    assert filt.count() == 80  # only the chunk with real 0.9 payloads


def test_consecutive_evolutions_each_get_a_snapshot(spark, evo_table):
    path, _ = evo_table
    before = max(mf.read_snapshots(path, spark))
    encode.evolve_add_column(spark, path, "e1", "int", default=1)
    encode.evolve_add_column(spark, path, "e2", "int", default=2)
    snaps = mf.read_snapshots(path, spark)
    assert max(snaps) == before + 2
    assert snaps[before + 1]["op"] == "add-column"
    assert snaps[before + 2]["op"] == "add-column"
    assert snaps[before + 2]["column"] == "e2"


def test_drop_column_and_tombstone(spark, evo_table):
    path, _ = evo_table
    man = encode.evolve_drop_column(spark, path, "text")
    assert "text" not in [c["name"] for c in man["columns"]]
    assert "text" in man["dropped_columns"]
    # reads exclude the dropped column; stale payload never resurfaces
    out = scan.decode_blocks(scan.read_blocks(spark, path), man)
    assert "text" not in out.columns
    with pytest.raises(ValueError, match="cannot be\\s+reused"):
        encode.evolve_add_column(spark, path, "text", "string")
    with pytest.raises(ValueError, match="no column"):
        encode.evolve_drop_column(spark, path, "text")
    with pytest.raises(ValueError, match="key column"):
        encode.evolve_drop_column(spark, path, "url")


def test_time_travel_before_evolution_still_reads(spark, evo_table):
    path, _ = evo_table
    man = scan.read_manifest(spark, path)
    blocks0 = scan.read_blocks_at(spark, path, snapshot_id=0)
    out = scan.decode_blocks(blocks0, man, ["doc_id", "quality"])
    rows = out.collect()
    assert len(rows) == 80  # only the original chunks
    assert {r["quality"] for r in rows} == {0.5}


@pytest.fixture(scope="module")
def renamed_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ren") / "tbl")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    web = docs.select(
        F.concat(F.lit("https://r/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60).alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )
    encode.encode_to_path(spark, web, path, chunks=2, target_rows_per_block=32)
    encode.evolve_rename_column(spark, path, "text", "body")
    return path, web


def test_rename_column_reads_and_appends(spark, renamed_table):
    path, web = renamed_table
    man = scan.read_manifest(spark, path)
    spec = next(c for c in man["columns"] if c["name"] == "body")
    assert spec["physical"] == "text"
    assert "text" in man["dropped_columns"]

    # old chunks decode under the new logical name
    out = scan.decode_blocks(scan.read_blocks(spark, path), man, ["doc_id", "body"])
    orig = {r["doc_id"]: r["text"] for r in web.select("doc_id", "text").collect()}
    got = {r["doc_id"]: r["body"] for r in out.collect()}
    assert got == orig

    # append with the NEW name: blobs land under the immutable physical
    # name so old and new chunks agree
    extra = web.withColumnRenamed("text", "body").withColumn(
        "doc_id", F.col("doc_id") + 500
    )
    encode.append_chunk(spark, extra, path)
    man2 = scan.read_manifest(spark, path)
    assert next(c for c in man2["columns"] if c["name"] == "body")["physical"] == "text"
    out2 = scan.decode_blocks(scan.read_blocks(spark, path), man2, ["doc_id", "body"])
    assert out2.count() == 120
    assert out2.where(F.col("body").isNull()).count() == 0


def test_rename_guards(spark, renamed_table):
    path, _ = renamed_table
    with pytest.raises(ValueError, match="already exists"):
        encode.evolve_rename_column(spark, path, "lang", "body")
    with pytest.raises(ValueError, match="physical payload name"):
        encode.evolve_rename_column(spark, path, "lang", "text")
    with pytest.raises(ValueError, match="key column"):
        encode.evolve_rename_column(spark, path, "url", "uri")
    with pytest.raises(ValueError, match="physical payload name"):
        encode.evolve_add_column(spark, path, "text", "string")


def test_rename_then_mask_and_compact(spark, renamed_table, tmp_path):
    path, _ = renamed_table
    man = scan.read_manifest(spark, path)
    blocks = scan.read_blocks(spark, path)
    # row-dropping mask re-encodes under the physical name: round-trips
    masked = scan.mask_values_in(blocks, man, "lang", ["en"])
    dec = scan.decode_blocks(masked, man, ["doc_id", "body", "lang"])
    assert {r["lang"] for r in dec.select("lang").distinct().collect()} == {"en"}
    assert dec.where(F.col("body").isNull()).count() == 0
    # compaction keeps the physical mapping and stays readable
    dst = str(tmp_path / "ren_compact")
    scan.compact_to_path(spark, path, dst)
    man2 = scan.read_manifest(spark, dst)
    out = scan.decode_blocks(scan.read_blocks(spark, dst), man2, ["doc_id", "body"])
    assert out.count() == 120


def test_datasource_reads_evolved_table(spark, evo_table):
    from duckdb_raquet_spark.datasource import RaquetDataSource

    path, _ = evo_table
    spark.dataSource.register(RaquetDataSource)
    df = spark.read.format("raquet").load(path)
    assert "text" not in df.columns  # dropped column never surfaces
    counts = {
        r["quality"]: r["count"]
        for r in df.groupBy("quality").count().collect()
    }
    assert counts == {0.5: 160, 0.9: 80}


def test_compact_backfills_added_column(spark, evo_table, tmp_path):
    path, _ = evo_table
    dst = str(tmp_path / "compacted")
    shutil.rmtree(dst, ignore_errors=True)
    scan.compact_to_path(spark, path, dst)
    man = scan.read_manifest(spark, dst)
    assert "text" not in [c["name"] for c in man["columns"]]
    out = scan.decode_blocks(scan.read_blocks(spark, dst), man, ["doc_id", "quality"])
    counts = {
        r["quality"]: r["count"]
        for r in out.groupBy("quality").count().collect()
    }
    assert counts == {0.5: 160, 0.9: 80}
    # compacted files physically shed the dropped payload
    import pyarrow.parquet as pq
    import glob as g

    files = [
        f
        for f in g.glob(f"{dst}/data/**/*.parquet", recursive=True)
        if "manifest" not in f
    ]
    assert files
    for f in files:
        assert "text_blob" not in pq.read_schema(f).names
