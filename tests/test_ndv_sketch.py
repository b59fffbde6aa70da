"""KMV NDV sketch (scan.analyze_ndv) — the Iceberg compute_table_stats
/ Puffin-stats analog for columns whose exact per-block value sets are
table-sized by design (url at 10^12 rows).

Reference parity: duckdb-raquet serves stats from precomputed per-block
metadata (band_stats_v01.cpp); the sketch extends that idea to distinct
counts that no exact per-block set can carry."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from duckdb_raquet_spark import encode, scan

pytestmark = pytest.mark.spark


def _py_hash(v: str) -> int:
    return int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:10], 16)


def _py_kmv(values, k):
    hs = sorted({_py_hash(v) for v in values if v is not None})[:k]
    return hs


def _webtext(spark, n=200, shift=0):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).where(F.col("doc_id") < n)
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            (F.col("doc_id") + shift).cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id") + shift) * 60
        ).alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
        (F.col("doc_id") + shift).alias("doc_id"),
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ndv") / "tbl")
    df = _webtext(spark)
    encode.encode_to_path(
        spark, df, path, target_rows_per_block=64, zlib_level=1, chunks=2
    )
    return path, df


def test_kmv_merge_is_union_sketch():
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — the property that
    makes per-chunk sketches combinable across appends."""
    a = [f"u{i}" for i in range(300)]
    b = [f"u{i}" for i in range(200, 500)]
    k = 64
    merged = scan.kmv_merge(_py_kmv(a, k), _py_kmv(b, k), k)
    assert merged == _py_kmv(a + b, k)


def test_kmv_estimate_small_is_exact():
    hs = _py_kmv([f"v{i}" for i in range(10)], 64)
    assert scan.kmv_estimate(hs, 64) == 10


def test_sketch_matches_pure_python_replay(spark, table):
    path, df = table
    out = {
        r["column"]: r
        for r in scan.analyze_ndv(
            spark, path, ["url", "lang"], k=32, persist=False
        ).collect()
    }
    urls = [r["url"] for r in df.select("url").collect()]
    langs = [r["lang"] for r in df.select("lang").collect()]
    for col, vals in (("url", urls), ("lang", langs)):
        hs = _py_kmv(vals, 32)
        assert out[col]["n_hashes"] == len(hs)
        assert out[col]["kth_hash"] == hs[-1]
        assert out[col]["ndv_est"] == scan.kmv_estimate(hs, 32)
    # low-cardinality column takes the exact branch
    assert out["lang"]["ndv_est"] == len(set(langs))


def test_estimator_error_within_kmv_band(spark, table):
    path, df = table
    true_ndv = df.select("url").distinct().count()
    est = (
        scan.analyze_ndv(spark, path, ["url"], k=64, persist=False)
        .collect()[0]["ndv_est"]
    )
    # KMV standard error ~ 1/sqrt(k-2) = 12.7% at k=64; allow 4 sigma
    assert abs(est - true_ndv) / true_ndv < 0.5


def test_incremental_append_merges_exactly(spark, table, tmp_path):
    path = str(tmp_path / "tbl")
    encode.encode_to_path(
        spark, _webtext(spark, n=150), path,
        target_rows_per_block=64, zlib_level=1, chunks=2,
    )
    scan.analyze_ndv(spark, path, ["url", "lang"], k=64)
    encode.append_chunk(spark, _webtext(spark, n=80, shift=5000), path)
    inc = scan.analyze_ndv(spark, path, ["url", "lang"], k=64, incremental=True)
    full = scan.analyze_ndv(
        spark, path, ["url", "lang"], k=64, incremental=False, persist=False
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # sidecar advanced to the current snapshot
    sk = scan.read_ndv_sketch(spark, path)
    cur = __import__(
        "duckdb_raquet_spark.manifest", fromlist=["manifest"]
    ).current_snapshot(path, spark)
    assert sk["snapshot_id"] == cur["snapshot_id"]


def test_incremental_noop_when_sketch_current(spark, table, tmp_path):
    path = str(tmp_path / "tbl")
    encode.encode_to_path(
        spark, _webtext(spark, n=100), path,
        target_rows_per_block=64, zlib_level=1, chunks=2,
    )
    first = scan.analyze_ndv(spark, path, ["url"], k=64)
    again = scan.analyze_ndv(spark, path, ["url"], k=64, incremental=True)
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_delete_falls_back_to_full_recompute(spark, tmp_path):
    path = str(tmp_path / "tbl")
    encode.encode_to_path(
        spark, _webtext(spark, n=120), path,
        target_rows_per_block=64, zlib_level=1, chunks=2,
    )
    scan.analyze_ndv(spark, path, ["url"], k=64)
    encode.delete_rows(spark, path, "doc_id", [0, 1, 2, 3, 4])
    inc = scan.analyze_ndv(spark, path, ["url"], k=64, incremental=True)
    full = scan.analyze_ndv(
        spark, path, ["url"], k=64, incremental=False, persist=False
    )
    # KMV cannot subtract, so the delete forces a recompute over live
    # rows — incremental must silently equal the full pass, not drift
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_column_stats_serves_persisted_sketch(spark, tmp_path):
    path = str(tmp_path / "tbl")
    encode.encode_to_path(
        spark, _webtext(spark, n=100), path,
        target_rows_per_block=64, zlib_level=1, chunks=2,
    )
    scan.analyze_ndv(spark, path, ["url"], k=64)
    got = {
        r["column"]: r["ndv_est"]
        for r in scan.column_stats(spark, path, with_ndv_sketch=True).collect()
    }
    assert got["url"] is not None and got["url"] > 0
    assert got["lang"] is None  # not analyzed -> no sketch claim
    # a new commit makes the sketch stale: served as NULL, never wrong
    encode.append_chunk(spark, _webtext(spark, n=10, shift=9000), path)
    got2 = {
        r["column"]: r["ndv_est"]
        for r in scan.column_stats(spark, path, with_ndv_sketch=True).collect()
    }
    assert got2["url"] is None


def test_unknown_column_raises(spark, table):
    path, _ = table
    with pytest.raises(KeyError):
        scan.analyze_ndv(spark, path, ["nope"], persist=False)
