"""Streaming analytics ops: watermarked windowed aggregation (batch-
equivalent on bounded input) and stateful gap sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_raquet_spark import streaming

pytestmark = pytest.mark.spark


def _events(spark, tmp_path):
    src = str(tmp_path / "events_src")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        # watermarks require TIMESTAMP (the driver tables ship NTZ)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .repartition(3)
        .write.parquet(src)
    )
    return src


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    """Incremental multi-batch windowed agg == one-shot batch agg on the
    same bounded input (watermark sized so no event is ever late —
    late-drop semantics get their own test below)."""
    src = _events(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming.windowed_counts(stream, "ts", window="1 day", watermark="365 days")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["win_start"], r["win_end"], r["event_type"]): (
            r["cnt"],
            round(r["sum_value"], 6),
        )
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = streaming.windowed_counts(
        spark.read.parquet(src), "ts", window="1 day", watermark="1 day"
    )
    want = {
        (r["win_start"], r["win_end"], r["event_type"]): (
            r["cnt"],
            round(r["sum_value"], 6),
        )
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_windowed_counts_drops_late_events(spark, tmp_path):
    """Append mode + 1-hour watermark: an event older than the watermark
    arrives in a later batch and is deterministically dropped; its
    already-closed window keeps the on-time count."""
    import time

    src = tmp_path / "late_src"
    src.mkdir()

    def write_file(name, rows):
        (
            spark.createDataFrame(rows, "ts string, event_type string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / name))
        )

    write_file("f1", [
        ("2024-01-01 10:00:00", "view", 1.0),
        ("2024-01-01 10:30:00", "view", 1.0),
        ("2024-01-01 13:00:00", "view", 1.0),
    ])
    schema = spark.read.parquet(str(src / "f1")).schema

    sink = str(tmp_path / "late_out")

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        out = streaming.windowed_counts(
            stream, "ts", key_col="event_type", window="1 hour", watermark="1 hour"
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_late"))
            .start()
        )
        q.awaitTermination(300)

    # run 1: watermark persisted in the checkpoint ends at 12:00
    run()
    time.sleep(1)
    write_file("f2", [
        ("2024-01-01 10:40:00", "view", 1.0),   # late: watermark is 12:00
        ("2024-01-01 14:00:00", "view", 1.0),
    ])
    # run 2 resumes from the checkpoint; the 10:40 event is behind the
    # restored watermark and must be dropped
    run()
    got = {}
    for r in spark.read.parquet(sink).collect():
        got[str(r["win_start"])] = got.get(str(r["win_start"]), 0) + r["cnt"]
    # the 10:00 window closed with its 2 ON-TIME events; the late 10:40
    # event did not resurrect it (cnt stays 2, no duplicate emission)
    assert got.get("2024-01-01 10:00:00") == 2


def test_sessionize_gap_sessions(spark, tmp_path):
    rows = [
        # user 1: two sessions separated by > gap; the first has TWO
        # events at the same timestamp (must not double-count values)
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:00:00", 4.0),
        (1, "2024-01-01 10:10:00", 2.0),
        (1, "2024-01-01 13:00:00", 3.0),
        # user 2: one long session (each hop < gap)
        (2, "2024-01-01 09:00:00", 5.0),
        (2, "2024-01-01 09:20:00", 5.0),
        (2, "2024-01-01 09:40:00", 5.0),
    ]
    src = str(tmp_path / "sess_src")
    (
        spark.createDataFrame(rows, "user_id long, ts string, value double")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
        .write.parquet(src)
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sessions = streaming.sessionize(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions").collect()
    )
    # within one availableNow run the final watermark closes user 1's
    # FIRST session (gap observed in-stream); open tail sessions stay in
    # state — assert the closed one is exactly right (3 events incl. the
    # duplicate-timestamp pair, values summed once each)
    assert (1, "2024-01-01 10:00:00", 3, 7.0) in got


def test_upsert_stream_cdc_merge(spark, tmp_path):
    """Streaming MERGE: a CDC-style stream of row versions upserts into
    a committed table; the final visible state keeps exactly the latest
    version per key (order_col collapses in-batch duplicates)."""
    from duckdb_raquet_spark import encode, scan

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(30)
    base = docs.select(
        F.concat(F.lit("https://d/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60).alias("warc_ts"),
        "text",
        "lang",
        "doc_id",
    )
    path = str(tmp_path / "tbl")
    encode.encode_to_path(spark, base, path, chunks=2, target_rows_per_block=16)

    # CDC feed: two versions of every %3 key (v1 then v2, one file each
    # so maxFilesPerTrigger=1 delivers them as separate batches), plus
    # one brand-new key
    src = str(tmp_path / "cdc_src")
    upd = base.where(F.col("doc_id") % 3 == 0)
    v1 = upd.withColumn("lang", F.lit("v1"))
    v2 = upd.withColumn("lang", F.lit("v2")).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    new = base.limit(1).select(
        F.lit("https://d/brandnew").alias("url"),
        F.col("warc_ts"),
        F.col("text"),
        F.lit("nw").alias("lang"),
        F.lit(777_777).alias("doc_id"),
    )
    v1.coalesce(1).write.parquet(src + "/f=1")
    v2.unionByName(new).coalesce(1).write.parquet(src + "/f=2")

    schema = spark.read.parquet(src + "/f=1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/f=*")
    )
    q = streaming.upsert_stream(
        stream,
        path,
        "url",
        order_col="warc_ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    out = {r["url"]: r["lang"] for r in scan.read_rows(spark, path).collect()}
    assert len(out) == 31  # 30 originals (some updated) + 1 insert
    assert out["https://d/brandnew"] == "nw"
    for r in base.collect():
        want = "v2" if r["doc_id"] % 3 == 0 else r["lang"]
        assert out[f"https://d/{r['doc_id']}"] == want


def test_dedup_exact_stream_cross_batch(spark, tmp_path):
    """Online exact dedup drops a re-crawl arriving in a LATER
    micro-batch (watermark-bounded state), and the same expression
    tree dedups a bounded batch input identically."""
    import time

    src = str(tmp_path / "docs_src")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.col("doc_id") < 40)
        .select(
            "doc_id",
            "text",
            F.timestamp_seconds(1704067200 + F.col("doc_id")).alias("ts"),
        )
    )
    docs.coalesce(1).write.parquet(src)
    time.sleep(1.1)  # distinct mtime -> the re-crawl lands in batch 2
    docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        "text",
        F.timestamp_seconds(1704070800 + F.col("doc_id")).alias("ts"),
    ).coalesce(1).write.mode("append").parquet(src)

    n_distinct = docs.select("text").distinct().count()
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming.dedup_exact_stream(
        stream, text_col="text", ts_col="ts", watermark="7 days"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from dedup_stream_out").collect()
    assert len(rows) == n_distinct
    assert len({r["text"] for r in rows}) == n_distinct
    # survivors keep full rows (digest helper columns dropped)
    assert set(rows[0].asDict()) == {"doc_id", "text", "ts"}
    # batch twin: state-free dedup over the same bounded input
    b = streaming.dedup_exact_stream(spark.read.parquet(src), text_col="text")
    assert b.count() == n_distinct
