"""Structured-Streaming ingest: micro-batches -> encoded block chunks.

The reference is strictly batch; its incremental machinery is the
two-phase pipelined producer with the manifest row emitted last
(/root/reference/src/raster/read_raster.cpp:1486-1590). The streaming
twin keeps both invariants per micro-batch:

  * each micro-batch becomes its own ``chunk=<batch_id>`` subdirectory —
    an idempotent overwrite, so Spark's at-least-once foreachBatch
    replay after a failure can never duplicate rows (the same batch id
    rewrites the same directory);
  * the manifest row + sidecar are re-finalized strictly AFTER the
    batch's data commit, so readers always see a manifest that covers
    only fully committed blocks;
  * a lineage record per batch (rows/bytes/wall) makes progress
    observable and resumable, same shape as batch-mode chunk lineage.

Block keys use a FIXED (resolution, ts_origin, bucket_seconds) from the
caller — a stream cannot scan its own future to size the time cells, so
the caller pins the key geometry up front (e.g. from the crawl window),
exactly like the reference pins tiling zoom at bind time.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from . import encode as enc
from . import manifest as mf


def encode_stream(
    stream_df: DataFrame,
    path: str,
    *,
    resolution: int,
    ts_origin: int,
    bucket_seconds: int = 86400,
    url_col: str = "url",
    ts_col: str | None = "warc_ts",
    zlib_level: int = 6,
    effort: str = "max",
    codec_overrides: dict[str, str] | None = None,
    shuffle: str = "hash",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the streaming encode; returns the StreamingQuery.

    ``stream_df`` is any streaming DataFrame with the webtext schema
    (file source, Kafka + parse, rate + synth, ...). ``shuffle="none"``
    pairs naturally with streaming ingest: each micro-batch partition
    encodes locally (zero raw-byte shuffle in the hot ingest path) and
    a background :func:`duckdb_raquet_spark.scan.compact_to_path` pass
    merges the salted sub-rows into the canonical layout later."""
    if not stream_df.isStreaming:
        raise ValueError("encode_stream needs a streaming DataFrame")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        t0 = time.time()
        n = batch_df.count()
        if n == 0:
            return
        blocks, man = enc.encode_table(
            batch_df,
            url_col=url_col,
            ts_col=ts_col,
            resolution=resolution,
            bucket_seconds=bucket_seconds,
            ts_range=(ts_origin, ts_origin),  # pinned geometry
            est_rows=n,
            zlib_level=zlib_level,
            effort=effort,
            codec_overrides=codec_overrides,
            shuffle=shuffle,
        )
        # pin ts_origin explicitly (ts_range above fixes the origin; the
        # effective bucket stays the caller's bucket_seconds)
        man["key"]["ts_origin"] = ts_origin
        part = f"{enc._data_path(path)}/chunk={batch_id}"
        blocks.sortWithinPartitions(enc.BLOCK, enc.SALT).write.mode(
            "overwrite"
        ).parquet(part)
        totals, hist = enc._aggregate_written(spark, path)
        final = mf.finalize_manifest(man, codec_histogram=hist, **totals)
        final["lineage_chunks"] = batch_id + 1
        enc._append_manifest_row(
            spark,
            path,
            final,
            man["columns"],
            target=f"{enc._data_path(path)}/chunk=-1",
            mode="overwrite",
        )
        mf.write_sidecar(path, final, spark)
        mf.write_chunk_lineage(
            path,
            batch_id,
            {
                "chunk": batch_id,
                "rows": n,
                "raw_bytes": final["raw_bytes"],
                "enc_bytes": final["enc_bytes"],
                "wall_seconds": round(time.time() - t0, 3),
                "streaming": True,
            },
            spark,
        )

    writer = stream_df.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
