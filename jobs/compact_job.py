#!/usr/bin/env python
"""spark-submit table-maintenance entry point: compact a raquet table.

The write-side complement of the map-only encode — merge each block
key's salted/partitioned sub-rows into canonical rows (the Iceberg
rewrite_data_files / OPTIMIZE analog), re-committed with the same
sorted-write + manifest-row-last protocol as the encode job
(duckdb_raquet_spark.scan.compact_to_path).

Usage:
    spark-submit --py-files dist/duckdb_raquet_spark.zip \
        jobs/compact_job.py SRC DST [--max-rows-per-block N]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--max-rows-per-block", type=int, default=262144)
    ap.add_argument("--zlib-level", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("raquet-compact").getOrCreate()
    from duckdb_raquet_spark import scan

    final = scan.compact_to_path(
        spark, args.src, args.dst,
        zlib_level=args.zlib_level,
        max_rows_per_block=args.max_rows_per_block,
    )
    print(json.dumps({
        k: final[k]
        for k in ("num_blocks", "num_rows", "raw_bytes", "enc_bytes")
    } | {"output": args.dst}))
    spark.stop()


if __name__ == "__main__":
    main()
