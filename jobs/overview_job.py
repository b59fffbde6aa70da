#!/usr/bin/env python
"""spark-submit maintenance entry point: materialize overview pyramids.

Builds blocks-shaped stats tables at coarser resolutions under
``<table>/overviews/res=<r>/`` (duckdb_raquet_spark.scan.build_overviews)
— the reference's pre-built overview tiles for webtext stats. Rollup
queries are then served from the smallest usable level
(scan.rollup_stats_served), bit-identical to recomputing from blocks.

Usage:
    spark-submit --py-files dist/duckdb_raquet_spark.zip \
        jobs/overview_job.py /path/table [--levels 0,2,4]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument(
        "--levels", default=None,
        help="comma-separated resolutions (default: res-2, res-4, ... >= 0)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("raquet-overviews").getOrCreate()
    from duckdb_raquet_spark import scan

    levels = (
        [int(x) for x in args.levels.split(",")] if args.levels else None
    )
    built = scan.build_overviews(spark, args.path, levels=levels)
    print(json.dumps({"levels": built, "path": args.path}))
    spark.stop()


if __name__ == "__main__":
    main()
