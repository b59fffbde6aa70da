#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/<tag>/ files.

Usage: python tools/dump_plans.py --out plans/r06 --suffix _after \
           --queries a,b,c [--sf-dir DIR] [--repo DIR]
"""
from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", default="plans/r06")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--repo", default=None, help="repo root to import from")
    args = ap.parse_args()

    repo = args.repo or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("raquet-plans")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", "/dev/shm/raquet_spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.chdir(repo)
    import __spark_entry__ as entry

    qs = entry.queries()
    outdir = args.out
    os.makedirs(outdir, exist_ok=True)
    for name in args.queries.split(","):
        df = qs[name](spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
