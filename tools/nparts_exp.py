#!/usr/bin/env python
"""Experiment: encode stage wall vs num_partitions (diagnostics only).

Usage: python tools/nparts_exp.py [--nparts 32,128,256,1024] [--effort max]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata_local/sf1.0")
    ap.add_argument("--nparts", default="32,64,128,256,1024")
    ap.add_argument("--effort", default="max")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    import bench
    from duckdb_raquet_spark import encode

    spark = bench.make_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = bench.sf_of(args.sf_dir)
    rows = int(bench.ROWS_PER_SF * sf)
    input_path, ts_range = bench.prepare_input(spark, rows)
    bench.warmup(spark, input_path, rows, ts_range)
    df = spark.read.parquet(input_path)
    trpb = max(1024, rows // 256)
    out = os.path.join(bench.TMP, "enc_nparts_exp")
    for np_s in args.nparts.split(","):
        np_ = int(np_s)
        best = None
        for _ in range(args.reps):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            encode.encode_to_path(
                spark, df, out, est_rows=rows, ts_range=ts_range,
                target_rows_per_block=trpb, effort=args.effort,
                num_partitions=np_,
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"n_parts={np_:5d} effort={args.effort}: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
