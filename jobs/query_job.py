#!/usr/bin/env python
"""spark-submit read-side CLI over an encoded raquet-style table.

The read twin of jobs/encode_job.py — the reference ships its read
surface as SQL macros (read_raquet / read_raquet_at / stats,
/root/reference/src/raquet_extension.cpp:36-263); this exposes the same
operations as subcommands so a cluster user never has to write driver
code:

    spark-submit --py-files dist/duckdb_raquet_spark.zip jobs/query_job.py \
        <table_path> point --url https://... [--ts-epoch N] [--cols text,lang]
    ... range --lo-epoch N --hi-epoch N [--cols url,lang] [--limit K]
    ... stats --col len_text            # decode-free, from block stats
    ... counts --col lang               # decode-free categorical counts
    ... decode [--cols url,text] [--limit K]
    ... manifest

Output: JSON lines on stdout (one per result row; `manifest` prints the
manifest document).
"""

from __future__ import annotations

import argparse
import json
import sys


def _rows_out(df, limit: int | None) -> None:
    if limit:
        df = df.limit(limit)
    for r in df.toJSON().toLocalIterator():
        print(r)


def _warn_stale_stats(man: dict) -> None:
    """Decode-free stats come from per-block footers written at encode
    time; equality deletes are metadata-only, so those footers still
    count deleted rows. Same trade as Iceberg metadata stats — flag it
    rather than silently over-counting."""
    if man.get("delete_files"):
        print(
            "warning: table has live equality-delete files; block-stats "
            "results include deleted rows (purge_deletes to refresh)",
            file=sys.stderr,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="encoded table path (output of encode_job)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("point")
    p.add_argument("--url", required=True)
    p.add_argument("--ts-epoch", type=int, default=None)
    p.add_argument("--cols", default=None)

    p = sub.add_parser("range")
    p.add_argument("--lo-epoch", type=int, required=True)
    p.add_argument("--hi-epoch", type=int, required=True)
    p.add_argument("--cols", default=None)
    p.add_argument("--limit", type=int, default=None)

    p = sub.add_parser("stats")
    p.add_argument("--col", required=True, help="num_stats key, e.g. len_text or warc_ts")

    p = sub.add_parser("counts")
    p.add_argument("--col", required=True, help="categorical column, e.g. lang")

    p = sub.add_parser("analyze")
    p.add_argument(
        "--ndv-cols",
        default=None,
        help="comma-sep columns: run the KMV NDV sketch pass (one pruned "
        "decode per column, persisted to _stats/ndv.json) before the "
        "metadata-only report; --incremental merges appended chunks only",
    )
    p.add_argument("--incremental", action="store_true")

    p = sub.add_parser("decode")
    p.add_argument("--cols", default=None)
    p.add_argument("--limit", type=int, default=None)

    p = sub.add_parser("rollup")
    p.add_argument("--parent-res", type=int, required=True)
    p.add_argument("--col", required=True, help="num_stats key, e.g. len_text")

    p = sub.add_parser("bandmath")
    p.add_argument("--cols", required=True, help="decoded numeric columns, comma-sep")
    p.add_argument(
        "--expr",
        required=True,
        help="numpy expression over the column names, e.g. '(a - b) / (a + b)'",
    )

    sub.add_parser("manifest")

    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("raquet-query").getOrCreate()
    from duckdb_raquet_spark import scan

    man = scan.read_manifest(spark, args.path)
    cols = args.cols.split(",") if getattr(args, "cols", None) else None

    if args.cmd == "manifest":
        print(json.dumps(man))
    elif args.cmd == "point":
        df = scan.point_lookup(
            spark, args.path, args.url, ts_epoch=args.ts_epoch, cols=cols, man=man
        )
        _rows_out(df, None)
    elif args.cmd == "range":
        df = scan.range_scan_ts(
            spark, args.path, args.lo_epoch, args.hi_epoch, cols=cols, man=man
        )
        _rows_out(df, args.limit)
    elif args.cmd == "stats":
        _warn_stale_stats(man)
        blocks = scan.read_blocks(spark, args.path)
        _rows_out(scan.summary_stats(blocks, args.col), None)
    elif args.cmd == "counts":
        _warn_stale_stats(man)
        blocks = scan.read_blocks(spark, args.path)
        _rows_out(scan.cat_value_counts(blocks, args.col), None)
    elif args.cmd == "analyze":
        if args.ndv_cols:
            scan.analyze_ndv(
                spark,
                args.path,
                args.ndv_cols.split(","),
                incremental=args.incremental,
            ).collect()
        _rows_out(
            scan.column_stats(
                spark, args.path, with_ndv_sketch=bool(args.ndv_cols)
            ),
            None,
        )
    elif args.cmd == "rollup":
        _warn_stale_stats(man)
        blocks = scan.read_blocks(spark, args.path)
        _rows_out(scan.rollup_stats(blocks, man, args.parent_res, args.col), None)
    elif args.cmd == "bandmath":
        import numpy as np

        blocks = scan.read_blocks(spark, args.path)
        expr = args.expr
        # The expression is the caller's own code running on their own job;
        # keep builtins so numpy internals (lazy imports) work under eval.
        fn = lambda a, expr=expr: eval(expr, {"np": np}, dict(a))  # noqa: E731,S307
        _rows_out(scan.column_math_stats(blocks, man, cols, fn), None)
    elif args.cmd == "decode":
        # table-level read: equality deletes applied (no-op otherwise)
        _rows_out(scan.read_rows(spark, args.path, cols, man=man), args.limit)
    else:  # pragma: no cover
        sys.exit(2)

    spark.stop()


if __name__ == "__main__":
    main()
