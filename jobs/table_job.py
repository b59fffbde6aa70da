#!/usr/bin/env python
"""spark-submit DML + maintenance CLI over a committed raquet table.

The operational twin of query_job.py: where query_job READS, this job
MUTATES and MAINTAINS — the commands an Iceberg operator would reach
for (`DELETE FROM`, `MERGE INTO`, changelog scan, history, expiry,
delete compaction), each O(delete set) / O(delta) / metadata-only, so
they cost the same on a 100 TB table as on the test fixtures.

    spark-submit --py-files dist/duckdb_raquet_spark.zip jobs/table_job.py \
        <table> delete --col lang --values de,fr
    ... delete --col url,warc_ts --values-parquet /path/droplist.parquet
    ... upsert --key-col url --input /path/new_rows.parquet   # or url,warc_ts
    ... compact-deletes                      # merge delete files, metadata-only
    ... compact-chunks --small-bytes 67108864 [--max-chunks 16]
    ... compact-chunks --chunks 3,4,5        # bin-pack: O(selected bytes)
    ... purge --output /path/purged          # apply deletes physically
    ... expire --keep-last 3                 # snapshots + orphan chunks/deletes
    ... tag corpus-v3 [--snapshot 4]         # immutable ref, pins vs expiry
    ... drop-tag corpus-v3 | tags            # refs are CAS-created files
    ... rollback --tag corpus-v3             # or --snapshot N
    ... expire --keep-last 1 --older-than 1767225600   # age + floor + tags
    ... history                              # one JSON line per snapshot
    ... changes --from-snapshot 2 [--to-snapshot 5] [--cols a,b]
    ... stage-append --input rows.parquet    # write-audit-publish: stage
    ... audit --token T [--cols a,b] [--limit N]   # read the staged view
    ... publish --token T [--rebase]         # CAS-commit the staged append
    ... drop-staged --token T | staged       # abandon / list

Mutations print ONE JSON summary line; `history`/`changes` print JSON
rows (same contract as query_job).
"""

from __future__ import annotations

import argparse
import json
import sys


def _rows_out(df, limit: int | None = None) -> None:
    if limit:
        df = df.limit(limit)
    for r in df.toJSON().toLocalIterator():
        print(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="committed raquet table path")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("delete")
    p.add_argument("--col", required=True,
                   help="key column, or comma list for a composite key")
    p.add_argument("--values", default=None, help="comma-separated literals")
    p.add_argument(
        "--values-parquet", default=None,
        help="parquet path whose first/only matching column is the key list",
    )
    p.add_argument("--staged", action="store_true",
                   help="stage (write-audit-publish) instead of committing")

    p = sub.add_parser("upsert")
    p.add_argument("--key-col", required=True)
    p.add_argument("--input", required=True, help="parquet of full rows")

    sub.add_parser("compact-deletes")

    p = sub.add_parser("compact-chunks")
    p.add_argument("--chunks", default=None,
                   help="comma list of chunk ids to merge")
    p.add_argument("--small-bytes", type=int, default=None,
                   help="merge every visible chunk smaller than this")
    p.add_argument("--max-chunks", type=int, default=None,
                   help="cap the selection, smallest first")

    p = sub.add_parser("purge")
    p.add_argument("--output", required=True)

    p = sub.add_parser("expire")
    p.add_argument("--keep-last", type=int, default=1)
    p.add_argument("--older-than", type=float, default=None,
                   help="unix ts: retain every snapshot committed at/after it")

    p = sub.add_parser("rollback")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--snapshot", type=int, default=None)
    g.add_argument("--tag", default=None)

    p = sub.add_parser("tag")
    p.add_argument("name")
    p.add_argument("--snapshot", type=int, default=None,
                   help="snapshot id to pin (default: current tip)")

    p = sub.add_parser("drop-tag")
    p.add_argument("name")

    sub.add_parser("tags")

    sub.add_parser("history")

    p = sub.add_parser("changes")
    p.add_argument("--from-snapshot", type=int, required=True)
    p.add_argument("--to-snapshot", type=int, default=None)
    p.add_argument("--cols", default=None)
    p.add_argument("--limit", type=int, default=None)

    p = sub.add_parser("stage-append")
    p.add_argument("--input", required=True, help="parquet of full rows")

    p = sub.add_parser("audit")
    p.add_argument("--token", required=True)
    p.add_argument("--cols", default=None)
    p.add_argument("--limit", type=int, default=None)

    p = sub.add_parser("publish")
    p.add_argument("--token", required=True)
    p.add_argument("--rebase", action="store_true",
                   help="re-anchor onto the current snapshot if the log "
                        "advanced since staging (plain appends compose)")

    p = sub.add_parser("drop-staged")
    p.add_argument("--token", required=True)

    sub.add_parser("staged")

    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("raquet-table").getOrCreate()
    from duckdb_raquet_spark import encode, scan

    if args.cmd == "delete":
        if (args.values is None) == (args.values_parquet is None):
            sys.exit("delete needs exactly one of --values / --values-parquet")
        cols = args.col.split(",")
        if args.values is not None:
            if len(cols) > 1:
                sys.exit("composite-key deletes need --values-parquet "
                         "(literal tuples are ambiguous on a CLI)")
            vals = args.values.split(",")
        else:
            vals = spark.read.parquet(args.values_parquet)
        man = encode.delete_rows(
            spark, args.path, cols if len(cols) > 1 else cols[0], vals,
            staged=args.staged,
        )
        if args.staged:
            print(json.dumps({
                "op": "stage-delete",
                "table": args.path,
                "token": man["token"],
                "entry": man["entry"],
                "parent_snapshot_id": man["parent_snapshot_id"],
            }))
        else:
            print(json.dumps({
                "op": "delete",
                "table": args.path,
                "commit": man["delete_files"][-1],
                "live_delete_files": len(man["delete_files"]),
            }))
    elif args.cmd == "upsert":
        df = spark.read.parquet(args.input)
        keys = args.key_col.split(",")
        final = encode.upsert_rows(
            spark, df, args.path, keys if len(keys) > 1 else keys[0]
        )
        print(json.dumps({
            "op": "upsert",
            "table": args.path,
            "num_rows": final["num_rows"],
            "live_delete_files": len(final.get("delete_files", [])),
        }))
    elif args.cmd == "compact-deletes":
        man = encode.compact_delete_files(spark, args.path)
        print(json.dumps({
            "op": "compact-deletes",
            "table": args.path,
            "live_delete_files": len(man.get("delete_files", [])),
            "entries": man.get("delete_files", []),
        }))
    elif args.cmd == "compact-chunks":
        from duckdb_raquet_spark import manifest as mf

        man = encode.compact_chunks(
            spark,
            args.path,
            [int(c) for c in args.chunks.split(",")] if args.chunks else None,
            small_bytes=args.small_bytes,
            max_chunks=args.max_chunks,
        )
        snap = mf.current_snapshot(args.path, spark)
        print(json.dumps({
            "op": "compact-chunks",
            "table": args.path,
            "compacted_from": snap.get("compacted_from"),
            "into": snap.get("into"),
            "visible_chunks": snap["chunks"],
            "num_rows": man["num_rows"],
        }))
    elif args.cmd == "purge":
        final = scan.purge_deletes(spark, args.path, args.output)
        print(json.dumps({
            "op": "purge",
            "table": args.path,
            "output": args.output,
            "num_rows": final["num_rows"],
            "enc_bytes": final["enc_bytes"],
        }))
    elif args.cmd == "expire":
        out = encode.expire_snapshots(
            spark, args.path, keep_last=args.keep_last,
            older_than_unix=args.older_than,
        )
        print(json.dumps({"op": "expire", "table": args.path, **out}))
    elif args.cmd == "rollback":
        from duckdb_raquet_spark import manifest as mf

        if args.tag is not None:
            man = encode.rollback_to_tag(spark, args.path, args.tag)
        else:
            man = encode.rollback_to_snapshot(spark, args.path, args.snapshot)
        snap = mf.current_snapshot(args.path, spark)
        print(json.dumps({
            "op": "rollback",
            "table": args.path,
            "to": args.tag if args.tag is not None else args.snapshot,
            "new_snapshot": snap["snapshot_id"],
            "visible_chunks": snap["chunks"],
            "num_rows": man["num_rows"],
        }))
    elif args.cmd == "tag":
        ref = encode.create_tag(
            spark, args.path, args.name, snapshot_id=args.snapshot
        )
        print(json.dumps({"op": "tag", "table": args.path, **ref}))
    elif args.cmd == "drop-tag":
        encode.drop_tag(spark, args.path, args.name)
        print(json.dumps({"op": "drop-tag", "table": args.path,
                          "name": args.name}))
    elif args.cmd == "tags":
        for r in encode.list_tags(spark, args.path).values():
            print(json.dumps(r))
    elif args.cmd == "stage-append":
        rec = encode.append_chunk(
            spark, spark.read.parquet(args.input), args.path, staged=True
        )
        print(json.dumps({
            "op": "stage-append",
            "table": args.path,
            "token": rec["token"],
            "chunk": rec["chunk"],
            "parent_snapshot_id": rec["parent_snapshot_id"],
            "num_rows": rec["manifest"]["num_rows"],
        }))
    elif args.cmd == "audit":
        cols = args.cols.split(",") if args.cols else None
        _rows_out(
            scan.read_staged_rows(spark, args.path, args.token, cols),
            args.limit,
        )
    elif args.cmd == "publish":
        final = encode.publish_staged(
            spark, args.path, args.token, rebase=args.rebase
        )
        from duckdb_raquet_spark import manifest as mf

        snap = mf.current_snapshot(args.path, spark)
        print(json.dumps({
            "op": "publish",
            "table": args.path,
            "token": args.token,
            "new_snapshot": snap["snapshot_id"],
            "num_rows": final["num_rows"],
        }))
    elif args.cmd == "drop-staged":
        out = encode.drop_staged(spark, args.path, args.token)
        print(json.dumps({"op": "drop-staged", "table": args.path, **out}))
    elif args.cmd == "staged":
        for r in encode.list_staged(spark, args.path).values():
            print(json.dumps({k: v for k, v in r.items()
                              if k != "manifest"}))
    elif args.cmd == "history":
        _rows_out(scan.table_history(spark, args.path))
    elif args.cmd == "changes":
        cols = args.cols.split(",") if args.cols else None
        _rows_out(
            scan.read_changes(
                spark,
                args.path,
                args.from_snapshot,
                args.to_snapshot,
                cols=cols,
            ),
            args.limit,
        )
    else:  # pragma: no cover
        sys.exit(2)

    spark.stop()


if __name__ == "__main__":
    main()
