#!/usr/bin/env python
"""spark-submit training-data dedup pipeline over a webtext parquet table.

End-to-end: exact dedup (digest groups) -> MinHash+LSH near-dup pairs ->
connected components -> one keep/drop decision list written as parquet.
The artifact a 100 TB pretraining pipeline actually consumes: every
doc_id labeled with its component's canonical keeper.

    spark-submit --py-files dist/duckdb_raquet_spark.zip jobs/dedup_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/dedup_out [--threshold 0.8] [--k 32] [--bands 8] \
        [--max-bucket 1000] [--delete-from /path/to/raquet_table \
        --delete-col doc_id]

Output table: (doc_id, keep_id, reason) where reason in
('exact', 'near', 'unique', 'index', 'fuzzy'); plus one JSON summary
line on stdout. With --fuzzy-index, near-dup detection ALSO runs
incrementally: the batch's exact-unique reps check LSH band collisions
against a persisted MinHash index of everything ever kept
(dedup.incremental_minhash_dedup — exact-Jaccard verified, O(batch +
collisions) per ingest) and kept reps append to the index; such drops
carry reason='fuzzy' and a NULL keep_id. With --digest-index, the job runs INCREMENTALLY across
invocations: docs whose 192-bit digest is already in the index are
dropped before any tokenization (exact matches only — near-dup
detection stays per-batch) yet still appear in the output with
reason='index' and a NULL keep_id (the keeper lives in a prior run),
so --delete-from removes them too; this run's kept digests are
appended afterward, so dedup of a growing corpus costs O(batch) per
ingest, never O(history).
With --delete-from, the drop list is additionally applied to a
committed raquet table as ONE Iceberg-style equality-delete commit
(encode.delete_rows) — the dedup sweep physically rewrites nothing.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument(
        "--max-bucket",
        type=int,
        default=1000,
        help="LSH hot-bucket cap (consecutive-id chaining above it); "
        "safe here because the consumer is connected components",
    )
    ap.add_argument(
        "--digest-index",
        default=None,
        help="parquet dir of (_len,_md5,_xx) digests from prior runs: "
        "docs already in it are dropped up front (O(batch) incremental "
        "dedup), and this run's kept docs are appended to it",
    )
    ap.add_argument(
        "--fuzzy-index",
        default=None,
        help="parquet dir of (_id,_hs,_bands) MinHash index rows from "
        "prior runs (build_minhash_index layout): the batch's exact-"
        "unique reps dedup against everything ever kept via LSH band "
        "collisions + exact Jaccard (O(batch + collisions), the kept "
        "corpus is never re-read), and this run's kept reps are "
        "appended; replaces the within-batch pair sweep (--max-bucket "
        "bounds hot band buckets on this path too)",
    )
    ap.add_argument(
        "--delete-from",
        default=None,
        help="raquet table path: apply the drop list as one equality-"
        "delete commit (merge-on-read; no data file rewritten)",
    )
    ap.add_argument(
        "--staged-delete",
        action="store_true",
        help="with --delete-from: STAGE the drop list (write-audit-"
        "publish) instead of committing it — audit via table_job, "
        "then publish or drop",
    )
    ap.add_argument(
        "--delete-col",
        default=None,
        help="table column the drop list keys match (default: --id-col)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("raquet-dedup").getOrCreate()
    from duckdb_raquet_spark.functions import dedup

    docs = spark.read.parquet(args.input).select(
        F.col(args.id_col).alias("doc_id"), F.col(args.text_col).alias("text")
    )

    # 0. cross-RUN incremental dedup: anti-join the batch's digests
    #    against the persisted index (bytes ∝ batch, never the history;
    #    within-batch dedup stays with steps 1-3 so reason labels hold).
    #    Index-dropped docs are NOT discarded: they re-enter the
    #    decision table with reason='index' and a NULL keep_id (their
    #    keeper lives in a prior run), so --delete-from still deletes
    #    them and every input doc has an output row.
    dig = ["_len", "_md5", "_xx"]
    idx_dropped = None
    n_dropped_by_index = 0
    if args.digest_index:
        try:
            idx = spark.read.parquet(args.digest_index).select(*dig)
        except Exception as e:
            # only a MISSING path means "first run"; permissions or a
            # schema-mismatched index must not silently disable
            # incremental dedup (and then append to the wrong place)
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                idx = None
            else:
                raise
        if idx is not None:
            d0 = docs.select("doc_id", *dedup.exact_digest_cols("text"))
            idx_dropped = d0.join(idx, dig, "left_semi").select("doc_id")
            n_dropped_by_index = idx_dropped.count()
            if n_dropped_by_index:
                docs = docs.join(idx_dropped, "doc_id", "left_anti")
            else:
                idx_dropped = None

    # 1. exact dedup on the 192-bit digest — collapses byte-identical
    #    copies before any tokenization (ONE digest definition shared
    #    with exact_dedup and the streaming filter)
    d = docs.select("doc_id", *dedup.exact_digest_cols("text"))
    w_exact = d.groupBy("_len", "_md5", "_xx").agg(
        F.min("doc_id").alias("exact_keep"), F.collect_list("doc_id").alias("_ids")
    )
    exact_map = w_exact.select(
        F.explode("_ids").alias("doc_id"), "exact_keep"
    )

    # 2. near-dup pairs over the exact-unique representatives only
    reps = docs.join(
        exact_map.where(F.col("doc_id") == F.col("exact_keep")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    kept_fuzzy_index = None
    if args.fuzzy_index:
        # 2'/3'. incremental fuzzy dedup against the persisted MinHash
        #    index: a rep is dropped iff its verified-Jaccard component
        #    reaches anything already kept (cross-run) or it is not
        #    first-in-batch in a base-free component. First run = empty
        #    index (built from zero rows, same schema).
        try:
            fidx = spark.read.parquet(args.fuzzy_index)
        except Exception as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                fidx = dedup.build_minhash_index(
                    reps.limit(0), "doc_id", "text", k=args.k, bands=args.bands
                )
            else:
                raise
        kept_reps, kept_fuzzy_index = dedup.incremental_minhash_dedup(
            reps, fidx, "doc_id", "text", args.threshold,
            k=args.k, bands=args.bands, max_bucket=args.max_bucket,
            base_is_index=True, return_kept_index=True,
        )
        fuzzy_drops = reps.select("doc_id").join(
            kept_reps.select("doc_id"), "doc_id", "left_anti"
        )
        # 4'. decision list: a doc whose exact representative was
        #    fuzzy-dropped drops with it; keep_id is NULL when the
        #    keeper may live in a prior run (same contract as 'index')
        keep_type = dict(docs.dtypes)["doc_id"]
        fz = fuzzy_drops.select(
            F.col("doc_id").alias("exact_keep"), F.lit(True).alias("_fz")
        )
        decided = exact_map.join(fz, "exact_keep", "left").select(
            "doc_id",
            F.when(
                F.col("_fz").isNotNull(), F.lit(None).cast(keep_type)
            ).otherwise(F.col("exact_keep")).alias("keep_id"),
            F.when(F.col("_fz").isNotNull(), "fuzzy")
            .when(F.col("exact_keep") != F.col("doc_id"), "exact")
            .otherwise("unique")
            .alias("reason"),
        )
    else:
        pairs = dedup.minhash_lsh_pairs(
            reps, "doc_id", "text", args.threshold,
            k=args.k, bands=args.bands, max_bucket=args.max_bucket,
        )

        # 3. transitive closure -> canonical keeper per near-dup cluster
        comps = dedup.connected_components(pairs, "a", "b")

        # 4. final decision list: exact keeper -> its component keeper
        decided = (
            exact_map.join(
                comps.withColumnRenamed("id", "exact_keep"), "exact_keep", "left"
            )
            .select(
                "doc_id",
                F.coalesce("comp", "exact_keep").alias("keep_id"),
                F.when(F.col("comp").isNotNull() & (F.col("comp") != F.col("doc_id")), "near")
                .when(F.col("exact_keep") != F.col("doc_id"), "exact")
                .otherwise("unique")
                .alias("reason"),
            )
        )
    if idx_dropped is not None:
        keep_type = dict(decided.dtypes)["keep_id"]
        decided = decided.unionByName(
            idx_dropped.select(
                "doc_id",
                F.lit(None).cast(keep_type).alias("keep_id"),
                F.lit("index").alias("reason"),
            )
        )
    decided.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    n_total = out.count()
    # eqNullSafe: reason='index' rows carry a NULL keep_id (the keeper
    # is in a prior run) and must count as DROPPED, not vanish from
    # both sides of a null-poisoned comparison
    is_kept = F.col("doc_id").eqNullSafe(F.col("keep_id"))
    n_keep = out.where(is_kept).count()
    by_reason = {
        r["reason"]: r["cnt"]
        for r in out.where(~is_kept)
        .groupBy("reason")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    summary = {
        "total_docs": n_total,
        "kept": n_keep,
        "dropped": n_total - n_keep,
        "dropped_by_reason": by_reason,
        "output": args.output,
    }
    if args.digest_index:
        # append this run's KEPT digests so the next batch dedups
        # against everything ever kept (the index grows by kept docs
        # only, ~45 bytes each)
        keepers = out.where(is_kept).select(
            "doc_id"
        )
        d.join(keepers, "doc_id", "left_semi").select(*dig).write.mode(
            "append"
        ).parquet(args.digest_index)
        summary["digest_index"] = args.digest_index
        summary["dropped_by_index"] = n_dropped_by_index
    if args.fuzzy_index:
        # append this run's kept reps' index rows so the next batch
        # fuzzy-dedups against everything ever kept
        n_dropped_by_fuzzy = out.where(F.col("reason") == "fuzzy").count()
        kept_fuzzy_index.write.mode("append").parquet(args.fuzzy_index)
        summary["fuzzy_index"] = args.fuzzy_index
        summary["dropped_by_fuzzy"] = n_dropped_by_fuzzy
    if args.delete_from:
        from duckdb_raquet_spark import encode

        col = args.delete_col or args.id_col
        drops = out.where(~is_kept).select(
            F.col("doc_id").alias(col)
        )
        summary["deleted_from"] = args.delete_from
        if n_total - n_keep == 0:
            # nothing to drop — delete_rows rejects empty sets
            summary["delete_commit"] = None
        elif args.staged_delete:
            # write-audit-publish: park the drop list for review —
            # `table_job.py <table> audit --token T` then publish
            rec = encode.delete_rows(
                spark, args.delete_from, col, drops, staged=True
            )
            summary["staged_token"] = rec["token"]
            summary["delete_commit"] = rec["entry"]
        else:
            man = encode.delete_rows(spark, args.delete_from, col, drops)
            summary["delete_commit"] = man["delete_files"][-1]
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
