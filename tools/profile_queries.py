#!/usr/bin/env python
"""Per-query / per-phase profiling harness for the round-6 optimization
pass (guide §1: measure first; noop-sink isolation). NOT part of the
driver contract — bench.py stays the frozen measurement harness.

Usage:
    python tools/profile_queries.py [--sf-dir /root/testdata/sf1.0] \
        [--queries q1,q2,...] [--phases] [--reps 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_spark(cpus: int = 32):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("raquet-profile")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.local.dir", "/dev/shm/raquet_spark_local")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def force(df):
    """bench.py's force(): count aggregate (column-pruned plan) — the
    shape the frozen harness actually times."""
    return df.agg({"*": "count"}).first()[0]


def timed(spark, name, fn, out, reps=1):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
    print(f"  {name}: {best:.3f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--phases", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf_dir
    qs = entry.queries()
    out: dict[str, float] = {}

    if args.phases:
        # phase breakdown of the minhash family + dsir
        from pyspark.sql import functions as F
        from duckdb_raquet_spark.functions import dedup
        from duckdb_raquet_spark.functions import text as tx

        docs = entry._read(spark, sf_dir, "documents")
        spark.sparkContext.setJobDescription("phase: hashed shingles")
        hs = docs.select(
            F.col("doc_id").alias("_id"),
            dedup.hashed_shingles_col("text", 3).alias("_hs"),
        )
        timed(spark, "mh_shingles", lambda: noop(hs), out, args.reps)
        sig = hs.selectExpr("_id", *dedup.minhash_cols_from_hashed("_hs", 32))
        timed(spark, "mh_signatures", lambda: noop(sig), out, args.reps)
        pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", 0.5, k=32, bands=8)
        timed(spark, "mh_pairs_full", lambda: noop(pairs), out, args.reps)

        d = docs.select("doc_id", "text", (F.col("source") == "src0").alias("tgt"))
        t = F.filter(tx.tokens_col("text"), lambda w: w != F.lit(""))
        n = F.size(t)
        grams = F.transform(
            F.when(n >= 2, F.sequence(F.lit(1), n - 1)),
            lambda i: F.concat(
                F.element_at(t, i), F.lit(" "), F.element_at(t, i + F.lit(1))
            ),
        )
        ex = d.select("doc_id", F.explode(grams).alias("_g"))
        timed(spark, "dsir_gram_explode", lambda: noop(ex), out, args.reps)

    names = (
        args.queries.split(",")
        if args.queries
        else [
            "dedup_minhash",
            "dedup_minhash_filter",
            "dedup_minhash_incr",
            "txt_dsir",
            "txt_bigram_lm",
            "txt_tfidf",
            "txt_perplexity",
            "txt_bpe",
            "dedup_semantic",
            "sessionize",
            "corpus_pack",
            "corpus_shards",
            "corpus_shuffle",
            "domain_quota",
            "txt_decontam_fuzzy",
            "dedup_incremental",
            "dedup_spans_removed",
            "dedup_chunk_filter",
        ]
    )
    for name in names:
        spark.sparkContext.setJobDescription(f"query: {name}")
        timed(spark, name, lambda n=name: force(qs[n](spark, sf_dir)), out, args.reps)

    print(json.dumps({"sf_dir": sf_dir, "timings": out}))


if __name__ == "__main__":
    main()
