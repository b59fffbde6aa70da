#!/usr/bin/env python
"""spark-submit shard-export CLI: cleaned corpus -> size-bounded
training shards.

The last stage of the pipeline: after clean_job / dedup_job /
tokenizer_job have produced the corpus a model should train on, this
exports it as one Parquet partition directory per ~--shard-tokens
tokens (documents never split) plus a `_shards_manifest.json` lineage
sidecar (per-shard docs / tokens / id range, the shard-level twin of
the encoder's per-chunk lineage), so a training job can consume,
resume and verify shard-by-shard. `--seed` fills shards in the seeded
deterministic GLOBAL shuffle order (md5 priority of "<seed>:<id>" —
reproducible across runs and engines) instead of id order; re-running
with a new seed exports an independent epoch permutation.

    spark-submit --py-files dist/duckdb_raquet_spark.zip jobs/shard_job.py \
        --input /path/corpus.parquet --output /path/shards \
        --shard-tokens 1048576 [--seed 7] [--id-col doc_id] \
        [--text-col text] [--cols text,lang]

Prints ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet corpus")
    ap.add_argument("--output", required=True, help="shard directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--shard-tokens", type=int, default=1 << 20)
    ap.add_argument("--seed", type=int, default=None,
                    help="shuffled fill order (omit for id order)")
    ap.add_argument("--n-buckets", type=int, default=1024)
    ap.add_argument("--cols", default=None,
                    help="comma list of columns to carry (default: all)")
    ap.add_argument("--verify", action="store_true",
                    help="re-read the export and diff it vs the manifest")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("raquet-shards").getOrCreate()
    from duckdb_raquet_spark.functions import corpus

    df = spark.read.parquet(args.input)
    man = corpus.write_shards(
        df,
        args.output,
        args.id_col,
        args.text_col,
        shard_tokens=args.shard_tokens,
        n_buckets=args.n_buckets,
        cols=args.cols.split(",") if args.cols else None,
        seed=args.seed,
    )
    out = {
        "op": "shard-export",
        "output": args.output,
        "n_shards": man["n_shards"],
        "n_docs": sum(s["n_docs"] for s in man["shards"]),
        "n_tokens": sum(s["n_tokens"] for s in man["shards"]),
        "shard_tokens": man["shard_tokens"],
        "seed": man["seed"],
    }
    if args.verify:
        res = corpus.verify_shards(spark, args.output)
        out["verified"] = res["ok"]
        out["mismatches"] = res["mismatches"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
