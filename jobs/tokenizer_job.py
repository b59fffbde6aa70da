#!/usr/bin/env python
"""spark-submit BPE tokenizer pipeline over a webtext parquet table.

Train a BPE merge table on the corpus (the word-frequency trick: one
corpus scan, then bounded-vocabulary merge rounds), write it as
parquet, and optionally tokenize the corpus with the learned table.
One JSON summary line on stdout.

    spark-submit --py-files dist/duckdb_raquet_spark.zip \
        jobs/tokenizer_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/bpe_out [--id-col doc_id] [--text-col text] \
        [--n-merges 64] [--min-freq 2] [--tokenize] [--in-plan]

Outputs:

* ``<output>/merges`` — the merge table parquet
  ``(rank int, left, right, merged string, freq bigint)``, learned
  order (= apply order).
* ``<output>/tokens`` (with ``--tokenize``) — ``(id, n_tokens,
  tokens array<string>)`` segmented with the learned table via the
  Arrow-batched segmenter (or the in-plan Column applier with
  ``--in-plan``; suited to small merge tables only — expression depth
  is linear in merges).

Text is normalized to the trainer's contract first (lowercase,
non-``[a-z0-9 ]`` collapsed to space — see ``tokenizer.normalize_col``).
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
    ap.add_argument("--n-merges", type=int, default=64)
    ap.add_argument("--min-freq", type=int, default=2)
    ap.add_argument(
        "--tokenize",
        action="store_true",
        help="also segment the corpus with the learned table",
    )
    ap.add_argument(
        "--in-plan",
        action="store_true",
        help="use the Column applier instead of the Arrow segmenter",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("raquet-bpe").getOrCreate()
    from duckdb_raquet_spark.functions import tokenizer as tk

    df = spark.read.parquet(args.input).select(
        F.col(args.id_col).alias("_id"),
        tk.normalize_col(args.text_col).alias("_norm"),
    )

    merges = tk.learn_bpe(
        df, "_norm", n_merges=args.n_merges, min_freq=args.min_freq
    )
    spark.createDataFrame(
        [
            (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
            for m in merges
        ],
        "rank int, left string, right string, merged string, freq long",
    ).coalesce(1).write.mode("overwrite").parquet(args.output + "/merges")

    summary = {
        "n_merges": len(merges),
        "top_merge": merges[0]["merged"] if merges else None,
        "top_freq": merges[0]["freq"] if merges else 0,
        "merges_path": args.output + "/merges",
    }

    if args.tokenize:
        seg = (
            tk.bpe_tokens_col("_norm", merges)
            if args.in_plan
            else tk.bpe_tokens_udf(merges)(F.col("_norm"))
        )
        toks = df.select(
            F.col("_id").alias("id"),
            seg.alias("tokens"),
        ).select("id", F.size("tokens").cast("long").alias("n_tokens"), "tokens")
        toks.write.mode("overwrite").parquet(args.output + "/tokens")
        agg = spark.read.parquet(args.output + "/tokens").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("total_tokens"),
        ).first()
        summary.update(
            {
                "rows": int(agg["rows"]),
                "total_tokens": int(agg["total_tokens"] or 0),
                "tokens_path": args.output + "/tokens",
            }
        )

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
