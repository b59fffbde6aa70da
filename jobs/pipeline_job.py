#!/usr/bin/env python
"""spark-submit END-TO-END corpus build: the whole curation pipeline as
ONE deployable command, composed from the library's staged operators.

    raw parquet
      -> PII redaction                       (always; pure Column)
      -> Gopher quality filter               (--gopher)
      -> URL/domain blocklist                (--blocklist FILE --url-col url)
      -> benchmark decontamination           (--decontam-eval PARQUET:
                                              13-gram exact + fuzzy Jaccard)
      -> cross-run incremental exact dedup   (--digest-index DIR)
      -> within-batch exact dedup, keep-first (always)
      -> fuzzy MinHash dedup filter          (--threshold T; <0 disables)
      -> per-domain quota cap                (--domain-quota N --domain-col c)
      -> seeded-shuffle token-bounded shards (--shard-tokens N --seed S)
      -> shard verification + lineage manifest

Every stage is the library call the scored oracle queries verify;
this job is the composition proof — a training corpus from raw pages
to resumable shards in one spark-submit. Prints ONE JSON line with
per-stage row counts (the funnel) and the shard manifest summary.

    spark-submit --py-files dist/duckdb_raquet_spark.zip jobs/pipeline_job.py \
        --input /root/testdata/sf0.01/documents.parquet --output /tmp/corpus \
        --digest-index /tmp/corpus_idx --threshold 0.5 \
        --domain-quota 200 --domain-col source --shard-tokens 65536 --seed 7
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True, help="shard directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the Gopher quality rules as a filter")
    ap.add_argument("--blocklist", default=None,
                    help="text file of blocked domains (one per line)")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--decontam-eval", default=None,
                    help="parquet of eval/benchmark docs: training docs "
                    "overlapping it are DROPPED (13-gram exact overlap OR "
                    "the fuzzy Jaccard screen at --decontam-threshold)")
    ap.add_argument("--decontam-text-col", default="text")
    ap.add_argument("--decontam-ngram", type=int, default=13)
    ap.add_argument("--decontam-threshold", type=float, default=0.8)
    ap.add_argument("--digest-index", default=None,
                    help="cross-run exact-dedup digest index (parquet dir)")
    ap.add_argument("--fuzzy-index", default=None,
                    help="cross-run MinHash index (parquet dir, "
                    "build_minhash_index layout): the fuzzy stage runs "
                    "incrementally against everything ever kept and "
                    "appends this run's keepers")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="fuzzy-dedup Jaccard threshold; negative disables")
    ap.add_argument("--max-bucket", type=int, default=1000)
    ap.add_argument("--domain-quota", type=int, default=None)
    ap.add_argument("--domain-col", default="source")
    ap.add_argument("--shard-tokens", type=int, default=1 << 20)
    ap.add_argument("--seed", type=int, default=0,
                    help="shard fill order = seeded global shuffle")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("raquet-pipeline").getOrCreate()
    from duckdb_raquet_spark.functions import corpus, dedup, text as tx

    idc, txc = args.id_col, args.text_col
    df = spark.read.parquet(args.input)
    funnel: dict[str, int] = {"input": df.count()}

    # 1. PII scrub (rewrites text in place; row count unchanged)
    df = df.withColumn(txc, tx.redact_pii_col(txc))

    # 2. Gopher quality rules
    if args.gopher:
        df = df.withColumn(
            "_gp", tx.gopher_quality_columns(txc)[-1]
        ).where(F.col("_gp")).drop("_gp")
        funnel["after_gopher"] = df.count()

    # 3. domain blocklist (label-suffix semantics, broadcast join)
    if args.blocklist:
        with open(args.blocklist) as f:
            doms = [ln.strip().lower() for ln in f if ln.strip()]
        flagged = tx.url_block_filter(df, args.url_col, doms)
        df = flagged.where(~F.col("blocked")).drop("host", "blocked")
        funnel["after_blocklist"] = df.count()

    # everything above is cheap pure-Column / broadcast work that can
    # re-run per pass; everything below (the dedup chain) must run ONCE
    pre_dedup = df

    # 3b. benchmark decontamination: drop training docs that leak the
    #     eval suite, verbatim (13-gram overlap) OR lightly edited
    #     (fuzzy Jaccard screen); eval sides broadcast in both
    if args.decontam_eval:
        ev = spark.read.parquet(args.decontam_eval)
        ex = tx.ngram_decontaminate(
            df, ev, idc, txc,
            n=args.decontam_ngram, eval_text_col=args.decontam_text_col,
        )
        fz = tx.fuzzy_decontaminate(
            df, ev, idc, txc,
            threshold=args.decontam_threshold,
            eval_text_col=args.decontam_text_col,
        )
        bad = (
            ex.where(F.col("contaminated") == 1).select("id")
            .unionByName(fz.where(F.col("contaminated") == 1).select("id"))
            .distinct()
            .withColumnRenamed("id", idc)
        )
        df = df.join(bad, idc, "left_anti")
        funnel["after_decontam"] = df.count()

    # 4. cross-RUN incremental exact dedup against the persisted index
    dig = ["_len", "_md5", "_xx"]
    if args.digest_index:
        try:
            idx = spark.read.parquet(args.digest_index).select(*dig)
        except Exception as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                idx = None
            else:
                raise
        if idx is not None:
            df = dedup.incremental_exact_dedup(
                df, idx, idc, txc, base_is_digests=True
            )
            funnel["after_index_dedup"] = df.count()

    # 5. within-batch exact dedup (keep-first) — cheaper than fuzzy,
    #    so it runs first and shrinks the LSH input
    keep = dedup.exact_dedup(df, idc, txc).select(
        F.col("keep_id").alias("_kid")
    )
    df = df.join(keep, df[idc] == F.col("_kid"), "left_semi")
    funnel["after_exact_dedup"] = df.count()

    # 6. fuzzy dedup: LSH -> verify -> components -> keep-first.
    #    With --fuzzy-index the stage runs INCREMENTALLY: the batch
    #    checks band collisions against everything ever kept (the
    #    cross-run twin of stage 4's digest index) and the survivors'
    #    index rows are appended in stage 9.
    kept_fuzzy_index = None
    if args.threshold >= 0 and args.fuzzy_index:
        try:
            fidx = spark.read.parquet(args.fuzzy_index)
        except Exception as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                fidx = dedup.build_minhash_index(df.limit(0), idc, txc)
            else:
                raise
        df, kept_fuzzy_index = dedup.incremental_minhash_dedup(
            df, fidx, idc, txc, args.threshold,
            max_bucket=args.max_bucket, base_is_index=True,
            return_kept_index=True,
        )
        funnel["after_fuzzy_dedup"] = df.count()
    elif args.threshold >= 0:
        df = dedup.minhash_dedup(
            df, idc, txc, args.threshold, max_bucket=args.max_bucket
        )
        funnel["after_fuzzy_dedup"] = df.count()

    # 7. hot-domain cap
    if args.domain_quota:
        df = corpus.domain_quota(
            df, idc, args.domain_col, args.domain_quota
        )
        funnel["after_domain_quota"] = df.count()

    # 8. seeded-shuffle shard export + lineage + verification.
    #    Persist the survivor ID SET only (narrow — bytes per row, at
    #    any corpus scale) and re-derive the row set from the cheap
    #    pre-dedup frame with one semi-join: the shard writer's two
    #    passes and the digest append then re-run only Column stages,
    #    never the dedup chain (LSH, verification, components).
    ids = df.select(idc).persist()
    funnel["survivors"] = ids.count()
    try:
        out = pre_dedup.join(ids, idc, "left_semi")
        man = corpus.write_shards(
            out, args.output, idc, txc,
            shard_tokens=args.shard_tokens, seed=args.seed,
        )
        ver = corpus.verify_shards(spark, args.output)

        # 9. the survivors' digests / MinHash rows extend the cross-run
        #    indexes (survivors only: a doc dropped by the later quota
        #    stage must NOT poison future batches as "already kept")
        if args.digest_index:
            out.select(*dedup.exact_digest_cols(txc)).write.mode(
                "append"
            ).parquet(args.digest_index)
        if kept_fuzzy_index is not None:
            kept_fuzzy_index.join(
                ids.withColumnRenamed(idc, "_id"), "_id", "left_semi"
            ).write.mode("append").parquet(args.fuzzy_index)
    finally:
        ids.unpersist()

    print(json.dumps({
        "op": "corpus-pipeline",
        "funnel": funnel,
        "n_shards": man["n_shards"],
        "n_tokens": sum(s["n_tokens"] for s in man["shards"]),
        "seed": man["seed"],
        "shards_verified": ver["ok"],
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
