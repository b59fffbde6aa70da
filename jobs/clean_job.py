#!/usr/bin/env python
"""spark-submit corpus-prep pipeline over a webtext parquet table.

End-to-end text cleaning, the stage a pretraining pipeline runs between
crawl ingest and dedup: (optional) HTML text extraction -> C4-style
line/page cleaning -> Gopher document-quality rules -> PII redaction ->
quality/token metrics. One JSON summary line on stdout; one output
parquet with every input row labeled (dropped pages keep their counts,
so filter-rate monitoring is one aggregate over the output).

    spark-submit --py-files dist/duckdb_raquet_spark.zip jobs/clean_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/clean_out [--id-col doc_id] [--text-col text] \
        [--html-col html] [--min-words 3] [--min-lines 3] [--langid]

With --html-col, the text is first extracted from the raw HTML binary
(byte-level </html> truncation, head/script/style removal, entity
unescape) and the cleaning runs on the extraction. Every stage is pure
Column expressions (one projection chain, no shuffle until the summary
aggregate); --langid adds the Arrow-vectorized language-id pass.

Output columns: (id, clean_text, n_kept, n_dropped, page_kept,
gopher_pass, n_tokens, quality[, lang]) — clean_text is PII-redacted.

Note: C4's line rules assume line-structured prose (crawl-extracted
text ends lines with terminal punctuation); the sandbox fixtures are
single-line unpunctuated word soup, so they clean to zero kept lines —
rule-correct, not a pipeline failure.
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
    ap.add_argument(
        "--html-col",
        default=None,
        help="extract text from this raw HTML binary column first",
    )
    ap.add_argument("--min-words", type=int, default=3)
    ap.add_argument("--min-lines", type=int, default=3)
    ap.add_argument(
        "--langid",
        action="store_true",
        help="add the Arrow-vectorized language-id column",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("raquet-clean").getOrCreate()
    from duckdb_raquet_spark.functions import text as tx

    df = spark.read.parquet(args.input)
    if args.html_col:
        src = df.select(
            F.col(args.id_col).alias("_id"),
            tx.html_text_col(args.html_col).alias("_text"),
        )
    else:
        src = df.select(
            F.col(args.id_col).alias("_id"),
            F.col(args.text_col).alias("_text"),
        )

    cleaned = tx.c4_clean(
        src,
        "_id",
        "_text",
        min_words=args.min_words,
        min_lines=args.min_lines,
    )
    out = cleaned.select(
        "id",
        tx.redact_pii_col("clean_text").alias("clean_text"),
        "n_kept",
        "n_dropped",
        "page_kept",
        tx.gopher_quality_columns("clean_text")[-1].alias("gopher_pass"),
        *tx.quality_columns("clean_text")[:1],  # n_tokens
        tx.quality_columns("clean_text")[-1].alias("quality"),
    )
    if args.langid:
        out = out.withColumn("lang", tx.langid_udf()(F.col("clean_text")))

    out.write.mode("overwrite").parquet(args.output)

    res = spark.read.parquet(args.output)
    agg = res.agg(
        F.count("*").alias("rows"),
        F.sum("page_kept").alias("pages_kept"),
        F.sum("n_kept").alias("lines_kept"),
        F.sum("n_dropped").alias("lines_dropped"),
        F.sum(F.col("gopher_pass").cast("int")).alias("gopher_pass"),
    ).first()
    print(
        json.dumps(
            {
                "rows": int(agg["rows"]),
                "pages_kept": int(agg["pages_kept"] or 0),
                "lines_kept": int(agg["lines_kept"] or 0),
                "lines_dropped": int(agg["lines_dropped"] or 0),
                "gopher_pass": int(agg["gopher_pass"] or 0),
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
