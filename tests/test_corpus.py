"""Corpus-assembly operators: sequence packing, domain quotas,
duplicate-passage filtering (functions/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_raquet_spark.functions import corpus


# ------------------------------------------------------ pack_sequences ----


def test_pack_sequences_matches_global_cumsum(spark):
    """Two-pass bucketed prefix sum == the naive global window, with
    non-dense ids and enough buckets that several are non-empty."""
    rows = [(i * 7 + 3, "w " * (i % 5 + 1)) for i in range(200)]  # 1..5 tokens
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: (r["tok_offset"], r["seq_first"], r["seq_last"], r["n_seqs"])
        for r in corpus.pack_sequences(df, "id", "text", ctx_len=7, n_buckets=13).collect()
    }
    # oracle: python cumsum in id order (split(' ') counts the trailing
    # empty token, matching tokens_col/string_split semantics)
    acc = 0
    for i in range(200):
        rid = i * 7 + 3
        n = len(("w " * (i % 5 + 1)).split(" "))
        first, last = acc // 7, (acc + n - 1) // 7
        assert out[rid] == (acc, first, last, last - first + 1), rid
        acc += n


def test_pack_sequences_single_and_empty(spark):
    df = spark.createDataFrame([(5, "a b c")], "id long, text string")
    r = corpus.pack_sequences(df, "id", "text", ctx_len=2).collect()[0]
    assert (r["tok_offset"], r["seq_first"], r["seq_last"], r["n_seqs"]) == (
        0,
        0,
        1,
        2,
    )
    empty = spark.createDataFrame([], "id long, text string")
    assert corpus.pack_sequences(empty, "id", "text").count() == 0


def test_pack_sequences_doc_spanning_boundary(spark):
    """A 10-token doc starting at offset 5 with ctx 8 spans seqs 0-1."""
    df = spark.createDataFrame(
        [(1, " ".join(["x"] * 5)), (2, " ".join(["y"] * 10))],
        "id long, text string",
    )
    out = {r["id"]: r for r in corpus.pack_sequences(df, "id", "text", ctx_len=8).collect()}
    assert out[2]["tok_offset"] == 5
    assert (out[2]["seq_first"], out[2]["seq_last"], out[2]["n_seqs"]) == (0, 1, 2)


# -------------------------------------------------------- domain_quota ----


def _naive_quota(df, quota):
    from pyspark.sql.window import Window

    pri = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("dom").orderBy(pri, "id")
    return df.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= quota).drop("_r")


@pytest.mark.parametrize("quota,salts", [(5, 4), (25, 3), (300, 8)])
def test_domain_quota_exact_vs_naive(spark, quota, salts):
    """The salted two-level rank is a pruning rewrite: identical rows to
    the one-window rank for under-, over- and exactly-at-quota domains."""
    rows = [(i, "hot") for i in range(250)] + [(1000 + i, f"d{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "id long, dom string")
    got = {
        (r["id"], r["dom"])
        for r in corpus.domain_quota(df, "id", "dom", quota, salts=salts).collect()
    }
    want = {(r["id"], r["dom"]) for r in _naive_quota(df, quota).collect()}
    assert got == want
    # every domain capped at quota
    from collections import Counter

    per = Counter(d for _, d in got)
    assert all(v <= quota for v in per.values())
    assert per["hot"] == min(quota, 250)


def test_domain_quota_deterministic(spark):
    rows = [(i, "a") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, dom string")
    a = sorted(r["id"] for r in corpus.domain_quota(df, "id", "dom", 10).collect())
    b = sorted(r["id"] for r in corpus.domain_quota(df.repartition(7), "id", "dom", 10).collect())
    assert a == b and len(a) == 10


# --------------------------------------------------- chunk_dedup_filter ----


def test_chunk_dedup_filter_keep_first(spark):
    """Duplicated 4-token passages: only the corpus-wide first
    occurrence (min (doc, pos)) of each digest is kept."""
    p1 = "a b c d"
    p2 = "e f g h"
    rows = [
        (1, f"{p1} {p2}"),        # both first occurrences -> kept 2/2
        (2, f"{p2} {p1}"),        # both dups             -> kept 0/2
        (3, f"{p1} z z z z q r"), # p1 dup, new passage kept -> 1/2 (+1 short tail ignored)
        (4, "x"),                 # 0 chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: (r["n_chunks"], r["n_kept"], r["n_dropped"])
        for r in corpus.chunk_dedup_filter(df, "doc_id", "text", chunk_tokens=4).collect()
    }
    assert out[1] == (2, 2, 0)
    assert out[2] == (2, 0, 2)
    assert out[3] == (2, 1, 1)
    assert out[4] == (0, 0, 0)


def test_chunk_dedup_filter_within_doc_dup(spark):
    """A passage repeated INSIDE one doc: first position kept only."""
    df = spark.createDataFrame(
        [(9, "a b a b a b")], "doc_id long, text string"
    )
    r = corpus.chunk_dedup_filter(df, "doc_id", "text", chunk_tokens=2).collect()[0]
    assert (r["n_chunks"], r["n_kept"], r["n_dropped"]) == (3, 1, 2)
