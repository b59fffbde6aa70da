"""Incremental MinHash/LSH dedup against a persisted index — the fuzzy
twin of incremental_exact_dedup (O(batch + collisions) per ingest,
kept text never re-read or re-tokenized)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_raquet_spark.functions import dedup

pytestmark = pytest.mark.spark


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _text(seed: int, n: int = 30, mutate: int | None = None) -> str:
    import random

    toks = random.Random(seed).choices(WORDS, k=n)
    if mutate is not None:
        toks[mutate] = "MUT"
    return " ".join(toks)


def test_base_duplicate_dropped_fresh_kept(spark):
    base = _df(spark, [(0, _text(1)), (2, _text(2))])
    delta = _df(
        spark,
        [
            (11, _text(1)),            # exact dup of base doc 0
            (13, _text(1, mutate=0)),  # near-dup of base doc 0
            (15, _text(9)),            # fresh
        ],
    )
    kept = dedup.incremental_minhash_dedup(
        delta, base, "doc_id", "text", 0.5, k=32, bands=8
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [15]


def test_keep_first_within_batch(spark):
    base = _df(spark, [(0, _text(5))])
    delta = _df(
        spark,
        [(21, _text(3)), (23, _text(3)), (25, _text(3, mutate=1))],
    )
    kept = dedup.incremental_minhash_dedup(
        delta, base, "doc_id", "text", 0.5, k=32, bands=8
    )
    # base-free near-dup cluster: smallest delta id survives
    assert sorted(r["doc_id"] for r in kept.collect()) == [21]


def test_transitive_reach_to_base_drops_whole_chain(spark):
    # d1 ~ base, d2 ~ d1 (but d2 !~ base directly at the threshold):
    # the component reaches base, so BOTH delta docs drop
    base = _df(spark, [(0, _text(4))])
    delta = _df(
        spark,
        [(31, _text(4, mutate=2)), (33, _text(4, mutate=2) + " tail")],
    )
    kept = dedup.incremental_minhash_dedup(
        delta, base, "doc_id", "text", 0.5, k=32, bands=8
    )
    assert kept.count() == 0


def test_replayed_batch_reads_as_duplicates(spark):
    """Crash-replay: the delta's ids ALREADY exist in the index (same
    batch re-ingested). Side membership is structural, so every doc
    must read as a duplicate of the kept corpus — not self-match to a
    silent keep."""
    batch = _df(spark, [(1, _text(1)), (2, _text(2)), (3, _text(3))])
    idx = dedup.build_minhash_index(batch, "doc_id", "text", k=32, bands=8)
    kept = dedup.incremental_minhash_dedup(
        batch, idx, "doc_id", "text", 0.5, k=32, bands=8, base_is_index=True
    )
    assert kept.count() == 0


def test_matches_pure_python_replay_on_real_corpus(spark):
    """Brute-force replay of the exact semantics on real data: all-pairs
    shingle Jaccard in Python -> delta-involving edge graph -> a delta
    doc survives iff its component reaches no base doc and it is the
    smallest delta id in the component."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 300)
    )
    base = docs.where(F.col("doc_id") % 2 == 0)
    delta = docs.where(F.col("doc_id") % 2 == 1)
    kept = dedup.incremental_minhash_dedup(
        delta, base, "doc_id", "text", 0.5, k=32, bands=8
    )
    got = sorted(r["doc_id"] for r in kept.collect())

    rows = docs.collect()
    def sh(t):
        w = t.split(" ")
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    shs = {r["doc_id"]: sh(r["text"]) for r in rows}
    ids = sorted(shs)
    adj = {i: set() for i in ids}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if a % 2 == 0 and b % 2 == 0:
                continue  # base x base edges never materialize
            inter = len(shs[a] & shs[b])
            union = len(shs[a] | shs[b])
            if union and inter / union >= 0.5:
                adj[a].add(b)
                adj[b].add(a)
    seen, want = set(), []
    for start in ids:
        if start in seen or not adj[start]:
            continue
        comp, stack = set(), [start]
        while stack:
            v = stack.pop()
            if v in comp:
                continue
            comp.add(v)
            stack.extend(adj[v] - comp)
        seen |= comp
        deltas = sorted(x for x in comp if x % 2 == 1)
        if deltas and not any(x % 2 == 0 for x in comp):
            want.append(deltas[0])  # base-free: keep-first
    isolated = [
        i for i in ids if i % 2 == 1 and not adj[i]
    ]
    want = sorted(want + isolated)
    assert got == want


def test_index_roundtrip_and_append(spark, tmp_path):
    p = str(tmp_path / "fidx")
    b1 = _df(spark, [(1, _text(1)), (2, _text(2))])
    dedup.build_minhash_index(b1, "doc_id", "text", k=32, bands=8).write.parquet(p)
    delta = _df(spark, [(10, _text(1)), (11, _text(7))])
    idx = spark.read.parquet(p)
    kept, kept_idx = dedup.incremental_minhash_dedup(
        delta, idx, "doc_id", "text", 0.5,
        k=32, bands=8, base_is_index=True, return_kept_index=True,
    )
    assert [r["doc_id"] for r in kept.collect()] == [11]
    assert [r["_id"] for r in kept_idx.collect()] == [11]
    kept_idx.write.mode("append").parquet(p)
    # next ingest of the same fresh doc is now a duplicate
    kept2 = dedup.incremental_minhash_dedup(
        _df(spark, [(20, _text(7))]), spark.read.parquet(p),
        "doc_id", "text", 0.5, k=32, bands=8, base_is_index=True,
    )
    assert kept2.count() == 0


def test_capped_equals_uncapped_on_real_corpus(spark):
    """Buckets below the default cap: the capped plan must reproduce
    the exact all-pairs decisions bit-for-bit."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    base = docs.where(F.col("doc_id") % 2 == 0)
    delta = docs.where(F.col("doc_id") % 2 == 1)
    capped = dedup.incremental_minhash_dedup(
        delta, base, "doc_id", "text", 0.5, k=32, bands=8, max_bucket=1000
    )
    exact = dedup.incremental_minhash_dedup(
        delta, base, "doc_id", "text", 0.5, k=32, bands=8, max_bucket=None
    )
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in exact.collect()
    )


def test_tiny_cap_chains_oversized_batch_cluster(spark):
    """A batch cluster far above the cap: consecutive-id chaining must
    still connect it transitively — one keeper survives, and a base
    match anywhere in the chain drops the whole cluster."""
    dup = _text(3)
    base = _df(spark, [(0, _text(8))])
    delta = _df(spark, [(100 + i, dup) for i in range(8)])
    kept = dedup.incremental_minhash_dedup(
        delta, base, "doc_id", "text", 0.5, k=32, bands=8, max_bucket=2
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [100]
    # now the same oversized cluster duplicates a BASE doc: the capped
    # delta x index probe plus the chain must drop every member
    base2 = _df(spark, [(0, dup)])
    kept2 = dedup.incremental_minhash_dedup(
        delta, base2, "doc_id", "text", 0.5, k=32, bands=8, max_bucket=2
    )
    assert kept2.count() == 0


def test_zero_shard_export_after_total_dedup(spark, tmp_path):
    """A batch fully absorbed by the cross-run indexes is a VALID
    zero-shard export: write_shards must produce an n_shards=0 manifest
    (not crash on the part-file-less parquet dir) and verify_shards
    must pass it."""
    from duckdb_raquet_spark.functions import corpus

    p = str(tmp_path / "shards")
    empty = _df(spark, []).where(F.lit(False))
    man = corpus.write_shards(empty, p, "doc_id", "text", shard_tokens=64)
    assert man["n_shards"] == 0 and man["shards"] == []
    assert corpus.verify_shards(spark, p) == {
        "ok": True, "n_shards": 0, "mismatches": [],
    }
