"""Round-3 additions: cosine_pairs hot-group cap, datasource
append-refusal + missing-block-column pruning, minhash uncapped default."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_raquet_spark.datasource import RaquetDataSource
from duckdb_raquet_spark.functions import dedup

pytestmark = pytest.mark.spark


def _vec(rng, base=None, jitter=0.0):
    v = base if base is not None else rng.normal(size=8)
    v = v + rng.normal(scale=jitter, size=8) if jitter else v
    return [float(x) for x in v]


def test_cosine_pairs_hot_group_chains(spark):
    """An all-one-group fixture must not go quadratic: with max_group
    below the group size the emitted pair count is linear, and the
    near-identical cluster stays transitively connected."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    rows = [(i, "g", _vec(rng, base, jitter=0.01)) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    pairs = dedup.cosine_pairs(
        df, "vec_id", "embedding", "label", 0.9, max_group=40
    ).collect()
    # linear, not quadratic: 100 near-identical vectors -> ~99 chained
    # pairs, far below all-pairs' 4950
    assert 0 < len(pairs) < 300
    parent = {i: i for i in range(100)}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for r in pairs:
        parent[find(int(r["a"]))] = find(int(r["b"]))
    assert len({find(i) for i in range(100)}) == 1


def test_cosine_pairs_uncapped_matches_small_groups(spark):
    """With groups under the cap, capped and uncapped plans agree."""
    rng = np.random.default_rng(11)
    rows = []
    for g in ("a", "b"):
        base = rng.normal(size=8)
        for i in range(5):
            rows.append((len(rows), g, _vec(rng, base, jitter=0.01)))
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    uncapped = {
        (r["a"], r["b"], round(r["cos"], 9))
        for r in dedup.cosine_pairs(df, "vec_id", "embedding", "label", 0.9).collect()
    }
    capped = {
        (r["a"], r["b"], round(r["cos"], 9))
        for r in dedup.cosine_pairs(
            df, "vec_id", "embedding", "label", 0.9, max_group=100
        ).collect()
    }
    assert uncapped == capped and len(uncapped) > 0


def test_minhash_uncapped_default_full_recall(spark):
    """Default (max_bucket=None) emits ALL verified pairs of an
    oversized bucket — pair-level recall is only traded away opt-in."""
    boiler = "cookie notice please accept our terms and conditions today"
    rows = [(i, boiler) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text", 0.8, k=16, bands=4).collect()
    assert len(pairs) == 30 * 29 // 2


def test_datasource_append_mode_refused(spark, tmp_path):
    spark.dataSource.register(RaquetDataSource)
    df = spark.createDataFrame(
        [("http://a/1", "hello world", "en")], "url string, text string, lang string"
    )
    out = str(tmp_path / "tbl")
    df.write.format("raquet").mode("overwrite").option("resolution", 4).save(out)
    with pytest.raises(Exception, match="overwrite"):
        df.write.format("raquet").mode("append").option("resolution", 4).save(out)
