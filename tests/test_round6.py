"""Round-6 optimization tests: the driver-local short-circuits of the
two driver-orchestrated loops (connected components, BPE rounds) must
produce outputs identical to the distributed paths they replace."""

import random

from duckdb_raquet_spark.functions import dedup


def _labels(df):
    return sorted((r["id"], r["comp"]) for r in df.collect())


def test_components_local_equals_distributed(spark):
    """Same random graph through the union-find short-circuit (default
    gate) and the distributed loop (gate forced off): identical
    (id, comp) sets — chains, cliques, isolated pairs, singleton-free."""
    rng = random.Random(13)
    pairs = [(rng.randint(0, 400), rng.randint(0, 400)) for _ in range(600)]
    pairs += [(i, i + 1) for i in range(500, 560)]  # a 60-link chain
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "a long, b long")
    local = dedup.connected_components(df, "a", "b")
    dist = dedup.connected_components(df, "a", "b", local_edges=0)
    got_local, got_dist = _labels(local), _labels(dist)
    assert got_local == got_dist
    # and both satisfy the contract: comp = min id of the component
    comp_min = {}
    for i, c in got_local:
        comp_min.setdefault(c, set()).add(i)
    for c, members in comp_min.items():
        assert c == min(members)


def test_components_local_empty_edges(spark):
    df = spark.createDataFrame([], "a long, b long")
    out = dedup.connected_components(df, "a", "b")
    assert out.columns == ["id", "comp"]
    assert out.count() == 0


def test_learn_bpe_local_equals_distributed(spark):
    """Merge tables from the driver-local rounds (default gate) and the
    distributed rounds (gate forced off) match merge for merge —
    including the overlapping-run case where greedy replace order
    matters and a tie round."""
    from duckdb_raquet_spark.functions import tokenizer as tk

    rng = random.Random(11)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 5)))
             for _ in range(30)]
    texts = [" ".join(rng.choice(words) for _ in range(10)) for _ in range(20)]
    texts.append("aaa aa aaaa")  # overlapping pairs within a word
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    key = lambda m: (m["rank"], m["left"], m["right"], m["merged"], m["freq"])  # noqa: E731
    local = [key(m) for m in tk.learn_bpe(df, "text", n_merges=8)]
    dist = [key(m) for m in tk.learn_bpe(df, "text", n_merges=8, local_words=0)]
    assert local == dist and len(local) == 8
