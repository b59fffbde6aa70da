"""Distributed BPE tokenizer training + application (Sennrich et al.
2016, arXiv:1508.07909) — the "train the tokenizer on the corpus you
just cleaned" step of an LLM data pipeline, as pure DataFrame plans.

The classic trick makes this scale: BPE statistics only depend on the
WORD-FREQUENCY table, not the corpus — a 100 TB crawl collapses to its
distinct-word vocabulary (Zipf: orders of magnitude smaller) in one
map-side-combining aggregate, and every merge round after that runs
over the vocabulary alone.  Each round is: count adjacent symbol
pairs (weighted by word frequency), pick the most frequent (ties:
lexicographically smallest — deterministic on any engine), merge that
pair everywhere, repeat.

Symbol sequences travel as a flat STRING with control-char framing —
``\\x1e<sym>\\x1f`` per symbol — so the merge step is a single literal
``replace``: engines scan left-to-right non-overlapping, which is
exactly BPE's greedy within-word merge order, and the framing makes
matches symbol-aligned by construction (``\\x1e`` only ever opens a
symbol, ``\\x1f`` only ever closes one; neither may appear in the
input — normalize first, see :func:`normalize_col`).  That framing is
what makes the whole trainer replayable in ANSI SQL (the DuckDB
oracle unrolls the same rounds with ``string_split`` + ``replace``),
so the correctness gate is a value-hash, not a rows-only check.

Reference parity: the reference engine has no tokenizer surface
(``/root/reference/src`` stops at scan/encode); this extends the
LLM-pipeline layer like `functions/corpus.py`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .text import spread_input, tokens_col

__all__ = [
    "SYM_OPEN",
    "SYM_CLOSE",
    "normalize_col",
    "learn_bpe",
    "bpe_tokens_col",
    "bpe_tokens_udf",
]

SYM_OPEN = "\x1e"   # opens every symbol (record separator)
SYM_CLOSE = "\x1f"  # closes every symbol (unit separator)


def normalize_col(text: Column | str) -> Column:
    """Lowercase + collapse everything outside ``[a-z0-9 ]`` to a
    space: the pre-tokenization contract that guarantees the framing
    control chars cannot appear inside a symbol."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " ")


def _encode_word(word: Column) -> Column:
    """``abc`` -> ``\\x1ea\\x1f\\x1eb\\x1f\\x1ec\\x1f`` (one framed
    symbol per character — the BPE start state)."""
    return F.regexp_replace(word, "(.)", SYM_OPEN + "$1" + SYM_CLOSE)


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    words = spread_input(df.select(F.col(text_col).alias("_txt"))).select(
        F.explode(
            F.filter(tokens_col("_txt"), lambda w: w != F.lit(""))
        ).alias("_w")
    )
    return (
        words.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_encode_word(F.col("_w")).alias("enc"), "freq")
    )


def _pairs_col(enc: Column) -> Column:
    """Adjacent framed-symbol pairs of an encoded word.  Splitting on
    ``\\x1e`` yields ``['', 'a\\x1f', 'b\\x1f', ...]`` (1-based element
    2 is the first symbol), so pair i is ``syms[i] || syms[i+1]`` for
    i in [2, n-1] — NULL (dropped by explode) below two symbols."""
    syms = F.split(enc, SYM_OPEN)
    n = F.size(syms)
    # adjacent symbol pairs via shifted-slice zip (elements 2..n-1
    # zipped with 3..n, both length n-2) — O(len) per word vs the
    # per-index element_at shape that re-runs the split per element
    return F.when(
        n >= 3,
        F.zip_with(
            F.slice(syms, 2, n - 2),
            F.slice(syms, 3, n - 2),
            lambda a, b: F.concat(a, b),
        ),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 16,
    min_freq: int = 1,
    local_words: int = 8192,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges over ``text_col`` (which must
    honor the :func:`normalize_col` contract).  Returns the merge
    table — ``[{rank, left, right, merged, freq}, ...]`` in learned
    order — stopping early when no pair reaches ``min_freq``.

    Plan at 10^12 docs: the corpus is scanned ONCE (word-frequency
    aggregate, map-side partials collapse Zipf-hot words before the
    exchange); every round after that is a bounded-vocabulary
    pair-count aggregate plus a 1-row argmax collect (``O(n_merges)``
    driver state), and the merge application is one literal
    ``replace`` projection.  The vocabulary is re-materialized per
    round (``localCheckpoint``) so the plan does not deepen with the
    number of rounds.

    Vocabularies at or under ``local_words`` distinct words (default
    8192) skip the distributed rounds entirely: the word-frequency
    table — already counted to size them — is collected once and the
    rounds replay in the driver with identical pair-count, argmax
    tie-break and non-overlapping-replace semantics (merge tables are
    equal by construction; pinned by a test). This is the broadcast-
    small-side trade (guide §3.1): n_merges round-trip jobs over a
    near-empty frame collapse into one bounded collect. Past the
    threshold the distributed rounds run exactly as before.
    """
    # lazy checkpoints: each round's replace-projection materializes
    # inside the SAME job as that round's argmax collect (eager=True
    # spent one extra full job per round just to fill the checkpoint);
    # lineage is still truncated, so plans stay shallow either way
    words = _word_freq(df, text_col).localCheckpoint(eager=False)
    # every round is a pair-count aggregate over the VOCABULARY, which
    # Zipf collapses to a sliver of the corpus; plan the rounds at a
    # vocab-derived shuffle width (ceiling = the session default, which
    # is sized for corpus scans) instead of paying n_merges rounds of
    # near-empty session-width exchanges (guide §2: derive partitioning
    # from input size). The count also materializes the checkpoint.
    spark = df.sparkSession
    n_words = words.count()
    if n_words <= int(local_words):
        wf = [(r["enc"], r["freq"]) for r in words.collect()]
        return _learn_rounds_local(wf, int(n_merges), int(min_freq))
    np_ = max(1, min(spark.sparkContext.defaultParallelism, n_words // 100_000 + 1))
    if words.rdd.getNumPartitions() > 4 * np_:
        words = words.repartition(np_).localCheckpoint(eager=False)
    conf = spark.conf
    prev_parts = conf.get("spark.sql.shuffle.partitions")
    merges: list[dict] = []
    try:
        conf.set("spark.sql.shuffle.partitions", str(np_))
        merges = _learn_rounds(words, int(n_merges), int(min_freq))
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_parts)
    return merges


def _learn_rounds_local(
    wf: list[tuple[str, int]], n_merges: int, min_freq: int
) -> list[dict]:
    """Driver-side replay of :func:`_learn_rounds` over a collected
    word-frequency table (bounded by ``learn_bpe``'s ``local_words``
    gate). Pair counting, argmax tie-break (count desc, framed pair
    asc — ASCII-range strings, so Python's ``<`` orders like Spark's)
    and the left-to-right non-overlapping ``str.replace`` all mirror
    the distributed expressions symbol for symbol."""
    merges: list[dict] = []
    for rank in range(int(n_merges)):
        cnt: dict[str, int] = {}
        for enc, freq in wf:
            syms = enc.split(SYM_OPEN)[1:]
            for i in range(len(syms) - 1):
                p = syms[i] + syms[i + 1]
                cnt[p] = cnt.get(p, 0) + freq
        if not cnt:
            break
        p, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < int(min_freq):
            break
        cut = p.index(SYM_CLOSE) + 1
        s1, s2 = p[:cut], p[cut:]
        src = SYM_OPEN + s1 + SYM_OPEN + s2
        dst = SYM_OPEN + s1[:-1] + s2
        merges.append(
            {
                "rank": rank,
                "left": s1[:-1],
                "right": s2[:-1],
                "merged": s1[:-1] + s2[:-1],
                "freq": c,
            }
        )
        wf = [(enc.replace(src, dst), freq) for enc, freq in wf]
    return merges


def _learn_rounds(words: DataFrame, n_merges: int, min_freq: int) -> list[dict]:
    merges: list[dict] = []
    for rank in range(int(n_merges)):
        top = (
            words.select(F.explode(_pairs_col(F.col("enc"))).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p").asc())
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["cnt"]) < int(min_freq):
            break
        p, cnt = top[0]["p"], int(top[0]["cnt"])
        cut = p.index(SYM_CLOSE) + 1
        s1, s2 = p[:cut], p[cut:]  # both framed: 'x\x1f', 'y\x1f'
        src = SYM_OPEN + s1 + SYM_OPEN + s2
        dst = SYM_OPEN + s1[:-1] + s2
        merges.append(
            {
                "rank": rank,
                "left": s1[:-1],
                "right": s2[:-1],
                "merged": s1[:-1] + s2[:-1],
                "freq": cnt,
            }
        )
        words = words.select(
            F.replace(F.col("enc"), F.lit(src), F.lit(dst)).alias("enc"),
            "freq",
        ).localCheckpoint(eager=False)
    return merges


def bpe_tokens_col(text: Column | str, merges: list[dict]) -> Column:
    """Tokenize ``text`` (normalize_col contract) with a learned merge
    table: per word, apply the merges in rank order (each one literal
    ``replace`` — the same greedy left-to-right semantics they were
    learned under), then unframe.  Returns ``array<string>`` of
    subword tokens, document order.  Pure Column expression, depth
    linear in ``len(merges)`` — keep merge tables that ride in-plan
    to O(100); bigger vocabularies belong in a broadcast-join
    segmenter."""
    words = F.filter(tokens_col(text), lambda w: w != F.lit(""))

    def _segment(w: Column) -> Column:
        enc = _encode_word(w)
        for m in merges:
            src = (
                SYM_OPEN + m["left"] + SYM_CLOSE + SYM_OPEN
                + m["right"] + SYM_CLOSE
            )
            dst = SYM_OPEN + m["merged"] + SYM_CLOSE
            enc = F.replace(enc, F.lit(src), F.lit(dst))
        syms = F.filter(F.split(enc, SYM_OPEN), lambda s: s != F.lit(""))
        return F.transform(
            syms, lambda s: F.substring(s, 1, F.length(s) - 1)
        )

    return F.flatten(F.transform(words, _segment))


def bpe_tokens_udf(merges: list[dict]):
    """Arrow-batched BPE segmenter for merge tables too big to ride
    in-plan (a production tokenizer's 32k-64k merges would explode
    :func:`bpe_tokens_col`'s expression tree).  The merge table
    broadcasts inside the UDF closure as a rank dict; per word the
    standard lowest-rank-first merge loop runs over a memoized word
    cache (Zipf again: a batch of web text re-tokenizes the same few
    thousand distinct words, so the per-word cost amortizes to a dict
    hit).  Same output as :func:`bpe_tokens_col` for any learned
    table — pinned by test.

    Returns a pandas_udf ``string -> array<string>``; apply as
    ``df.select(bpe_tokens_udf(merges)(F.col('text')))``.
    """
    from pyspark.sql.functions import pandas_udf

    rank_of = {
        (m["left"], m["right"]): (r, m["merged"])
        for r, m in enumerate(merges)
    }

    def _segment_word(w: str, cache: dict) -> list[str]:
        hit = cache.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                rm = rank_of.get((syms[i], syms[i + 1]))
                if rm is not None and (best is None or rm[0] < best[0]):
                    best = (rm[0], i, rm[1])
            if best is None:
                break
            _, i, merged = best
            # merge ALL occurrences of this pair left-to-right (the
            # greedy semantics the merges were learned under)
            a, b = syms[i], syms[i + 1]
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        cache[w] = syms
        return syms

    @pandas_udf("array<string>")
    def _bpe(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts.fillna(""):
            toks: list[str] = []
            for w in t.split(" "):
                if w:
                    toks.extend(_segment_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return _bpe
