"""Corpus-assembly operators: the steps between "filtered documents"
and "training batches" in an LLM data pipeline.

Four operators, all pure DataFrame plans (no Python UDFs):

* :func:`pack_sequences` — concat-and-chunk training-sequence packing
  (every doc's tokens land at a global offset; sequences are ``ctx_len``
  cuts of the concatenated stream).  The global prefix sum is computed
  with a scale-correct two-pass scheme (bounded per-bucket windows plus
  a tiny driver-side bucket-offset table) instead of a single-partition
  global window.
* :func:`domain_quota` — cap documents per domain with a deterministic
  hash priority.  Hot domains (the 10^9-page host in a crawl) are
  handled with a salted two-level rank so no single window partition
  ever sees more than ``salts * quota``-ish rows — and the result is
  EXACT (identical to the naive one-window rank), not sampled.
* :func:`chunk_dedup_filter` — duplicate-passage removal accounting:
  for every fixed-token chunk occurrence, keep it iff it is the
  corpus-wide first occurrence (min (doc, position) per digest), and
  report per-document kept/dropped counts.  The application step of
  Lee et al. 2022-style chunk dedup (detection lives in
  :func:`duckdb_raquet_spark.functions.dedup.chunk_dedup`).
* :func:`mix_epochs` — weighted source mixing with fractional epochs
  (the GPT-3 / Pile recipe: curated sources repeat >1 epoch, bulk
  crawl subsamples to <1), deterministic and engine-reproducible.

Reference parity: the reference engine stops at scan/encode analytics
(``/root/reference/src``); these mirror the downstream pipeline the
north rule's Common-Crawl table feeds, per SURVEY.md's
training-data-pipeline section.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import let_col, spread_input, tokens_col

__all__ = [
    "pack_sequences",
    "domain_quota",
    "chunk_dedup_filter",
    "mix_epochs",
    "priority_sample",
    "shard_assignments",
    "verify_shards",
    "shuffle_shard_assignments",
    "write_shards",
]


def _md5_priority(col: Column) -> Column:
    """Deterministic 60-bit priority from md5 — the same cross-engine
    construction as text.hash_sample (DuckDB replays it as
    ('0x' || substr(md5(x), 1, 15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _bucketed_prefix_sum(
    toks: DataFrame, bucket_col: Column, order_cols: list[str]
) -> DataFrame:
    """Exclusive prefix sum of ``n_tokens`` over ``toks`` in
    ``order_cols`` order, without a global window: rows are grouped by
    ``bucket_col`` (which MUST be monotone non-decreasing along the
    order — a range bucketing of the leading order column), per-bucket
    totals come back as an O(n_buckets) driver offset table, and the
    window runs WITHIN each bucket only. Bit-identical to
    ``SUM() OVER (ORDER BY ...)`` (integer sums, associative
    regrouping). Returns ``toks`` + ``tok_offset``."""
    from pyspark.sql.window import Window

    bucketed = toks.withColumn("_b", bucket_col)
    agg = bucketed.groupBy("_b").agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("c")
    ).collect()
    totals = {r["_b"]: r["t"] for r in agg}
    n_rows = sum(int(r["c"]) for r in agg)
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((int(b), acc))
        acc += int(totals[b])
    spark = toks.sparkSession
    off_df = spark.createDataFrame(offsets, "_b long, _boff long")
    # the within-bucket window runs over one row per DOC (the narrow
    # token-count frame) — size its exchange from the row count rather
    # than the corpus-scan shuffle width (guide §2, scale-adaptive;
    # ceiling = session default). Repartitioning by _b satisfies the
    # window's required distribution, so no second exchange is planned.
    np_ = max(
        1,
        min(
            toks.sparkSession.sparkContext.defaultParallelism,
            n_rows // 100_000 + 1,
        ),
    )
    w = Window.partitionBy("_b").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        bucketed.repartition(np_, "_b")
        .join(F.broadcast(off_df), "_b")
        .withColumn(
            "tok_offset",
            (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("_boff")).cast(
                "long"
            ),
        )
        .drop("_b", "_boff")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ctx_len: int = 1024,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents ordered by
    ``id_col`` are conceptually concatenated into one token stream and
    cut every ``ctx_len`` tokens (GPT-style pretraining packing — no
    padding, docs span sequence boundaries).  Returns one row per doc:

    ``(id, n_tokens, tok_offset, seq_first, seq_last, n_seqs)``

    where ``tok_offset`` is the exclusive prefix sum of token counts in
    id order and ``seq_first/seq_last`` are the first/last ``ctx_len``
    sequences the doc lands in.

    Plan at 10^12 docs: a naive ``SUM() OVER (ORDER BY id)`` is a
    single-partition window — a non-starter.  Instead:

    1. bucket every doc by id range (``floor((id - min_id) / width)``,
       ``n_buckets`` buckets — width from one cheap min/max agg);
    2. per-bucket token totals (hash agg, ``n_buckets`` rows) come back
       to the driver, which computes exclusive bucket offsets — the
       only driver-side state is O(n_buckets);
    3. the offset table joins back (broadcast — it is tiny) and a
       window runs WITHIN each bucket only, so no partition ever holds
       more than ~n_docs/n_buckets rows (ids uniform; with skewed id
       ranges raise ``n_buckets``).

    The result is bit-identical to the global window (integer sums,
    associative regrouping).
    """
    # narrow projection materialized once (localCheckpoint, lazy) so
    # the (100 TB) text column is tokenized exactly once across the two
    # passes — ~16 bytes/row of block storage, vs re-reading the full
    # text per pass. localCheckpoint rather than persist(): checkpoint
    # blocks are reclaimed by the ContextCleaner as soon as the caller
    # drops the returned DataFrame, while an explicit persist() would
    # pin them in the cache manager for the whole session (nothing here
    # can unpersist after the caller's materialization).
    # no spread_input: a token-count split is light per row, so the
    # widening exchange costs more than the narrow-scan serialization
    # it fixes (clean-window A/B at sf1.0: 1.17 s vs 1.45 s with the
    # exchange); genuinely heavy per-row work (semantic_dedup's
    # centroid assignment, BPE's explode+aggregate) keeps its widening
    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    lo, hi = toks.agg(F.min("id"), F.max("id")).first()
    if lo is None:
        return toks.select(
            "id",
            "n_tokens",
            F.lit(0).cast("long").alias("tok_offset"),
            F.lit(0).cast("long").alias("seq_first"),
            F.lit(0).cast("long").alias("seq_last"),
            F.lit(0).cast("long").alias("n_seqs"),
        )
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    # pass 1 + 2 (bounded-window prefix sum): per-bucket totals -> an
    # O(n_buckets) driver offset table -> broadcast join + within-bucket
    # window only, so no partition ever holds more than ~n/n_buckets rows
    out = (
        _bucketed_prefix_sum(
            toks,
            ((F.col("id") - F.lit(int(lo))) / F.lit(width)).cast("long"),
            ["id"],
        )
        .withColumn(
            "seq_first", F.floor(F.col("tok_offset") / ctx_len).cast("long")
        )
        .withColumn(
            "seq_last",
            F.floor(
                (F.col("tok_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / ctx_len
            ).cast("long"),
        )
        .withColumn(
            "n_seqs", (F.col("seq_last") - F.col("seq_first") + 1).cast("long")
        )
    )
    return out.select(
        "id", "n_tokens", "tok_offset", "seq_first", "seq_last", "n_seqs"
    )


def domain_quota(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    quota: int,
    *,
    salts: int = 64,
) -> DataFrame:
    """Keep at most ``quota`` documents per domain, selected by a
    deterministic md5 hash priority (smallest first, id tiebreak) — the
    hot-domain cap of a crawl pipeline, reproducible across runs and
    engines.  Returns the surviving rows of ``df``.

    EXACTNESS + SKEW: the naive plan is one rank window per domain —
    the 10^9-page domain becomes one executor's partition.  Here the
    selection runs in two levels: rows first rank within
    ``(domain, priority % salts)`` — ``salts`` independent, bounded
    windows per domain — and only rows with sub-rank <= quota (at most
    ``salts * quota`` per domain, regardless of domain size) reach the
    exact second-level rank.  Any row in a domain's true top-``quota``
    is necessarily in its salt bucket's top-``quota``, so the two-level
    result equals the one-window result exactly — this is a pruning
    rewrite, not an approximation.  Domains under quota skip nothing
    and lose nothing (their ranks are all <= quota).
    """
    from pyspark.sql.window import Window

    pri = _md5_priority(F.col(id_col))
    salted = df.withColumn("_pri", pri).withColumn(
        "_salt", (F.pmod(F.col("_pri"), F.lit(salts))).cast("int")
    )
    w1 = Window.partitionBy(domain_col, "_salt").orderBy("_pri", id_col)
    cand = salted.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= quota
    )
    w2 = Window.partitionBy(domain_col).orderBy("_pri", id_col)
    kept = cand.withColumn("_r2", F.row_number().over(w2)).where(
        F.col("_r2") <= quota
    )
    return kept.drop("_pri", "_salt", "_r1", "_r2")


def chunk_dedup_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 20,
) -> DataFrame:
    """Duplicate-passage removal accounting: split every doc into
    consecutive ``chunk_tokens``-token passages (same windows as
    ``dedup.chunk_dedup``), and for each passage occurrence keep it iff
    it is the corpus-wide FIRST occurrence of its digest (min
    ``(doc, position)``).  Returns one row per document:

    ``(id, n_chunks, n_kept, n_dropped)``

    Plan at 10^12 docs: the explode emits one 32-hex digest per
    passage (never text); the keeper per digest is a hash aggregate
    (``min(struct(id, pos))`` — structs compare lexicographically, and
    struct min is still a map-side-partial aggregate, so a boilerplate
    passage shared by 10^8 docs costs one combiner row per partition,
    not a 10^8-row window); the join back is digest-keyed.  The struct
    min replaces an earlier ``id * 2^20 + pos`` bit-pack whose overflow
    (ids >= 2^43 or docs over ~20M tokens) silently corrupted
    first-occurrence selection.
    """
    toks = tokens_col(F.col("_txt"))
    n_chunks = F.floor(F.size(toks) / chunk_tokens).cast("int")
    # let-bound token array: per-chunk slices read it O(1) instead of
    # re-running the split per chunk (text.let_col rationale)
    digests = let_col(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(0), F.floor(F.size(t) / chunk_tokens).cast("int") - 1
            ),
            lambda i: F.md5(
                F.array_join(
                    F.slice(t, i * chunk_tokens + 1, chunk_tokens), " "
                ).cast("binary")
            ),
        ),
    )
    # guard: sequence(0, -1) is DESCENDING in Spark, so n_chunks == 0
    # must yield NULL (explode drops it), not a bogus [0, -1] pair
    occ = (
        spread_input(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        )
        .select(
            "id",
            F.when(n_chunks > 0, digests).alias("_d"),
        )
        .select(
            "id", F.posexplode("_d").alias("pos", "chunk_md5")
        )
        .withColumn(
            "_occ", F.struct(F.col("id").cast("long").alias("id"), F.col("pos"))
        )
    )
    keepers = occ.groupBy("chunk_md5").agg(F.min("_occ").alias("_keep"))
    marked = occ.join(keepers, "chunk_md5").withColumn(
        "_kept", (F.col("_occ") == F.col("_keep")).cast("int")
    )
    per_doc = marked.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("_kept").cast("long").alias("n_kept"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (
                F.coalesce("n_chunks", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).cast("long").alias("n_dropped"),
        )
    )


def mix_epochs(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Weighted source mixing with fractional epochs — the GPT-3 /
    Pile training-mix recipe (Brown et al. 2020 table 2.2: curated
    sources repeat for >1 epoch while bulk crawl subsamples to <1).
    Every document is emitted ``floor(w)`` times, plus one more iff
    its deterministic md5 priority lands under ``frac(w)`` — a source
    weighted 2.4 contributes every doc twice and a reproducible 40%
    slice a third time, so expected tokens-per-source match the mix
    exactly while membership stays a pure function of
    ``(id, weights)``: the SAME rows on any engine or re-run (md5 is
    the cross-engine-stable hash, the :func:`text.hash_sample`
    convention — this op is its upsampling twin).

    Pure Column plan: one scan, a bounded ``sequence`` explode
    (``ceil(w)`` copies, a per-source constant), no shuffle, no
    Python.  Returns the input rows with an added 0-based ``epoch``
    column; downstream packing keys on ``(id, epoch)``.
    """
    w = F.lit(float(default_weight))
    for value, f in sorted(weights.items()):
        w = F.when(F.col(source_col) == value, F.lit(float(f))).otherwise(w)
    whole = F.floor(w).cast("int")
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    extra = (bucket.cast("double") / F.lit(float(1 << 60))) < (w - F.floor(w))
    n_copies = (whole + extra.cast("int")).alias("_n_copies")
    return (
        df.withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def shard_assignments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_tokens: int = 1 << 20,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Doc-granular training-shard assignment: documents ordered by
    ``id_col`` fill shards of ~``shard_tokens`` tokens; a document
    belongs to the shard its FIRST token lands in (docs never split —
    the reader-friendly convention for resumable data loaders), so a
    shard holds at most ``shard_tokens`` + one doc-overhang tokens.

    The assignment is a pure function of the token-count prefix sum —
    ``shard = floor(tok_offset / shard_tokens)`` — computed with
    :func:`pack_sequences`'s two-pass scheme (bounded per-bucket
    windows + an O(n_buckets) driver offset table), so it is exact,
    deterministic, engine-reproducible, and never materializes a
    global window.  Returns ``(id, n_tokens, tok_offset, shard)``.
    """
    packed = pack_sequences(
        df, id_col, text_col, ctx_len=int(shard_tokens), n_buckets=n_buckets
    )
    return packed.select(
        "id",
        "n_tokens",
        "tok_offset",
        F.col("seq_first").alias("shard"),
    )


def _shard_stats(spark, path: str, id_col: str) -> DataFrame:
    """Per-shard lineage aggregate over an exported shard directory —
    the ONE definition of what a shard manifest records, used by both
    the author (:func:`write_shards`) and the consumer check
    (:func:`verify_shards`) so they can never drift apart."""
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def verify_shards(spark, path: str) -> dict:
    """Consumer-side shard verification: recompute every shard's
    (n_docs, n_tokens, id range) from the Parquet data with one
    aggregate and diff it against ``_shards_manifest.json`` — the
    check a training job runs before resuming from shard K (the
    shard-level twin of the encoder's lineage validation). Token
    counts come from the persisted ``n_tokens`` column, so
    verification never re-tokenizes text.

    Returns ``{"ok": bool, "n_shards": int, "mismatches": [...]}``
    where each mismatch names the shard and the (manifest, actual)
    pair that disagrees — empty when the export is intact.
    """
    import json

    from .. import fsio

    man = json.loads(fsio.read_bytes(spark, path, "_shards_manifest.json"))
    id_col = man["id_col"]
    if man["n_shards"] == 0:
        # zero-shard export (empty corpus after dedup): nothing to read
        return {"ok": True, "n_shards": 0, "mismatches": []}
    actual = {
        int(r["shard"]): (
            int(r["n_docs"]), int(r["n_tokens"]),
            int(r["min_id"]), int(r["max_id"]),
        )
        for r in _shard_stats(spark, path, id_col).collect()
    }
    mismatches: list[dict] = []
    seen = set()
    for s in man["shards"]:
        k = int(s["shard"])
        seen.add(k)
        want = (
            int(s["n_docs"]), int(s["n_tokens"]),
            int(s["min_id"]), int(s["max_id"]),
        )
        got = actual.get(k)
        if got != want:
            mismatches.append({"shard": k, "manifest": want, "actual": got})
    for k in sorted(set(actual) - seen):
        mismatches.append(
            {"shard": k, "manifest": None, "actual": actual[k]}
        )
    return {
        "ok": not mismatches,
        "n_shards": man["n_shards"],
        "mismatches": mismatches,
    }


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_bits_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    selection step of importance-resampling pipelines (DSIR's "R":
    score, then sample by weight; Xie et al. 2023), as priority
    sampling (Duffield, Lund & Thorup 2007): doc i gets priority
    ``w_i / u_i`` and the k highest-priority docs are the sample.

    Weights are powers of two, ``w_i = 2^bits_i`` with ``bits_i`` an
    integer column (the repo's whole-bit LLR/rarity scores plug in
    directly), and ``u_i`` is the md5-uniform of ``"<seed>:<id>"`` on
    [0, 2^60) — so the priority ORDER is realized integer-exactly as
    the k SMALLEST values of ``h_i >> (bits_i - min_bits)`` (common
    weight scaling cancels in the order; the shift is capped at 59, a
    2^59 dynamic range, beyond which heavier docs tie at key 0 and the
    id breaks ties deterministically). No floats anywhere, so the
    sample is reproducible across runs AND engines (DuckDB: ``h >>
    least(bits - mn, 59)``).

    Plan at 10^12 docs: one narrow (id, bits) projection
    (localCheckpoint — scanned by the 1-row min aggregate and the
    top-k), a pure-Column key, and a distributed
    ``TakeOrderedAndProject`` top-k — never a global sort; the k
    winners semi-join back to the full rows.

    Returns the k sampled rows of ``df`` (all original columns).
    """
    nw = df.select(
        F.col(id_col).alias("_pid"),
        F.col(weight_bits_col).cast("long").alias("_pw"),
    ).localCheckpoint(eager=False)
    row = nw.agg(F.min("_pw").alias("mn")).first()
    if row is None or row["mn"] is None:
        return df.limit(0)
    mn = int(row["mn"])
    h = _md5_priority(
        F.concat(F.lit(f"{int(seed)}:"), F.col("_pid").cast("string"))
    )
    keyed = (
        nw.withColumn("_h", h)
        .withColumn(
            "_s",
            F.least(F.col("_pw") - F.lit(mn), F.lit(59)).cast("int"),
        )
        .withColumn("_key", F.expr("shiftright(_h, _s)"))
    )
    top = keyed.orderBy("_key", "_pid").limit(int(k)).select("_pid")
    return df.join(top, df[id_col] == F.col("_pid"), "left_semi")


def shuffle_shard_assignments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: int = 0,
    shard_tokens: int = 1 << 20,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic GLOBAL corpus shuffle + shard assignment — the
    step a pretraining pipeline runs after cleaning/dedup so a data
    loader reading shards in order sees a decorrelated stream (no
    million-page domain run, no crawl-time ordering; Brown 2020 /
    RefinedWeb both shuffle at the document level before sharding).

    The shuffled order is ``(shuf_key, id)`` where ``shuf_key`` is the
    60-bit md5 priority of ``"<seed>:<id>"`` — a pure function of
    (seed, id), so the permutation is reproducible across runs AND
    across engines (DuckDB replays it as
    ``('0x' || substr(md5(seed || ':' || id), 1, 15))::BIGINT``), and
    changing ``seed`` yields an independent epoch permutation.

    Shards then fill in shuffled order: ``shard = floor(exclusive
    token prefix sum / shard_tokens)``, docs never split. Because
    ``shuf_key`` is uniform on [0, 2^60) BY CONSTRUCTION, bucketing
    its value range gives balanced buckets regardless of id skew — no
    min/max pre-pass needed — and the prefix sum uses the same
    bounded-window two-pass scheme as :func:`pack_sequences` (never a
    single-partition global window).

    Returns ``(id, shuf_key, n_tokens, tok_offset, shard)``.
    """
    pri = _md5_priority(
        F.concat(F.lit(f"{int(seed)}:"), F.col("id").cast("string"))
    )
    # no spread_input (pack_sequences rationale): md5-of-short-string
    # plus a token count is light per row — the widening exchange costs
    # more than it parallelizes (measured 1.11 s vs 1.25 s at sf1.0)
    toks = df.select(
        F.col(id_col).alias("id"),
        pri.alias("shuf_key"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    width = ((1 << 60) + n_buckets - 1) // n_buckets
    out = _bucketed_prefix_sum(
        toks,
        (F.col("shuf_key") / F.lit(width)).cast("long"),
        ["shuf_key", "id"],
    )
    return out.select(
        "id",
        "shuf_key",
        "n_tokens",
        "tok_offset",
        F.floor(F.col("tok_offset") / F.lit(int(shard_tokens)))
        .cast("long")
        .alias("shard"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    shard_tokens: int = 1 << 20,
    *,
    n_buckets: int = 1024,
    cols: list[str] | None = None,
    seed: int | None = None,
) -> dict:
    """Export a cleaned corpus as size-bounded training shards: one
    Parquet partition directory per shard (``shard=K/``) plus a
    ``_shards_manifest.json`` sidecar recording per-shard lineage
    (docs, tokens, id range) and the assignment parameters — the
    shard-level twin of the encoder's per-chunk lineage manifests
    (SURVEY.md: checkpoint-resumable encoding), letting a training job
    consume / resume / verify shard-by-shard without listing data
    files.

    ``seed`` switches the fill order from id order to the seeded
    deterministic GLOBAL shuffle (:func:`shuffle_shard_assignments`) —
    the usual export for training, where shard K must be a random
    sample of the corpus, not a crawl-order run; the manifest records
    the seed so the permutation is reproducible.

    Plan: one :func:`shard_assignments` pass (the text column is
    tokenized exactly once, inside ``pack_sequences``'s checkpointed
    narrow projection), an id-keyed join back to the carried columns,
    a ``partitionBy(shard)`` write, and one O(n_shards) aggregate for
    the manifest.  No collect of data rows; driver state is bounded by
    the shard count.

    Returns the manifest dict (also written next to the data).
    """
    import json

    spark = df.sparkSession
    asg = (
        shard_assignments(
            df, id_col, text_col, shard_tokens, n_buckets=n_buckets
        )
        if seed is None
        else shuffle_shard_assignments(
            df, id_col, text_col, seed, shard_tokens, n_buckets=n_buckets
        )
    )
    keep = [
        c for c in (cols if cols is not None else df.columns) if c != id_col
    ]
    clash = {"n_tokens", "shard", "_shard_id"} & set(keep)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} collide with shard-output names; "
            "rename them or pass cols= without them"
        )
    # join on a reserved temp key so a carried column literally named
    # "id" (distinct from id_col) cannot collide with asg's key
    src = df.select(F.col(id_col).alias("_shard_id"), *[F.col(c) for c in keep])
    rows = asg.join(src, asg["id"] == src["_shard_id"]).select(
        asg["id"].alias(id_col),
        *[src[c] for c in keep],
        asg["n_tokens"],
        asg["shard"],
    )
    rows.write.mode("overwrite").partitionBy("shard").parquet(path)
    try:
        stats = _shard_stats(spark, path, id_col).orderBy("shard").collect()
    except Exception as e:
        # an EMPTY corpus (every doc deduped away by the cross-run
        # indexes) writes no part files, and parquet cannot infer a
        # schema from _SUCCESS alone — that is a valid zero-shard
        # export, not an error
        if "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        stats = []
    manifest = {
        "format": "raquet-shards/1",
        "shard_tokens": int(shard_tokens),
        "seed": seed,
        "id_col": id_col,
        "columns": keep,
        "n_shards": len(stats),
        "shards": [
            {
                "shard": int(r["shard"]),
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"]),
                "min_id": int(r["min_id"]),
                "max_id": int(r["max_id"]),
            }
            for r in stats
        ],
    }
    from .. import fsio

    fsio.write_bytes(
        spark, path, "_shards_manifest.json", json.dumps(manifest).encode()
    )
    return manifest
