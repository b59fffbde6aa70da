"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 10^12 documents: every operator is a shuffle-bounded
DataFrame plan —
  * exact dedup        : one hash aggregate on the text (or its digest);
  * MinHash LSH        : signatures are pure Column expressions
                         (xxhash64 inside array transforms, JVM-side),
                         candidates come from an equi-join on (band id,
                         band hash) buckets, never an all-pairs product;
  * SimHash            : explode -> JVM hash -> bit-majority aggregate,
                         banded equi-join for Hamming candidates;
  * embedding near-dup : bucketed (group key) exact cosine join.
Exact verification always follows candidate generation, so results are
exact subject to LSH recall (tunable via bands x rows).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import let_col, sliding_ngrams_col, spread_input, tokens_col

# deterministic MinHash permutation parameters (public xxhash-based
# affine family; seeds fixed so signatures are reproducible). The
# 31-bit Mersenne prime keeps every a*h+b product under 2^62, so the
# expressions are safe under Spark's ANSI overflow checking.
_MERSENNE = (1 << 31) - 1


def _perm_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE - 1, k, dtype=np.int64)
    b = rng.integers(0, _MERSENNE - 1, k, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


# ---------------------------------------------------------------- shingles ----


def shingles_col(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), single-space tokenization.
    Shifted-slice zip construction (text.sliding_ngrams_col): O(n·len)
    per row vs the transform(sequence)+slice shape whose lambda
    re-evaluates the tokenize split per window (O(len²))."""
    toks = tokens_col(text)
    size = F.size(toks)
    return F.when(size >= n, F.array_distinct(sliding_ngrams_col(toks, n))).otherwise(
        F.array_distinct(F.array(F.concat_ws(" ", toks)))
    )


def jaccard_col(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two (distinct) shingle arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


# ------------------------------------------------------------------- exact ----


def exact_digest_cols(text_col: Column | str) -> list[Column]:
    """THE document-identity digest: ``(length, md5, xxhash64)`` as
    three JVM Column expressions. Single definition shared by the
    batch sweep (:func:`exact_dedup`) and the streaming filter
    (``streaming.dedup_exact_stream``) so both sides agree on identity
    bit-for-bit by construction, not by parallel copies."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.length(c).alias("_len"),
        F.md5(c.cast("binary")).alias("_md5"),
        F.xxhash64(c).alias("_xx"),
    ]


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the smallest id per identical text — one hash aggregate on a
    192-bit composite digest ``(length, md5, xxhash64)``, all JVM-side.

    Grouping on the digest instead of the text column means the exchange
    carries ~45-byte rows, not document bodies (at 100 TB, grouping on
    ``text`` shuffles the whole corpus); map-side partial aggregation
    collapses duplicates before a byte moves. The composite is exact for
    any non-adversarial corpus (independent-hash collision P ~ 2^-128 at
    10^12 docs), and an adversarially md5-colliding pair still differs
    in xxhash64. Returns (keep_id, n_copies) — the dedup decision list."""
    d = df.select(F.col(id_col).alias("_id"), *exact_digest_cols(text_col))
    return (
        d.groupBy("_len", "_md5", "_xx")
        .agg(F.min("_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


# ----------------------------------------------------------- n-gram jaccard ----


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    threshold: float,
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs within a blocking group (e.g. the
    same source/domain). The blocking join bounds the pair explosion; the
    group key shuffles once. Returns (a, b, jac)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        shingles_col(text_col, n).alias("_sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = a.join(b, (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
    jac = jaccard_col(F.col("a._sh"), F.col("b._sh"))
    return (
        pairs.select(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            jac.alias("jac"),
        )
        .where(F.col("jac") >= threshold)
    )


# ---------------------------------------------------------------- minhash ----


def hashed_shingles_col(text: Column | str, n: int = 3) -> Column:
    """Distinct shingles -> 64-bit xxhash64 values (JVM, no Python).

    Full 64 bits so hashed-set Jaccard is collision-free in practice
    (P ~ n^2/2^64 per doc) and equals raw-shingle Jaccard; the MinHash
    permutations fold each value to 31 bits internally, so signatures
    are unchanged versus hashing to 31 bits up front."""
    sh = shingles_col(text, n)
    return F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))


def minhash_cols_from_hashed(hashed: str, k: int = 32) -> list[str]:
    """k MinHash SQL snippets (``... AS mh_i``, for ``selectExpr``) from
    an ALREADY MATERIALIZED hashed-shingle array column named ``hashed``.

    Keeping the hashed array a real column matters: embedding the
    shingle pipeline inside each of the k signature expressions makes
    Catalyst evaluate tokenize+slice+hash k times per row (k=32 -> 32x
    the scan cost). One projection computes the array; these k exprs
    are then cheap per-element arithmetic + array_min.

    SQL snippets rather than Column objects, deliberately: building the
    k=32 lambda expressions through the DataFrame API costs ~350 py4j
    round-trips (~0.5 s of query construction per call site — measured,
    and the frozen bench pays it cold every run); one ``selectExpr``
    parses the same expressions JVM-side in a single call. The parsed
    plan is identical: `h` binds as the lambda variable, the `L`
    suffixes pin the same BIGINT literals F.lit produced.

    Elements fold to 31 bits first: keeps a*h+b under 2^62
    (ANSI-overflow safe) and bit-identical to the previous
    hash-to-31-bits-up-front signatures."""
    out = []
    for i, (pa, pb) in enumerate(_perm_params(k)):
        out.append(
            f"array_min(transform(`{hashed}`, h -> "
            f"pmod(pmod(h, {_MERSENNE}L) * {pa}L + {pb}L, {_MERSENNE}L)))"
            f" AS mh_{i}"
        )
    return out


_HOT_BUCKET = 64  # bucket size above which all-pairs generation is salted


def _self_pairs_skew_safe(
    rows: DataFrame,
    key_cols: list[str],
    *,
    id_col: str = "_id",
    salts: int | None = None,
) -> DataFrame:
    """All ``(a, b)`` pairs with ``a < b`` within each key group — the
    EXACT pair multiset of the plain self-equi-join, made straggler-safe
    (guide §2.5 skew). A group of B rows emits B(B-1)/2 pairs, and the
    naive self-join computes every one of them inside the single task
    that owns the group's key — one boilerplate bucket (mirrored pages,
    a mass-duplicated page family) serializes the whole stage, the one
    quadratic hazard of LSH banding. AQE's skew-join splitting cannot
    see it: the INPUT rows of a hot bucket are a few KB (far below
    ``skewedPartitionThresholdInBytes``); it is the join's OUTPUT that
    explodes.

    Groups are sized with one window pass (checkpointed — it is also
    the single materialization of whatever pipeline feeds ``rows``);
    groups <= ``_HOT_BUCKET`` keep the plain join, larger ones join a
    salted left side against an S-way replicated right side: every
    (a, b) pair still meets exactly once — at b's replica matching a's
    salt — so the pair set is unchanged; only task placement changes.
    S derives from the session's parallelism (scale-adaptive, not a
    local-mode constant); replication touches only hot-bucket rows."""
    from pyspark.sql import Window

    s = int(salts) if salts else max(
        2, rows.sparkSession.sparkContext.defaultParallelism
    )
    w = Window.partitionBy(*key_cols)
    sized = rows.select(
        id_col, *key_cols, F.count(F.lit(1)).over(w).alias("_n")
    ).localCheckpoint(eager=False)
    eq = None
    for kc in key_cols:
        c = F.col(f"x.{kc}") == F.col(f"y.{kc}")
        eq = c if eq is None else (eq & c)
    lt = F.col(f"x.{id_col}") < F.col(f"y.{id_col}")
    small = sized.where(F.col("_n") <= _HOT_BUCKET)
    pairs_small = (
        small.alias("x")
        .join(small.alias("y"), eq & lt)
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
    )
    big = sized.where(F.col("_n") > _HOT_BUCKET)
    bx = big.withColumn("_s", F.pmod(F.xxhash64(id_col), F.lit(s)))
    by = big.withColumn(
        "_s",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(s - 1).cast("long"))
        ),
    )
    pairs_big = (
        bx.alias("x")
        .join(by.alias("y"), eq & (F.col("x._s") == F.col("y._s")) & lt)
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
    )
    return pairs_small.unionByName(pairs_big)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    *,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket: int | None = None,
    persist_shingles: bool = True,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-verified.

    signatures (Column exprs) -> band hashes -> explode to (band, hash)
    -> self-equi-join on the bucket (the only shuffle that matters; no
    all-pairs product) -> distinct candidate pairs -> exact hashed-set
    Jaccard verification of the CANDIDATES ONLY. bands x rows = k;
    recall ~ 1-(1-t^rows)^bands.

    Tokenize once: the 64-bit hashed-shingle arrays computed for the
    signatures are persisted (MEMORY_AND_DISK, ~8 bytes/shingle vs the
    raw text) and reused for verification as hashed-set Jaccard, which
    equals raw-shingle Jaccard up to 64-bit collisions (P ~ n^2/2^64
    per doc) — so candidate documents are never re-tokenized.

    Hot-bucket cap (opt-in): a bucket of near-identical boilerplate
    (cookie banners, mirrored pages) would otherwise produce |bucket|^2
    candidates — the one quadratic hazard in the plan. With
    ``max_bucket=N``, buckets larger than N switch from all-pairs to
    consecutive-id chaining (n-1 candidate pairs connecting the same
    near-dup cluster transitively); verification stays exact, so for
    dedup-by-connected-components the result is identical, while
    pathological buckets stay linear. The default is None (no cap, full
    pair-level recall) because chaining silently drops non-consecutive
    PAIRS in oversized buckets — pair-level consumers must opt in."""
    from pyspark.sql import Window

    rows = k // bands
    hs = spread_input(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    ).select("_id", hashed_shingles_col("_txt", n).alias("_hs"))
    if persist_shingles:
        # materialization barrier, reused below for verification.
        # localCheckpoint (the pack_sequences convention), NOT persist():
        # persist() pins blocks in the session CacheManager until an
        # explicit unpersist()/clearCache(), so repeated pair sweeps in a
        # long-lived session would accumulate shingle caches; checkpoint
        # blocks are reclaimed by the ContextCleaner once the plan is
        # unreferenced
        hs = hs.localCheckpoint(eager=False)
    sig = hs.selectExpr("_id", *minhash_cols_from_hashed("_hs", k))
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("_id", *band_cols)
    buckets = banded.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("h"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "bk.band", "bk.h")
    if max_bucket is None:
        cand = _self_pairs_skew_safe(buckets, ["band", "h"]).distinct()
    else:
        # one exchange on (band, h) computes both the bucket size and the
        # next-id chain; the split below reuses it. Checkpoint barrier:
        # small feeds both self-join sides and pairs_big a third read —
        # without it each re-runs the signature pipeline over the corpus
        w = Window.partitionBy("band", "h")
        wo = w.orderBy("_id")
        sized = buckets.select(
            "_id",
            "band",
            "h",
            F.count("*").over(w).alias("_n"),
            F.lead("_id").over(wo).alias("_next"),
        ).localCheckpoint(eager=False)
        small = sized.where(F.col("_n") <= max_bucket)
        pairs_small = (
            small.alias("x")
            .join(
                small.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.h") == F.col("y.h"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        )
        pairs_big = (
            sized.where((F.col("_n") > max_bucket) & F.col("_next").isNotNull())
            .select(F.col("_id").alias("a"), F.col("_next").alias("b"))
        )
        cand = pairs_small.unionByName(pairs_big).distinct()
    # candidate-pair barrier: the frame is read three times below (both
    # arms of the ids union and the verification spine) — without it
    # the bucket join + distinct run three times (measured as duplicate
    # 128/256-task stages)
    cand = cand.localCheckpoint(eager=False)
    # verify only the candidate ids against the PERSISTED hashed-shingle
    # arrays: the semi-join (AQE-broadcast for realistic candidate
    # counts) prunes before the join, so non-candidate documents neither
    # re-tokenize nor shuffle
    ids = (
        cand.select(F.col("a").alias("_id"))
        .unionByName(cand.select(F.col("b").alias("_id")))
        .distinct()
    )
    sh_cand = hs.join(ids, "_id", "left_semi")
    verified = (
        cand.join(
            sh_cand.withColumnRenamed("_id", "a").withColumnRenamed("_hs", "_sha"), "a"
        )
        .join(
            sh_cand.withColumnRenamed("_id", "b").withColumnRenamed("_hs", "_shb"), "b"
        )
        .select(
            "a",
            "b",
            jaccard_col(F.col("_sha"), F.col("_shb")).alias("jac"),
        )
        .where(F.col("jac") >= threshold)
    )
    return verified.select("a", "b", "jac")


def chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 20,
    min_copies: int = 2,
) -> DataFrame:
    """Chunk-level exact duplication: split each document into
    consecutive non-overlapping ``chunk_tokens``-token passages, digest
    each, report digests appearing >= ``min_copies`` times corpus-wide —
    the chunk-granular approximation of exact-substring training-data
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"; the suffix-array pass is replaced by fixed windows
    so the whole op is two Column projections + one hash aggregate).

    Plan at 10^12 docs: explode emits ~n_tokens/chunk_tokens rows per
    doc carrying a 32-hex digest (never the passage text), partial
    aggregation collapses repeats map-side. Returns
    (chunk_md5, keep_id, n_copies)."""
    toks = tokens_col(F.col("_txt"))
    n_chunks = F.floor(F.size(toks) / chunk_tokens).cast("int")
    # let-bound token array: the per-chunk slices read it O(1) instead
    # of re-running the split per chunk (text.let_col rationale)
    chunks = let_col(
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
    pairs = spread_input(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    ).select(
        "_id",
        F.explode(F.when(n_chunks > 0, chunks)).alias("chunk_md5"),
    )
    return (
        pairs.groupBy("chunk_md5")
        .agg(F.min("_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") >= min_copies)
    )


def _graph_partitions(df: DataFrame, n_edges: int) -> int:
    """Scale-adaptive partition count for the component loop's tiny
    iterative frames (guide §2: derive partitioning from input size,
    not a constant tuned to either local mode or the cluster). The
    session default (``spark.sql.shuffle.partitions``) is sized for the
    corpus-wide scans; the label/edge frames are a few bytes per
    near-dup PAIR — orders of magnitude smaller — and every round runs
    several exchanges over them, so at the default width the loop's
    wall is pure task-launch overhead (measured: 45 stages × 64-256
    tasks for a 5k-edge graph, ~8 s of almost-no-work stages at sf1.0).
    ~100k edge rows per partition keeps partitions real; the session
    default stays the ceiling so a 10^12-edge graph still uses the
    full cluster."""
    default = df.sparkSession.sparkContext.defaultParallelism
    return max(1, min(default, n_edges // 100_000 + 1))


def _components_local(spark, edge_rows, id_type) -> DataFrame:
    """Driver-side union-find over a collected (symmetrized) edge list:
    (id, comp) with comp = the smallest id in the component — the same
    assignment the distributed loop converges to, computed exactly.
    Bounded by ``connected_components``' ``local_edges`` gate."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(v):
        r = v
        while parent[r] != r:
            r = parent[r]
        while parent[v] != r:  # path compression
            parent[v], v = r, parent[v]
        return r

    for row in edge_rows:
        x, y = row[0], row[1]
        if x not in parent:
            parent[x] = x
        if y not in parent:
            parent[y] = y
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry
    roots: dict = {}
    for v in parent:
        r = find(v)
        m = roots.get(r)
        # min id per component; Python's < on longs/strings orders the
        # same way Spark's F.min does on the matching column type
        if m is None or v < m:
            roots[r] = v
    data = [(v, roots[find(v)]) for v in parent]
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("comp", id_type)]
    )
    return spark.createDataFrame(data, schema)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    *,
    max_iter: int = 25,
    local_edges: int = 500_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs -> (id, comp) with
    comp = the smallest id in the component: the dedup GROUP assignment
    that turns any pair op (minhash/simhash/cosine) into a keep/drop
    decision ("keep comp, drop the rest").

    Min-label propagation WITH pointer jumping: every node starts as
    its own label; each round (1) pushes the smaller label across
    every edge (join + hash aggregate) and (2) shortcuts each label to
    its label's label (``comp <- comp(comp)``, one self-join) — the
    label-doubling step that makes a length-L chain converge in
    O(log L) rounds instead of O(L). This matters because the
    hot-bucket caps upstream (``minhash_lsh_pairs``'s ``max_bucket``,
    ``cosine_pairs``'s ``max_group``) deliberately emit successor
    CHAINS for oversized buckets, whose diameter equals the bucket
    size — plain propagation would deterministically exhaust
    ``max_iter`` on any verified near-dup cluster longer than ~25
    links, exactly the boilerplate-cluster case the caps target. With
    jumping, ``max_iter=25`` covers chains up to ~2^25 links. The loop
    is driver-ORCHESTRATED but every round is a distributed plan;
    ``localCheckpoint`` truncates lineage so round N's plan does not
    replay rounds 1..N-1. Raises after ``max_iter`` rounds rather
    than silently returning unconverged labels.

    Graphs at or under ``local_edges`` edge rows (after symmetrizing;
    default 500k, ~tens of MB collected) skip the loop entirely: the
    edge set — already materialized and counted to size the loop — is
    collected once and labeled by driver-side union-find, the same
    small-side-to-driver trade as a broadcast join (guide §3.1). The
    label assignment (comp = smallest id reachable) is a property of
    the graph, not the algorithm, so the output is identical; what
    changes is 3-6 rounds of several near-empty exchanges each
    collapsing into one collect. Near-dup edge sets are bytes per
    VERIFIED pair, so even large corpora often fit; past the threshold
    the distributed loop runs exactly as before."""
    spark = pairs.sparkSession
    e = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    edges = e.unionByName(
        e.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).distinct()
    edges = edges.persist()
    # materialize the edge set ONCE at the session's corpus-sized width
    # (the distinct over the input pairs is the only corpus-scale step
    # here); the count both fills the persist and sizes the loop
    n_edges = edges.count()
    if n_edges <= int(local_edges):
        rows = edges.collect()
        edges.unpersist()
        return _components_local(spark, rows, edges.schema["x"].dataType)
    np_ = _graph_partitions(edges, n_edges)
    # the loop's frames are tiny (bytes per near-dup pair), but every
    # round plans 3-4 exchanges; at the session-default shuffle width
    # those are launch-overhead stages (64-256 near-empty tasks each).
    # Plan the loop's ACTIONS at the edge-derived width instead —
    # scale-adaptive, ceiling = the session default, restored after.
    conf = spark.conf
    prev_parts = conf.get("spark.sql.shuffle.partitions")
    # lazy checkpoints throughout the loop: each round's plan is
    # truncated either way, but eager=True would spend one extra full
    # job per round just to fill the checkpoint — the convergence
    # aggregate below materializes it inside the job it already runs
    try:
        conf.set("spark.sql.shuffle.partitions", str(np_))
        labels = (
            edges.select(F.col("x").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("comp"))
            .localCheckpoint(eager=False)
        )
        for _ in range(max_iter):
            # smallest neighbor label per node: every node appears as a
            # ``y`` (edges are symmetric), so the inner join covers all
            prop = (
                edges.join(labels, edges.x == labels.id)
                .groupBy(F.col("y").alias("id"))
                .agg(F.min("comp").alias("_pc"))
            )
            merged = labels.join(prop, "id").select(
                "id",
                F.col("comp").alias("_old"),
                F.least("comp", "_pc").alias("_m"),
            )
            # pointer jump: comp <- comp(comp). Labels are node ids and
            # only ever decrease, so comp(comp) <= comp and the left
            # join always finds a row (every label is a labeled node).
            hop = merged.select(
                F.col("id").alias("_cid"), F.col("_m").alias("_cc")
            )
            new_labels = (
                merged.join(hop, merged._m == hop._cid, "left")
                .select(
                    "id", "_old", F.coalesce("_cc", "_m").alias("comp")
                )
                .localCheckpoint(eager=False)
            )
            # ONE action per round: the convergence aggregate runs over
            # the frame that still carries the previous label, so it
            # both fills the checkpoint and answers "done?" — the old
            # shape ran a second join-and-count job per round
            changed = new_labels.agg(
                F.sum((F.col("comp") != F.col("_old")).cast("long"))
            ).first()[0]
            labels = new_labels.select("id", "comp")
            if not changed:
                edges.unpersist()
                return labels
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_parts)
    edges.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


# ----------------------------------------------------------------- simhash ----


def _token_hash_col(tok: Column, hasher: str) -> Column:
    """Per-token 64-bit (or 60-bit) hash, JVM-side.

    ``xxh64`` is the default (cheapest). ``md5_60`` takes the top 60
    bits of md5 as an integer — marginally more expensive but computable
    bit-identically in any ANSI engine (DuckDB, Trino), which makes the
    whole SimHash pipeline cross-engine verifiable; SimHash quality is
    indifferent to which uniform hash feeds it."""
    if hasher == "xxh64":
        return F.xxhash64(tok)
    if hasher == "md5_60":
        return F.conv(F.substring(F.md5(F.encode(tok, "UTF-8")), 1, 15), 16, 10).cast(
            "long"
        )
    raise ValueError(f"unknown hasher {hasher!r}")


def simhash64(
    df: DataFrame, id_col: str, text_col: str, *, hasher: str = "xxh64"
) -> DataFrame:
    """64-bit SimHash per document: explode tokens, hash JVM-side, take
    the per-bit majority — all shuffles are one groupBy on the id.
    With ``hasher='md5_60'`` bits 60-63 are constant-zero votes (every
    token votes -1), so the effective signature is 60 bits."""
    toks = spread_input(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    ).select(
        "_id",
        F.explode(F.array_distinct(tokens_col("_txt"))).alias("tok"),
    ).withColumn("h", _token_hash_col(F.col("tok"), hasher))
    bit_sums = toks.groupBy("_id").agg(
        *[
            F.sum(
                (F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s{i}")
            for i in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"s{i}") > 0, F.lit(1).cast("long")).otherwise(0)
            * F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        )
    return bit_sums.select(F.col("_id").alias(id_col), sim.alias("simhash"))


def hamming_band_pairs(
    sig: DataFrame, id_col: str, sig_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs of 64-bit signatures with Hamming distance <= max_hamming,
    via 4x16-bit banding (pigeonhole: <=3 differing bits leave >=1 band
    intact, so recall is GUARANTEED, not probabilistic) then exact
    popcount verification of the candidates only. Shared kernel of
    :func:`simhash_pairs` (text) and ``multimodal.phash_pairs``
    (images). Returns (a, b, hamming)."""
    if max_hamming > 3:
        # 4 bands only guarantee recall up to 3 differing bits; a larger
        # radius needs more bands — failing loudly beats silent recall loss
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-band pigeonhole "
            "guarantee (<= 3); use more bands"
        )
    # Materialization barrier before the self-join: the broadcast build
    # side is its own evaluation of the plan, so without it the
    # signature computation runs TWICE — for the media callers
    # (phash/audio/video pairs) that is the full mapInPandas decode of
    # every payload, the most expensive stage there is. localCheckpoint
    # (the pack_sequences convention) lets the ContextCleaner reclaim
    # the blocks once the pair frame is dropped; signatures are ~16
    # bytes/row, so the checkpoint is always tiny next to the inputs.
    sig = sig.localCheckpoint(eager=False)
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(sig_col, b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("h"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("_id", "bk.band", "bk.h")
    # skew-safe all-pairs within each 16-bit band bucket (a family of
    # identical signatures — N copies of one image — would otherwise
    # serialize in the single task owning that bucket), then re-attach
    # the two signatures from the checkpointed sig frame by id
    cand = _self_pairs_skew_safe(bands, ["band", "h"]).distinct()
    sa = sig.select(F.col(id_col).alias("a"), F.col(sig_col).alias("sa"))
    sb = sig.select(F.col(id_col).alias("b"), F.col(sig_col).alias("sb"))
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    *,
    hasher: str = "xxh64",
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming via 4x16-bit
    banding (pigeonhole: <=3 differing bits leave >=1 band intact), then
    exact popcount verification."""
    sig = simhash64(df, id_col, text_col, hasher=hasher)
    return hamming_band_pairs(sig, id_col, "simhash", max_hamming)


# ------------------------------------------------------------ embedding dup ----


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_col: str,
    threshold: float,
    *,
    max_group: int | None = 1000,
    salt_buckets: int = 1,
) -> DataFrame:
    """Embedding near-duplicate pairs within a blocking group, exact
    double-precision cosine (zip_with + aggregate, JVM expressions).

    Hot-group cap (ON by default — ``max_group=1000``): the
    within-group all-pairs join is quadratic in the largest blocking
    group, which at corpus scale is dominated by one skewed key (e.g.
    ``lang='en'``) — a scale-killer if left naive. Groups larger than
    ``max_group`` switch from all-pairs to consecutive-id chaining —
    each member compares only to its successor in the group, keeping
    the pathological group LINEAR while still connecting a near-dup
    cluster transitively for connected-component consumers. Pair-level
    consumers that truly need every pair of an oversized group must
    opt OUT explicitly with ``max_group=None`` (accepting the O(n²)
    cost); the naive call is the safe one."""
    from pyspark.sql import Window

    from .similarity import cosine_col

    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    if max_group is None:
        if salt_buckets > 1:
            # low-cardinality blocking key (e.g. 8 quantizer clusters on
            # 32+ cores): the plain group equi-join hashes to at most
            # |groups| reduce tasks and the quadratic verify runs nearly
            # serial. Salt one side by id hash, replicate the other
            # across all salts (guide §2.5): every (a, b) pair still
            # meets exactly once — at b's replica matching a's salt — so
            # the pair set is identical, but the work spreads over
            # |groups| × salt_buckets keys.
            sa = v.withColumn(
                "_s", F.pmod(F.xxhash64("_id"), F.lit(int(salt_buckets)))
            )
            sb = v.withColumn(
                "_s",
                F.explode(F.sequence(F.lit(0), F.lit(int(salt_buckets) - 1))),
            )
            pairs = (
                sa.alias("a")
                .join(
                    sb.alias("b"),
                    (F.col("a._g") == F.col("b._g"))
                    & (F.col("a._s") == F.col("b._s"))
                    & (F.col("a._id") < F.col("b._id")),
                )
                .select(
                    F.col("a._id").alias("a"),
                    F.col("b._id").alias("b"),
                    cosine_col(F.col("a._v"), F.col("b._v")).alias("cos"),
                )
            )
            return pairs.where(F.col("cos") >= threshold)
        pairs = (
            v.alias("a")
            .join(
                v.alias("b"),
                (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")),
            )
            .select(
                F.col("a._id").alias("a"),
                F.col("b._id").alias("b"),
                cosine_col(F.col("a._v"), F.col("b._v")).alias("cos"),
            )
        )
        return pairs.where(F.col("cos") >= threshold)
    # one exchange on _g computes both the group size and the next-id
    # chain; small groups keep the exact all-pairs join
    w = Window.partitionBy("_g")
    wo = w.orderBy("_id")
    sized = v.select(
        "_id",
        "_g",
        "_v",
        F.count("*").over(w).alias("_n"),
        F.lead("_id").over(wo).alias("_next"),
        F.lead("_v").over(wo).alias("_nextv"),
    )
    # referenced three times below (small x2 via the self-join's
    # broadcast build side, pairs_big once) — without a barrier each
    # reference re-runs the window shuffle+sort over the full vector
    # column; the checkpoint runs it once (hamming_band_pairs rationale)
    sized = sized.localCheckpoint(eager=False)
    small = sized.where(F.col("_n") <= max_group)
    pairs_small = (
        small.alias("a")
        .join(
            small.alias("b"),
            (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            cosine_col(F.col("a._v"), F.col("b._v")).alias("cos"),
        )
    )
    # chained pairs carry the successor's vector through the window, so
    # no second join is needed for the hot group
    pairs_big = sized.where(
        (F.col("_n") > max_group) & F.col("_next").isNotNull()
    ).select(
        F.col("_id").alias("a"),
        F.col("_next").alias("b"),
        cosine_col(F.col("_v"), F.col("_nextv")).alias("cos"),
    )
    return pairs_small.unionByName(pairs_big).where(F.col("cos") >= threshold)


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_centroids: int = 8,
    threshold: float = 0.95,
    centroids: list[tuple[int, list[float]]] | None = None,
    seed: int = 42,
    max_group: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = cluster the embedding space with a trained coarse
    quantizer, then exact cosine near-duplicate detection ONLY within
    each cluster — the cluster is the blocking key, so the quadratic
    all-pairs term is bounded per cluster instead of per corpus (the
    paper's point: semantically unrelated regions never compare).

    Keep rule (deterministic, SQL-replayable like the rest of this
    module): within a cluster, a row is dropped iff some SMALLER id in
    the same cluster matches it at >= ``threshold`` — the repo's
    keep-first convention (chunk_dedup_filter, exact_dedup).

    ``centroids`` accepts a pre-trained quantizer (e.g. the persisted
    IVF index's — then an independent SQL engine can replay cluster
    assignment from the SAME centroids); otherwise deterministic
    sampled spherical k-means trains one (seed pinned).

    100 TB posture: training samples a bounded set driver-side;
    assignment is one pure-Column pass (no shuffle) materialized ONCE
    (localCheckpoint — the self-join and the keep join would otherwise
    re-scan the corpus and re-run the k-centroid assignment three
    times). ``max_group`` defaults to ``None`` (exact all-pairs within
    every cluster) because the keep flag is a ONE-SHOT decision: under
    a cap, an oversized cluster degrades to consecutive-id chaining,
    which only finds duplicates whose chain-adjacent neighbor clears
    the threshold — fine for the transitive connected-component
    consumers ``cosine_pairs`` defaults for, wrong for keep-first.
    Pass a cap only to accept that documented recall loss on clusters
    larger than the cap; the scale-correct way to bound the quadratic
    term is more centroids (smaller clusters), which is the SemDeDup
    paper's own knob.

    Returns every input row as ``(id_col, cluster_id, keep)``.
    """
    from . import similarity as sim

    if centroids is None:
        centroids = sim.ivf_kmeans_centroids(
            df, id_col, vec_col, n_centroids, seed=seed
        )
    # widen FIRST, assign after: the n_centroids-cosine assignment is
    # the heavy per-row expression here, and computing it inside
    # spread_input's input would run it on the scan's 1-2 splits
    # BEFORE the widening exchange (measured: the whole assignment ran
    # on 2 cores)
    assigned = spread_input(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    ).select(
        "_id",
        "_v",
        sim.ivf_assign_col(F.col("_v"), centroids).alias("cluster_id"),
    ).localCheckpoint(eager=False)
    # salt the within-cluster join when the quantizer has fewer clusters
    # than the session has cores — otherwise the quadratic verify hashes
    # to |clusters| reduce tasks and runs nearly serial (guide §2.5)
    par = df.sparkSession.sparkContext.defaultParallelism
    n_clusters = max(1, len(centroids))
    salt = max(1, (2 * par + n_clusters - 1) // n_clusters) if max_group is None else 1
    pairs = cosine_pairs(
        assigned, "_id", "_v", "cluster_id", threshold,
        max_group=max_group, salt_buckets=salt,
    )
    drops = pairs.select(F.col("b").alias("_id")).distinct().withColumn(
        "_dup", F.lit(True)
    )
    return assigned.join(drops, on="_id", how="left").select(
        F.col("_id").alias(id_col),
        "cluster_id",
        F.col("_dup").isNull().alias("keep"),
    )


# -------------------------------------------------------------- line dedup ----


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated-LINE removal (RefinedWeb's "line-wise
    corrections", Penedo et al. 2023 arXiv:2306.01116 — the pass that
    strips navigation bars, cookie banners and share buttons, i.e.
    boilerplate that document-level exact/fuzzy dedup cannot touch
    because the surrounding page always differs): any exact line whose
    total occurrence count across the corpus reaches ``min_count`` is
    removed from EVERY document.

    Plan shape (the 100 TB story):

    * line identity travels as the same 192-bit digest as
      :func:`exact_dedup` (:func:`exact_digest_cols`) — the counting
      exchange carries ~45-byte rows, never line bytes, and map-side
      partial aggregation collapses hot boilerplate (the 10^9-copy
      cookie banner) to one combiner row per partition before a byte
      moves;
    * the hot-digest set semi-joins back against the exploded
      positions and collapses to one ``(id, sorted positions)`` row
      per affected document — bytes proportional to REMOVED lines
      (ints), never to the corpus;
    * the rebuild joins that removal list to the source by id (one
      id-keyed exchange — the same exchange any re-encode performs)
      and drops positions with a single higher-order ``filter``
      lambda over the split array: no explode of kept text, no
      Python, whole-stage codegen end to end.

    Returns ``(id, clean_text, n_removed, n_lines)``; a document whose
    every line is boilerplate comes back with ``clean_text = ''``
    rather than vanishing (filter-rate monitoring stays one aggregate
    over the output).
    """
    # NULL text reads as the empty page (one empty line) so the
    # accounting columns stay sane (size(NULL) would report -1 lines)
    text = F.coalesce(F.col(text_col), F.lit(""))
    # narrow (_id, _pos, digests) projection materialized once
    # (localCheckpoint): both the hot-line count and the removal-list
    # semi-join read it — without it each would re-split and re-digest
    # the full text column
    lines = spread_input(
        df.select(
            F.col(id_col).alias("_id"),
            F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
        )
    ).select(
        "_id", F.posexplode(F.split("_txt", "\n")).alias("_pos", "_line")
    ).select("_id", "_pos", *exact_digest_cols("_line")).localCheckpoint(
        eager=False
    )
    hot = (
        lines.groupBy("_len", "_md5", "_xx")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= int(min_count))
        .select("_len", "_md5", "_xx")
    )
    removals = (
        lines.join(hot, ["_len", "_md5", "_xx"], "left_semi")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_rm"))
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.split(text, "\n").alias("_ls"),
    )
    rm = F.coalesce(F.col("_rm"), F.array().cast("array<int>"))
    kept = F.filter("_ls", lambda x, i: ~F.array_contains(rm, i))
    return (
        base.join(removals, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.array_join(kept, "\n").alias("clean_text"),
            F.size(rm).cast("long").alias("n_removed"),
            F.size("_ls").cast("long").alias("n_lines"),
        )
    )


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tokens: int = 20,
) -> DataFrame:
    """Sliding-window EXACT-SUBSTRING duplicate detection — the
    ExactSubstr variant of Lee et al. 2022 (arXiv:2107.06499), which
    :func:`chunk_dedup`'s aligned non-overlapping passages only
    approximate: every STRIDE-1 window of ``min_tokens`` tokens is
    digested, a window occurrence is duplicated iff its digest occurs
    elsewhere in the corpus and this occurrence is not the corpus-wide
    first (min ``struct(doc, pos)``, the :func:`chunk_dedup` keeper
    convention), and per document the overlapping duplicated windows
    merge into MAXIMAL token spans — the removal plan ExactSubstr cuts
    out of the text, catching repeats at ANY offset.

    Cost model at 10^12 docs: one 16-byte digest row per TOKEN (Lee
    2022 pays a corpus-wide suffix array for the same coverage) — the
    explode carries digests, never text; the keeper is ONE map-side
    partial hash aggregate (a boilerplate window shared by 10^8 pages
    costs one combiner row per partition); the span merge is a window
    WITHIN each document only (bounded by doc length), via gap-aware
    islands (``lag`` + running sum: positions ``p < q`` merge iff
    ``q - p <= min_tokens``, i.e. their spans overlap or touch) —
    never a global window.

    Returns one row per maximal duplicated span:
    ``(id, span_start, span_end, n_windows)`` — token offsets, 0-based
    start, exclusive end. Docs with no duplicated window emit no row.
    """
    toks = tokens_col(F.col("_txt"))
    lw = int(min_tokens)
    n_win = F.size(toks) - lw + 1
    # let-bound token array: each stride-1 window slices it O(lw)
    # instead of re-running the split per window (text.let_col)
    digs = let_col(
        toks,
        lambda t: F.transform(
            # sequence(0, -1) is DESCENDING in Spark: gate on n_win > 0
            F.sequence(F.lit(0), F.size(t) - lw),
            lambda i: F.md5(
                F.array_join(F.slice(t, i + 1, lw), " ").cast("binary")
            ),
        ),
    )
    occ = (
        spread_input(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        )
        .select("id", F.when(n_win > 0, digs).alias("_d"))
        .select("id", F.posexplode("_d").alias("pos", "_w"))
        .withColumn(
            "_occ",
            F.struct(F.col("id").cast("long").alias("id"), F.col("pos")),
        )
    )
    # keep only duplicated digests BEFORE the occurrence join: the
    # inner join then emits only duplicated occurrences (instead of
    # re-emitting every occ row and filtering after)
    g = (
        occ.groupBy("_w")
        .agg(F.min("_occ").alias("_keep"), F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > 1)
    )
    dup = (
        occ.join(g, "_w")
        .where(F.col("_occ") != F.col("_keep"))
        .select("id", "pos")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("pos")
    # gap-aware island merge: windows at pos p and q (p < q) cover
    # [p, p+lw) and [q, q+lw), which overlap or touch iff q - p <= lw —
    # the plain pos - row_number trick merges only CONSECUTIVE
    # positions and would emit overlapping "maximal" spans for
    # duplicated windows separated by a sub-window gap
    new_isl = F.when(
        F.lag("pos").over(w).isNull()
        | ((F.col("pos") - F.lag("pos").over(w)) > lw),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        dup.withColumn(
            "_isl",
            F.sum(new_isl).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("id", "_isl")
        .agg(
            F.min("pos").alias("_s"),
            (F.max("pos") + F.lit(lw)).alias("_e"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            F.col("id").cast("long").alias("id"),
            F.col("_s").cast("long").alias("span_start"),
            F.col("_e").cast("long").alias("span_end"),
            F.col("_n").cast("long").alias("n_windows"),
        )
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Apply an ExactSubstr removal plan (:func:`repeated_spans`): drop
    every token whose 0-based position falls inside one of the doc's
    ``(span_start, span_end)`` intervals and rebuild the text — the
    cut Lee et al. 2022 make after detection. Tokenization is
    :func:`~..functions.text.tokens_col`'s single-space split, whose
    ``array_join(' ')`` inverse round-trips any string exactly, so
    docs outside every span keep their text byte-identical (they skip
    the rebuild entirely via the left join's NULL arm).

    Plan at 10^12 docs: spans collapse to one bounded array per
    DUPLICATED doc (rows ∝ docs with removals, not corpus size), join
    back on id, and the cut is one higher-order ``filter`` over token
    positions — zero Python, no window, one equi-join.
    """
    sp = spans.groupBy(F.col("id").alias("_sid")).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    out = df.join(sp, F.col(id_col).cast("long") == F.col("_sid"), "left")
    toks = tokens_col(F.col(text_col))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"), lambda s: (i >= s["s"]) & (i < s["e"])
        ),
    )
    return out.withColumn(
        text_col,
        F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
            F.array_join(kept, " ")
        ),
    ).drop("_sid", "_spans")


def incremental_exact_dedup(
    delta: DataFrame,
    base: DataFrame,
    id_col: str,
    text_col: str,
    *,
    base_is_digests: bool = False,
) -> DataFrame:
    """O(delta) exact dedup for a GROWING corpus: keep the rows of
    ``delta`` whose text (a) does not already appear in ``base`` and
    (b) is the first occurrence within the delta (smallest id — the
    same keep-first convention as :func:`exact_dedup`).

    At 10^12 docs you never re-dedup the whole corpus per ingest. The
    base collapses once to its 192-bit digest set (``(_len, _md5,
    _xx)``, ~45 bytes/doc — persist it as the dedup INDEX and pass
    ``base_is_digests=True`` on later batches); each new batch then
    costs one digest scan of the delta plus one anti-join against the
    index — bytes moved are proportional to the BATCH, never the
    corpus, and AQE broadcasts the delta side of the anti-join when
    the batch is small.

    Composition with the table layer: ``delta`` = the decoded rows of
    ``scan.read_appended_between(path, N)`` (the chunk-set delta of two
    snapshots), and the kept rows' complement feeds
    ``encode.delete_rows`` — ingest → dedup → commit is O(batch) end
    to end. ``streaming.dedup_exact_stream`` is the per-micro-batch
    twin with watermark-bounded state; this is the batch/table form.

    NULL text is never considered a duplicate OF THE BASE (anti-join
    keys with NULL never match), but NULL-text rows dedup among
    themselves within the delta, exactly like :func:`exact_dedup`.

    Returns the kept delta rows (all original columns).
    """
    dig = ["_len", "_md5", "_xx"]
    d = delta.select(
        F.col(id_col).alias("_iid"), *exact_digest_cols(text_col)
    )
    b = (
        base.select(*dig)
        if base_is_digests
        else base.select(*exact_digest_cols(text_col))
    )
    fresh = d.join(b, dig, "left_anti")
    keep = fresh.groupBy(*dig).agg(F.min("_iid").alias("_keep_id"))
    return delta.join(
        keep.select("_keep_id"),
        delta[id_col] == F.col("_keep_id"),
        "left_semi",
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    *,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """End-to-end fuzzy document dedup: the keep-first FILTER that the
    pair/component primitives exist to feed (the step a crawl pipeline
    actually runs — detection alone never shrinks the corpus).

    Composition: :func:`minhash_lsh_pairs` (LSH candidates, exact
    hashed-shingle Jaccard verification) -> :func:`connected_components`
    (min-label + pointer jumping) -> drop every document whose component
    label is not its own id (keep-first = smallest id per near-dup
    cluster, the same deterministic convention as :func:`exact_dedup`).

    Plan at 10^12 docs: the drop list holds ONE ~8-byte id per dropped
    duplicate — bytes proportional to removed docs, never the corpus —
    and applies as a single left-anti join on ``id_col`` (AQE picks a
    broadcast for realistic dup rates; a pathological mostly-duplicate
    corpus degrades to one id-keyed shuffle, still narrow). Upstream
    skew is governed by ``max_bucket`` (ON by default here, matching
    the library's hot-group posture): oversized LSH buckets emit
    consecutive-id chains whose verified links connect the same cluster
    transitively, so the keep/drop DECISION is unchanged while the
    bucket cost stays linear. Pass ``max_bucket=None`` to reproduce the
    all-pairs edge set exactly (e.g. when mirroring a closed-form
    transitive-closure oracle).

    Returns the KEPT rows of ``df`` (all original columns). For the
    drop side (e.g. to feed ``encode.delete_rows``), anti-join the
    result back or use the component output directly.
    """
    pairs = minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        threshold,
        k=k,
        bands=bands,
        n=n,
        max_bucket=max_bucket,
    )
    comps = connected_components(pairs, "a", "b")
    drops = comps.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias("_drop_id")
    )
    return df.join(
        drops, df[id_col] == drops["_drop_id"], "left_anti"
    )


# ------------------------------------------------ incremental fuzzy dedup ----


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    persist_shingles: bool = True,
) -> DataFrame:
    """The persisted FUZZY-dedup index row set: one narrow row per kept
    document — ``(_id, _hs, _bands)`` where ``_hs`` is the 64-bit
    hashed-shingle array (what exact Jaccard verification needs, ~8
    bytes/shingle vs the raw text) and ``_bands`` the LSH band hashes
    (what candidate generation joins on). The fuzzy twin of
    :func:`incremental_exact_dedup`'s digest index: write it once for
    the corpus already kept, append each batch's keepers after, and
    every future ingest deduplicates against the corpus WITHOUT
    re-reading or re-tokenizing any kept document."""
    rows = k // bands
    hs = spread_input(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    ).select("_id", hashed_shingles_col("_txt", n).alias("_hs"))
    if persist_shingles:
        # Same barrier minhash_lsh_pairs uses, for the same reason:
        # without a materialization barrier CollapseProject inlines the
        # tokenize+shingle expression into each of the k minhash
        # columns, so every downstream evaluation of ``_bands``
        # re-tokenizes the text k times (measured 46 s -> 3 s on the
        # sf0.1 candidate join). localCheckpoint, NOT persist(): the
        # CacheManager holds persisted blocks until unpersist()/
        # clearCache(), so on-the-fly index builds in a long-lived
        # session would leak shingle caches — checkpoint blocks are
        # reclaimed by the ContextCleaner once the plan is
        # unreferenced. An index WRITTEN to parquet (the production
        # path) materializes these columns anyway. Callers that provide
        # their own barrier (incremental_minhash_dedup's outer
        # checkpoint) pass ``persist_shingles=False`` to avoid holding
        # the shingle payload twice.
        hs = hs.localCheckpoint(eager=False)
    sig = hs.selectExpr("_id", "_hs", *minhash_cols_from_hashed("_hs", k))
    return sig.select(
        "_id",
        "_hs",
        F.array(
            *[
                F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)])
                for b in range(bands)
            ]
        ).alias("_bands"),
    )


def _index_buckets(idx: DataFrame) -> DataFrame:
    return idx.select("_id", F.posexplode("_bands").alias("band", "h"))


def _verify_pairs(
    cand: DataFrame, left_idx: DataFrame, right_idx: DataFrame, threshold: float
) -> DataFrame:
    """Exact hashed-set Jaccard over candidate (a, b) pairs; each index
    is semi-joined down to its candidate ids first so non-candidate
    documents neither shuffle nor re-tokenize (the minhash_lsh_pairs
    verification pattern, across two indexes)."""
    # barrier: cand is read three times (two id projections + the join
    # spine) — without it the candidate join runs three times
    cand = cand.localCheckpoint(eager=False)
    la = left_idx.join(
        cand.select(F.col("a").alias("_id")).distinct(), "_id", "left_semi"
    ).select(F.col("_id").alias("a"), F.col("_hs").alias("_sha"))
    rb = right_idx.join(
        cand.select(F.col("b").alias("_id")).distinct(), "_id", "left_semi"
    ).select(F.col("_id").alias("b"), F.col("_hs").alias("_shb"))
    return (
        cand.join(la, "a")
        .join(rb, "b")
        .where(jaccard_col(F.col("_sha"), F.col("_shb")) >= threshold)
        .select("a", "b")
    )


def incremental_minhash_dedup(
    delta: DataFrame,
    base: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    *,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket: int | None = 1000,
    base_is_index: bool = False,
    return_kept_index: bool = False,
):
    """O(delta + collisions) fuzzy dedup of a new batch against an
    already-deduplicated corpus — MinHash/LSH ingestion without ever
    re-scanning kept text (the fuzzy half of the incremental-dedup
    story; :func:`incremental_exact_dedup` is the exact half).

    Candidates are band collisions (delta x index and delta x delta —
    never index x index: the kept corpus is already duplicate-free),
    verified by EXACT hashed-shingle Jaccard, then resolved by
    connected components over the verified edges: a delta document is
    dropped iff its component reaches any base document (it duplicates
    something already kept, possibly transitively through another
    delta doc) or it is not the smallest delta id in a base-free
    component (keep-first within the batch, the library-wide
    convention). Base and delta membership is tracked structurally
    (internal 2*id(+1) relabeling, ids must fit 62 bits), so a delta id
    that already exists in the index — a replayed batch — reads as a
    duplicate of the kept corpus, never as a self-match.

    At 10^12 kept docs the per-ingest cost is: the batch's own
    signatures, one equi-join of the batch's O(bands x |delta|) bucket
    rows against the index's bucket side, Jaccard over collisions
    only, and components over the collision graph — bytes moved scale
    with the BATCH and its collisions, never the corpus. The index's
    `_hs` payload is what buys exact verification without touching
    kept text; a band-collision-only variant would shrink the index
    ~5x at the cost of approximate membership.

    ``max_bucket`` (ON by default, the library's hot-group posture)
    bounds the one quadratic hazard — a boilerplate band bucket
    (cookie banners, mirrored pages). Delta x delta collisions above
    the cap switch to consecutive-id CHAINING (n-1 edges connecting
    the same cluster transitively — the minhash_lsh_pairs trick, exact
    for component decisions); delta x index candidates are capped to
    the ``max_bucket`` smallest index ids per delta doc per band
    (base-reach needs ONE verified base match, so the cap can only
    miss when every one of 1000 sampled collisions fails verification
    while a crowded-out one would have passed — and the delta x delta
    chain still links the batch's own members). ``None`` restores the
    exact all-pairs candidate set (what a closed-form oracle replays).

    ``base_is_index=True`` passes a persisted :func:`build_minhash_index`
    output (the production path); otherwise ``base`` is a corpus
    DataFrame indexed on the fly. ``return_kept_index=True`` also
    returns the kept rows' index rows — append them to the persisted
    index to complete the ingest (jobs/dedup_job.py --fuzzy-index).

    Returns the kept delta rows (all original columns), or
    ``(kept, kept_index)`` with ``return_kept_index=True``.
    """
    # one barrier per side (ADVICE r5): the outer checkpoints below are
    # the single materialization of each on-the-fly index — the inner
    # shingle barrier (persist_shingles) would hold the same _hs arrays
    # a second time with no reuse benefit, since the index rows are the
    # only thing read downstream
    idx_b = (
        base
        if base_is_index
        else build_minhash_index(
            base, id_col, text_col, k=k, bands=bands, n=n,
            persist_shingles=False,
        ).localCheckpoint(eager=False)
    )
    idx_d = build_minhash_index(
        delta, id_col, text_col, k=k, bands=bands, n=n,
        persist_shingles=False,
    ).localCheckpoint(eager=False)
    bd = _index_buckets(idx_d)
    bb = _index_buckets(idx_b)
    raw_db = bd.alias("x").join(
        bb.alias("y"),
        (F.col("x.band") == F.col("y.band")) & (F.col("x.h") == F.col("y.h")),
    )
    if max_bucket is None:
        cand_db = raw_db.select(
            F.col("x._id").alias("a"), F.col("y._id").alias("b")
        ).distinct()
        # skew-safe: a boilerplate band bucket inside the batch would
        # otherwise serialize the all-pairs join in one task (§2.5);
        # the delta x index join above is broadcast-bd (plan-audited),
        # which has no key-skew straggler by construction
        cand_dd = _self_pairs_skew_safe(bd, ["band", "h"]).distinct()
    else:
        from pyspark.sql import Window

        # delta x index: at most max_bucket (smallest) index candidates
        # per delta doc per band — bounds verify/components against a
        # boilerplate bucket; ONE verified base match already decides
        wdb = Window.partitionBy("x._id", "x.band").orderBy("y._id")
        cand_db = (
            raw_db.select(
                F.col("x._id").alias("a"),
                F.col("y._id").alias("b"),
                F.row_number().over(wdb).alias("_rn"),
            )
            .where(F.col("_rn") <= max_bucket)
            .select("a", "b")
            .distinct()
        )
        # delta x delta: oversized buckets switch to consecutive-id
        # chaining (component decisions unchanged, bucket cost linear)
        w = Window.partitionBy("band", "h")
        wo = w.orderBy("_id")
        # checkpoint: small feeds both self-join sides and pairs_big a
        # third read — one window pass instead of three
        sized = bd.select(
            "_id",
            "band",
            "h",
            F.count("*").over(w).alias("_n"),
            F.lead("_id").over(wo).alias("_next"),
        ).localCheckpoint(eager=False)
        small = sized.where(F.col("_n") <= max_bucket)
        pairs_small = (
            small.alias("x")
            .join(
                small.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.h") == F.col("y.h"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        )
        pairs_big = sized.where(
            (F.col("_n") > max_bucket) & F.col("_next").isNotNull()
        ).select(F.col("_id").alias("a"), F.col("_next").alias("b"))
        cand_dd = pairs_small.unionByName(pairs_big).distinct()
    v_db = _verify_pairs(cand_db, idx_d, idx_b, threshold)
    v_dd = _verify_pairs(cand_dd, idx_d, idx_d, threshold)
    # which side a node belongs to is carried STRUCTURALLY (delta ->
    # 2*id+1, base -> 2*id), never by id identity — re-ingesting a batch
    # whose ids already exist in the index (the crash-replay case) must
    # read as "duplicates of the kept corpus", not as self-matches.
    # Doubling preserves order, so min-label keep-first is unchanged;
    # ids must fit 62 bits (the library-wide id headroom assumption).
    e_db = v_db.select(
        (F.col("a") * 2 + 1).alias("a"), (F.col("b") * 2).alias("b")
    )
    e_dd = v_dd.select(
        (F.col("a") * 2 + 1).alias("a"), (F.col("b") * 2 + 1).alias("b")
    )
    comps = connected_components(e_db.unionByName(e_dd), "a", "b")
    is_delta = F.col("id") % 2 == 1
    g = comps.groupBy("comp").agg(
        F.max(F.when(~is_delta, True).otherwise(False)).alias("_has_base"),
        F.min(F.when(is_delta, F.col("id"))).alias("_min_delta"),
    )
    drops = (
        comps.join(g, "comp")
        .where(
            is_delta
            & (F.col("_has_base") | (F.col("id") != F.col("_min_delta")))
        )
        .select(F.shiftright(F.col("id"), 1).alias("_drop_id"))
    )
    kept = delta.join(drops, delta[id_col] == F.col("_drop_id"), "left_anti")
    if not return_kept_index:
        return kept
    kept_index = idx_d.join(
        drops.withColumnRenamed("_drop_id", "_id"), "_id", "left_anti"
    )
    return kept, kept_index
