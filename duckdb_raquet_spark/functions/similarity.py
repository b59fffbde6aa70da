"""Similarity search over embedding columns (array<float>).

Brute-force exact top-k as the baseline (TakeOrderedAndProject — no full
sort, no Python), and a random-hyperplane LSH-bucketed variant as the
scale path: at 10^12 vectors the bucket equi-join touches only candidate
buckets instead of scoring every vector, the same prune-then-verify shape
as the engine's block scans.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Exact double-precision dot product, sequential fold (JVM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def ann_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    exclude_id=None,
) -> DataFrame:
    """Exact top-k cosine neighbors: score every row (whole-stage
    codegen'd expression), orderBy+limit plans as a distributed top-k
    (TakeOrderedAndProject), not a global sort."""
    q = _lit_vec(query)
    v = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col).alias("vec_id"), cosine_col(v, q).alias("score")
    )
    if exclude_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)


# --------------------------------------------------------------- LSH ANN ----


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: bit i = sign(dot(v, plane_i)).
    Pure Column expressions — one fold per plane."""
    v = vec_col.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot_col(v, _lit_vec(p.tolist()))
        bucket = bucket.bitwiseOR(
            F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def ann_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    *,
    n_planes: int = 12,
    probe_hamming: int = 2,
    exclude_id=None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: score only rows whose hyperplane
    signature is within ``probe_hamming`` bits of the query's (multi-probe
    — the IVF 'nearby centroids' idea). At scale the bucket table is
    written bucketed/sorted so the probe is a pruned scan, not a full
    pass."""
    planes = hyperplanes(len(query), n_planes)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(np.asarray(query, dtype=np.float64), p)) >= 0:
            qsig |= 1 << i
    sig = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        bucket_col(F.col(vec_col), planes).alias("_sig"),
    )
    probe = sig.where(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    if exclude_id is not None:
        probe = probe.where(F.col("vec_id") != exclude_id)
    q = _lit_vec(query)
    return (
        probe.select(
            "vec_id", cosine_col(F.col("_v").cast("array<double>"), q).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )
