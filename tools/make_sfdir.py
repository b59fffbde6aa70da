#!/usr/bin/env python
"""Generate a driver-SCALE replica of the testdata star schema for
performance measurement (round-6 optimization work). NOT the driver's
generator and NOT bit-identical to its tables — only the row counts and
the distributions that drive query cost are matched (doc token counts,
near-dup rate, vocab size, source/lang mix, unit-norm embeddings,
event/user cardinalities). Correctness stays pinned to the driver's own
/root/testdata sf dirs; this exists so sf1.0-scale walls can be measured
locally before the driver's round-end run.

Usage: python tools/make_sfdir.py [--sf 1.0] [--out /root/testdata_local]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "query", "scan", "sort", "hash", "group", "filter", "join",
    "order", "line", "batch", "data", "key", "row", "part", "agg",
    "fast", "slow", "big", "small", "customer", "the", "a", "v",
]


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    n_base = int(n * 0.95)
    ntoks = rng.integers(10, 101, n_base)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in ntoks]
    # ~5% near-dup copies of random earlier docs: perturb the tail
    n_dup = n - n_base
    partners = rng.integers(0, n_base, n_dup)
    for p in partners:
        w = texts[p].split(" ")
        cut = max(1, int(len(w) * 0.9))
        w2 = w[:cut] + list(vocab[rng.integers(0, len(vocab), len(w) - cut)])
        if rng.random() < 0.03:
            texts.append(texts[p])  # exact dup sprinkle
        else:
            texts.append(" ".join(w2))
    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    langs = rng.choice(
        ["en", "zh", "es", "fr", "de"], n, p=[0.41, 0.15, 0.15, 0.145, 0.145]
    )
    sources = np.array([f"src{i % 20}" for i in rng.permutation(n)])
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    # ~8% near-dups: small perturbation of an earlier vector
    n_dup = int(n * 0.08)
    idx = rng.integers(0, n - n_dup, n_dup)
    v[n - n_dup:] = v[idx] + 0.05 * rng.standard_normal((n_dup, 64)).astype(
        np.float32
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = 30 * 86400 * 1_000_000
    ts = base + rng.integers(0, span, n).astype("timedelta64[us]")
    ts = np.sort(ts)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": rng.choice(
                ["signup", "purchase", "view", "click", "error"], n
            ),
            "value": rng.uniform(0, 100, n),
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)],
        }
    )


def gen_tpch(rng: np.random.Generator, sf: float, out: str) -> None:
    n_orders = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    base = np.datetime64("2023-01-01T00:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_orders), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
                "o_orderstatus": rng.choice(["O", "F", "P"], n_orders),
                "o_totalprice": rng.uniform(1000, 500000, n_orders).round(2),
                "o_orderdate": pa.array(
                    base
                    + rng.integers(0, 365 * 86400 * 10**6, n_orders).astype(
                        "timedelta64[us]"
                    )
                ),
                "o_orderpriority": rng.choice(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                    n_orders,
                ),
            }
        ),
        os.path.join(out, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_orders, n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(float),
                "l_extendedprice": rng.uniform(900, 100000, n_li).round(2),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": rng.choice(["A", "N", "R"], n_li),
                "l_linestatus": rng.choice(["O", "F"], n_li),
                "l_shipdate": pa.array(
                    base
                    + rng.integers(0, 365 * 86400 * 10**6, n_li).astype(
                        "timedelta64[us]"
                    )
                ),
            }
        ),
        os.path.join(out, "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": rng.uniform(-999, 9999, n_cust).round(2),
            }
        ),
        os.path.join(out, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            }
        ),
        os.path.join(out, "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [f"part {i}" for i in range(n_part)],
                "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
                "p_retailprice": rng.uniform(900, 2000, n_part).round(2),
            }
        ),
        os.path.join(out, "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        os.path.join(out, "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
        os.path.join(out, "region.parquet"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/testdata_local")
    args = ap.parse_args()
    sf = args.sf
    out = os.path.join(args.out, f"sf{sf}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(
        gen_documents(rng, max(500, int(50_000 * sf))),
        os.path.join(out, "documents.parquet"),
    )
    pq.write_table(
        gen_embeddings(rng, max(500, int(20_000 * sf))),
        os.path.join(out, "embeddings.parquet"),
    )
    pq.write_table(
        gen_events(rng, int(1_000_000 * sf), max(100, int(15_000 * sf))),
        os.path.join(out, "events.parquet"),
    )
    gen_tpch(rng, sf, out)
    open(os.path.join(out, "_DONE"), "w").close()
    print(out)


if __name__ == "__main__":
    main()
