"""Exact shuffle placement: invert HashPartitioning's murmur3 so a
driver-computed assignment (e.g. LPT bin packing of codec-bound work)
survives the shuffle instead of being re-rolled by the partitioner's
own hash (balls-into-bins collisions leave some tasks with several
serial codec groups while cores idle — guide §2.5).

Used by the per-block re-encode spread (scan.py) and the planned
encode placement (encode.py)."""

from __future__ import annotations

import heapq


def murmur3_hash_long(v: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashLong for one non-null LongType column
    — the hash HashPartitioning applies (pmod(murmur3(key), n)).
    Replicated bit for bit (pinned by tests against F.hash)."""
    m = 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & m

    def mixk1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & m
        k1 = rotl(k1, 15)
        return (k1 * 0x1B873593) & m

    def mixh1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & m

    v &= 0xFFFFFFFFFFFFFFFF
    h1 = seed & m
    h1 = mixh1(h1, mixk1(v & m))
    h1 = mixh1(h1, mixk1((v >> 32) & m))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1


def partition_reps(n: int) -> list[int]:
    """reps[p] = a long x with pmod(murmur3(x), n) == p, for every
    partition p — coupon-collector search, ~n*ln(n) hashes."""
    reps: list[int | None] = [None] * n
    found = 0
    x = 0
    while found < n:
        h = murmur3_hash_long(x)
        signed = h - (1 << 32) if h >= (1 << 31) else h
        p = signed % n  # == Spark's Pmod for positive n
        if reps[p] is None:
            reps[p] = x
            found += 1
        x += 1
    return reps  # type: ignore[return-value]


def lpt_bins(sizes: list[int], n_bins: int) -> list[int]:
    """LPT greedy: item i (with cost sizes[i]) -> bin, bins byte-
    near-equal; bins relabeled so the HEAVIEST loads get the LOWEST
    indices (partitions are scheduled in index order — a heavy bin
    started first can never become a late tail). Returns bin index per
    item position."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    heap = [(0, b) for b in range(n_bins)]
    heapq.heapify(heap)
    raw = [0] * len(sizes)
    loads = [0] * n_bins
    for i in order:
        load, b = heapq.heappop(heap)
        raw[i] = b
        loads[b] = load + sizes[i]
        heapq.heappush(heap, (loads[b], b))
    by_load = sorted(range(n_bins), key=lambda b: -loads[b])
    relabel = {b: pid for pid, b in enumerate(by_load)}
    return [relabel[b] for b in raw]
