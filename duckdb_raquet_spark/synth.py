"""Deterministic synthetic Common-Crawl-style webtext (seed 42).

The FIXTURES.md F1 table: Zipfian hot domains (skew exercise), per-domain
sorted timestamps with crawl bursts (delta/RLE-friendly), boilerplate-
heavy text (dict/FSST-friendly), per-domain language (long runs), binary
html with invalid-UTF8 bytes, plus pinned edge rows. Mirrors the
reference's seeded fixture convention
(/root/reference/test/sql/read_raster_metadata.test:11-15, numpy seed 42).

Generation is distributed: ``spark.range`` + ``mapInPandas`` with a
per-partition RNG seeded by (seed, partition id) — deterministic for a
fixed ``num_partitions`` and scalable to bench sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = ["en", "de", "fr", "es", "zh", "ru", "pt", "it", "ja", "nl", "pl", "sv"]
_LANG_W = [0.55, 0.10, 0.08, 0.08, 0.06, 0.05, 0.02, 0.02, 0.01, 0.01, 0.01, 0.01]
_YEAR_START = 1704067200  # 2024-01-01 UTC
_YEAR_SECONDS = 365 * 86400


def _vocab(n: int = 2000) -> np.ndarray:
    rng = np.random.default_rng(7)
    lens = rng.integers(3, 10, n)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return np.array(["".join(rng.choice(letters, l)) for l in lens])


def _gen_partition(ids: np.ndarray, seed: int, n_domains: int, avg_words: int,
                   html_bytes: int) -> pd.DataFrame:
    rng = np.random.default_rng((seed, int(ids[0]) if len(ids) else 0))
    n = len(ids)
    vocab = _vocab()
    # Zipfian domain draw (s~1.2): a few hot domains dominate
    ranks = (rng.zipf(1.2, n) - 1) % n_domains
    domains = np.array([f"d{r:04d}.example.com" for r in ranks])
    # language fixed per domain
    lang_idx = (ranks * 2654435761) % 997 % len(_LANGS)
    lang_cdf = np.cumsum(_LANG_W) / np.sum(_LANG_W)
    lang_u = ((ranks * 40503) % 1000) / 1000.0
    lang_pick = np.searchsorted(lang_cdf, lang_u)
    langs = np.array(_LANGS)[np.clip(lang_pick, 0, len(_LANGS) - 1)]
    # timestamps: base per domain + small in-crawl increments (bursts)
    dom_base = (ranks * 977_777) % _YEAR_SECONDS
    ts = _YEAR_START + dom_base + (ids % 1000) * rng.integers(1, 90, n)
    ts = np.minimum(ts, _YEAR_START + _YEAR_SECONDS - 1)
    urls = np.array(
        [f"https://{d}/p{int(r) % 23}/doc-{int(i)}" for d, r, i in zip(domains, ranks, ids)]
    )
    # text: boilerplate per domain + zipf words
    n_words = np.maximum(5, rng.poisson(avg_words, n))
    boiler = np.array(
        [f"welcome to d{r:04d} official page terms privacy contact" for r in ranks]
    )
    texts = []
    for i in range(n):
        w = vocab[(rng.zipf(1.35, n_words[i]) - 1) % len(vocab)]
        texts.append(boiler[i] + " " + " ".join(w))
    # html: tags + text bytes + deterministic invalid-UTF8 tail
    htmls = []
    for i in range(n):
        body = texts[i][: html_bytes // 2].encode()
        pad = bytes([(int(ids[i]) * 31 + j) % 256 for j in range(24)])
        htmls.append(b"<html><head><title>t</title></head><body>" + body + b"</body></html>" + pad)
    pdf = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(ts, unit="s"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )
    # pinned edge rows (FIXTURES.md F1 edge list) on fixed global ids
    for j, i in enumerate(ids):
        gid = int(i)
        if gid == 1:
            pdf.iloc[j, pdf.columns.get_loc("text")] = ""
        elif gid == 2:
            pdf.iloc[j, pdf.columns.get_loc("text")] = "   \t  "
        elif gid == 3:
            pdf.iloc[j, pdf.columns.get_loc("text")] = "x"
        elif gid == 4:
            pdf.iloc[j, pdf.columns.get_loc("lang")] = None
        elif gid == 5:
            pdf.iloc[j, pdf.columns.get_loc("html")] = b""
        elif gid == 6:
            pdf.iloc[j, pdf.columns.get_loc("text")] = "emoji 🎉 CJK 中文字 RTL שלום مرحبا"
    return pdf


def synth_webtext(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    n_domains: int = 1000,
    avg_words: int = 120,
    html_bytes: int = 2048,
    num_partitions: int = 32,
    start: int = 0,
) -> DataFrame:
    base = spark.range(start, start + n_rows, 1, num_partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield _gen_partition(ids, seed, n_domains, avg_words, html_bytes)

    return base.mapInPandas(gen, schema=SCHEMA)
