"""Round-2 surface tests: sargable ts-less point lookups, keep-shape
null masking (ST_ClipMask analog), fused column math, the persisted ANN
index, digest dedup, LSH hot-bucket capping, scheme-qualified (file://)
table paths, and FSST greedy-parse equivalence."""

from __future__ import annotations

import random
import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_raquet_spark import encode, scan, synth
from duckdb_raquet_spark.codecs import fsst
from duckdb_raquet_spark.functions import dedup, multimodal as mm, similarity

pytestmark = pytest.mark.spark


# ------------------------------------------------------ ts-less point ----


def test_point_lookup_no_ts_high_res(spark, tmp_path):
    """res >= 13 would need 8192+ isin literals under the old cover-list
    plan; the two-phase sargable path must stay exact (and cheap)."""
    df = synth.synth_webtext(spark, 400, num_partitions=4)
    path = str(tmp_path / "hires")
    encode.encode_to_path(
        spark, df, path, target_rows_per_block=64, resolution=13
    )
    row = df.orderBy("url").first()
    got = scan.point_lookup(spark, path, row["url"], cols=["text", "lang"]).collect()
    assert len(got) == 1
    assert got[0]["text"] == row["text"] and got[0]["lang"] == row["lang"]
    missing = scan.point_lookup(
        spark, path, "https://never.example.com/none", cols=["text"]
    ).collect()
    assert missing == []


def test_prune_url_hash_plan_has_no_literal_blowup(spark, tmp_path):
    """The pruned plan must not embed a 2^res cover list."""
    df = synth.synth_webtext(spark, 200, num_partitions=2)
    path = str(tmp_path / "hires2")
    encode.encode_to_path(spark, df, path, target_rows_per_block=64, resolution=13)
    man = scan.read_manifest(spark, path)
    blocks = scan.read_blocks(spark, path)
    from duckdb_raquet_spark import blockkey as bk

    url = df.first()["url"]
    pruned = scan.prune_blocks_for_url_hash(blocks, man, bk.hash_x_from_url(url))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # a cover-list plan at res 13 would print thousands of literals
    assert len(plan) < 20000
    assert pruned.count() >= 1


# ------------------------------------------------ keep-shape null mask ----


@pytest.fixture(scope="module")
def small_table(spark):
    path = "/tmp/raquet_test_round2"
    df = synth.synth_webtext(spark, 600, num_partitions=4).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    shutil.rmtree(path, ignore_errors=True)
    encode.encode_to_path(spark, df, path, target_rows_per_block=128, resolution=3)
    return df, path


def test_mask_to_null_keeps_shape(spark, small_table):
    df, path = small_table
    man = scan.read_manifest(spark, path)
    blocks = scan.read_blocks(spark, path)
    langs = [r[0] for r in df.select("lang").distinct().collect() if r[0] is not None]
    keep = sorted(langs)[:1]
    masked = scan.mask_to_null_in(blocks, man, "lang", keep, null_cols=["text"])
    dec = scan.decode_blocks(masked, man, ["url", "text", "lang"])
    got = {r["url"]: (r["text"], r["lang"]) for r in dec.collect()}
    exp = {r["url"]: (r["text"], r["lang"]) for r in df.collect()}
    assert len(got) == len(exp)  # row count preserved (keep-shape)
    for url, (text, lang) in exp.items():
        g_text, g_lang = got[url]
        assert g_lang == lang  # coordinates untouched
        assert g_text == (text if lang in keep else None)


def test_mask_values_eq_none_raises(spark, small_table):
    _, path = small_table
    man = scan.read_manifest(spark, path)
    blocks = scan.read_blocks(spark, path)
    with pytest.raises(ValueError):
        scan.mask_values_eq(blocks, man, "lang", None)


# ------------------------------------------------------ fused col math ----


def test_column_math_stats_matches_dataframe(spark, small_table):
    df, path = small_table
    man = scan.read_manifest(spark, path)
    blocks = scan.read_blocks(spark, path)
    got = scan.column_math_stats(
        blocks, man, ["n_chars"], lambda a: a["n_chars"] * 2.0 + 1.0
    ).first()
    exp = df.select((F.col("n_chars") * 2.0 + 1.0).alias("y")).agg(
        F.count("y"), F.sum("y"), F.min("y"), F.max("y")
    ).first()
    assert got["cnt"] == exp[0]
    assert got["sum"] == pytest.approx(exp[1], rel=1e-12)
    assert got["min"] == exp[2] and got["max"] == exp[3]


# ------------------------------------------------------------ ANN index ----


def test_ann_index_probe_matches_adhoc(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    idx = str(tmp_path / "ann_idx")
    similarity.build_ann_index(emb, "vec_id", "embedding", idx, n_planes=10)
    a = similarity.ann_lsh(
        emb, "vec_id", "embedding", q, k=5, n_planes=10, exclude_id=0,
        index_path=idx,
    ).collect()
    b = similarity.ann_lsh(
        emb, "vec_id", "embedding", q, k=5, n_planes=10, exclude_id=0
    ).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in a] == [
        (r["vec_id"], round(r["score"], 9)) for r in b
    ]
    # index probe reads a strict subset of buckets: verify pruning pushes
    plan = (
        spark.read.parquet(idx)
        .where(F.col("sig").isin([1, 2, 3]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(sig" in plan.replace(" ", "")


# ------------------------------------------------------------ dedup ----


def test_exact_dedup_digest_groups(spark):
    rows = [(0, "aa bb"), (1, "aa bb"), (2, "cc"), (3, "dd"), (4, "cc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["keep_id"], r["n_copies"])
        for r in dedup.exact_dedup(df, "doc_id", "text").collect()
    }
    assert got == {(0, 2), (2, 2), (3, 1)}


def test_minhash_hot_bucket_chains(spark):
    """An all-identical boilerplate cluster must not go quadratic: with
    max_bucket below the cluster size the candidate set is linear, yet
    the verified pairs still connect the whole cluster."""
    boiler = "cookie notice please accept our terms and conditions today"
    rows = [(i, boiler) for i in range(120)]
    rows += [(1000 + i, f"unique document number {i} with words {i * 7}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", 0.8, k=16, bands=4, max_bucket=50
    ).collect()
    # linear, not quadratic: 120 identical docs -> ~119 chained pairs,
    # far below the 7140 of all-pairs
    assert 0 < len(pairs) < 400
    # connectivity: union-find over the emitted pairs joins the cluster
    parent = {i: i for i in range(120)}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for r in pairs:
        a, b = int(r["a"]), int(r["b"])
        if a < 1000 and b < 1000:
            parent[find(a)] = find(b)
    assert len({find(i) for i in range(120)}) == 1


def test_simhash_max_hamming_guard(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.simhash_pairs(df, "doc_id", "text", max_hamming=4)


def test_simhash_hashers_agree_on_identical_docs(spark):
    rows = [(0, "same words here"), (1, "same words here"), (2, "totally different content")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for hasher in ("xxh64", "md5_60"):
        pairs = dedup.simhash_pairs(df, "doc_id", "text", 0, hasher=hasher).collect()
        assert {(r["a"], r["b"]) for r in pairs} == {(0, 1)}


def test_binary_stats_includes_md5(spark):
    df = spark.createDataFrame([(0, bytearray(b"xyz"))], "id long, payload binary")
    r = df.select(*mm.binary_stats_col("payload")).first()
    assert r["n_bytes"] == 3
    assert len(r["content_md5"]) == 32


# ------------------------------------------------------ file:// scheme ----


def test_encode_read_roundtrip_file_scheme(spark, tmp_path):
    """The manifest-last invariant must hold on scheme-qualified paths
    (the object-store shape) — manifest row, sidecar and lineage all
    route through the Hadoop FileSystem API."""
    df = synth.synth_webtext(spark, 150, num_partitions=2)
    path = "file://" + str(tmp_path / "remote_enc")
    final = encode.encode_to_path(
        spark, df, path, target_rows_per_block=64, resolution=2
    )
    assert final["num_rows"] == 150
    man = scan.read_manifest(spark, path)
    assert man["num_rows"] == 150
    dec = scan.decode_blocks(scan.read_blocks(spark, path), man, ["url", "text"])
    assert dec.count() == 150
    from duckdb_raquet_spark import manifest as mf

    lin = mf.read_chunk_lineage(path, spark)
    assert 0 in lin and lin[0]["rows"] == 150


def test_catalog_table_surface(spark, small_table):
    df, path = small_table
    scan.register_table(spark, path, "rq_round2")
    man = scan.read_manifest_table(spark, "rq_round2")
    assert man["num_rows"] == 600
    dec = scan.decode_blocks(
        scan.read_blocks_table(spark, "rq_round2"), man, ["url", "n_chars"]
    )
    assert dec.count() == 600


# ---------------------------------------------------------------- FSST ----


def _greedy_reference(data: bytes, table: list[bytes]) -> bytes:
    """Independent naive greedy longest-match encoder (spec oracle)."""
    by_len = sorted(table, key=len, reverse=True)
    codes = {s: bytes([i]) for i, s in enumerate(table)}
    out = bytearray()
    pos = 0
    while pos < len(data):
        for s in by_len:
            if data.startswith(s, pos):
                out += codes[s]
                pos += len(s)
                break
        else:
            out += b"\xff" + data[pos : pos + 1]
            pos += 1
    return bytes(out)


def test_fsst_compress_matches_greedy_spec():
    rnd = random.Random(77)
    for _ in range(30):
        alpha = bytes(rnd.randrange(256) for _ in range(rnd.randrange(2, 10)))
        data = bytes(rnd.choice(alpha) for _ in range(rnd.randrange(0, 2500)))
        table, seen = [], set()
        for _ in range(rnd.randrange(0, 25)):
            ln = rnd.randrange(1, 9)
            start = rnd.randrange(0, max(1, len(data) - ln)) if data else 0
            s = data[start : start + ln]
            if s and s not in seen:
                seen.add(s)
                table.append(s)
        enc = fsst.compress(data, table)
        assert enc == _greedy_reference(data, table)
        assert fsst.decompress(enc, table) == data


def test_effort_fast_roundtrip(spark, tmp_path):
    """effort='fast' drops the bz2 candidate (throughput mode) but keeps
    bit-identity and the <=-reference guarantee (zlib stays in the race)."""
    df = synth.synth_webtext(spark, 200, num_partitions=2)
    path = str(tmp_path / "fast_enc")
    final = encode.encode_to_path(
        spark, df, path, target_rows_per_block=64, resolution=2, effort="fast"
    )
    assert final["effort"] == "fast"
    man = scan.read_manifest(spark, path)
    dec = scan.decode_blocks(scan.read_blocks(spark, path), man, ["url", "text"])
    assert dec.exceptAll(df.select("url", "text")).count() == 0
    assert not any(
        "bz2" in codec
        for inner in final["codec_histogram"].values()
        for codec in inner
    )


# ------------------------------------------------------- column groups ----


def test_column_group_roundtrip_and_masks(spark, tmp_path):
    """Interleaved column-group layout (interleave_bands analog): grouped
    columns share one blob; decode, point reads, and the mask/transform
    re-encode paths must all stay bit-exact."""
    df = synth.synth_webtext(spark, 400, num_partitions=4)
    path = str(tmp_path / "grouped")
    final = encode.encode_to_path(
        spark, df, path, target_rows_per_block=128, resolution=2,
        column_groups=[["text", "html"]],
    )
    assert final["column_groups"] == {"text+html": ["text", "html"]}
    man = scan.read_manifest(spark, path)
    blocks = scan.read_blocks(spark, path)
    # schema holds ONE blob for the group, none for the members
    assert "text+html_blob" in blocks.columns
    assert "text_blob" not in blocks.columns and "html_blob" not in blocks.columns
    # codecs record the group for each member
    import json as _json

    c = _json.loads(blocks.select("codecs").first()[0])
    assert c["text"].startswith("group[2](") and c["html"] == c["text"]
    # full round trip, including the binary member
    dec = scan.decode_blocks(blocks, man, ["url", "text", "html", "lang"])
    key = [
        F.col("url"), F.col("text"), F.md5(F.base64("html")).alias("h"), F.col("lang")
    ]
    assert dec.select(*key).exceptAll(df.select(*key)).count() == 0
    assert dec.count() == 400
    # single-member decode reads only the group blob (still correct)
    one = scan.decode_blocks(blocks, man, ["text"])
    assert one.count() == 400
    # mask re-encode path round-trips grouped blobs too
    langs = sorted(
        r[0] for r in df.select("lang").distinct().collect() if r[0] is not None
    )
    masked = scan.mask_values_in(blocks, man, "lang", langs[:2])
    got = scan.decode_blocks(masked, man, ["url", "text"])
    exp = df.where(F.col("lang").isin(langs[:2])).select("url", "text")
    assert got.exceptAll(exp).count() == 0 and got.count() == exp.count()


def test_group_codec_unit():
    from duckdb_raquet_spark.codecs import registry

    inners = [b"\x10abcdef" * 10, b"\x00" + b"\x01" * 64, b""]
    payload = registry.encode_group(inners, 6)
    assert registry.decode_group(payload) == inners
    assert registry.group_codec_name(payload).startswith("group[3](")


# ----------------------------------------------------------- text ops ----


def test_bpe_token_count_and_rolling_fp(spark):
    from duckdb_raquet_spark.functions import text as textfn

    df = spark.createDataFrame(
        [(0, "Hello, world 42!"), (1, "a"), (2, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", textfn.token_count_bpe_col("text").alias("n")
        ).collect()
    }
    # Hello | , | world | 4 | 2 | !  -> 6
    assert got[0] == 6 and got[1] == 1
    fp = df.select(
        "doc_id", textfn.fingerprint_rolling_md5_col("text", 8).alias("fp")
    ).collect()
    assert all(r["fp"] is not None for r in fp)
    # identical text -> identical fingerprint; sliding window really slides
    again = df.select(
        "doc_id", textfn.fingerprint_rolling_md5_col("text", 8).alias("fp")
    ).collect()
    assert sorted((r["doc_id"], r["fp"]) for r in fp) == sorted(
        (r["doc_id"], r["fp"]) for r in again
    )


# ---------------------------------------------------- map-only encode ----


def test_shuffle_none_maponly_roundtrip(spark, tmp_path):
    """shuffle='none' (map-only encode): zero raw-byte shuffle, salt =
    input partition id. Same format — every reader works unchanged —
    with a block's rows spread across one salted row per touching
    partition."""
    from pyspark.sql import functions as F

    df = synth.synth_webtext(spark, 300, num_partitions=4)
    path = str(tmp_path / "maponly_enc")
    final = encode.encode_to_path(
        spark, df, path, target_rows_per_block=64, resolution=2, shuffle="none"
    )
    assert final["shuffle"] == "none"
    assert final["num_rows"] == 300
    man = scan.read_manifest(spark, path)
    blocks = scan.read_blocks(spark, path)
    # salts are partition ids (several per block allowed)
    salts = {r["salt"] for r in blocks.select("salt").distinct().collect()}
    assert salts <= set(range(4))
    # bit-exact round trip of the full table
    dec = scan.decode_blocks(blocks, man, ["url", "warc_ts", "text", "html", "lang"])
    src = df.select(*dec.columns)
    assert dec.exceptAll(src).count() == 0
    assert src.exceptAll(dec).count() == 0
    # point lookup still prunes to one block key and finds the row
    probe = df.orderBy("url").first()
    got = scan.point_lookup(
        spark, path, probe["url"], cols=["url", "text"], man=man
    ).collect()
    assert any(r["url"] == probe["url"] for r in got)
    # decoded text identical for the probed url (the per-row invariant)
    assert [r["text"] for r in got if r["url"] == probe["url"]] == [probe["text"]]


def test_shuffle_none_rejects_unknown_mode(spark):
    df = synth.synth_webtext(spark, 50, num_partitions=1)
    with pytest.raises(ValueError, match="shuffle"):
        encode.encode_table(df, est_rows=50, shuffle="range")


# -------------------------------------------------------- compaction ----


def test_compact_maponly_reproduces_hash_layout(spark, tmp_path):
    """compact_blocks is the complement of map-only ingest: map-only
    (4 partitions) -> compact must reproduce the hash-shuffle encode's
    layout BIT-FOR-BIT (same blocks, same bytes), because block rows are
    deterministically sorted before encoding."""
    df = synth.synth_webtext(spark, 300, num_partitions=4)
    p_map = str(tmp_path / "mo")
    p_hash = str(tmp_path / "ha")
    p_cmp = str(tmp_path / "cmp")
    encode.encode_to_path(
        spark, df, p_map, target_rows_per_block=64, resolution=2, shuffle="none"
    )
    ref = encode.encode_to_path(
        spark, df, p_hash, target_rows_per_block=64, resolution=2
    )
    final = scan.compact_to_path(spark, p_map, p_cmp)
    assert final["num_rows"] == 300
    assert final["num_blocks"] == ref["num_blocks"]
    assert final["enc_bytes"] == ref["enc_bytes"]
    assert final["codec_histogram"] == ref["codec_histogram"]
    # byte-level: every (block, salt) payload identical to the hash run
    a = scan.read_blocks(spark, p_cmp).select("block", "salt", "text_blob")
    b = scan.read_blocks(spark, p_hash).select("block", "salt", "text_blob")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # and the decoded content round-trips
    man = scan.read_manifest(spark, p_cmp)
    dec = scan.decode_blocks(scan.read_blocks(spark, p_cmp), man, ["url", "text"])
    src = df.select("url", "text")
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0


def test_compact_passthrough_and_split(spark, tmp_path):
    """Already-canonical tables pass through untouched; a row cap forces
    contiguous salted sub-rows that still decode bit-exactly."""
    df = synth.synth_webtext(spark, 200, num_partitions=2)
    p = str(tmp_path / "src")
    ref = encode.encode_to_path(spark, df, p, target_rows_per_block=64, resolution=1)
    man = scan.read_manifest(spark, p)
    # passthrough: identical payload rows
    out = scan.compact_blocks(scan.read_blocks(spark, p), man)
    a = out.select("block", "salt", "text_blob")
    b = scan.read_blocks(spark, p).select("block", "salt", "text_blob")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # forced split: cap far below block size
    p2 = str(tmp_path / "split")
    final = scan.compact_to_path(spark, p, p2, max_rows_per_block=16)
    assert final["num_rows"] == 200
    assert final["num_blocks"] > ref["num_blocks"]
    man2 = scan.read_manifest(spark, p2)
    dec = scan.decode_blocks(scan.read_blocks(spark, p2), man2, ["url", "text"])
    src = df.select("url", "text")
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0


# --------------------------------------------------------- overviews ----


def test_overviews_serve_rollups_bit_identical(spark, tmp_path):
    """Materialized stats pyramids: rollups served from an overview
    level must equal rollups from the blocks table exactly (the stats
    are exactly mergeable), and the overview table must answer
    summary-style queries with ~4^r rows."""
    df = synth.synth_webtext(spark, 400, num_partitions=4).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    path = str(tmp_path / "ov")
    encode.encode_to_path(spark, df, path, target_rows_per_block=32, resolution=4)
    man = scan.read_manifest(spark, path)
    levels = scan.build_overviews(spark, path)
    assert levels == [0, 2]
    assert scan.overview_levels(spark, path) == [0, 2]
    blocks = scan.read_blocks(spark, path)
    for p in (0, 1, 2):
        direct = {
            r["block"]: (r["n_rows"], r["cnt"], r["sum"], r["min"], r["max"])
            for r in scan.rollup_stats(blocks, man, p, "n_chars").collect()
        }
        served = {
            r["block"]: (r["n_rows"], r["cnt"], r["sum"], r["min"], r["max"])
            for r in scan.rollup_stats_served(spark, path, man, p, "n_chars").collect()
        }
        assert served == direct
    # overview rows: few, payload-free, and cat counts merge exactly
    ov = scan.read_overview(spark, path, 2)
    assert ov.count() <= 4 ** 2
    got = {
        r["value"]: r["cnt"] for r in scan.cat_value_counts(ov, "lang").collect()
    }
    want = {
        r["lang"]: r["cnt"]
        for r in df.where(F.col("lang").isNotNull())
        .groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_overviews_reject_bad_levels(spark, tmp_path):
    df = synth.synth_webtext(spark, 100, num_partitions=1)
    path = str(tmp_path / "ovbad")
    encode.encode_to_path(spark, df, path, target_rows_per_block=32, resolution=2)
    with pytest.raises(ValueError):
        scan.build_overviews(spark, path, levels=[2])


# -------------------------------------------------------- edge inputs ----


def test_encode_edge_inputs(spark, tmp_path):
    """Empty tables, NULL urls, and all-NULL columns must round-trip:
    empty -> valid 0-row committed table; NULL url keys hash
    deterministically (Spark xxhash64 skips nulls -> seed-derived
    constant) and the null values survive decode bit-exactly."""
    df = synth.synth_webtext(spark, 50, num_partitions=1)

    empty = df.where(F.lit(False))
    man = encode.encode_to_path(spark, empty, str(tmp_path / "empty"))
    assert man["num_rows"] == 0 and man["num_blocks"] == 0
    assert scan.read_blocks(spark, str(tmp_path / "empty")).count() == 0

    nulls = (
        df.limit(10).withColumn("url", F.lit(None).cast("string"))
        .unionByName(df.limit(40))
    )
    p = str(tmp_path / "nullurl")
    man = encode.encode_to_path(spark, nulls, p)
    assert man["num_rows"] == 50
    dec = scan.decode_blocks(scan.read_blocks(spark, p), man, ["url", "text"])
    assert dec.count() == 50
    assert dec.where(F.col("url").isNull()).count() == 10
    got = {r["text"] for r in dec.where(F.col("url").isNull()).collect()}
    want = {r["text"] for r in nulls.where(F.col("url").isNull()).collect()}
    assert got == want

    an = df.withColumn("lang", F.lit(None).cast("string"))
    p2 = str(tmp_path / "allnull")
    man = encode.encode_to_path(spark, an, p2)
    dec = scan.decode_blocks(scan.read_blocks(spark, p2), man, ["lang"])
    assert dec.where(F.col("lang").isNull()).count() == 50


# -------------------------------------------- pipeline text ops (r2) ----


def test_canonical_url_col(spark):
    from duckdb_raquet_spark.functions import text as textfn

    rows = [
        ("HTTP://WWW.Example.COM:80/A/B?utm_source=x&z=1&a=2#frag",
         "http://www.example.com/A/B?a=2&z=1"),
        ("https://Host.com:443/", "https://host.com/"),
        ("https://h.com/p?fbclid=abc", "https://h.com/p"),
        ("https://h.com/p", "https://h.com/p"),
        ("https://h.com:8080/p?b=2&a=1", "https://h.com:8080/p?a=1&b=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r[0] for r in df.select(textfn.canonical_url_col("url")).collect()]
    assert got == [want for _, want in rows]


def test_boilerplate_ngrams_counts_distinct_docs(spark):
    from duckdb_raquet_spark.functions import text as textfn

    rows = [
        (0, "accept our cookies now please"),
        (1, "accept our cookies now thanks"),
        (2, "accept our cookies now ok ok accept our cookies now"),
        (3, "totally unrelated words here"),
        (4, "ab"),  # shorter than n -> contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["ngram"]: r["doc_freq"]
        for r in textfn.boilerplate_ngrams(df, "doc_id", "text", n=4, min_docs=3).collect()
    }
    # repeated occurrence inside doc 2 counts ONCE (distinct docs)
    assert got == {"accept our cookies now": 3}


def test_hash_sample_deterministic_and_stratified(spark):
    from duckdb_raquet_spark.functions import text as textfn

    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got1 = {r["doc_id"] for r in textfn.hash_sample(df, "doc_id", {"a": 0.5}, "s").collect()}
    got2 = {r["doc_id"] for r in textfn.hash_sample(df, "doc_id", {"a": 0.5}, "s").collect()}
    assert got1 == got2  # pure function of (id, fractions)
    assert all(i % 2 for i in got1)  # default_fraction 0 drops stratum b
    assert 350 < len(got1) < 650  # ~50% of the 1000 'a' rows


def test_ivf_index_probe_matches_adhoc(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    idx = str(tmp_path / "ivf_idx")
    similarity.build_ivf_index(emb, "vec_id", "embedding", idx, n_centroids=8)
    a = similarity.ann_ivf(
        emb, "vec_id", "embedding", q, k=5, n_probe=3, exclude_id=0,
        index_path=idx,
    ).collect()
    b = similarity.ann_ivf(
        emb, "vec_id", "embedding", q, k=5, n_centroids=8, n_probe=3,
        exclude_id=0,
    ).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in a] == [
        (r["vec_id"], round(r["score"], 9)) for r in b
    ]
    # probe predicate pushes into the parquet scan of the sorted lists
    plan = (
        spark.read.parquet(idx)
        .where(F.col("centroid_id").isin([1, 2]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(centroid_id" in plan.replace(" ", "")


# ------------------------------------------------------------- skew ----


def test_salting_bounds_hot_blocks(spark, tmp_path):
    """Hot-cell skew: at a low resolution every cell is hot, so the
    encoder must salt (n_salt > 1) and spread each cell's rows across
    salted sub-blocks; same-url rows stay co-located (salt is a url
    hash, so one url's recrawls land in ONE sub-block), and the table
    still round-trips bit-exactly."""
    df = synth.synth_webtext(spark, 400, num_partitions=4)
    path = str(tmp_path / "salted")
    final = encode.encode_to_path(
        spark, df, path, target_rows_per_block=64, max_rows_per_block=64,
        resolution=1,
    )
    man = scan.read_manifest(spark, path)
    assert man["key"]["n_salt"] > 1
    blocks = scan.read_blocks(spark, path)
    per_cell = blocks.groupBy("block").count().collect()
    assert max(r["count"] for r in per_cell) > 1  # cells actually split
    # no salted sub-block hugely above the cap (salting is hash-spread,
    # not exact-capped; 2x headroom)
    assert blocks.agg(F.max("n_rows")).first()[0] <= 2 * 64
    assert final["num_rows"] == 400
    dec = scan.decode_blocks(blocks, man, ["url", "text"])
    src = df.select("url", "text")
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0


def test_quantize_embeddings_cosine_preserved(spark):
    """Int8 quantization: codes in [-127, 127], dequantized cosine
    within 1e-2 of the exact cosine, zero vectors stay zero."""
    import numpy as np

    from duckdb_raquet_spark.functions import similarity

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 32)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    rows.append((99, [0.0] * 32))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.quantize_embeddings(emb, "vec_id", "embedding").collect()
    byid = {r["vec_id"]: r for r in out}
    assert byid[99]["q"] == [0] * 32 and byid[99]["scale"] == 0.0
    for i in range(50):
        q = np.array(byid[i]["q"], dtype=np.float64) * byid[i]["scale"]
        a = vecs[i].astype(np.float64)
        assert np.abs(q).max() <= 127 * byid[i]["scale"] + 1e-12
        cos = (q @ a) / (np.linalg.norm(q) * np.linalg.norm(a))
        assert cos > 0.999
