"""The encode job: webtext DataFrame -> sorted table of encoded blocks.

Spark-first re-expression of the reference's ingestion table function
``read_raster`` (/root/reference/src/raster/read_raster.cpp:733-1593):
its phases map onto a declarative plan —

    reference (single-process C++)          this engine (Spark)
    --------------------------------        ------------------------------
    bind: tile grid + dataset stats         key_col() + choose_resolution
    per-thread tile queue                   shuffle by (block, salt):
                                              groupBy().applyInPandas
    per-tile warp + gzip per band           per-block per-column codec
                                              auto-select (Arrow batches)
    empty-tile skip (:444-483)              .where() before encode
    metadata row emitted last (CAS :1488)   manifest row appended after
                                              all data commits
    no skew handling (uniform grid)         explicit salt column splits
                                              oversized blocks

The only shuffle in the job is the groupBy on (block, salt) — there are
no joins on the encode path, matching the reference's design (SURVEY.md
§2.3). Skew: block keys are url-hash-spread, so hot *domains* do not
create hot blocks; hot *time buckets* (crawl bursts) can — the salt
splits any block above ``max_rows_per_block`` into independently encoded
sub-blocks that readers treat as row-groups of the same logical block.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import blockkey as bk
from . import manifest as mf
from . import selector

BLOCK = "block"
SALT = "salt"

# "no CAS requested" sentinel for _commit_snapshot's expected_parent
# (None is a real value there: "the caller saw an empty snapshot log")
_NO_CAS = object()

STATS_TYPE = T.StructType(
    [
        T.StructField("n_rows", T.LongType()),
        T.StructField("raw_bytes", T.LongType()),
        T.StructField("enc_bytes", T.LongType()),
        T.StructField("ts_min", T.LongType()),
        T.StructField("ts_max", T.LongType()),
    ]
)

NUM_STAT_TYPE = T.StructType(
    [
        T.StructField("min", T.LongType()),
        T.StructField("max", T.LongType()),
        T.StructField("sum", T.LongType()),
        T.StructField("sum_sq", T.DoubleType()),
        T.StructField("cnt", T.LongType()),
    ]
)

MAX_CAT_DISTINCT = 64


def blob_col(name: str) -> str:
    return f"{name}_blob"


def member_to_group(groups: dict[str, list[str]] | None) -> dict[str, str]:
    return {m: g for g, ms in (groups or {}).items() for m in ms}


def blocks_schema(
    columns: list[dict], groups: dict[str, list[str]] | None = None
) -> T.StructType:
    """Output schema: one binary payload column per encoded input column
    (fixed columns, not a map, so Parquet prunes untouched payloads —
    the reference's single-band-fetch property,
    /root/reference/docs/PERFORMANCE_COMPARISON.md:154-156). Columns in
    a column group share ONE interleaved blob (named after the group),
    emitted at the first member's position — the interleave_bands layout
    (ref band_encoder.cpp:333-352)."""
    m2g = member_to_group(groups)
    fields = [
        T.StructField(BLOCK, T.LongType(), False),
        T.StructField(SALT, T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
    emitted: set[str] = set()
    for c in columns:
        g = m2g.get(c["name"])
        if g is None:
            # renamed columns keep their immutable physical payload name
            fields.append(
                T.StructField(blob_col(c.get("physical", c["name"])), T.BinaryType())
            )
        elif g not in emitted:
            emitted.add(g)
            fields.append(T.StructField(blob_col(g), T.BinaryType()))
    fields += [
        T.StructField("codecs", T.StringType()),
        T.StructField("stats", STATS_TYPE),
        T.StructField(
            "cat_counts", T.MapType(T.StringType(), T.MapType(T.StringType(), T.LongType()))
        ),
        T.StructField("num_stats", T.MapType(T.StringType(), NUM_STAT_TYPE)),
        T.StructField("metadata", T.StringType()),
        T.StructField("lineage", T.StringType()),
    ]
    return T.StructType(fields)


def columns_of(df: DataFrame) -> list[dict]:
    return columns_of_schema(df.schema)


def columns_of_schema(schema) -> list[dict]:
    cols = []
    for f in schema.fields:
        kind = selector.kind_of_spark_type(f.dataType.simpleString())
        cols.append({"name": f.name, "spark_type": f.dataType.simpleString(), "kind": kind})
    return cols


def _num_stat(vals: np.ndarray) -> dict:
    v = vals.astype(np.int64)
    return {
        "min": int(v.min()),
        "max": int(v.max()),
        "sum": int(v.sum()),
        "sum_sq": float(np.square(v.astype(np.float64)).sum()),
        "cnt": int(len(v)),
    }


def encode_block_arrow(
    tbl: "pa.Table",
    col_specs: list[tuple[str, str]],
    sort_cols: list[str],
    zlib_level: int,
    block: int,
    salt: int,
    ts_col: str | None,
    effort: str = selector.EFFORT_MAX,
    groups: dict[str, list[str]] | None = None,
) -> dict:
    """Encode one block's rows (an Arrow table) -> one output row dict.

    THE encode kernel for every path (batch applyInArrow, mask
    re-encode, streaming). No pandas, no per-value Python objects:
    string/binary columns never leave Arrow buffers; numerics drop to
    numpy views. Rows are deterministically ordered (ts, url,
    nulls first) so re-encoding the same block yields identical bytes
    (resume idempotency) and timestamp deltas stay small.
    """
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        tbl,
        sort_keys=[(c, "ascending") for c in sort_cols],
        null_placement="at_start",
    )
    tbl = tbl.take(idx)
    n = tbl.num_rows
    row: dict = {BLOCK: block, SALT: salt, "n_rows": n}
    codecs: dict[str, str] = {}
    cat_counts: dict[str, dict[str, int]] = {}
    num_stats: dict[str, dict] = {}
    raw_total = 0
    enc_total = 0
    ts_min = ts_max = None
    m2g = member_to_group(groups)
    pending: dict[str, dict[str, bytes]] = {}
    for name, kind, *rest in col_specs:
        force = rest[0] if rest else None
        col = tbl[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if name in m2g:
            # group member: cheap structural payload now, shared
            # compression once per group below
            payload, _, cstats = selector.encode_column_arrow(
                col, kind, zlib_level, force="plain"
            )
            pending.setdefault(m2g[name], {})[name] = payload
        else:
            payload, cname, cstats = selector.encode_column_arrow(
                col, kind, zlib_level, force=force, effort=effort
            )
            row[blob_col(name)] = payload
            codecs[name] = cname
            enc_total += len(payload)
        raw_total += cstats["raw_bytes"]
        if kind == selector.KIND_STRING:
            valid = col.drop_null()
            if len(valid):
                vc = pc.value_counts(valid)
                if 0 < len(vc) <= MAX_CAT_DISTINCT:
                    cat_counts[name] = {
                        str(f["values"]): int(f["counts"]) for f in vc.to_pylist()
                    }
                lens = pc.utf8_length(valid).to_numpy(zero_copy_only=False)
                num_stats[f"len_{name}"] = _num_stat(lens.astype(np.int64))
        elif kind == selector.KIND_INT:
            valid = col.drop_null()
            if len(valid):
                vals = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
                num_stats[name] = _num_stat(vals)
        elif kind == selector.KIND_TIMESTAMP:
            valid = col.drop_null()
            if len(valid):
                vals = (
                    valid.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                )
                st = _num_stat(vals)
                num_stats[name] = st
                if ts_col and name == ts_col:
                    ts_min, ts_max = st["min"], st["max"]
    from .codecs import registry as _registry

    for g, members in (groups or {}).items():
        inners = [pending[g][m] for m in members]
        payload = _registry.encode_group(inners, zlib_level, effort)
        row[blob_col(g)] = payload
        cname = _registry.group_codec_name(payload)
        for m in members:
            codecs[m] = cname
        enc_total += len(payload)
    row["codecs"] = json.dumps(codecs, sort_keys=True)
    row["stats"] = {
        "n_rows": n,
        "raw_bytes": raw_total,
        "enc_bytes": enc_total,
        "ts_min": ts_min,
        "ts_max": ts_max,
    }
    row["cat_counts"] = cat_counts
    row["num_stats"] = num_stats
    row["metadata"] = None
    row["lineage"] = None
    return row


def _pdf_to_arrow(pdf: pd.DataFrame, col_specs: list[tuple[str, str]]) -> "pa.Table":
    """pandas -> Arrow with the engine's explicit per-kind types (the
    mask/transform path decodes to pandas; this keeps its re-encode
    bit-consistent with the batch Arrow path)."""
    arrays, names = [], []
    for name, kind, *_ in col_specs:
        s = pdf[name]
        if kind == selector.KIND_STRING:
            arrays.append(pa.array(s, type=pa.large_string()))
        elif kind == selector.KIND_BINARY:
            arrays.append(pa.array(s, type=pa.large_binary()))
        elif kind == selector.KIND_TIMESTAMP:
            arrays.append(pa.Array.from_pandas(s, type=pa.timestamp("us")))
        elif kind == selector.KIND_DOUBLE:
            arrays.append(pa.array(s.to_numpy(dtype=np.float64), type=pa.float64()))
        else:
            arrays.append(pa.Array.from_pandas(s, type=pa.int64()))
        names.append(name)
    return pa.table(arrays, names=names)


def encode_block_pdf(
    pdf: pd.DataFrame,
    col_specs: list[tuple[str, str]],
    sort_cols: list[str],
    zlib_level: int,
    block: int,
    salt: int,
    ts_col: str | None,
    effort: str = selector.EFFORT_MAX,
    groups: dict[str, list[str]] | None = None,
) -> dict:
    """pandas wrapper over :func:`encode_block_arrow` (transform path)."""
    return encode_block_arrow(
        _pdf_to_arrow(pdf, col_specs), col_specs, sort_cols, zlib_level,
        block, salt, ts_col, effort, groups
    )


def sort_cols_for(columns: list[dict], url_col: str, ts_col: str | None) -> list[str]:
    names = {c["name"] for c in columns}
    return [c for c in (ts_col, url_col) if c and c in names] or [columns[0]["name"]]


def make_encode_fn(
    columns: list[dict], url_col: str, ts_col: str | None, zlib_level: int,
    effort: str = selector.EFFORT_MAX,
    groups: dict[str, list[str]] | None = None,
):
    """Per-(block, salt) encoder run via applyInArrow: the group arrives
    as a pa.Table (string/binary data stays in Arrow buffers — no pandas
    object materialization, which dominated memory traffic and capped
    multi-core scaling), one block row goes back as a 1-row pa.Table."""

    col_specs = [(c["name"], c["kind"], c.get("codec")) for c in columns]
    sort_cols = sort_cols_for(columns, url_col, ts_col)
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(blocks_schema(columns, groups))

    def encode_fn(key: tuple, tbl: "pa.Table") -> "pa.Table":
        block, salt = (
            k.as_py() if hasattr(k, "as_py") else int(k) for k in key
        )
        row = encode_block_arrow(
            tbl, col_specs, sort_cols, zlib_level, int(block), int(salt), ts_col,
            effort, groups,
        )
        arrays = [
            pa.array([row.get(f.name)], type=f.type) for f in arrow_schema
        ]
        return pa.Table.from_arrays(arrays, schema=arrow_schema)

    return encode_fn


def make_map_encode_fn(
    columns: list[dict], url_col: str, ts_col: str | None, zlib_level: int,
    effort: str = selector.EFFORT_MAX,
    groups: dict[str, list[str]] | None = None,
):
    """Per-PARTITION encoder run via mapInArrow — the shuffle-free
    encode path. Each input partition locally groups its rows by block
    key and emits one encoded row per (block, salt=partitionId): the
    raw bytes never cross the network. The salt dimension already
    models split blocks (hot-key salting), so readers need no changes —
    a block's rows are simply spread over as many salted rows as input
    partitions that touched it.

    The trade, explicitly: with K partitions contributing to each block
    cell, blobs are ~K× smaller, so compression degrades toward the
    small-blob regime (the reference has the same trade between tile
    size and ratio). Right when the input is already clustered by the
    key dimensions (an Iceberg table partitioned by crawl date ~ the
    time cells) — then K is small and the shuffle saved at 100 TB is
    the dominant cost. Wrong for uniformly random input at high
    resolution; use the default hash-shuffle path there."""

    col_specs = [(c["name"], c["kind"], c.get("codec")) for c in columns]
    sort_cols = sort_cols_for(columns, url_col, ts_col)
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(blocks_schema(columns, groups))
    ROWS_PER_OUT_BATCH = 32  # bound driver/exchange batch size (~blobs)

    def encode_partition(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = int(ctx.partitionId()) if ctx is not None else 0
        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        blocks_np = tbl[BLOCK].to_numpy(zero_copy_only=False)
        order = np.argsort(blocks_np, kind="stable")
        tbl = tbl.take(pa.array(order))
        blocks_np = blocks_np[order]
        bounds = np.flatnonzero(
            np.r_[True, blocks_np[1:] != blocks_np[:-1], True]
        )
        rows: list[dict] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sub = tbl.slice(int(s), int(e - s))
            rows.append(
                encode_block_arrow(
                    sub, col_specs, sort_cols, zlib_level,
                    int(blocks_np[s]), pid, ts_col, effort, groups,
                )
            )
            if len(rows) >= ROWS_PER_OUT_BATCH:
                yield _rows_to_batch(rows, arrow_schema)
                rows = []
        if rows:
            yield _rows_to_batch(rows, arrow_schema)

    return encode_partition


def make_local_group_encode_fn(
    columns: list[dict], url_col: str, ts_col: str | None, zlib_level: int,
    effort: str = selector.EFFORT_MAX,
    groups: dict[str, list[str]] | None = None,
):
    """Per-PARTITION encoder for the PLANNED placement path: every
    (block, salt) group arrives whole in one partition (the driver's
    LPT assignment + exact murmur targeting guarantee it), so the
    partition locally sorts by (block, salt) and encodes each complete
    slice — same per-group bytes as the groupBy/applyInArrow path, no
    grouping exchange semantics needed from Catalyst."""

    col_specs = [(c["name"], c["kind"], c.get("codec")) for c in columns]
    sort_cols = sort_cols_for(columns, url_col, ts_col)
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(blocks_schema(columns, groups))
    ROWS_PER_OUT_BATCH = 32

    def encode_partition(batches):
        # the plan sorts each partition by (block, salt) JVM-side
        # (spillable sort), so groups arrive CONTIGUOUS and this
        # streams them: peak Python memory is one group's slices —
        # the same bound as the grouped-exec path — never the whole
        # partition (which grows with data/bins at scale)
        rows: list[dict] = []
        cur: tuple[int, int] | None = None
        cur_slices: list["pa.RecordBatch"] = []

        def flush() -> dict | None:
            nonlocal cur_slices
            if cur is None or not cur_slices:
                return None
            tbl = pa.Table.from_batches(cur_slices)
            cur_slices = []
            return encode_block_arrow(
                tbl, col_specs, sort_cols, zlib_level,
                cur[0], cur[1], ts_col, effort, groups,
            )

        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            b_np = batch.column(names.index(BLOCK)).to_numpy(
                zero_copy_only=False
            )
            s_np = batch.column(names.index(SALT)).to_numpy(
                zero_copy_only=False
            )
            changed = np.flatnonzero(
                (b_np[1:] != b_np[:-1]) | (s_np[1:] != s_np[:-1])
            ) + 1
            bounds = np.r_[0, changed, len(b_np)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                key = (int(b_np[s]), int(s_np[s]))
                if key != cur:
                    row = flush()
                    if row is not None:
                        rows.append(row)
                        if len(rows) >= ROWS_PER_OUT_BATCH:
                            yield _rows_to_batch(rows, arrow_schema)
                            rows = []
                    cur = key
                cur_slices.append(batch.slice(int(s), int(e - s)))
        row = flush()
        if row is not None:
            rows.append(row)
        if rows:
            yield _rows_to_batch(rows, arrow_schema)

    return encode_partition


def _rows_to_batch(rows: list[dict], arrow_schema) -> "pa.RecordBatch":
    arrays = [
        pa.array([r.get(f.name) for r in rows], type=f.type)
        for f in arrow_schema
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def encode_table(
    df: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str | None = "warc_ts",
    resolution: int | None = None,
    bucket_seconds: int = bk.DEFAULT_BUCKET_SECONDS,
    est_rows: int | None = None,
    ts_range: tuple[int, int] | None = None,
    target_rows_per_block: int = 65536,
    max_rows_per_block: int = 262144,
    zlib_level: int = 6,
    chunk: tuple[int, int] | None = None,
    num_partitions: int | None = None,
    codec_overrides: dict[str, str] | None = None,
    effort: str = selector.EFFORT_MAX,
    column_groups: list[list[str]] | None = None,
    shuffle: str = "hash",
    salt_mode: str = "avg",
) -> tuple[DataFrame, dict]:
    """Lazy encode plan: input rows -> one row per (block, salt).

    ``salt_mode`` picks how the salt fan-out is sized. ``"avg"``
    (default) divides the row estimate by the cell count — free, and
    right whenever the key dimensions spread the data (url-hash always
    does). ``"sampled"`` runs one cheap sample aggregation (<=100k
    sampled rows, one narrow shuffle of key counts) to estimate the
    HOTTEST cell and sizes n_salt so even that cell's encode group
    stays under ``max_rows_per_block`` — the explicit skew lever for
    crawl-burst time buckets, where the average is small but one cell
    holds a large share of the corpus and would otherwise become a
    straggler group of unbounded memory. Estimate is sampling-based
    (±error at 100k samples is a few percent); n_salt is rounded up.

    ``shuffle`` picks how rows reach their encode group: ``"hash"``
    (default) is one hash repartition on (block, salt) — every block's
    rows are co-located, one encoded row per (block, salt). ``"none"``
    is the map-only path (:func:`make_map_encode_fn`): zero raw-byte
    shuffle, salt = input partition id, K× more (smaller) block rows
    when K partitions touch a cell — the explicit scale lever for
    inputs already clustered by the key dimensions.

    Returns (blocks_df, unfinalized manifest). The ONLY shuffle is a
    range repartition on (block, salt) placed BEFORE the groupBy —
    range partitioning satisfies the grouping's clustered-distribution
    requirement, so Catalyst adds no second exchange, and the encoded
    output comes out globally block-ordered for free (row-group pruning
    needs it; the reference's ORDER BY block, README.md:259-261).
    ``ts_range`` = (min_epoch, max_epoch) skips the bind-time min/max
    scan of the timestamp column. ``chunk`` = (k, n_chunks) restricts
    the plan to one deterministic slice of the key space before the
    shuffle (checkpoint-resume granule).
    """
    columns = columns_of(df)
    names = {c["name"] for c in columns}
    if url_col not in names:
        raise ValueError(f"url_col {url_col!r} not in {sorted(names)}")
    groups: dict[str, list[str]] | None = None
    if column_groups:
        groups = {}
        seen: set[str] = set()
        for members in column_groups:
            if len(members) < 2:
                raise ValueError("a column group needs >= 2 members")
            for m in members:
                if m not in names:
                    raise ValueError(f"group member {m!r} not a column")
                if m in seen:
                    raise ValueError(f"column {m!r} in more than one group")
                if codec_overrides and m in codec_overrides:
                    raise ValueError(
                        f"column {m!r} cannot have both a codec override "
                        "and a group (the group owns its compression)"
                    )
                seen.add(m)
            groups["+".join(members)] = list(members)
    if codec_overrides:
        # explicit per-column codec, the reference encoder's `compression`
        # parameter re-expressed per column (read_raster named param,
        # /root/reference/src/raster/read_raster.cpp:733-1100); recorded
        # in the manifest so mask/streaming re-encodes honor it too
        unknown = set(codec_overrides) - names
        if unknown:
            raise ValueError(f"codec_overrides for unknown columns {sorted(unknown)}")
        for c in columns:
            if c["name"] in codec_overrides:
                selector.validate_override(c["kind"], codec_overrides[c["name"]])
                c["codec"] = codec_overrides[c["name"]]
    if ts_col is not None and ts_col not in names:
        ts_col = None
    if est_rows is None:
        est_rows = df.count()
    res = (
        resolution
        if resolution is not None
        else bk.choose_resolution(est_rows, target_rows_per_block)
    )
    if ts_col is None:
        ts_origin, eff_bucket = 0, bucket_seconds
    else:
        if ts_range is None:
            r = df.agg(
                F.min(F.unix_timestamp(ts_col)), F.max(F.unix_timestamp(ts_col))
            ).first()
            ts_range = (int(r[0] or 0), int(r[1] or 0))
        ts_origin, eff_bucket = bk.ts_params(
            ts_range[0], ts_range[1], res, bucket_seconds
        )
    cells = 4**res

    key = bk.key_col(
        F.col(url_col),
        F.col(ts_col) if ts_col else None,
        res,
        eff_bucket,
        ts_origin,
    )
    if salt_mode == "sampled":
        frac = min(1.0, 100_000 / max(est_rows, 1))
        hot = (
            df.sample(fraction=frac, seed=42)
            .select(key)
            .groupBy(BLOCK)
            .count()
            .agg(F.max("count"))
            .first()[0]
            or 0
        )
        est_max_cell = int(hot / frac)
        n_salt = max(1, math.ceil(est_max_cell / max_rows_per_block))
    elif salt_mode == "avg":
        n_salt = max(1, math.ceil(est_rows / max(cells, 1) / max_rows_per_block))
    else:
        raise ValueError(f"salt_mode must be 'avg' or 'sampled', got {salt_mode!r}")
    salt = (
        F.pmod(F.xxhash64(F.col(url_col), F.lit(7)), F.lit(n_salt)).cast("int")
        if n_salt > 1
        else F.lit(0).cast("int")
    )
    keyed = df.withColumn(BLOCK, key).withColumn(SALT, salt)
    if chunk is not None:
        k, n_chunks = chunk
        keyed = keyed.where(
            F.pmod(F.xxhash64(F.col(BLOCK), F.col(SALT)), F.lit(n_chunks)) == k
        )

    spark = df.sparkSession
    schema = blocks_schema(columns, groups)
    if shuffle == "none":
        blocks = keyed.mapInArrow(
            make_map_encode_fn(columns, url_col, ts_col, zlib_level, effort, groups),
            schema=schema,
        )
    elif shuffle == "hash":
        p = max(2, spark.sparkContext.defaultParallelism)
        # Group placement. Hashing (block, salt) keys into p partitions
        # leaves the codec-bound encode stage straggler-bound: group
        # sizes are Zipf-ish (hot cells ~8x the median rows) and
        # balls-into-bins stacking adds to it — measured max/median
        # task time 1.73 on the 2.6 GB table, ~65% core efficiency.
        # Merely oversampling the width does NOT pay (~0.1 s per-task
        # Python-exec overhead outgrows the balance win; measured flat
        # 19-22 s across n_parts 32..1024, and 2.4 s -> 5.8 s at
        # fast effort). Instead, when the job is heavy enough and the
        # key space enumerable, spend one narrow pre-pass on per-group
        # row counts, LPT-pack groups into byte-near-equal bins
        # driver-side, and address each bin's exact shuffle partition
        # through a searched murmur representative (placement.py);
        # grouping then happens locally inside each partition
        # (mapInArrow), since every group lands whole. Guide §8:
        # decide placement with small rows, move the payload bytes
        # once. Light jobs (deltas, micro-batches) and huge key spaces
        # (driver-metadata bound) keep the plain hash placement.
        planned = (
            num_partitions is None
            and effort == selector.EFFORT_MAX  # bz2-led kernel: ~1.5 s per
            # median group, where balance dominates; at fast effort the
            # zstd-led groups are ~10x cheaper and the pre-pass +
            # per-task overhead outweigh the balance win (measured:
            # noop-isolated fast encode 4.4-6.2 s groupBy vs 5.6-6.5 s
            # planned; max-effort stage 20.5 s -> 14.5 s planned) —
            # the decode rebalance's codec-gate rationale
            and cells * n_salt <= 65536  # driver-metadata bound
            and est_rows >= 64 * target_rows_per_block  # pre-pass ≪ encode
        )
        if planned:
            from . import placement

            counts = (
                keyed.groupBy(BLOCK, SALT)
                .agg(F.count(F.lit(1)).alias("_n"))
                .collect()
            )
            # 2 waves of byte-equal bins: one wave leaves the wall
            # hostage to a single slow bin (measured 16.0-24.6 s noop-
            # isolated vs 13.3-14.3 s at 2x), four pay ~0.1 s/task
            # Python-exec overhead for insurance the LPT packing no
            # longer needs (14.6-15.3 s) — 2x measured best
            n_parts = 2 * p
            pids = placement.lpt_bins([int(r["_n"]) for r in counts], n_parts)
            reps = placement.partition_reps(n_parts)
            plan_df = spark.createDataFrame(
                [
                    (int(r[BLOCK]), int(r[SALT]), reps[pid])
                    for r, pid in zip(counts, pids)
                ],
                schema=f"{BLOCK} long, {SALT} int, _px long",
            )
            # left join: a group the pre-pass missed (impossible for a
            # deterministic source) still encodes, placed arbitrarily
            keyed = keyed.join(F.broadcast(plan_df), on=[BLOCK, SALT], how="left")
            # JVM-side (spillable) per-partition sort so the Python
            # encoder can STREAM contiguous groups instead of
            # materializing its whole partition (bins grow with
            # data at scale; one group is the memory bound either way)
            blocks = (
                keyed.repartition(n_parts, "_px")
                .sortWithinPartitions(BLOCK, SALT)
                .mapInArrow(
                    make_local_group_encode_fn(
                        columns, url_col, ts_col, zlib_level, effort, groups
                    ),
                    schema=schema,
                )
            )
        else:
            n_parts = num_partitions or p
            # hash repartition (satisfies the groupBy's clustered
            # distribution -> no second exchange) — NOT
            # repartitionByRange, whose boundary sampling executes the
            # whole child an extra time (a full input scan here);
            # global block order is restored cheaply on the encoded
            # rows in write_blocks, which are ~5x smaller than input
            keyed = keyed.repartition(n_parts, BLOCK, SALT)
            encode_fn = make_encode_fn(
                columns, url_col, ts_col, zlib_level, effort, groups
            )
            blocks = keyed.groupBy(BLOCK, SALT).applyInArrow(encode_fn, schema=schema)
    else:
        raise ValueError(f"shuffle must be 'hash' or 'none', got {shuffle!r}")

    man = mf.build_manifest(
        columns=columns,
        resolution=res,
        bucket_seconds=eff_bucket,
        ts_origin=ts_origin,
        url_col=url_col,
        ts_col=ts_col,
        n_salt=n_salt,
        extra={"effort": effort, "column_groups": groups, "shuffle": shuffle},
    )
    return blocks, man


# ----------------------------------------------------------------- write ----


def _data_path(path: str) -> str:
    return os.path.join(path, "data")


def _aggregate_written(
    spark: SparkSession, path: str, visible_chunks: list[int] | None = None
) -> tuple[dict, dict]:
    """Single columnar pass over stats/codecs (payloads pruned) to
    finalize the manifest after data commit: grouping by the codecs JSON
    (few distinct combos) yields totals and the codec histogram from one
    job. ``visible_chunks`` restricts the pass to a snapshot's chunk set
    (partition-pruned) so rolled-back chunk dirs never pollute totals."""
    df = spark.read.parquet(_data_path(path))
    if visible_chunks is not None:
        df = df.where(F.col("chunk").isin([int(c) for c in visible_chunks]))
    rows = (
        df.where(F.col(BLOCK) != bk.MANIFEST_BLOCK)
        .groupBy("codecs")
        .agg(
            F.count("*").alias("num_blocks"),
            F.sum("n_rows").alias("num_rows"),
            F.sum("stats.raw_bytes").alias("raw_bytes"),
            F.sum("stats.enc_bytes").alias("enc_bytes"),
        )
        .collect()
    )
    hist: dict[str, dict[str, int]] = {}
    totals = {"num_blocks": 0, "num_rows": 0, "raw_bytes": 0, "enc_bytes": 0}
    for r in rows:
        totals["num_blocks"] += r["num_blocks"]
        totals["num_rows"] += int(r["num_rows"] or 0)
        totals["raw_bytes"] += int(r["raw_bytes"] or 0)
        totals["enc_bytes"] += int(r["enc_bytes"] or 0)
        for col, codec in json.loads(r["codecs"]).items():
            h = hist.setdefault(col, {})
            h[codec] = h.get(codec, 0) + r["num_blocks"]
    return totals, hist


def _commit_snapshot(
    spark: SparkSession,
    path: str,
    *,
    chunks: list[int],
    op: str,
    final: dict,
    extra: dict | None = None,
    expected_parent: dict | None = _NO_CAS,
) -> dict:
    """Append the next snapshot to the table's `_snapshots/` log
    (Iceberg-style history: every commit names its visible chunk set).
    Idempotent against re-finalization: a resumed encode that re-runs
    after completion sees an identical current snapshot and writes
    nothing.

    ``expected_parent`` (a snapshot dict, or None meaning "the caller
    saw an empty log") turns the commit into a compare-and-swap on the
    caller's base-manifest read: if another writer advanced the log
    since, ConcurrentCommitError is raised instead of committing a
    manifest that silently drops the concurrent change (e.g. an
    append racing a delete_rows would otherwise re-finalize from a
    base without the new delete entry). Pass the snapshot returned by
    ``mf.committed_manifest``. The sentinel ``_NO_CAS`` (default)
    keeps the legacy last-writer-wins behavior for single-writer
    paths."""
    # carry the live delete-file list into EVERY snapshot so readers at
    # any snapshot id (and after expire_snapshots) resolve row-level
    # deletes without walking to an older commit
    if final.get("delete_files") and not (extra or {}).get("delete_files"):
        extra = dict(extra or {})
        extra["delete_files"] = final["delete_files"]
    # the full manifest rides in the snapshot file (mf.committed_manifest)
    extra = dict(extra or {})
    extra.setdefault("manifest", final)
    cur = mf.current_snapshot(path, spark)
    if (
        cur is not None
        and cur["chunks"] == sorted(chunks)
        and cur["op"] == op
        # totals must match too: re-encoding DIFFERENT data over an
        # existing path is an overwrite commit, not a resume no-op
        and cur.get("num_rows") == final.get("num_rows")
        and cur.get("enc_bytes") == final.get("enc_bytes")
        # and the delete-file list: a rollback FORWARD to a delete
        # snapshot changes only this — swallowing it would desync the
        # snapshot log from the sidecar (divergent reads, and expiry
        # could reclaim a delete dir the sidecar still references)
        and cur.get("delete_files") == (extra or {}).get("delete_files")
    ):
        return cur
    if expected_parent is not _NO_CAS:
        seen = expected_parent["snapshot_id"] if expected_parent else None
        now = cur["snapshot_id"] if cur else None
        if seen != now:
            raise mf.ConcurrentCommitError(
                f"snapshot log at {path} advanced from {seen} to {now} "
                "since this writer read its base manifest; re-read and "
                "retry the operation"
            )
    snap = mf.make_snapshot(
        snapshot_id=(cur["snapshot_id"] + 1) if cur else 0,
        chunks=chunks,
        op=op,
        parent_id=cur["snapshot_id"] if cur else None,
        num_rows=final.get("num_rows"),
        enc_bytes=final.get("enc_bytes"),
        extra=extra,
    )
    mf.write_snapshot(path, snap, spark)
    return snap


def _append_manifest_row(
    spark: SparkSession,
    path: str,
    man: dict,
    columns: list[dict],
    *,
    target: str | None = None,
    mode: str = "append",
) -> None:
    # written driver-side with pyarrow into the committed data dir: a
    # 1-row DataFrame write costs a whole Spark job (scheduling + commit
    # protocol), measurable against the encode wall at cluster sizes.
    # The bytes route through fsio — plain paths hit the local FS, any
    # ``scheme://`` path goes through the Hadoop FileSystem API, so the
    # manifest-last invariant holds on object stores too.
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    from . import fsio

    dest = target or _data_path(path)
    if mode == "overwrite":
        fsio.delete_dir(spark, dest)
    arrow_schema = to_arrow_schema(blocks_schema(columns, man.get("column_groups")))
    values = {
        BLOCK: bk.MANIFEST_BLOCK,
        SALT: 0,
        "n_rows": 0,
        "metadata": mf.to_json(man),
    }
    tbl = pa.table(
        {f.name: [values.get(f.name)] for f in arrow_schema},
        schema=arrow_schema,
    )
    sink = pa.BufferOutputStream()
    pq.write_table(tbl, sink)
    fsio.write_bytes(
        spark, dest, "part-manifest-row.parquet", sink.getvalue().to_pybytes()
    )


def write_blocks(
    blocks: DataFrame,
    path: str,
    man: dict,
    columns: list[dict],
    *,
    mode: str = "overwrite",
    sorted: bool = True,
) -> dict:
    """Write blocks, then finalize + append the manifest row LAST — the
    reference's metadata-row-after-all-data invariant, distributed.

    ``sorted=True`` (default) range-partitions + in-file sorts the
    ENCODED rows so output files are globally block-ordered (file- and
    row-group-level min/max pruning, the reference's ORDER BY block,
    README.md:259-261). The range sampler executes the child plan a
    second time, so the encoded blocks are persisted MEMORY_AND_DISK for
    the duration — the job's one cluster-memory pressure point.

    ``sorted=False`` is the memory-hardened alternative for encodes
    whose blocks exceed cluster memory: each encode task streams its
    partition straight to its own file — no persist, no second pass, no
    exchange after the encode shuffle. Files keep only per-task locality
    (hash-partitioned keys), so scans prune at row-group rather than
    file granularity until :func:`scan.compact_to_path` rewrites the
    table into the canonical sorted layout (bit-identical blocks)."""
    spark = blocks.sparkSession
    if sorted:
        from pyspark import StorageLevel

        blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_files = max(2, spark.sparkContext.defaultParallelism)
            (
                blocks.repartitionByRange(n_files, BLOCK, SALT)
                .sortWithinPartitions(BLOCK, SALT)
                .write.mode(mode)
                .parquet(_data_path(path))
            )
        finally:
            blocks.unpersist()
    else:
        blocks.sortWithinPartitions(BLOCK, SALT).write.mode(mode).parquet(
            _data_path(path)
        )
    totals, hist = _aggregate_written(spark, path)
    final = mf.finalize_manifest(man, codec_histogram=hist, **totals)
    _append_manifest_row(spark, path, final, columns)
    mf.write_sidecar(path, final, spark)
    return final


def encode_to_path(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    chunks: int = 1,
    resume: bool = False,
    url_col: str = "url",
    ts_col: str | None = "warc_ts",
    **kwargs,
) -> dict:
    """End-to-end encode job with optional chunked checkpoint-resume.

    ``chunks > 1`` splits the block-key space into deterministic chunk
    ids; each chunk is an independently committed Spark job followed by a
    per-chunk lineage record (rows, bytes, wall seconds). ``resume=True``
    skips chunks whose lineage record exists — re-running a half-finished
    encode does not duplicate or re-encode completed chunks. Chunk ids
    derive from (block, salt), so an encode unit never spans chunks.
    """
    est_rows = kwargs.pop("est_rows", None)
    columns = columns_of(df)
    need_ts = (
        ts_col is not None
        and kwargs.get("ts_range") is None
        and ts_col in {f.name for f in df.schema.fields}
    )
    if est_rows is None or need_ts:
        # one bind-time stats job for count + ts min/max (on Iceberg these
        # come free from table/column metadata; here a column-pruned scan)
        aggs = [F.count("*")]
        if need_ts:
            aggs += [F.min(F.unix_timestamp(ts_col)), F.max(F.unix_timestamp(ts_col))]
        r = df.agg(*aggs).first()
        if est_rows is None:
            est_rows = int(r[0])
        if need_ts:
            kwargs["ts_range"] = (int(r[1] or 0), int(r[2] or 0))

    sorted_write = kwargs.pop("sorted_write", True)
    if chunks <= 1:
        blocks, man = encode_table(
            df, url_col=url_col, ts_col=ts_col, est_rows=est_rows, **kwargs
        )
        man["lineage_chunks"] = 1
        if not sorted_write:
            man["sorted"] = False
        t0 = time.time()
        final = write_blocks(blocks, path, man, columns, sorted=sorted_write)
        mf.write_chunk_lineage(
            path,
            0,
            {
                "chunk": 0,
                "rows": final["num_rows"],
                "raw_bytes": final["raw_bytes"],
                "enc_bytes": final["enc_bytes"],
                "wall_seconds": round(time.time() - t0, 3),
                "input_rows": est_rows,
            },
            spark,
        )
        _commit_snapshot(
            spark, path, chunks=[0], op="encode", final=final,
            extra={"layout": "flat"},
        )
        return final

    # chunked mode: each chunk is an idempotent overwrite of its own
    # chunk=<k> subdirectory — re-running a chunk after a mid-write crash
    # can never duplicate rows (no append anywhere), and the lineage
    # record is written strictly after the chunk's job commit.
    done = mf.read_chunk_lineage(path, spark) if resume else {}
    man = None
    files_per_chunk = max(1, spark.sparkContext.defaultParallelism // chunks)
    for k in range(chunks):
        blocks, chunk_man = encode_table(
            df,
            url_col=url_col,
            ts_col=ts_col,
            est_rows=est_rows,
            chunk=(k, chunks),
            num_partitions=files_per_chunk,
            **kwargs,
        )
        man = chunk_man
        if k in done:
            continue
        t0 = time.time()
        part_path = os.path.join(_data_path(path), f"chunk={k}")
        if sorted_write:
            from pyspark import StorageLevel

            blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                (
                    blocks.repartitionByRange(files_per_chunk, BLOCK, SALT)
                    .sortWithinPartitions(BLOCK, SALT)
                    .write.mode("overwrite")
                    .parquet(part_path)
                )
            finally:
                blocks.unpersist()
        else:
            blocks.sortWithinPartitions(BLOCK, SALT).write.mode(
                "overwrite"
            ).parquet(part_path)
        agg = (
            spark.read.parquet(part_path)
            .agg(F.count("*"), F.sum("n_rows"), F.sum("stats.raw_bytes"), F.sum("stats.enc_bytes"))
            .first()
        )
        mf.write_chunk_lineage(
            path,
            k,
            {
                "chunk": k,
                "wall_seconds": round(time.time() - t0, 3),
                "blocks": agg[0],
                "rows": int(agg[1] or 0),
                "raw_bytes": int(agg[2] or 0),
                "enc_bytes": int(agg[3] or 0),
            },
            spark,
        )
    man["lineage_chunks"] = chunks
    if not sorted_write:
        man["sorted"] = False
    # aggregate ONLY this encode's chunk set: a stale orphan chunk dir
    # (a crashed append, a rollback awaiting expiry) must not inflate
    # the fresh table's totals
    totals, hist = _aggregate_written(
        spark, path, visible_chunks=list(range(chunks))
    )
    final = mf.finalize_manifest(man, codec_histogram=hist, **totals)
    # manifest row last, in its own chunk=-1 partition, overwrite =
    # exactly-once (the CAS analog, read_raster.cpp:1488)
    _append_manifest_row(
        spark,
        path,
        final,
        columns,
        target=os.path.join(_data_path(path), "chunk=-1"),
        mode="overwrite",
    )
    mf.write_sidecar(path, final, spark)
    _commit_snapshot(
        spark, path, chunks=list(range(chunks)), op="encode", final=final
    )
    return final


def append_chunk(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    zlib_level: int = 6,
    effort: str = selector.EFFORT_MAX,
    codec_overrides: dict[str, str] | None = None,
    shuffle: str = "hash",
    staged: bool = False,
    _replace_chunks: list[int] | None = None,
    _op: str = "append",
    _expected_parent=_NO_CAS,
) -> dict:
    """Append new rows to a committed CHUNKED table as the next chunk —
    the sanctioned append path (the datasource rejects ``mode('append')``
    because task-level appends would desync the manifest; this one
    re-finalizes the manifest strictly AFTER the chunk's data commit,
    the same invariant as streaming ingest, whose per-micro-batch commit
    is exactly one append_chunk).

    Key geometry (resolution / bucket / origin) is pinned from the
    existing manifest so old and new chunks share one block-key space;
    the appended chunk is an idempotent overwrite of its own
    ``chunk=<k>`` directory. Only chunked-layout tables can append
    (a flat table's data files sit where partition discovery would put
    the chunk dirs) — encode with ``chunks>=1``? flat tables raise.

    Concurrency: the final commit is a CAS on the snapshot observed
    here — if another writer (e.g. a delete_rows) commits in between,
    ConcurrentCommitError is raised; the already-written chunk dir and
    lineage record are harmless (the chunk id is burned, the dir is
    unreferenced until expiry) and re-running the append succeeds
    under a fresh id with the concurrent change folded in.

    The private ``_replace_chunks`` / ``_op`` / ``_expected_parent``
    hooks serve :func:`compact_chunks`: the new chunk's commit then
    REPLACES the given visible chunks instead of adding to them, and
    the CAS anchors to the snapshot at which the caller derived the
    replacement set (its decode + delete-entry capture point), not to
    this function's own re-read — a delete committed between the two
    reads must fail the compaction, or its keys would be missing from
    the rewritten chunk while its entry (seq < new chunk id) no longer
    applies to it."""
    if staged and (_replace_chunks or _op != "append"):
        raise ValueError("only plain appends can be staged")
    man, base_snap = mf.committed_manifest(path, spark)
    if staged and base_snap is None:
        # pre-snapshot-log readers plan every chunk dir on disk, so a
        # "staged" chunk would be visible immediately — the opposite of
        # the WAP contract
        raise ValueError(
            "staged appends need a snapshot-log table (pre-log tables "
            "read all chunk dirs); append once to create the log first"
        )
    if _expected_parent is not _NO_CAS:
        seen = _expected_parent["snapshot_id"] if _expected_parent else None
        now = base_snap["snapshot_id"] if base_snap else None
        if seen != now:
            raise mf.ConcurrentCommitError(
                f"snapshot log at {path} advanced from {seen} to {now} "
                "since the replacement set was derived; re-read and retry"
            )
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    # layout check must look at the DATA directory, not lineage: the
    # flat (chunks=1) encode also writes a chunk-00000.json lineage
    # record, but its parquet files sit directly under data/ where a
    # chunk=<k> subdirectory would break partition discovery
    if not _is_chunked(spark, path):
        raise ValueError(
            "append_chunk needs a chunked-layout table (data/chunk=*/); "
            "this table was written flat — compact or re-encode chunked"
        )
    done = mf.read_chunk_lineage(path, spark)
    claimed = mf.read_chunk_lineage(path, spark, include_claims=True)
    k = max(claimed, default=-1) + 1
    # claim the chunk id EXCLUSIVELY before any data write: two racing
    # appenders that both saw max(done)=k-1 would otherwise both
    # overwrite data/chunk=<k> — the snapshot CAS protects metadata,
    # but the loser's in-flight overwrite could clobber the winner's
    # committed files. The claim is the lineage filename itself
    # (create-or-fail, like the snapshot CAS); it is overwritten with
    # the real record after the data lands, and a crash in between
    # burns the id exactly like a lost snapshot CAS does.
    from . import fsio as _fsio

    while True:
        try:
            _fsio.write_bytes_exclusive(
                spark,
                mf.lineage_dir(path),
                f"chunk-{k:05d}.json",
                json.dumps({"chunk": k, "claimed": True}).encode(),
            )
            break
        except FileExistsError:
            k += 1
    # visible set comes from the snapshot log when present (a rollback
    # leaves orphaned chunk dirs on disk that must not rejoin the table
    # through an append's re-finalization); pre-log tables see all
    # lineage chunks, exactly the old behavior
    cur_snap = base_snap
    visible = cur_snap["chunks"] if cur_snap else sorted(done)
    replace = sorted(int(c) for c in (_replace_chunks or []))
    if replace:
        missing = set(replace) - {int(c) for c in visible}
        if missing:
            raise ValueError(
                f"chunks {sorted(missing)} are not visible at the current "
                f"snapshot (visible: {sorted(int(c) for c in visible)})"
            )
    visible = [int(c) for c in visible if int(c) not in set(replace)]
    # schema evolution: an appended frame may omit columns added after
    # the original encode — fill their recorded defaults, then align
    # column order to the manifest's
    for c in man["columns"]:
        if c["name"] not in df.columns and "added_snapshot" in c:
            df = df.withColumn(
                c["name"], F.lit(c.get("default")).cast(c["spark_type"])
            )
    man_names = [c["name"] for c in man["columns"]]
    if df.columns != man_names and set(df.columns) == set(man_names):
        df = df.select(*man_names)
    # renamed columns: encode under the immutable PHYSICAL payload name
    # so this chunk's blobs line up with every older chunk's
    for c in man["columns"]:
        p = c.get("physical", c["name"])
        if p != c["name"] and c["name"] in df.columns:
            df = df.withColumnRenamed(c["name"], p)
    key = man["key"]
    n = df.count()
    t0 = time.time()
    blocks, chunk_man = encode_table(
        df,
        url_col=man["url_col"],
        ts_col=man["ts_col"],
        resolution=key["resolution"],
        bucket_seconds=key["bucket_seconds"],
        ts_range=(key["ts_origin"], key["ts_origin"]),  # pinned geometry
        est_rows=n,
        zlib_level=zlib_level,
        effort=effort,
        codec_overrides=codec_overrides,
        shuffle=shuffle,
    )
    chunk_man["key"]["ts_origin"] = key["ts_origin"]
    expected = [
        (c.get("physical", c["name"]), c["spark_type"]) for c in man["columns"]
    ]
    if [(c["name"], c["spark_type"]) for c in chunk_man["columns"]] != expected:
        raise ValueError(
            "appended DataFrame columns do not match the table's: "
            f"{[(c['name'], c['spark_type']) for c in chunk_man['columns']]} "
            f"vs {expected}"
        )
    # carry evolution metadata through re-finalization: the new chunk's
    # plain column specs would otherwise shed added_snapshot/default
    # annotations and the schema_evolved reader switch
    chunk_man["columns"] = man["columns"]
    for _k in ("schema_evolved", "dropped_columns", "delete_files"):
        if _k in man:
            chunk_man[_k] = man[_k]
    part = os.path.join(_data_path(path), f"chunk={k}")
    blocks.sortWithinPartitions(BLOCK, SALT).write.mode("overwrite").parquet(part)
    totals, hist = _aggregate_written(
        spark, path, visible_chunks=list(visible) + [k]
    )
    chunk_man["lineage_chunks"] = k + 1
    final = mf.finalize_manifest(chunk_man, codec_histogram=hist, **totals)
    if not staged:
        # staged commits must stay invisible: the chunk=-1 manifest
        # row and the sidecar are what pre-log readers plan from
        _append_manifest_row(
            spark,
            path,
            final,
            man["columns"],
            target=os.path.join(_data_path(path), "chunk=-1"),
            mode="overwrite",
        )
        mf.write_sidecar(path, final, spark)
    # lineage records THIS chunk's bytes (aggregate the chunk=<k>
    # partition alone, as the chunked encode loop does) — the finalized
    # manifest's raw/enc_bytes are whole-table totals and would
    # over-report the appended chunk
    crow = (
        spark.read.parquet(part)
        .agg(
            F.sum("stats.raw_bytes").alias("raw"),
            F.sum("stats.enc_bytes").alias("enc"),
        )
        .collect()[0]
    )
    mf.write_chunk_lineage(
        path,
        k,
        {
            "chunk": k,
            "rows": n,
            "raw_bytes": int(crow["raw"] or 0),
            "enc_bytes": int(crow["enc"] or 0),
            "wall_seconds": round(time.time() - t0, 3),
            **(
                {"compacted_from": replace} if replace else {"appended": True}
            ),
            **({"staged": True} if staged else {}),
        },
        spark,
    )
    if staged:
        # write-audit-publish: park the would-be commit under _staged/
        # instead of the snapshot log — no reader of the table sees the
        # new chunk until publish_staged turns this record into a real
        # snapshot (under the same CAS as any commit)
        rec = {
            "token": uuid.uuid4().hex[:12],
            "op": _op,
            "chunk": k,
            "parent_snapshot_id": (
                base_snap["snapshot_id"] if base_snap else None
            ),
            "chunks": sorted(list(visible) + [k]),
            "manifest": final,
            "created_unix": int(time.time()),
        }
        mf.write_staged(path, rec, spark)
        return rec
    _commit_snapshot(
        spark, path, chunks=list(visible) + [k], op=_op, final=final,
        expected_parent=base_snap,
        extra={"compacted_from": replace, "into": k} if replace else None,
    )
    return final


def rollback_to_tag(spark: SparkSession, path: str, name: str) -> dict:
    """Roll the table back to the state a tag pins (Iceberg's
    ``rollback_to_snapshot(table.refs['tag'].snapshot_id)`` shorthand):
    resolve the ref, then :func:`rollback_to_snapshot`. The tag's pin
    guarantees the target snapshot (and its files) still exist — a
    tagged state is always restorable, however much ingest and expiry
    happened since."""
    return rollback_to_snapshot(spark, path, mf.resolve_ref(path, name, spark))


def rollback_to_snapshot(spark: SparkSession, path: str, snapshot_id: int) -> dict:
    """Roll a chunked table back to an earlier snapshot's visible chunk
    set (Iceberg rollback semantics: a NEW snapshot is committed whose
    chunk set equals the target's — history is append-only, nothing is
    deleted, and the rolled-back chunks' directories stay on disk,
    unreferenced). The manifest row and sidecar are re-finalized over
    the target's chunks only, so totals/codec histogram reflect the
    restored table; a later append_chunk picks a fresh chunk id and
    aggregates the visible set, never resurrecting orphans."""
    snaps = mf.read_snapshots(path, spark)
    if snapshot_id not in snaps:
        raise KeyError(
            f"no snapshot {snapshot_id} at {path}; have {sorted(snaps)}"
        )
    target = snaps[snapshot_id]
    if target.get("layout") == "flat":
        raise ValueError("flat tables have a single snapshot; nothing to roll back")
    man, base_snap = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    man = dict(man)
    # restore the delete-file list VISIBLE AT the target snapshot
    # (every commit since row-level deletes carries the live list; a
    # snapshot without the key predates all deletes), remapped through
    # renames committed since — the rollback snapshot is NEW, so reads
    # at it cannot replay those renames themselves
    dl = mf.remap_delete_entries(
        snaps, snapshot_id, target.get("delete_files", [])
    )
    if dl:
        man["delete_files"] = dl
    else:
        man.pop("delete_files", None)
    totals, hist = _aggregate_written(
        spark, path, visible_chunks=target["chunks"]
    )
    man["lineage_chunks"] = max(target["chunks"]) + 1
    final = mf.finalize_manifest(man, codec_histogram=hist, **totals)
    _append_manifest_row(
        spark,
        path,
        final,
        man["columns"],
        target=os.path.join(_data_path(path), "chunk=-1"),
        mode="overwrite",
    )
    mf.write_sidecar(path, final, spark)
    _commit_snapshot(
        spark,
        path,
        chunks=list(target["chunks"]),
        op="rollback",
        final=final,
        extra={"rolled_back_to": snapshot_id},
        expected_parent=base_snap,
    )
    return final


def create_tag(
    spark: SparkSession, path: str, name: str, snapshot_id: int | None = None
) -> dict:
    """Iceberg ``CREATE TAG`` analog: an immutable named pointer to a
    snapshot (default: the current tip). Tagged snapshots — and through
    them their chunk dirs and equality-delete files — are protected
    from ``expire_snapshots`` for as long as the tag exists, so a tag
    pins a reproducible table state (the "corpus-v3 trained on THIS"
    release workflow) across ongoing CDC ingest and maintenance.
    Creation is a CAS (exclusive file create): racing writers on the
    same name cannot both win, and re-pointing requires an explicit
    ``drop_tag`` + ``create_tag``."""
    snaps = mf.read_snapshots(path, spark)
    if not snaps:
        raise FileNotFoundError(f"no snapshot log at {path}")
    sid = max(snaps) if snapshot_id is None else int(snapshot_id)
    if sid not in snaps:
        raise KeyError(f"no snapshot {sid} at {path}; have {sorted(snaps)}")
    return mf.write_ref(path, name, sid, spark)


def drop_tag(spark: SparkSession, path: str, name: str) -> None:
    """Remove a tag; its snapshot becomes expirable again."""
    mf.delete_ref(path, name, spark)


def list_tags(spark: SparkSession, path: str) -> dict[str, dict]:
    """All named refs as ``{name: {name, snapshot_id, kind}}``."""
    return mf.read_refs(path, spark)


def list_staged(spark: SparkSession, path: str) -> dict[str, dict]:
    """Staged write-audit-publish commits awaiting publish, keyed by
    token (see :func:`append_chunk` ``staged=True``)."""
    return mf.read_staged(path, spark)


def publish_staged(
    spark: SparkSession, path: str, token: str, *, rebase: bool = False
) -> dict:
    """Publish a staged append (Iceberg write-audit-publish, the
    cherry-pick step): turn the parked ``_staged/`` record into a real
    snapshot under the same CAS as any commit. If the snapshot log
    advanced since staging, the default is to refuse (the audit ran
    against a stale base); ``rebase=True`` re-anchors the append onto
    the CURRENT snapshot — safe for plain appends (the new chunk's
    payloads are self-contained; only the visible set and totals
    change) provided the schema is unchanged."""
    rec = mf.get_staged(path, token, spark)
    cur_man, cur_snap = mf.committed_manifest(path, spark)
    cur_id = cur_snap["snapshot_id"] if cur_snap else None
    if rec["op"] == "delete":
        return _publish_staged_delete(
            spark, path, token, rec, cur_man, cur_snap, rebase=rebase
        )
    k = int(rec["chunk"])
    if cur_id == rec["parent_snapshot_id"]:
        final = rec["manifest"]
        chunks = [int(c) for c in rec["chunks"]]
    else:
        if not rebase:
            raise mf.ConcurrentCommitError(
                f"snapshot log at {path} advanced from "
                f"{rec['parent_snapshot_id']} to {cur_id} since this "
                "commit was staged; audit against the new base and "
                "publish with rebase=True (plain appends compose), or "
                "drop_staged"
            )
        same = [
            (c["name"], c["spark_type"]) for c in cur_man["columns"]
        ] == [
            (c["name"], c["spark_type"])
            for c in rec["manifest"]["columns"]
        ]
        if not same:
            raise ValueError(
                "cannot rebase staged append: the table schema changed "
                "since staging; drop_staged and re-stage"
            )
        chunks = sorted({int(c) for c in cur_snap["chunks"]} | {k})
        totals, hist = _aggregate_written(
            spark, path, visible_chunks=chunks
        )
        # current manifest is the base: it carries the delete files and
        # evolution state committed since staging
        final = mf.finalize_manifest(
            dict(cur_man), codec_histogram=hist, **totals
        )
    _append_manifest_row(
        spark,
        path,
        final,
        final["columns"],
        target=os.path.join(_data_path(path), "chunk=-1"),
        mode="overwrite",
    )
    mf.write_sidecar(path, final, spark)
    _commit_snapshot(
        spark, path, chunks=chunks, op="append", final=final,
        expected_parent=cur_snap, extra={"staged_token": token},
    )
    mf.delete_staged(path, token, spark)
    return final


def _publish_staged_delete(
    spark, path, token, rec, cur_man, cur_snap, *, rebase: bool
) -> dict:
    """Publish a staged DELETE: the value file already sits under
    ``_deletes/`` (unreferenced); publishing appends its entry to the
    manifest under the commit CAS. Rebase is safe by the sequence
    rule — the entry's per-row ``_dseq`` was stamped at stage time, so
    chunks appended since stay untouched, exactly as if the delete had
    committed first — provided its key columns survived evolution."""
    cur_id = cur_snap["snapshot_id"] if cur_snap else None
    entry = rec["entry"]
    if cur_id == rec["parent_snapshot_id"]:
        man = rec["manifest"]
    else:
        if not rebase:
            raise mf.ConcurrentCommitError(
                f"snapshot log at {path} advanced from "
                f"{rec['parent_snapshot_id']} to {cur_id} since this "
                "delete was staged; audit against the new base and "
                "publish with rebase=True, or drop_staged"
            )
        spec = {
            c["name"]: c["spark_type"] for c in cur_man["columns"]
        }
        staged_spec = {
            c["name"]: c["spark_type"]
            for c in rec["manifest"]["columns"]
        }
        stale = [
            c for c in entry["cols"] if spec.get(c) != staged_spec.get(c)
        ]
        if stale:
            raise ValueError(
                f"cannot rebase staged delete: key columns {stale} "
                "changed since staging; drop_staged and re-stage"
            )
        man = dict(cur_man)
        man["delete_files"] = list(man.get("delete_files", [])) + [entry]
    man, _ = _meta_commit(
        spark, path, man, "delete",
        {"delete_files": man["delete_files"], "staged_token": token},
        parent=cur_snap,
    )
    mf.delete_staged(path, token, spark)
    return man


def drop_staged(spark: SparkSession, path: str, token: str) -> dict:
    """Abandon a staged commit: the ``_staged/`` record is removed;
    a staged APPEND's chunk directory becomes a normal orphan (id
    burned, invisible to every reader, reclaimed by
    :func:`expire_snapshots`); a staged DELETE's value file is
    unreferenced by every snapshot, so it is reclaimed eagerly."""
    rec = mf.get_staged(path, token, spark)
    mf.delete_staged(path, token, spark)
    if rec["op"] == "delete":
        from . import fsio

        fsio.delete_dir(spark, os.path.join(path, rec["entry"]["dir"]))
        return {"dropped": token, "delete_dir": rec["entry"]["dir"]}
    return {"dropped": token, "chunk": int(rec["chunk"])}


def expire_snapshots(
    spark: SparkSession,
    path: str,
    *,
    keep_last: int = 1,
    older_than_unix: float | None = None,
    delete_orphan_chunks: bool = True,
) -> dict:
    """Iceberg ``expire_snapshots`` + ``remove_orphan_files`` analog:
    retain the newest ``keep_last`` snapshots — plus, when
    ``older_than_unix`` is given, EVERY snapshot committed at or after
    it (Iceberg's ``older_than``/``retain_last`` pair: age is the
    retention policy, ``keep_last`` the floor) — delete the older
    snapshot files, and (optionally) delete chunk directories no
    retained snapshot references — the physical reclamation step after
    rollbacks/compaction at 100 TB, where orphaned chunks are real
    storage. Lineage records are kept for ALL chunks, expired or not:
    they are the historical metrics log, and ``append_chunk`` derives
    the next chunk id from them, so ids are never reused even after a
    chunk's data is reclaimed."""
    from . import fsio

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = mf.read_snapshots(path, spark)
    if not snaps:
        raise FileNotFoundError(f"no snapshot log at {path}")
    ids = sorted(snaps)
    # tagged snapshots are pinned: a tag's purpose is to keep its table
    # state (and files) reachable across retention, Iceberg's ref rule
    tagged = {
        int(r["snapshot_id"]) for r in mf.read_refs(path, spark).values()
    }
    keep = set(ids[-keep_last:]) | (tagged & set(ids))
    if older_than_unix is not None:
        keep |= {
            i
            for i in ids
            if snaps[i].get("committed_unix", 0) >= older_than_unix
        }
    keep_ids = sorted(keep)
    expired = [i for i in ids if i not in keep]
    retained_chunks: set[int] = set()
    for i in keep_ids:
        retained_chunks.update(int(c) for c in snaps[i]["chunks"])
    # staged (write-audit-publish) commits pin their WHOLE visible set:
    # the audit view reads the parent chunks too, and a rollback +
    # expire between staging and publish must not truncate it silently
    staged_recs = mf.read_staged(path, spark)
    for rec in staged_recs.values():
        retained_chunks.update(int(c) for c in rec["chunks"])
    for i in expired:
        fsio.delete_file(
            spark, mf.snapshots_dir(path), f"snap-{i:05d}.json"
        )
    removed_chunks: list[int] = []
    if delete_orphan_chunks:
        # fsio listing, not glob: works on object stores / HDFS too —
        # reclamation is precisely the operation that matters there
        for name in fsio.list_dirs(spark, _data_path(path)):
            if not name.startswith("chunk="):
                continue
            c = int(name.split("=", 1)[1])
            if c >= 0 and c not in retained_chunks:
                fsio.delete_dir(
                    spark, os.path.join(_data_path(path), name)
                )
                removed_chunks.append(c)
    removed_deletes: list[str] = []
    if delete_orphan_chunks:
        # equality-delete files no retained snapshot references (e.g.
        # after a rollback to a pre-delete snapshot) are storage too
        retained_deletes: set[str] = set()
        for i in keep_ids:
            for e in snaps[i].get("delete_files", []):
                retained_deletes.add(os.path.basename(e["dir"]))
        # staged records' audit views apply their parent's deletes:
        # those dirs must survive until the record publishes or drops
        for rec in staged_recs.values():
            for e in rec["manifest"].get("delete_files", []) or []:
                retained_deletes.add(os.path.basename(e["dir"]))
        ddir = os.path.join(path, DELETES_DIR)
        for name in fsio.list_dirs(spark, ddir):
            if name not in retained_deletes:
                fsio.delete_dir(spark, os.path.join(ddir, name))
                removed_deletes.append(name)
    return {
        "retained_snapshots": keep_ids,
        "expired_snapshots": expired,
        "removed_chunks": sorted(removed_chunks),
        "removed_delete_files": sorted(removed_deletes),
    }


# ------------------------------------------------------ schema evolution ----
#
# Iceberg-style METADATA-ONLY schema changes over the chunked layout:
# no data file is rewritten, so evolving a 100 TB table costs two JSON
# writes regardless of size. The manifest's `columns` list is the
# single source of schema truth; evolved tables set `schema_evolved`
# so readers switch to an explicit manifest-derived Parquet schema
# (inferred schemas would silently drop a column that only newer
# chunks carry — Spark picks an arbitrary file's footer otherwise).
# Old chunks' missing payloads decode as the column's recorded default
# (NULL unless set). Dropped names are tombstoned and may never be
# reused: old files still hold `<name>_blob` bytes, and a reused name
# would resurface those stale payloads as the new column's data.


def _meta_commit(spark, path, man, op: str, extra: dict, *, parent) -> dict:
    """Metadata-only commit: claim snapshot id ``parent + 1``
    (exclusive-create = the concurrency gate), then rewrite manifest
    row + sidecar. ``parent`` is the snapshot observed when the CALLER
    read the sidecar it mutated — claiming parent+1 (not
    current_snapshot()+1 re-read here) makes the exclusive create a
    true compare-and-swap on the caller's view: a concurrent commit
    that advanced the log since the sidecar read already holds
    parent+1, so this writer raises ConcurrentCommitError instead of
    silently overwriting the other writer's manifest change (the
    lost-update race between e.g. evolve_add_column and delete_rows).
    A writer crashing between snapshot and sidecar writes leaves a
    metadata-op snapshot with an unchanged manifest — re-running the
    operation is safe (it claims a fresh id). Direct snapshot write,
    NOT _commit_snapshot: its resume-idempotency check (same chunks +
    op + totals) would wrongly swallow the second of two consecutive
    metadata ops — they change none of those fields, only the
    manifest."""
    extra = dict(extra)
    # every commit snapshots the table's live delete-file list so a
    # reader at any snapshot (and expire_snapshots) never loses it
    if "delete_files" not in extra and man.get("delete_files"):
        extra["delete_files"] = man["delete_files"]
    # the FULL manifest rides in the snapshot file, so it commits
    # atomically with the exclusive-create CAS (mf.committed_manifest)
    extra["manifest"] = man
    # metadata ops on a flat (chunks=1) table must keep the layout
    # marker: read_all skips the chunk-visibility filter for flat
    # tables, whose files carry no chunk partition column. A pre-log
    # table has no parent to inherit it from, so probe the data dir —
    # writing chunk=-1 next to a flat table's root-level files would
    # flip partition discovery and hide every data file
    if "layout" not in extra:
        if parent is not None and parent.get("layout"):
            extra["layout"] = parent["layout"]
        elif parent is None and not _is_chunked(spark, path):
            extra["layout"] = "flat"
    if parent is not None:
        chunks = [int(c) for c in parent["chunks"]]
    else:
        chunks = sorted(mf.read_chunk_lineage(path, spark))
    snap = mf.make_snapshot(
        snapshot_id=(parent["snapshot_id"] + 1) if parent else 0,
        chunks=chunks,
        op=op,
        parent_id=parent["snapshot_id"] if parent else None,
        num_rows=man.get("num_rows"),
        enc_bytes=man.get("enc_bytes"),
        extra=extra,
    )
    mf.write_snapshot(path, snap, spark)
    if extra.get("layout") == "flat":
        # flat tables keep the manifest row directly under data/ — a
        # chunk=-1 subdir next to root-level parquet files would flip
        # Spark's partition discovery and hide every data file
        _append_manifest_row(spark, path, man, man["columns"])
    else:
        _append_manifest_row(
            spark,
            path,
            man,
            man["columns"],
            target=os.path.join(_data_path(path), "chunk=-1"),
            mode="overwrite",
        )
    mf.write_sidecar(path, man, spark)
    return man, snap


def _evolve_commit(spark, path, man, op: str, extra: dict, *, parent) -> dict:
    man = dict(man)
    man["schema_evolved"] = True
    return _meta_commit(spark, path, man, op, extra, parent=parent)


def _is_chunked(spark, path: str) -> bool:
    """True iff the table uses the chunked layout (data/chunk=*/).
    fsio listing, not a local glob — DML and schema evolution must
    recognize chunked tables on object stores / HDFS too."""
    from . import fsio

    return any(
        d.startswith("chunk=") for d in fsio.list_dirs(spark, _data_path(path))
    )


def _visible_chunks(spark, path) -> list[int]:
    cur = mf.current_snapshot(path, spark)
    if cur is not None:
        return [int(c) for c in cur["chunks"]]
    return sorted(mf.read_chunk_lineage(path, spark))


def evolve_add_column(
    spark: SparkSession,
    path: str,
    name: str,
    spark_type: str,
    *,
    default=None,
) -> dict:
    """ALTER TABLE ADD COLUMN (metadata-only). Chunks written before
    the change decode the column as ``default`` (NULL if unset); chunks
    appended after carry real payloads. Returns the updated manifest.

    The decode/point-lookup/compaction paths understand missing
    payloads; the stats-proof mask fast paths assume materialized
    payloads and per-block stats — run ``compact_to_path`` first to
    physically backfill an added column before masking on it."""
    man, cur = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    if not _is_chunked(spark, path):
        raise ValueError(
            "schema evolution needs a chunked-layout table (data/chunk=*/)"
        )
    names = [c["name"] for c in man["columns"]]
    physicals = {c.get("physical", c["name"]) for c in man["columns"]}
    if name in names or name in physicals:
        raise ValueError(f"column {name!r} already exists (or is a "
                         "renamed column's physical payload name)")
    if name in man.get("dropped_columns", []):
        raise ValueError(
            f"column name {name!r} was dropped earlier and cannot be "
            "reused: old data files still hold its payload bytes, which "
            "would resurface as the new column's values"
        )
    kind = selector.kind_of_spark_type(spark_type)
    spec = {
        "name": name,
        "spark_type": spark_type,
        "kind": kind,
        "added_snapshot": (cur["snapshot_id"] + 1) if cur else 0,
    }
    if default is not None:
        spec["default"] = default
    man = dict(man)
    man["columns"] = list(man["columns"]) + [spec]
    man, _ = _evolve_commit(
        spark, path, man, "add-column",
        {"column": name, "spark_type": spark_type}, parent=cur,
    )
    return man


def evolve_rename_column(
    spark: SparkSession, path: str, old: str, new: str
) -> dict:
    """ALTER TABLE RENAME COLUMN (metadata-only). The payload keeps its
    immutable PHYSICAL name — old and new chunks agree on one blob name
    forever (the Iceberg field-id discipline); only the manifest's
    logical name changes, so readers, appends and compaction all route
    through the ``physical`` mapping. The old logical name is tombstoned
    (its payload bytes live on under the physical name). Key columns
    (url/ts) and column-group members cannot be renamed."""
    man, cur = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    names = [c["name"] for c in man["columns"]]
    physicals = {c.get("physical", c["name"]) for c in man["columns"]}
    if old not in names:
        raise ValueError(f"no column {old!r}; have {names}")
    if new in names or new in physicals:
        raise ValueError(f"column {new!r} already exists (or is a "
                         "renamed column's physical payload name)")
    if new in man.get("dropped_columns", []):
        raise ValueError(
            f"column name {new!r} was dropped or renamed away earlier "
            "and cannot be reused"
        )
    if old == man.get("url_col") or old == man.get("ts_col"):
        raise ValueError(f"cannot rename key column {old!r}")
    in_group = member_to_group(man.get("column_groups"))
    if old in in_group:
        raise ValueError(
            f"column {old!r} is interleaved in column group "
            f"{in_group[old]!r}; rename is only supported for standalone "
            "columns"
        )
    man = dict(man)
    cols = []
    for c in man["columns"]:
        if c["name"] == old:
            c = dict(c)
            # chained renames keep the ORIGINAL physical name
            c["physical"] = c.get("physical", old)
            c["name"] = new
        cols.append(c)
    man["columns"] = cols
    man["dropped_columns"] = sorted(
        set(man.get("dropped_columns", [])) | {old}
    )
    # equality-delete files referencing the column follow the rename
    # (readers select the delete parquet's value column POSITIONALLY,
    # so the file's internal name staying `old` is immaterial)
    if man.get("delete_files"):
        man["delete_files"] = [
            mf._entry_with_cols(
                e, [new if c == old else c for c in mf.delete_entry_cols(e)]
            )
            if old in mf.delete_entry_cols(e)
            else e
            for e in man["delete_files"]
        ]
    man, _ = _evolve_commit(
        spark, path, man, "rename-column", {"from": old, "to": new}, parent=cur
    )
    return man


def evolve_drop_column(spark: SparkSession, path: str, name: str) -> dict:
    """ALTER TABLE DROP COLUMN (metadata-only). The payload bytes stay
    in the old files, unreferenced (an explicit-schema read never
    touches them; ``compact_to_path`` physically sheds them since it
    re-encodes through the manifest's column list). The name is
    tombstoned against reuse. Returns the updated manifest."""
    man, cur = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    names = [c["name"] for c in man["columns"]]
    if name not in names:
        raise ValueError(f"no column {name!r}; have {names}")
    if name == man.get("url_col") or name == man.get("ts_col"):
        raise ValueError(f"cannot drop key column {name!r}")
    in_group = member_to_group(man.get("column_groups"))
    if name in in_group:
        raise ValueError(
            f"column {name!r} is interleaved in column group "
            f"{in_group[name]!r}; drop is only supported for standalone "
            "columns (group payloads are one blob)"
        )
    if any(
        name in mf.delete_entry_cols(e)
        for e in man.get("delete_files", [])
    ):
        raise ValueError(
            f"column {name!r} is referenced by live equality-delete "
            "files; purge_deletes first (dropping it would strand "
            "unresolvable deletes)"
        )
    man = dict(man)
    spec = next(c for c in man["columns"] if c["name"] == name)
    man["columns"] = [c for c in man["columns"] if c["name"] != name]
    # tombstone the physical payload name too: that is the blob whose
    # stale bytes a reused name would resurface
    man["dropped_columns"] = sorted(
        set(man.get("dropped_columns", []))
        | {name, spec.get("physical", name)}
    )
    man, _ = _evolve_commit(
        spark, path, man, "drop-column", {"column": name}, parent=cur
    )
    return man


# Iceberg's safe type promotions (spec §Schema Evolution): widening
# never changes the column KIND here — every integral type already
# encodes through the same 64-bit "int" kernels and float promotes to
# the IEEE-754-as-int64 "double" view — so the change is purely the
# manifest's declared logical type; decode's existing cast-to-schema
# step re-types old payloads on the fly and appended chunks encode
# identically. A mis-typed column no longer needs a rewrite.
_WIDENINGS: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "integer", "bigint", "long"},
    "smallint": {"int", "integer", "bigint", "long"},
    "int": {"bigint", "long"},
    "integer": {"bigint", "long"},
    "float": {"double"},
}


def evolve_widen_column(
    spark: SparkSession, path: str, name: str, new_type: str
) -> dict:
    """ALTER TABLE ALTER COLUMN TYPE (metadata-only, Iceberg's safe
    promotion set: int->bigint and float->double families). No data
    file is rewritten — widening a 100 TB table costs two JSON writes;
    old payloads decode straight to the widened type (the column kind
    is unchanged, only the declared logical type moves) and any later
    ``purge_deletes``/``transform_blocks`` compaction backfills the
    physical payloads as a side effect of its rewrite."""
    man, cur = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    spec = next((c for c in man["columns"] if c["name"] == name), None)
    if spec is None:
        raise ValueError(
            f"no column {name!r}; have {[c['name'] for c in man['columns']]}"
        )
    old_type = spec["spark_type"].lower()
    new_type = new_type.lower()
    if new_type == old_type:
        return man  # no-op
    if new_type not in _WIDENINGS.get(old_type, set()):
        allowed = sorted(_WIDENINGS.get(old_type, set()))
        raise ValueError(
            f"cannot widen {name!r} from {old_type!r} to {new_type!r}; "
            f"safe promotions from {old_type!r}: {allowed or 'none'} "
            "(narrowing or cross-kind changes need a rewrite)"
        )
    assert selector.kind_of_spark_type(new_type) == spec["kind"]
    man = dict(man)
    man["columns"] = [
        {**c, "spark_type": new_type} if c["name"] == name else c
        for c in man["columns"]
    ]
    man, _ = _evolve_commit(
        spark, path, man, "widen-column",
        {"column": name, "from": old_type, "to": new_type}, parent=cur,
    )
    return man


# ------------------------------------------------------ row-level deletes ----
#
# Iceberg-style EQUALITY DELETE FILES (merge-on-read): DELETE writes a
# small parquet of key values plus a metadata-only commit — no data
# file is rewritten, so deleting rows from a 100 TB table costs
# O(delete set), not O(table). Each delete file records the column it
# matches on and a SEQUENCE number (the highest chunk id visible when
# it committed): it deletes matching rows only in chunks <= seq, so a
# later append may re-insert a deleted key and stay visible (Iceberg's
# sequence-number rule for equality deletes). Readers apply deletes as
# a broadcast anti-join (scan.read_rows); scan.purge_deletes rewrites
# the table with deletes applied physically and clears the list.

DELETES_DIR = "_deletes"


def _delete_arrow_types(specs: list[dict]) -> list:
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow = to_arrow_schema(
        T.StructType.fromDDL(
            ", ".join(f"`k{i}` {s['spark_type']}" for i, s in enumerate(specs))
        )
    )
    return [arrow.field(i).type for i in range(len(specs))]


def delete_rows(
    spark: SparkSession, path: str, col, values, *, staged: bool = False
) -> dict:
    """DELETE FROM <table> WHERE (<cols>) IN (<values>) as an Iceberg
    equality-delete commit. ``col`` is one column name or a LIST of
    names — a composite key like a crawl table's natural ``(url,
    warc_ts)`` — and ``values`` is a list/tuple/set of literals (tuples
    for composite keys) or a DataFrame carrying the key columns (e.g.
    a dedup pipeline's drop list — written distributed, never
    collected). Delete files are broadcast to readers, so keep a
    single delete commit to broadcast-able size (millions of keys, not
    billions); bigger retention sweeps belong in
    ``scan.transform_blocks`` rewrites.

    The value file is the v2 layout: fixed internal columns
    ``_k0.._k{n-1}`` (key values, entry-``cols`` order) + ``_dseq``
    (the sequence number, PER ROW). Fixed names make every v2 file of
    a key-set schema-identical — even across later column renames — so
    the read path folds all of them into ONE multi-path parquet scan
    instead of a per-file union chain, and a per-row sequence lets
    ``compact_delete_files`` merge files from different commits without
    losing each value's own visibility horizon.

    Returns the updated manifest. The delete applies to rows in chunks
    visible NOW (chunk id <= the recorded sequence number); chunks
    appended later are untouched."""
    import uuid

    cols = [col] if isinstance(col, str) else list(col)
    if not cols:
        raise ValueError("need at least one key column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate key columns in {cols}")
    man, cur = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    if not _is_chunked(spark, path):
        raise ValueError(
            "row-level deletes need a chunked-layout table (data/chunk=*/)"
        )
    by_name = {c["name"]: c for c in man["columns"]}
    specs = []
    for c in cols:
        if c not in by_name:
            raise ValueError(f"no column {c!r}; have {sorted(by_name)}")
        specs.append(by_name[c])
    visible = (
        [int(c) for c in cur["chunks"]]
        if cur is not None
        else sorted(mf.read_chunk_lineage(path, spark))
    )
    seq = max(visible) if visible else 0
    snap_id = (cur["snapshot_id"] + 1) if cur else 0
    # UNIQUE dir token (not the contended snapshot id): two racing
    # delete_rows would otherwise both write delete-<N> — the CAS loser
    # overwrites the winner's value file, silently dropping its deletes
    # even though the winner's commit stands. The snap-id prefix is
    # kept for human readability only.
    rel = f"delete-{snap_id:05d}-{uuid.uuid4().hex[:10]}"
    dest = os.path.join(path, DELETES_DIR, rel)
    knames = [f"_k{i}" for i in range(len(cols))]
    if isinstance(values, DataFrame):
        vdf = values
        if not set(cols) <= set(vdf.columns):
            if len(vdf.columns) == len(cols):
                # positional: a single-column drop list under any name
                vdf = vdf.toDF(*cols)
            else:
                raise ValueError(
                    f"values DataFrame must carry columns {cols} or "
                    f"exactly {len(cols)} columns; has {vdf.columns}"
                )
        vdf = vdf.select(
            *[
                F.col(c).cast(s["spark_type"]).alias(k)
                for c, s, k in zip(cols, specs, knames)
            ]
        )
        for k in knames:  # equality deletes never match NULL keys
            vdf = vdf.where(F.col(k).isNotNull())
        vdf = vdf.distinct().withColumn("_dseq", F.lit(int(seq)).cast("long"))
        vdf.coalesce(1).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        if n == 0:
            # same contract as the literal path: an empty delete set is
            # a caller bug, and committing it would tax every future
            # read with a pointless anti-join
            from . import fsio

            fsio.delete_dir(spark, dest)
            raise ValueError("empty delete set")
    else:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from . import fsio

        rows = [
            v if isinstance(v, tuple) else (v,) for v in values
        ]
        if any(len(r) != len(cols) for r in rows):
            raise ValueError(
                f"each delete value must have {len(cols)} elements "
                f"(key columns {cols})"
            )
        rows = sorted(set(rows))
        if not rows:
            raise ValueError("empty delete set")
        types = _delete_arrow_types(specs)
        arrays = []
        for i, want in enumerate(types):
            col_vals = [r[i] for r in rows]
            try:
                arrays.append(pa.array(col_vals, type=want))
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                # CLI callers pass string literals for numeric/timestamp
                # columns (table_job --values 5,7) — cast, don't fail
                arrays.append(pa.array(col_vals).cast(want))
        arrays.append(pa.array([int(seq)] * len(rows), type=pa.int64()))
        tbl = pa.table(dict(zip(knames + ["_dseq"], arrays)))
        sink = pa.BufferOutputStream()
        pq.write_table(tbl, sink)
        fsio.write_bytes(spark, dest, "part-0.parquet", sink.getvalue().to_pybytes())
        n = len(rows)
    entry = {
        "dir": f"{DELETES_DIR}/{rel}",
        "cols": cols,
        "seq": int(seq),
        "n": int(n),
        "v": 2,
    }
    if len(cols) == 1:
        entry["col"] = cols[0]  # readability + v1-reader compat
    man = dict(man)
    man["delete_files"] = list(man.get("delete_files", [])) + [entry]
    if staged:
        # write-audit-publish for a DELETE (e.g. a dedup drop list to
        # be audited before it applies): the value file is on disk but
        # unreferenced until publish; the staged manifest carries the
        # entry, so read_staged_rows audits the post-delete view
        if cur is None:
            from . import fsio

            fsio.delete_dir(spark, dest)
            raise ValueError(
                "staged deletes need a snapshot-log table"
            )
        rec = {
            "token": uuid.uuid4().hex[:12],
            "op": "delete",
            "entry": entry,
            "parent_snapshot_id": cur["snapshot_id"],
            "chunks": sorted(int(c) for c in visible),
            "manifest": man,
            "created_unix": int(time.time()),
        }
        mf.write_staged(path, rec, spark)
        return rec
    try:
        man, _ = _meta_commit(
            spark, path, man, "delete",
            {"delete_files": man["delete_files"]},
            parent=cur,
        )
    except mf.ConcurrentCommitError:
        # lost the CAS: our value file is unreferenced — reclaim it now
        # instead of leaving an orphan for expire_snapshots
        from . import fsio

        fsio.delete_dir(spark, dest)
        raise
    return man


def upsert_rows(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_col,
    *,
    zlib_level: int = 6,
    effort: str = selector.EFFORT_MAX,
    codec_overrides: dict[str, str] | None = None,
) -> dict:
    """MERGE INTO <table> USING df ON table.key = df.key — matched rows
    replaced, unmatched rows inserted (Iceberg merge-on-read UPSERT,
    the ``raquet_metadata.hpp`` table-mutation analog). ``key_col`` is
    one column name or a LIST for a composite natural key like
    ``(url, warc_ts)``. Composed from the two primitives so it inherits
    their cost model: one equality delete on df's keys (O(|df|) — the
    delete's sequence number covers only chunks visible NOW) plus one
    appended chunk carrying df's rows (chunk id > seq, so the fresh
    versions survive the anti-join). No existing data file is
    rewritten; a 100-row upsert into a 100 TB table moves ~100 rows.

    df must carry the table's full column set (this engine stores whole
    rows per block — partial-column UPDATE would need a read-modify
    path; use evolve_* for schema changes). Duplicate keys WITHIN df
    are an error: both copies would survive the merge.

    Returns the final manifest (after the append's re-finalization)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    man, _ = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    names = [c["name"] for c in man["columns"]]
    for k in keys:
        if k not in names:
            raise ValueError(f"no column {k!r}; have {names}")
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise ValueError(
            f"upsert df must carry the full column set; missing {missing}"
        )
    dup = (
        df.groupBy(*keys).count().where(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            f"duplicate {keys!r} keys within the upsert df — dedupe "
            "first (both copies would survive the merge)"
        )
    if not df.take(1):
        return man  # empty MERGE is a no-op, not an error
    delete_rows(spark, path, keys if len(keys) > 1 else keys[0],
                df.select(*keys))
    # the MERGE is two commits; once the delete has landed, a CAS loss
    # on the append leg (a writer slipped in between) must NOT leave
    # the table with matched rows deleted and no replacements — retry
    # the append, which its contract makes safe ("re-running the
    # append succeeds under a fresh id with the concurrent change
    # folded in"). The delete leg needs no such care: if IT loses the
    # CAS nothing has happened yet and the caller simply re-runs.
    last: Exception | None = None
    for _ in range(5):
        try:
            return append_chunk(
                spark,
                df.select(*names),
                path,
                zlib_level=zlib_level,
                effort=effort,
                codec_overrides=codec_overrides,
            )
        except mf.ConcurrentCommitError as e:
            last = e
    raise last


def compact_delete_files(spark: SparkSession, path: str) -> dict:
    """Iceberg ``rewrite_position_delete_files`` analog for equality
    deletes: merge ALL live delete files of each key-column set into
    ONE v2 parquet, committed as a metadata-only snapshot — no data
    file is touched, so compacting a 100 TB table's delete backlog
    costs O(total delete rows), which is broadcast-sized by contract.

    Why it matters: ``streaming.upsert_stream`` commits one delete file
    per micro-batch; without this step the read path opens O(#commits)
    parquet files per scan (one multi-path scan node, but the file
    count still grows). After compaction the broadcast side of
    ``read_rows`` is exactly one file per key set, forever O(#key
    sets). Per-VALUE sequence numbers (``_dseq``) are preserved by
    max-merging, so the Iceberg sequence rule — a key re-inserted
    after its delete stays visible — survives compaction bit-for-bit:
    pre-merge a row is dropped iff chunk <= seq in ANY file, which
    equals chunk <= max(seq) per value.

    Old value files stay on disk for time travel (older snapshots still
    reference them); ``expire_snapshots(delete_orphan_chunks=True)``
    reclaims them once no retained snapshot does. Returns the updated
    manifest; a no-op (already exactly one v2 file per key set) returns
    it unchanged without committing."""
    import uuid

    from . import fsio

    man, cur = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    entries = list(man.get("delete_files") or [])
    if not entries:
        raise ValueError(f"no delete files to compact at {path}")
    groups: dict[tuple, list[dict]] = {}
    for e in entries:
        groups.setdefault(tuple(mf.delete_entry_cols(e)), []).append(e)
    if all(
        len(es) == 1 and es[0].get("v", 1) >= 2 for es in groups.values()
    ):
        return man  # already compact
    snap_id = (cur["snapshot_id"] + 1) if cur else 0
    new_entries: list[dict] = []
    written: list[str] = []
    n_merged = 0
    for cols, es in sorted(groups.items()):
        if len(es) == 1 and es[0].get("v", 1) >= 2:
            new_entries.append(es[0])
            continue
        knames = [f"_k{i}" for i in range(len(cols))]
        v2_dirs = [
            os.path.join(path, e["dir"]) for e in es if e.get("v", 1) >= 2
        ]
        dd = None
        if v2_dirs:
            # widening-robust grouped read (scan._read_v2_delete_dirs):
            # post-widen int64 key files can sit next to pre-widen
            # int32 ones in the same key set
            from . import scan as _scan

            dd = _scan._read_v2_delete_dirs(spark, v2_dirs).select(
                *knames, "_dseq"
            )
        for e in es:
            if e.get("v", 1) >= 2:
                continue
            d0 = spark.read.parquet(os.path.join(path, e["dir"]))
            # v1 files: one value column (any internal name — it may
            # predate a rename), constant per-file sequence
            d = d0.select(
                F.col(d0.columns[0]).alias("_k0"),
                F.lit(int(e["seq"])).cast("long").alias("_dseq"),
            )
            dd = d if dd is None else dd.unionByName(d)
        merged = dd.groupBy(*knames).agg(F.max("_dseq").alias("_dseq"))
        rel = f"merged-{snap_id:05d}-{uuid.uuid4().hex[:10]}"
        dest = os.path.join(path, DELETES_DIR, rel)
        merged.coalesce(1).write.mode("overwrite").parquet(dest)
        stats = spark.read.parquet(dest).agg(
            F.count("*").alias("n"),
            F.min("_dseq").alias("smin"),
            F.max("_dseq").alias("smax"),
        ).collect()[0]
        entry = {
            "dir": f"{DELETES_DIR}/{rel}",
            "cols": list(cols),
            "seq": max(int(e["seq"]) for e in es),
            "n": int(stats["n"]),
            "v": 2,
            "merged_from": len(es),
        }
        # the single-column `col` alias lets a v1-era reader apply this
        # entry — but such a reader uses the ENTRY seq for every row,
        # which over-deletes re-inserted keys when the merged per-row
        # _dseq values differ. Stamp it only when they are homogeneous
        # (entry seq == every row's seq); otherwise a legacy reader
        # fails loud on the missing key instead of silently mis-reading
        if len(cols) == 1 and stats["smin"] == stats["smax"]:
            entry["col"] = cols[0]
        new_entries.append(entry)
        written.append(dest)
        n_merged += len(es)
    man = dict(man)
    man["delete_files"] = new_entries
    try:
        man, _ = _meta_commit(
            spark, path, man, "compact-deletes",
            {"delete_files": new_entries, "compacted_files": n_merged},
            parent=cur,
        )
    except mf.ConcurrentCommitError:
        for dest in written:  # lost the CAS: reclaim our orphans now
            fsio.delete_dir(spark, dest)
        raise
    return man


def compact_chunks(
    spark: SparkSession,
    path: str,
    chunk_ids: list[int] | None = None,
    *,
    small_bytes: int | None = None,
    max_chunks: int | None = None,
    zlib_level: int = 6,
    effort: str = selector.EFFORT_MAX,
    codec_overrides: dict[str, str] | None = None,
    shuffle: str = "hash",
) -> dict:
    """Incremental data-file compaction — the Iceberg
    ``rewrite_data_files`` (bin-packing) analog, committed IN PLACE as
    a new snapshot. Streaming ingest appends one small chunk per
    micro-batch; this merges only the selected chunks into one fresh
    chunk and costs O(selected bytes), unlike ``scan.compact_to_path``
    /``scan.purge_deletes`` which rewrite the whole table into a new
    path. Reference parity: the reference's overview/ALL_touched
    maintenance rebuilds are likewise scoped rewrites over an
    otherwise-immutable Parquet layout (/root/reference/README.md
    `raquet_rewrite` workflow); the snapshot mechanics are Iceberg's.

    Selection: an explicit ``chunk_ids`` list, or the smallest visible
    chunks by encoded bytes — every chunk under ``small_bytes``, capped
    at ``max_chunks`` (smallest first). At least 2 chunks must qualify.

    Semantics:

    * rows are read at the CURRENT snapshot with equality deletes
      applied (the merge-on-read view), so the rewrite applies those
      deletes PHYSICALLY for the compacted chunks; the new chunk id
      exceeds every live delete entry's sequence number, so no entry
      re-deletes (or misses) its rows — untouched chunks keep
      merge-on-read semantics unchanged.
    * the commit replaces the selected chunks in the visible set
      (op ``compact-chunks``, ``compacted_from`` recorded); old dirs
      stay on disk for time travel until ``expire_snapshots``.
    * concurrency: the commit CAS anchors to the snapshot at which the
      selection and delete entries were captured — a racing writer
      forces ``ConcurrentCommitError`` and a clean retry (the burned
      chunk id and dir are reclaimed by expiry, same as a lost append).
    * incremental readers: ``scan.read_changes`` /
      ``read_appended_between`` REFUSE ranges that span a
      compact-chunks snapshot (rewritten rows would surface as
      spurious inserts+deletes); ranges ending at or starting from the
      rewrite boundary stay exact — consume to the boundary first,
      Delta/Iceberg's rule for rewrite commits.
    """
    from . import scan as _scan

    man, cur = mf.committed_manifest(path, spark)
    if man is None:
        raise FileNotFoundError(f"no committed manifest at {path}")
    if not _is_chunked(spark, path):
        raise ValueError(
            "compact_chunks needs a chunked-layout table (data/chunk=*/)"
        )
    visible = (
        [int(c) for c in cur["chunks"]]
        if cur is not None
        else sorted(mf.read_chunk_lineage(path, spark))
    )
    if chunk_ids is not None:
        sel = sorted({int(c) for c in chunk_ids})
        unknown = set(sel) - set(visible)
        if unknown:
            raise ValueError(
                f"chunks {sorted(unknown)} are not visible; "
                f"visible: {sorted(visible)}"
            )
    else:
        if small_bytes is None and max_chunks is None:
            raise ValueError(
                "pass chunk_ids, small_bytes or max_chunks to select "
                "what to compact"
            )
        lin = mf.read_chunk_lineage(path, spark)
        sized = sorted(
            (int(lin.get(c, {}).get("enc_bytes") or 0), c) for c in visible
        )
        picked = [
            c for b, c in sized if small_bytes is None or b < small_bytes
        ]
        if max_chunks is not None:
            picked = picked[:max_chunks]
        sel = sorted(picked)
    if len(sel) < 2:
        raise ValueError(
            f"need at least 2 chunks to compact; selection: {sel} "
            f"(visible: {sorted(visible)})"
        )
    names = [c["name"] for c in man["columns"]]
    # current-snapshot merge-on-read view of ONLY the selected chunks:
    # chunk filter + delete entries are captured eagerly here, and the
    # append's CAS (expected_parent=cur) rejects the commit if any
    # writer advanced the log after this capture point
    blocks = _scan.read_blocks(spark, path).where(F.col("chunk").isin(sel))
    entries = _scan.read_delete_entries(spark, path)
    rows = _scan.decode_blocks(blocks, man, names, with_chunk=True)
    if entries:
        rows = _scan._apply_delete_entries(spark, path, rows, entries)
    return append_chunk(
        spark,
        rows.select(*names),
        path,
        zlib_level=zlib_level,
        effort=effort,
        codec_overrides=codec_overrides,
        shuffle=shuffle,
        _replace_chunks=sel,
        _op="compact-chunks",
        _expected_parent=cur,
    )
