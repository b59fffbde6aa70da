"""Read path: pruned scans, lazy block decode, decode-free stats.

Mirrors the reference's read macros and value functions —
``read_raquet`` / ``read_raquet_at`` / ``ST_RasterValue`` /
``ST_RasterSummaryStats`` (/root/reference/src/raquet_extension.cpp:36-263,
/root/reference/src/raster/st_raster_value.cpp, st_raster_stats.cpp) —
with the same core principle: *blocks are not decoded unnecessarily*
(st_raster_value.cpp:352-354). Pruning happens three ways, all before
any payload byte is touched:

1. key predicates (equality / BETWEEN / isin / bit-extracted ts-bucket)
   pushed into the Parquet scan (row-group min/max on the sorted key);
2. per-block stats columns (``stats.ts_min/ts_max``) — exact block-level
   refinement without decode;
3. Parquet column pruning — only the requested ``<col>_blob`` payloads
   are ever read (single-band-fetch analog).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import blockkey as bk
from . import manifest as mf
from . import selector
from .placement import lpt_bins as _lpt_bins
from .placement import murmur3_hash_long as _murmur3_hash_long  # noqa: F401 (pinned by tests)
from .placement import partition_reps as _partition_reps
from .encode import (
    BLOCK,
    SALT,
    blob_col,
    blocks_schema,
    encode_block_arrow,
    encode_block_pdf,
    sort_cols_for,
    _data_path,
)

# ----------------------------------------------------------------- reads ----


def _read_raw(spark: SparkSession, path: str) -> DataFrame:
    """Every file under data/, INCLUDING chunks no longer visible at
    the current snapshot (rolled-back orphans awaiting expiry). Only
    time travel and maintenance may want this.

    Schema-evolved tables read with an EXPLICIT manifest-derived schema:
    Spark's inferred schema comes from one arbitrary file's footer, so a
    column only newer chunks carry could silently vanish, and a dropped
    column's stale payloads could resurface. With the explicit schema,
    files missing a payload column yield NULL (decoded downstream as the
    column's default) and dropped payloads are never read at all; the
    `chunk` partition column is still discovered and appended."""
    man, _ = mf.committed_manifest(path, spark)
    if man is not None and man.get("schema_evolved"):
        sch = blocks_schema(man["columns"], man.get("column_groups"))
        return spark.read.schema(sch).parquet(_data_path(path))
    return spark.read.parquet(_data_path(path))


def read_all(spark: SparkSession, path: str) -> DataFrame:
    """All rows visible at the CURRENT snapshot. Every ordinary read
    path routes through here, so a rollback is immediately effective
    for point lookups, scans, the datasource view and compaction —
    not just for explicit read_blocks_at calls. Pre-snapshot-log and
    flat tables read unfiltered, as always; the manifest row
    (chunk=-1) is always visible."""
    df = _read_raw(spark, path)
    snap = mf.current_snapshot(path, spark)
    if snap is not None and snap.get("layout") != "flat" and "chunk" in df.columns:
        df = df.where(
            F.col("chunk").isin([int(c) for c in snap["chunks"]] + [-1])
        )
    return df


def read_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Data rows only — read_raquet analog
    (/root/reference/src/raquet_extension.cpp:36-45)."""
    return read_all(spark, path).where(F.col(BLOCK) != bk.MANIFEST_BLOCK)


def read_blocks_at(
    spark: SparkSession,
    path: str,
    *,
    snapshot_id: int | None = None,
    as_of_unix: float | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Time-travel read (Iceberg VERSION/TIMESTAMP AS OF analog): data
    rows visible at a snapshot of the `_snapshots/` log. Exactly one of
    ``snapshot_id`` / ``as_of_unix`` / ``ref`` (a tag name from
    ``encode.create_tag``) selects the snapshot; none means
    the current snapshot. The visibility filter is on the ``chunk``
    partition column, so Spark prunes whole chunk directories at
    planning time — an old snapshot's scan reads only its own files,
    no matter how many chunks were appended since. Tables from before
    the snapshot log (no `_snapshots/` dir) read fully, as always."""
    if ref is not None:
        if snapshot_id is not None or as_of_unix is not None:
            raise ValueError("pass snapshot_id, as_of_unix OR ref, not both")
        snapshot_id = mf.resolve_ref(path, ref, spark)
    snaps = mf.read_snapshots(path, spark)
    if not snaps:
        if snapshot_id is not None or as_of_unix is not None:
            raise FileNotFoundError(f"no snapshot log at {path}")
        return read_blocks(spark, path)
    if snapshot_id is not None and as_of_unix is not None:
        raise ValueError("pass snapshot_id OR as_of_unix, not both")
    if snapshot_id is not None:
        if snapshot_id not in snaps:
            raise KeyError(
                f"no snapshot {snapshot_id} at {path}; have {sorted(snaps)}"
            )
        snap = snaps[snapshot_id]
    elif as_of_unix is not None:
        snap = mf.snapshot_as_of(path, as_of_unix, spark)
        if snap is None:
            raise KeyError(f"no snapshot at or before {as_of_unix} in {path}")
    else:
        snap = snaps[max(snaps)]
    if snap.get("layout") == "flat":
        return read_blocks(spark, path)
    # raw read, NOT read_blocks: a pre-rollback snapshot may reference
    # chunks the current snapshot no longer shows (still on disk until
    # expire_snapshots reclaims them)
    return _read_raw(spark, path).where(
        (F.col(BLOCK) != bk.MANIFEST_BLOCK)
        & F.col("chunk").isin([int(c) for c in snap["chunks"]])
    )


def _guard_rewrites(snaps: dict, from_id: int, to_id: int, what: str) -> None:
    """Incremental reads refuse ranges spanning a data-rewrite commit
    (``encode.compact_chunks``): the rewritten chunk's rows are the
    same logical rows, so diffing chunk sets across it would surface
    every compacted row as a spurious delete+insert pair. Ranges that
    END at or START from the rewrite snapshot stay exact — consume to
    the boundary first (the Delta `ignoreChanges` / Iceberg
    replace-snapshot rule, made loud instead of silent)."""
    # snapshot ids are claimed consecutively (parent + 1), so a missing
    # id inside the range means expire_snapshots reclaimed it (possible
    # once tags pin non-contiguous survivors) — an expired middle could
    # hide a compact-chunks commit from this guard, so refuse loudly
    _check_contiguous(snaps, from_id, to_id, what)
    rewrote = [
        i
        for i in sorted(snaps)
        if from_id < i <= to_id and snaps[i].get("op") == "compact-chunks"
    ]
    if rewrote:
        raise ValueError(
            f"{what} range ({from_id}, {to_id}] spans data-rewrite "
            f"snapshot(s) {rewrote} (compact_chunks); rewritten rows "
            "would read as spurious inserts/deletes. Consume the "
            "sub-ranges from scan.rewrite_boundaries(path, "
            f"{from_id}, {to_id}) in order instead — each is exact, "
            "and the skipped replace steps are net no-ops."
        )


def _check_contiguous(snaps: dict, from_id: int, to_id: int, what: str) -> None:
    """Refuse incremental ranges crossing EXPIRED history: snapshot ids
    are claimed consecutively (parent + 1), so a missing id in
    ``(from_id, to_id]`` proves ``expire_snapshots`` reclaimed it — and
    an expired middle could hide a data-rewrite commit from the op
    scan. Single source for ``_guard_rewrites`` and
    ``rewrite_boundaries``."""
    missing = [i for i in range(from_id + 1, to_id + 1) if i not in snaps]
    if missing:
        raise ValueError(
            f"{what} range ({from_id}, {to_id}] crosses expired "
            f"snapshot(s) {missing}: history needed to prove the range "
            "is rewrite-free is gone. Re-baseline the consumer from a "
            "full read at a retained snapshot."
        )


def rewrite_boundaries(
    spark: SparkSession, path: str, from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> list[tuple[int, int]]:
    """The safe consumption plan for an incremental reader over a
    maintained table: split ``(from, to]`` at every data-rewrite
    (``compact-chunks``) snapshot and drop the rewrite steps
    themselves (a pure replace commit's NET change is empty — the
    rewritten rows are the same logical rows). Returns ``(lo, hi]``
    pairs to feed ``read_changes`` in order; applying those deltas in
    sequence reproduces the table state at ``to`` exactly, which is
    what a changelog consumer does anyway — only the single-range NET
    view (where an insert-then-delete across the rewrite would cancel)
    is unavailable across a rewrite, and that is what the guard
    refuses loudly."""
    snaps = mf.read_snapshots(path, spark)
    if not snaps:
        raise FileNotFoundError(f"no snapshot log at {path}")
    to_id = max(snaps) if to_snapshot_id is None else to_snapshot_id
    for sid in (from_snapshot_id, to_id):
        if sid not in snaps:
            raise KeyError(f"no snapshot {sid} at {path}; have {sorted(snaps)}")
    # an expired middle (possible once tags pin non-contiguous
    # survivors) would make the returned pairs reference missing
    # snapshots AND could hide a rewrite from the op scan — refuse
    # here, where the consumer plans, not later inside read_changes
    _check_contiguous(snaps, from_snapshot_id, to_id, "rewrite_boundaries")
    rewrites = [
        i
        for i in sorted(snaps)
        if from_snapshot_id < i <= to_id
        and snaps[i].get("op") == "compact-chunks"
    ]
    out: list[tuple[int, int]] = []
    lo = from_snapshot_id
    for rw in rewrites:
        if rw - 1 > lo:
            out.append((lo, rw - 1))
        lo = rw  # skip the (rw-1, rw] replace step: net change is empty
    if to_id > lo:
        out.append((lo, to_id))
    return out


def read_appended_between(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Incremental (CDC-style) read: the block rows ADDED after
    ``from_snapshot_id`` and visible at ``to_snapshot_id`` (default:
    current). Chunks are immutable and ids never reused, so the delta
    is exactly the chunk-set difference — an incremental consumer
    (an index refresher, a downstream aggregation) scans only the new
    chunks' files, partition-pruned, no matter how large the table
    has grown."""
    snaps = mf.read_snapshots(path, spark)
    if not snaps:
        raise FileNotFoundError(f"no snapshot log at {path}")
    if from_snapshot_id not in snaps:
        raise KeyError(f"no snapshot {from_snapshot_id} at {path}")
    to_id = max(snaps) if to_snapshot_id is None else to_snapshot_id
    if to_id not in snaps:
        raise KeyError(f"no snapshot {to_id} at {path}")
    _guard_rewrites(snaps, from_snapshot_id, to_id, "read_appended_between")
    new_chunks = sorted(
        set(snaps[to_id]["chunks"]) - set(snaps[from_snapshot_id]["chunks"])
    )
    if not new_chunks:
        # no delta (also the flat-layout case, which has no chunk column)
        return read_blocks(spark, path).where(F.lit(False))
    # raw read: the delta of a historical snapshot pair may include
    # chunks rolled back since (valid until expired)
    return _read_raw(spark, path).where(
        (F.col(BLOCK) != bk.MANIFEST_BLOCK)
        & F.col("chunk").isin([int(c) for c in new_chunks])
    )


def table_history(spark: SparkSession, path: str) -> DataFrame:
    """The snapshot log as a DataFrame (Iceberg's `table.history()`):
    one row per snapshot — id, parent, op, chunk count, committed ts,
    rows/bytes."""
    snaps = mf.read_snapshots(path, spark)
    rows = [
        (
            int(s["snapshot_id"]),
            s.get("parent_id"),
            s["op"],
            len(s["chunks"]),
            float(s["committed_unix"]),
            s.get("num_rows"),
            s.get("enc_bytes"),
        )
        for _, s in sorted(snaps.items())
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, op string, n_chunks int, "
        "committed_unix double, num_rows long, enc_bytes long",
    )


def read_manifest(spark: SparkSession, path: str) -> dict:
    """Manifest dict — read_raquet_metadata analog (:89-100). Prefers
    the current snapshot's embedded manifest (atomic with the commit
    CAS), then the sidecar (local FS directly, object stores via the
    Hadoop FileSystem), then the block=0 row (latest if re-appended by
    a resumed job)."""
    side, _ = mf.committed_manifest(path, spark)
    if side is not None:
        return side
    rows = (
        read_all(spark, path)
        .where(F.col(BLOCK) == bk.MANIFEST_BLOCK)
        .select("metadata")
        .collect()
    )
    if not rows:
        raise FileNotFoundError(f"no manifest row in {path}")
    mans = [mf.from_json(r[0]) for r in rows if r[0]]
    return max(mans, key=lambda m: m.get("created_unix") or 0)


# ---------------------------------------------------------------- decode ----


def _colspecs(man: dict, cols: list[str] | None) -> list[tuple[str, str, str]]:
    specs = [(c["name"], c["spark_type"], c["kind"]) for c in man["columns"]]
    if cols is not None:
        order = {n: i for i, n in enumerate(cols)}
        specs = sorted(
            (s for s in specs if s[0] in order), key=lambda s: order[s[0]]
        )
        missing = set(cols) - {s[0] for s in specs}
        if missing:
            raise ValueError(f"unknown columns {sorted(missing)}")
    return specs



def _blob_plan(man: dict, specs: list[tuple[str, str, str]]):
    """Resolve which blob columns the requested logical columns live in
    (column-group members share one interleaved blob) and build a
    per-row payload getter that decompresses each touched group ONCE.

    Renamed columns: the payload keeps its immutable PHYSICAL name
    (the Iceberg field-id discipline — old and new chunks then agree on
    one blob name forever); the manifest's ``physical`` key maps the
    logical name here, the single payload-resolution choke point."""
    from .codecs import registry as _registry

    phys = {c["name"]: c.get("physical", c["name"]) for c in man["columns"]}
    groups = man.get("column_groups") or {}
    m2g = {m: g for g, ms in groups.items() for m in ms}
    blob_names: list[str] = []
    seen: set[str] = set()
    for name, _, _ in specs:
        b = blob_col(m2g.get(name, phys.get(name, name)))
        if b not in seen:
            seen.add(b)
            blob_names.append(b)

    def payload_getter(get_blob):
        cache: dict[str, list[bytes]] = {}

        def get(name: str) -> bytes | None:
            g = m2g.get(name)
            if g is None:
                return get_blob(blob_col(phys.get(name, name)))
            if g not in cache:
                blob = get_blob(blob_col(g))
                cache[g] = (
                    [None] * len(groups[g])
                    if blob is None
                    else _registry.decode_group(blob)
                )
            return cache[g][groups[g].index(name)]

        return get

    return blob_names, payload_getter


def _evo_decode_fn(columns: list[dict], specs):
    """Evolution-aware per-column decode: a NULL payload (chunk older
    than an added column) yields the column's recorded default instead
    of crashing. Returns ``dec(get, name, kind, n) -> pa.Array``."""
    import pyarrow as pa

    from pyspark.sql import types as _T
    from pyspark.sql.pandas.types import to_arrow_schema as _tas

    defaults = {c["name"]: c.get("default") for c in columns}
    logical = _tas(
        _T._parse_datatype_string(
            ", ".join(f"`{n}` {t}" for n, t, _ in specs)
        )
    )

    def dec(get, name: str, kind: str, n: int) -> "pa.Array":
        raw = get(name)
        if raw is None:
            d = defaults.get(name)
            ft = logical.field(name).type
            return pa.nulls(n, ft) if d is None else pa.array([d] * n, type=ft)
        return selector.decode_column_arrow(raw, kind, n)

    return dec


def _codec_bound_decode(man: dict, names: list[str], share: float = 0.05) -> bool:
    """True when decoding ``names`` is slow-kernel-bound: at least
    ``share`` of some requested column's blocks were committed through
    a bz2 codec (the ~40 MB/s/core kernel the decode rebalance exists
    for). Column-group payloads count if any member column matches.
    No histogram (pre-histogram table generations) -> True (keep the
    rebalance; unknown decode cost is treated as expensive)."""
    hist = man.get("codec_histogram")
    if not hist:
        return True
    groups = man.get("column_groups") or {}
    want = set(names)
    for g, members in groups.items():
        if want & set(members):
            want.add(g)
    for col, counts in hist.items():
        if col not in want:
            continue
        total = sum(counts.values())
        slow = sum(n for codec, n in counts.items() if "bz2" in codec)
        if total and slow / total >= share:
            return True
    return False


def decode_blocks(
    blocks: DataFrame,
    man: dict,
    cols: list[str] | None = None,
    *,
    with_block: bool = False,
    with_chunk: bool = False,
    eq_filter: tuple[str, object] | None = None,
    rebalance: bool | None = None,
) -> DataFrame:
    """blocks -> original rows via mapInArrow (payload bytes in, Arrow
    arrays out — decoded strings never materialize as Python objects;
    the Python loop is per block row, never per value —
    raquet_decode_band analog,
    /root/reference/src/raster/st_raster_value.cpp:145-211).

    ``eq_filter=(col, value)`` is the single-element-extract fast path
    (get_pixel_value analog, ref st_raster_value.cpp:352-420): the
    filter column decodes FIRST; blocks with no matching row skip every
    other payload entirely, and matching blocks emit only the matching
    rows (element take, not full-block Arrow transfer). Point lookups
    over many candidate blocks decode exactly one payload per miss."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    specs = _colspecs(man, cols)
    if eq_filter is not None and eq_filter[0] not in {s[0] for s in specs}:
        raise ValueError(f"eq_filter column {eq_filter[0]!r} not in decode set")
    blob_names, payload_getter = _blob_plan(man, specs)
    # schema evolution: chunks older than an added column carry a NULL
    # payload; decode fills the column's recorded default (NULL if unset)
    defaults = {c["name"]: c.get("default") for c in man["columns"]}
    needed = [BLOCK, SALT, "n_rows"] + blob_names
    if with_chunk:
        # chunk is the partition column of the chunked layout; rows
        # need it so equality deletes apply per their sequence number
        if "chunk" not in blocks.columns:
            raise ValueError("with_chunk requires a chunked-layout read")
        needed.insert(0, "chunk")
    src = blocks.select(*needed)  # Parquet reads only these payloads
    # Full decodes are codec-CPU-bound and per-block cost varies with
    # compressibility, so byte-balanced scan splits are CPU-imbalanced;
    # when the scan has too few splits for the straggler tail to
    # average out (< 4x the session's cores), round-robin the block
    # rows first — measured 5.2 s -> 2.7 s on the 2.6 GB bz2 table.
    # Shuffling the encoded payloads costs ~GB/s against bz2's
    # ~40 MB/s/core decode, so the exchange is noise; at scale (many
    # splits) or on pruned point paths (eq_filter) it is skipped
    # outright (guide §2.5).
    if rebalance is None:
        # codec gate: the exchange only pays for itself against a SLOW
        # decode kernel. bz2 runs ~40 MB/s/core; zstd/zlib/dict decode
        # an order of magnitude faster, so shuffling their payloads
        # costs more than the straggler tail it evens out (measured:
        # fast-effort 2.6 GB table 1.14 s -> 1.45 s with the exchange).
        # The manifest's codec histogram says which kernels the
        # REQUESTED columns actually decode through; tables without
        # one (pre-histogram generations) keep the rebalance.
        rebalance = eq_filter is None and _codec_bound_decode(
            man, [s[0] for s in specs]
        )
    if rebalance:
        sc = blocks.sparkSession.sparkContext
        # byte gate FIRST (file listing only — no plan compile): small
        # tables and pruned deltas decode faster than their exchange
        # schedules, and must not even pay the .rdd partition probe;
        # unknown schemes fall back to the partition-count rule alone
        big_enough = True
        try:
            from urllib.parse import urlparse
            import os as _os

            paths = [urlparse(f).path for f in src.inputFiles()]
            big_enough = sum(_os.path.getsize(p) for p in paths) >= (32 << 20)
        except OSError:
            pass
        if big_enough:
            cur = src.rdd.getNumPartitions()
            if 1 < cur < 4 * sc.defaultParallelism:
                # keyless round-robin, deliberately NOT the byte-LPT
                # spread the re-encode paths use: measured on the
                # 2.6 GB table, LPT balanced the tasks (max/med 1.77/
                # 1.00 -> 1.03/0.62) but the extra tasks' fixed cost
                # inflated the stage 68.9 -> 94.3 core-s — the decode
                # kernel is ~10x cheaper per block than re-encode, so
                # the placement tax is never paid back
                src = src.repartition(2 * sc.defaultParallelism)
    schema_parts = []
    if with_chunk:
        schema_parts += ["chunk int"]
    if with_block:
        schema_parts += [f"{BLOCK} long", f"{SALT} int"]
    schema_parts += [f"`{n}` {t}" for n, t, _ in specs]
    out_schema = ", ".join(schema_parts)
    arrow_schema = to_arrow_schema(T._parse_datatype_string(out_schema))

    def fn(batches):
        for rb in batches:
            n_rows_col = rb.column(rb.schema.get_field_index("n_rows"))
            blk_col = rb.column(rb.schema.get_field_index(BLOCK))
            salt_col = rb.column(rb.schema.get_field_index(SALT))
            chk_col = (
                rb.column(rb.schema.get_field_index("chunk"))
                if with_chunk
                else None
            )
            payload_cols = {
                b: rb.column(rb.schema.get_field_index(b)) for b in blob_names
            }
            for i in range(rb.num_rows):
                n = n_rows_col[i].as_py()

                def get_raw(b, i=i):
                    v = payload_cols[b][i].as_py()
                    return None if v is None else bytes(v)

                get = payload_getter(get_raw)

                def dec(name: str, kind: str, n: int = n) -> pa.Array:
                    raw = get(name)
                    if raw is None:  # pre-evolution chunk: default-fill
                        ftype = arrow_schema.field(name).type
                        d = defaults.get(name)
                        if d is None:
                            return pa.nulls(n, type=ftype)
                        return pa.array([d] * n, type=ftype)
                    return selector.decode_column_arrow(raw, kind, n)

                decoded: dict[str, pa.Array] = {}
                take_idx = None
                if eq_filter is not None:
                    fname, fval = eq_filter
                    kind = next(k for nm, _, k in specs if nm == fname)
                    farr = dec(fname, kind)
                    eq = pc.equal(farr, pa.scalar(fval, type=farr.type))
                    idx = np.flatnonzero(
                        eq.to_numpy(zero_copy_only=False) == True  # noqa: E712
                    )
                    if len(idx) == 0:
                        continue  # no other payload is touched
                    take_idx = pa.array(idx)
                    decoded[fname] = farr.take(take_idx)
                    n_out = len(idx)
                else:
                    n_out = n
                arrays = []
                if with_chunk:
                    arrays.append(
                        pa.array(
                            np.full(n_out, chk_col[i].as_py(), dtype=np.int32),
                            type=pa.int32(),
                        )
                    )
                if with_block:
                    arrays.append(
                        pa.array(
                            np.full(n_out, blk_col[i].as_py(), dtype=np.int64),
                            type=pa.int64(),
                        )
                    )
                    arrays.append(
                        pa.array(
                            np.full(n_out, salt_col[i].as_py(), dtype=np.int32),
                            type=pa.int32(),
                        )
                    )
                for name, _, kind in specs:
                    arr = decoded.get(name)
                    if arr is None:
                        arr = dec(name, kind)
                        if take_idx is not None:
                            arr = arr.take(take_idx)
                    arrays.append(arr)
                yield pa.RecordBatch.from_arrays(
                    [
                        a.cast(f.type) if a.type != f.type else a
                        for a, f in zip(arrays, arrow_schema)
                    ],
                    schema=arrow_schema,
                )

    return src.mapInArrow(fn, schema=out_schema)


# ------------------------------------------------------ row-level deletes ----


def read_delete_entries(
    spark: SparkSession,
    path: str,
    *,
    snapshot_id: int | None = None,
    as_of_unix: float | None = None,
) -> list[dict]:
    """Equality-delete file entries visible at a snapshot (default:
    current). Every commit since a table's first DELETE carries the
    live list in its snapshot, so the entry list at snapshot S is S's
    own record — a snapshot without the key predates all deletes.
    Tables without a snapshot log fall back to the sidecar manifest."""
    snaps = mf.read_snapshots(path, spark)
    if not snaps:
        man = mf.read_sidecar(path, spark)
        return list((man or {}).get("delete_files", []))
    if snapshot_id is not None and as_of_unix is not None:
        raise ValueError("pass snapshot_id OR as_of_unix, not both")
    if snapshot_id is not None:
        if snapshot_id not in snaps:
            raise KeyError(
                f"no snapshot {snapshot_id} at {path}; have {sorted(snaps)}"
            )
        snap = snaps[snapshot_id]
    elif as_of_unix is not None:
        snap = mf.snapshot_as_of(path, as_of_unix, spark)
        if snap is None:
            raise KeyError(f"no snapshot at or before {as_of_unix} in {path}")
    else:
        snap = snaps[max(snaps)]
    # replay rename-column ops committed AFTER this snapshot so its
    # entries resolve against the CURRENT manifest's names (decoded
    # rows always carry current names; the value files themselves are
    # read positionally, so only the logical label needs updating)
    return mf.remap_delete_entries(
        snaps, snap["snapshot_id"], list(snap.get("delete_files", []))
    )


def _apply_delete_entries(
    spark: SparkSession,
    path: str,
    rows: DataFrame,
    entries: list[dict],
    chunk_col: str = "chunk",
) -> DataFrame:
    """Merge-on-read: anti-join decoded rows against each equality
    delete key-set's (values, seq) rows. Delete files are small by
    contract, so the join is a BROADCAST hash anti-join — no shuffle of
    the data side; the residual ``chunk <= seq`` sequence predicate
    keeps rows appended AFTER a delete visible even when their key
    matches (Iceberg's sequence-number rule).

    Plan size is O(#key sets), not O(#delete commits): v2 files of a
    key set share one fixed schema (``_k0.., _dseq`` — sequence per
    ROW), so all of them load through a single multi-path parquet
    read; only legacy v1 files (constant per-file seq, arbitrary
    internal name) still need a per-file union."""
    for cols, dd in _delete_sides(spark, path, entries):
        cond = F.col(chunk_col) <= F.col("_dseq")
        for i, c in enumerate(cols):
            cond = cond & (F.col(c) == F.col(f"_dv{i}"))
        rows = rows.join(F.broadcast(dd), on=cond, how="left_anti")
    return rows


def _read_v2_delete_dirs(spark, dirs: list[str]) -> DataFrame:
    """One DataFrame over many v2 delete dirs, robust to key-column
    type WIDENING between commits: a multi-path parquet scan takes its
    schema from one arbitrary footer, so an int32 ``_k0`` file next to
    a post-widen int64 one fails (or silently mis-reads) at scan time.
    Dirs are grouped by footer schema — one multi-path scan per group
    (O(#widens+1) groups, not O(#commits)) — and the groups union;
    Spark's set-operation widening coerces the key types to the widest
    member, matching the table's evolved logical type."""
    by_schema: dict[tuple, list[str]] = {}
    for d in dirs:
        key = tuple(
            (f.name, f.dataType.simpleString())
            for f in spark.read.parquet(d).schema.fields
        )
        by_schema.setdefault(key, []).append(d)
    parts = [spark.read.parquet(*ds) for ds in by_schema.values()]
    dd = parts[0]
    for p in parts[1:]:
        dd = dd.unionByName(p)
    return dd


def _delete_sides(spark, path, entries):
    """Group equality-delete entries by key-column set and build one
    broadcast-side DataFrame per set with columns ``_dv0.._dv{k-1},
    _dseq``. v2 entries fold into ONE multi-path parquet scan."""
    groups: dict[tuple, list[dict]] = {}
    for e in entries:
        groups.setdefault(tuple(mf.delete_entry_cols(e)), []).append(e)
    out = []
    for cols, es in sorted(groups.items()):
        dvs = [F.col(f"_k{i}").alias(f"_dv{i}") for i in range(len(cols))]
        v2_dirs = [
            os.path.join(path, e["dir"]) for e in es if e.get("v", 1) >= 2
        ]
        dd = None
        if v2_dirs:
            dd = _read_v2_delete_dirs(spark, v2_dirs).select(*dvs, "_dseq")
        for e in es:
            if e.get("v", 1) >= 2:
                continue
            d0 = spark.read.parquet(os.path.join(path, e["dir"]))
            # POSITIONAL select of the single value column: a v1 file
            # written before evolve_rename_column keeps the old name
            # internally while the entry's `col` follows the rename
            d = d0.select(
                F.col(d0.columns[0]).alias("_dv0"),
                F.lit(int(e["seq"])).cast("long").alias("_dseq"),
            )
            dd = d if dd is None else dd.unionByName(d)
        out.append((cols, dd))
    return out


def _dcols_of(entries) -> set[str]:
    return {c for e in entries for c in mf.delete_entry_cols(e)}


def _delete_flag_join(
    spark: SparkSession,
    path: str,
    rows: DataFrame,
    entries: list[dict],
    chunk_col: str = "chunk",
):
    """Broadcast LEFT joins that FLAG (not drop) rows matching the
    given equality-delete entries. Returns ``(flagged_df, any_match)``;
    the right side is uniqued per key tuple with max(seq), so the join
    can never fan out. Used where the matching rows themselves are the
    result (changelog deletes/resurrections) — the read path's
    anti-join stays :func:`_apply_delete_entries`."""
    from functools import reduce

    conds = []
    for gi, (cols, dd) in enumerate(_delete_sides(spark, path, entries)):
        dvs = [f"_dv{i}" for i in range(len(cols))]
        dd = (
            dd.groupBy(*dvs)
            .agg(F.max("_dseq").alias("_dseq"))
            .select(
                *[F.col(v).alias(f"_g{gi}{v}") for v in dvs],
                F.col("_dseq").alias(f"_g{gi}_ds"),
            )
        )
        cond = F.col(chunk_col) <= F.col(f"_g{gi}_ds")
        for i, c in enumerate(cols):
            cond = cond & (F.col(c) == F.col(f"_g{gi}_dv{i}"))
        rows = rows.join(F.broadcast(dd), on=cond, how="left")
        conds.append(F.col(f"_g{gi}_dv0").isNotNull())
    return rows, reduce(lambda a, b: a | b, conds)


def read_rows(
    spark: SparkSession,
    path: str,
    cols: list[str] | None = None,
    *,
    snapshot_id: int | None = None,
    as_of_unix: float | None = None,
    ref: str | None = None,
    apply_deletes: bool = True,
    man: dict | None = None,
) -> DataFrame:
    """The table-level reader: time-travel block scan + decode +
    merge-on-read equality-delete anti-join. This is what SELECT means
    on a table with row-level deletes; ``read_blocks``/``decode_blocks``
    stay the physical layer underneath (deletes not applied).
    ``ref`` reads at a named tag (``encode.create_tag``)."""
    if ref is not None:
        if snapshot_id is not None or as_of_unix is not None:
            raise ValueError("pass snapshot_id, as_of_unix OR ref, not both")
        snapshot_id = mf.resolve_ref(path, ref, spark)
    man = man or read_manifest(spark, path)
    blocks = read_blocks_at(
        spark, path, snapshot_id=snapshot_id, as_of_unix=as_of_unix
    )
    entries = (
        read_delete_entries(
            spark, path, snapshot_id=snapshot_id, as_of_unix=as_of_unix
        )
        if apply_deletes
        else []
    )
    return _decode_with_entries(spark, path, blocks, man, cols, entries)


def _decode_with_entries(
    spark: SparkSession,
    path: str,
    blocks: DataFrame,
    man: dict,
    cols: list[str] | None,
    entries: list[dict],
) -> DataFrame:
    """Decode + merge-on-read equality-delete anti-join — the shared
    tail of :func:`read_rows` and :func:`read_staged_rows`."""
    if not entries:
        return decode_blocks(blocks, man, cols)
    names = [c["name"] for c in man["columns"]]
    want = list(cols) if cols is not None else names
    dcols = sorted(_dcols_of(entries))
    unknown = set(dcols) - set(names)
    if unknown:
        raise ValueError(
            f"delete files reference missing columns {sorted(unknown)} "
            "(renamed or dropped after the delete?)"
        )
    dec_cols = list(dict.fromkeys(want + dcols))
    rows = decode_blocks(blocks, man, dec_cols, with_chunk=True)
    rows = _apply_delete_entries(spark, path, rows, entries)
    return rows.select(*want)


def read_staged_rows(
    spark: SparkSession,
    path: str,
    token: str,
    cols: list[str] | None = None,
) -> DataFrame:
    """AUDIT read of a staged write-audit-publish commit
    (``encode.append_chunk(..., staged=True)`` or
    ``encode.delete_rows(..., staged=True)``): the table AS IF the
    staged commit were published — for an append, the parent chunks
    plus the staged chunk; for a delete, the parent chunks with the
    staged entry applied on top of the parent's deletes (the staged
    manifest carries both). Readers without the token (read_rows, the
    datasource, time travel) see neither."""
    rec = mf.get_staged(path, token, spark)
    man = rec["manifest"]
    # schema evolution committed AFTER staging would make the staged
    # manifest's decode bind against files the current schema renamed/
    # added/widened — refuse loudly rather than serve wrong columns
    # (publish_staged applies the same rule to rebase)
    cur = mf.committed_manifest(path, spark)[0]
    _spec = lambda m: [  # noqa: E731
        (c["name"], c["spark_type"], c.get("physical", c["name"]))
        for c in m["columns"]
    ]
    if cur is not None and _spec(cur) != _spec(man):
        raise ValueError(
            "table schema changed since this commit was staged; "
            "drop_staged and re-stage against the new schema"
        )
    blocks = _read_raw(spark, path).where(
        (F.col(BLOCK) != bk.MANIFEST_BLOCK)
        & F.col("chunk").isin([int(c) for c in rec["chunks"]])
    )
    entries = list(man.get("delete_files") or [])
    return _decode_with_entries(spark, path, blocks, man, cols, entries)


def _clear_stale_table_meta(spark: SparkSession, src: str, dst: str) -> None:
    """Writing a fresh table into a reused path must not inherit the
    old occupant's snapshot log or delete files — readers prefer the
    `_snapshots/` log over the sidecar, so stale metadata would
    override the new data (wrong chunk visibility, phantom deletes)."""
    from . import fsio

    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError("src and dst must differ (in-place rewrite "
                         "would read the files it is overwriting)")
    for sub in ("_snapshots", "_deletes", "_lineage"):
        fsio.delete_dir(spark, os.path.join(dst, sub))


def purge_deletes(
    spark: SparkSession, src: str, dst: str, zlib_level: int = 6
) -> dict:
    """Physically apply a table's equality-delete files into a NEW
    committed table (merge-on-read -> copy-on-write compaction step):
    per-block decode -> drop matching rows -> re-encode via
    :func:`transform_blocks`. A delete file applies to chunk ``c`` iff
    ``c <= seq`` — monotone in ``c`` — so chunks group into intervals
    by which files apply; chunks no file touches pass through with
    payloads unread. The output table carries no delete files (and
    fresh chunk ids), so its reads skip the anti-join entirely."""
    from functools import reduce

    from . import encode as enc

    man = read_manifest(spark, src)
    entries = man.get("delete_files") or []
    if not entries:
        raise ValueError(
            f"no delete files at {src}; use compact_to_path for plain "
            "compaction"
        )
    blocks = read_blocks(spark, src)
    # delete sets are broadcast-sized by contract (delete_rows doc).
    # v2 files carry a PER-ROW sequence (compact_delete_files merges
    # commits with different horizons into one file), so one file can
    # yield several (key-set, seq, values) groups — a value deleted at
    # seq 2 must NOT purge a matching row re-inserted in chunk 3 just
    # because a different value in the same file has seq 5.
    sets: list[tuple[tuple[str, ...], int, set]] = []
    for e in entries:
        cols = tuple(mf.delete_entry_cols(e))
        drows = spark.read.parquet(os.path.join(src, e["dir"])).collect()
        if e.get("v", 1) >= 2:
            k = len(cols)
            by_seq: dict[int, set] = {}
            for r in drows:
                key = r[0] if k == 1 else tuple(r[i] for i in range(k))
                by_seq.setdefault(int(r["_dseq"]), set()).add(key)
            for s, vals in sorted(by_seq.items()):
                sets.append((cols, s, vals))
        else:
            sets.append((cols, int(e["seq"]), {r[0] for r in drows}))
    chunks = sorted(
        int(r["chunk"]) for r in blocks.select("chunk").distinct().collect()
    )
    # clear the reused destination only after every src-side read above
    # succeeded — failing earlier must leave dst's previous occupant
    # intact, not half-stripped of its metadata
    _clear_stale_table_meta(spark, src, dst)
    groups: dict[tuple, list[int]] = {}
    for c in chunks:
        key = tuple(i for i, (_, s, _) in enumerate(sets) if s >= c)
        groups.setdefault(key, []).append(c)
    out_names = enc.blocks_schema(
        man["columns"], man.get("column_groups")
    ).fieldNames()
    parts: list[DataFrame] = []
    for key, cs in sorted(groups.items()):
        sub = blocks.where(F.col("chunk").isin(cs))
        if not key:
            parts.append(sub.select(*out_names))  # payloads untouched
            continue
        by_key: dict[tuple, set] = {}
        for i in key:
            kc, _, vals = sets[i]
            by_key.setdefault(kc, set()).update(vals)
        # materialize each key set's probe values ONCE per chunk group
        # (they ship in the closure, converted per executor at
        # deserialization) — not rebuilt on every per-block call
        preds = [
            (list(kc), sorted(vals) if len(kc) == 1 else set(vals))
            for kc, vals in sorted(by_key.items())
        ]

        def row_filter(frame, preds=preds):
            keep = np.ones(len(frame), dtype=bool)
            for kc, vals in preds:
                if len(kc) == 1:
                    keep &= ~frame[kc[0]].isin(vals).to_numpy(dtype=bool)
                else:  # composite: tuple-membership via MultiIndex
                    mi = pd.MultiIndex.from_frame(frame[kc])
                    keep &= ~np.asarray(mi.isin(vals))
            return keep

        parts.append(
            transform_blocks(
                sub, man, row_filter, zlib_level,
                filter_cols=sorted({c for kc, _ in preds for c in kc}),
            )
        )
    merged = reduce(DataFrame.unionByName, parts)
    base = {k: v for k, v in man.items() if k not in (
        "num_blocks", "num_rows", "raw_bytes", "enc_bytes",
        "codec_histogram", "created_unix", "delete_files",
    )}
    base.update({
        "num_blocks": None, "num_rows": None, "raw_bytes": None,
        "enc_bytes": None, "codec_histogram": {}, "created_unix": None,
        "purged_from": src, "shuffle": "hash",
    })
    final = enc.write_blocks(merged, dst, base, man["columns"])
    mf.write_chunk_lineage(
        dst, 0,
        {"chunk": 0, "rows": final["num_rows"],
         "raw_bytes": final["raw_bytes"], "enc_bytes": final["enc_bytes"],
         "purged_from": src, "applied_delete_files": len(entries)},
        spark,
    )
    return final


def read_changes(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    cols: list[str] | None = None,
) -> DataFrame:
    """Changelog scan (Iceberg `changes` analog): NET row-level changes
    between two snapshots, tagged ``_change_type`` 'insert' | 'delete'.

    * inserts — rows of chunks added in ``(from, to]`` that are still
      alive at ``to`` (a row inserted and deleted inside the range is a
      net no-op and appears as neither);
    * deletes — rows alive at ``from`` that equality-delete files
      committed in the range remove (broadcast left-join flags, no
      shuffle of the decoded side), plus all alive-at-``from`` rows of
      chunks a rollback removed in the range.

    Chunk immutability makes the insert side partition-pruned to the
    new chunks only; the delete side decodes only surviving chunks
    (delete files target chunks <= their sequence number, all of which
    existed at ``from``). Both sides together cost O(delta), not
    O(table) — the property an incremental index refresher or
    downstream aggregate needs."""
    from functools import reduce

    snaps = mf.read_snapshots(path, spark)
    if not snaps:
        raise FileNotFoundError(f"no snapshot log at {path}")
    to_id = max(snaps) if to_snapshot_id is None else to_snapshot_id
    for sid in (from_snapshot_id, to_id):
        if sid not in snaps:
            raise KeyError(f"no snapshot {sid} at {path}; have {sorted(snaps)}")
    _guard_rewrites(snaps, from_snapshot_id, to_id, "read_changes")
    man = read_manifest(spark, path)
    names = [c["name"] for c in man["columns"]]
    want = list(cols) if cols is not None else names
    # via read_delete_entries so rename ops committed after either
    # endpoint are replayed over the entries' column names
    entries_from = read_delete_entries(
        spark, path, snapshot_id=from_snapshot_id
    )
    entries_to = read_delete_entries(spark, path, snapshot_id=to_id)
    seen = {e["dir"] for e in entries_from}
    new_entries = [e for e in entries_to if e["dir"] not in seen]
    for e in entries_from + entries_to:
        for c in mf.delete_entry_cols(e):
            if c not in names:
                raise ValueError(
                    f"delete file {e['dir']} references missing column "
                    f"{c!r} (renamed or dropped after the range?)"
                )
    chunks_from = set(snaps[from_snapshot_id]["chunks"])
    chunks_to = set(snaps[to_id]["chunks"])
    added = sorted(chunks_to - chunks_from)
    removed = sorted(chunks_from - chunks_to)
    surviving = sorted(chunks_from & chunks_to)

    parts: list[DataFrame] = []
    if added:
        blocks_new = read_blocks_at(spark, path, snapshot_id=to_id).where(
            F.col("chunk").isin(added)
        )
        dcols = sorted(_dcols_of(entries_to))
        dec = list(dict.fromkeys(want + dcols))
        rows_new = decode_blocks(
            blocks_new, man, dec, with_chunk=True, rebalance=False
        )
        if entries_to:
            rows_new = _apply_delete_entries(spark, path, rows_new, entries_to)
        parts.append(
            rows_new.select(*want).withColumn("_change_type", F.lit("insert"))
        )
    if new_entries and surviving:
        blocks_old = read_blocks_at(
            spark, path, snapshot_id=from_snapshot_id
        ).where(F.col("chunk").isin(surviving))
        dcols = sorted(_dcols_of(entries_from) | _dcols_of(new_entries))
        rows_old = decode_blocks(
            blocks_old, man, list(dict.fromkeys(want + dcols)),
            with_chunk=True, rebalance=False,
        )
        if entries_from:
            rows_old = _apply_delete_entries(spark, path, rows_old, entries_from)
        flagged, cond = _delete_flag_join(spark, path, rows_old, new_entries)
        parts.append(
            flagged.where(cond)
            .select(*want)
            .withColumn("_change_type", F.lit("delete"))
        )
    removed_entries = [
        e
        for e in entries_from
        if e["dir"] not in {x["dir"] for x in entries_to}
    ]
    if removed_entries and surviving:
        # rows a rollback RESURRECTED: dead at `from` because of a
        # since-removed delete file, alive at `to` — net inserts
        blocks_srv = read_blocks_at(spark, path, snapshot_id=to_id).where(
            F.col("chunk").isin(surviving)
        )
        dcols = sorted(_dcols_of(entries_to) | _dcols_of(removed_entries))
        rows_srv = decode_blocks(
            blocks_srv, man, list(dict.fromkeys(want + dcols)),
            with_chunk=True, rebalance=False,
        )
        flagged, cond = _delete_flag_join(
            spark, path, rows_srv, removed_entries
        )
        was_dead = flagged.where(cond)
        if entries_to:
            was_dead = _apply_delete_entries(spark, path, was_dead, entries_to)
        parts.append(
            was_dead.select(*want).withColumn("_change_type", F.lit("insert"))
        )
    if removed:
        blocks_rm = read_blocks_at(
            spark, path, snapshot_id=from_snapshot_id
        ).where(F.col("chunk").isin(removed))
        dcols = sorted(_dcols_of(entries_from))
        rows_rm = decode_blocks(
            blocks_rm, man, list(dict.fromkeys(want + dcols)),
            with_chunk=True, rebalance=False,
        )
        if entries_from:
            rows_rm = _apply_delete_entries(spark, path, rows_rm, entries_from)
        parts.append(
            rows_rm.select(*want).withColumn("_change_type", F.lit("delete"))
        )
    if not parts:
        empty = read_blocks_at(spark, path, snapshot_id=to_id).limit(0)
        return decode_blocks(empty, man, want).withColumn(
            "_change_type", F.lit("insert")
        )
    return reduce(DataFrame.unionByName, parts)


# ------------------------------------------------------------ point/range ----


def point_lookup(
    spark: SparkSession,
    path: str,
    url: str,
    ts_epoch: int | None = None,
    cols: list[str] | None = None,
    man: dict | None = None,
) -> DataFrame:
    """Point query — ST_RasterValue/read_raquet_at analog: O(1) key
    computation on the driver, equality (or small isin cover) predicate
    pushed to Parquet, decode of only the touched block(s), exact url
    filter after decode (the in-block offset analog)."""
    man = man or read_manifest(spark, path)
    res = man["key"]["resolution"]
    bucket = man["key"]["bucket_seconds"]
    origin = man["key"].get("ts_origin", 0)
    blocks = read_blocks(spark, path)
    if ts_epoch is not None:
        key = bk.key_for_point(url, ts_epoch, res, bucket, origin)
        pruned = blocks.where(F.col(BLOCK) == key)
    else:
        pruned = prune_blocks_for_url_hash(blocks, man, bk.hash_x_from_url(url))
    url_col = man["url_col"]
    want = cols if cols is None else list(dict.fromkeys([url_col] + cols))
    entries = man.get("delete_files") or []
    if entries and "chunk" in blocks.columns:
        # row-level deletes: decode the delete columns too, anti-join
        # per sequence rule, then project back down
        dcols = sorted(_dcols_of(entries))
        dec_cols = (
            None if want is None else list(dict.fromkeys(want + dcols))
        )
        decoded = decode_blocks(
            pruned, man, dec_cols, with_chunk=True, eq_filter=(url_col, url)
        )
        decoded = _apply_delete_entries(spark, path, decoded, entries)
        names = [c["name"] for c in man["columns"]]
        decoded = decoded.select(*(want if want is not None else names))
    else:
        decoded = decode_blocks(pruned, man, want, eq_filter=(url_col, url))
    out = decoded.where(F.col(url_col) == url)  # no-op safety re-check
    return out.select(*cols) if cols is not None else out


MAX_POINT_KEYS = 1024


def prune_blocks_for_url_hash(blocks: DataFrame, man: dict, x26: int) -> DataFrame:
    """ts-less point pruning, sargable at every resolution.

    A url with unknown timestamp touches one cell per time bucket —
    2^res candidates. Materializing them as an ``isin`` literal list
    (QUADBIN_POLYFILL-style) stops scaling past res ~10 (8K+ literals in
    the plan; unusable at res 20). Instead: a Morton BETWEEN over the
    hash-slice envelope plus the exact bit-extracted
    ``hash_cell_col(block, res) == xr`` predicate — the same
    extract-and-compare pattern :func:`prune_blocks_for_ts` uses for
    time (ref /root/reference/src/raquet_extension.cpp:61-64).

    Because an expression predicate can't prune Parquet row groups, a
    key-column-only pre-scan (payloads never read) first recovers the
    cells that actually exist — bounded by how often the url's hash cell
    was crawled — and those become a pushed ``isin``. If the cell is
    pathologically hot (> MAX_POINT_KEYS blocks) the isin is skipped and
    the bit predicate alone filters."""
    res = man["key"]["resolution"]
    shift = bk.COORD_BITS - res
    xr = int(x26) >> shift
    lo = int(bk.key_from_parts(np.uint64(xr << shift), np.uint64(0), res))
    hi = int(
        bk.key_from_parts(np.uint64(xr << shift), np.uint64(bk.COORD_MAX), res)
    )
    exact = F.col(BLOCK).between(lo, hi) & (
        bk.hash_cell_col(F.col(BLOCK), res) == xr
    )
    hits = (
        blocks.select(BLOCK)
        .where(exact)
        .distinct()
        .limit(MAX_POINT_KEYS + 1)
        .collect()
    )
    keys = sorted(int(r[0]) for r in hits)
    if 0 < len(keys) <= MAX_POINT_KEYS:
        return blocks.where(
            F.col(BLOCK).between(keys[0], keys[-1]) & F.col(BLOCK).isin(keys)
        )
    return blocks.where(exact)


def prune_blocks_for_ts(
    blocks: DataFrame, man: dict, lo_epoch: int, hi_epoch: int
) -> DataFrame:
    """Block-level time-range pruning, no decode: sargable key BETWEEN
    (row-group pruning on the sorted key), exact bit-extracted ts-bucket
    match (polyfill-membership analog,
    /root/reference/src/raquet_extension.cpp:61-64), then exact
    stats.ts_min/ts_max overlap."""
    res = man["key"]["resolution"]
    bucket = man["key"]["bucket_seconds"]
    origin = man["key"].get("ts_origin", 0)
    shift = bk.COORD_BITS - res
    max_cell = (1 << res) - 1
    ylr = min(max(0, (lo_epoch - origin) // bucket), max_cell)
    yhr = min(max(0, (hi_epoch - origin) // bucket), max_cell)
    lo_key = int(bk.key_from_parts(np.uint64(0), np.uint64(ylr << shift), res))
    hi_key = int(
        bk.key_from_parts(np.uint64(bk.COORD_MAX), np.uint64(yhr << shift), res)
    )
    lo_us, hi_us = lo_epoch * 1_000_000, hi_epoch * 1_000_000
    return blocks.where(
        F.col(BLOCK).between(lo_key, hi_key)
        & bk.ts_bucket_col(F.col(BLOCK), res).between(ylr, yhr)
        & (F.col("stats.ts_min") <= hi_us)
        & (F.col("stats.ts_max") >= lo_us)
    )


def range_scan_ts(
    spark: SparkSession,
    path: str,
    lo_epoch: int,
    hi_epoch: int,
    cols: list[str] | None = None,
    man: dict | None = None,
) -> DataFrame:
    """Time-range scan: block pruning -> decode -> exact row filter
    [lo, hi) — the read_raquet(file, geometry) analog."""
    man = man or read_manifest(spark, path)
    ts_col = man["ts_col"]
    if ts_col is None:
        raise ValueError("table has no timestamp column")
    blocks = prune_blocks_for_ts(read_blocks(spark, path), man, lo_epoch, hi_epoch)
    want = cols if cols is None else list(dict.fromkeys([ts_col] + cols))
    entries = man.get("delete_files") or []
    if entries and "chunk" in blocks.columns:
        # merge-on-read: decode delete columns too, anti-join per the
        # sequence rule, project back down (mirrors point_lookup)
        dcols = sorted(_dcols_of(entries))
        dec_cols = None if want is None else list(dict.fromkeys(want + dcols))
        decoded = decode_blocks(
            blocks, man, dec_cols, with_chunk=True, rebalance=False
        )
        decoded = _apply_delete_entries(spark, path, decoded, entries)
        names = [c["name"] for c in man["columns"]]
        decoded = decoded.select(*(want if want is not None else names))
    else:
        decoded = decode_blocks(blocks, man, want, rebalance=False)
    out = decoded.where(
        (F.col(ts_col) >= F.timestamp_seconds(F.lit(lo_epoch)))
        & (F.col(ts_col) < F.timestamp_seconds(F.lit(hi_epoch)))
    )
    return out.select(*cols) if cols is not None else out


# ------------------------------------------------------- decode-free stats ----


def summary_stats(blocks: DataFrame, stat_key: str) -> DataFrame:
    """count/sum/mean/min/max/stddev from per-block stats columns only —
    the ST_RasterSummaryStats precomputed-passthrough analog
    (/root/reference/src/raster/st_raster_stats.cpp:311-349): no payload
    is decoded. ``stat_key`` is an input column name (int/timestamp) or
    ``len_<col>`` for string char-lengths."""
    s = F.col("num_stats").getItem(stat_key)
    agg = blocks.where(s.isNotNull()).agg(
        F.sum(s.getField("cnt")).alias("cnt"),
        F.sum(s.getField("sum")).alias("sum"),
        F.min(s.getField("min")).alias("min"),
        F.max(s.getField("max")).alias("max"),
        F.sum(s.getField("sum_sq")).alias("sum_sq"),
    )
    # sum*sum must multiply as DOUBLE: the long product overflows once
    # the column total passes 2^31.5 (a ~2.4x-scale table of len_text
    # already sits at 2.4e9 — ANSI mode then kills the whole query).
    # Values are bit-identical where the long path survived: sum is an
    # exactly-representable double here, and fl(s)*fl(s) rounds the
    # exact product to the SAME nearest double the old long-multiply-
    # then-divide path produced.
    s_d = F.col("sum").cast("double")
    return agg.select(
        F.col("cnt"),
        F.col("sum"),
        (F.col("sum") / F.col("cnt")).alias("mean"),
        F.col("min"),
        F.col("max"),
        F.sqrt(
            (F.col("sum_sq") - s_d * s_d / F.col("cnt"))
            / (F.col("cnt") - 1)
        ).alias("stddev"),
    )


def column_stats(
    spark: SparkSession, path: str, *, with_ndv_sketch: bool = False
) -> DataFrame:
    """ANALYZE TABLE analog (Iceberg ``compute_table_stats``): one row
    per column with storage + statistics, computed from block METADATA
    and blob lengths only — no payload decodes, one aggregate pass:

    ``(column, codec_mix, n_blocks, enc_bytes, enc_share, ndv,
    min_val, max_val)``

    * ``enc_bytes`` / ``enc_share`` — where the compressed budget goes
      (the first question a codec engineer asks of a 100 TB table);
    * ``ndv`` — EXACT distinct count for categorical (dict-eligible)
      columns, merged from the per-block ``cat_counts`` key sets; NULL
      for high-cardinality columns (no per-block set is kept for them
      by design — the stats would be table-sized);
    * ``min_val``/``max_val`` — from per-block ``num_stats`` for
      int/timestamp columns (``len_<col>`` char-length stats are
      served by :func:`summary_stats`, not repeated here).

    The whole pass is one hash aggregate over the blocks table's
    metadata columns; per-column rows materialize driver-side from the
    single result row (O(#columns)).

    ``with_ndv_sketch=True`` appends an ``ndv_est`` column served from
    the persisted KMV sketch (:func:`analyze_ndv`) when it matches the
    current snapshot — the NDV answer for high-cardinality columns
    whose exact ``ndv`` is NULL by design, still metadata-only here
    (the decode pass happened at ANALYZE time, like Iceberg's Puffin
    stats files)."""
    man = read_manifest(spark, path)
    blocks = read_blocks(spark, path)
    aggs = []
    for c in man["columns"]:
        name = c["name"]
        p = c.get("physical", name)
        blob = F.col(f"{p}_blob")
        keys = F.map_keys(
            F.coalesce(
                F.col("cat_counts").getItem(name),
                F.create_map().cast("map<string,bigint>"),
            )
        )
        ns = F.col("num_stats").getItem(name)
        aggs += [
            F.count(F.when(blob.isNotNull(), 1)).alias(f"nb__{name}"),
            F.coalesce(F.sum(F.octet_length(blob)), F.lit(0)).alias(
                f"enc__{name}"
            ),
            F.size(
                F.array_distinct(F.flatten(F.collect_list(keys)))
            ).alias(f"ndv__{name}"),
            # a block WITHOUT cat stats for this column means the
            # column is not dict-eligible there: the merged key set is
            # then a subset, not the NDV — track it to null the result
            F.count(
                F.when(
                    blob.isNotNull()
                    & F.col("cat_counts").getItem(name).isNull(),
                    1,
                )
            ).alias(f"nocat__{name}"),
            F.min(ns.getField("min")).alias(f"min__{name}"),
            F.max(ns.getField("max")).alias(f"max__{name}"),
        ]
    row = blocks.agg(*aggs).collect()[0]
    total = sum(int(row[f"enc__{c['name']}"] or 0) for c in man["columns"])
    out = []
    for c in man["columns"]:
        name = c["name"]
        enc = int(row[f"enc__{name}"] or 0)
        ndv = (
            int(row[f"ndv__{name}"])
            if int(row[f"nocat__{name}"] or 0) == 0
            and int(row[f"ndv__{name}"] or 0) > 0
            else None
        )
        out.append(
            (
                name,
                json.dumps(
                    man.get("codec_histogram", {}).get(name, {}),
                    sort_keys=True,
                ),
                int(row[f"nb__{name}"] or 0),
                enc,
                round(enc / total, 4) if total else 0.0,
                ndv,
                row[f"min__{name}"],
                row[f"max__{name}"],
            )
        )
    if not with_ndv_sketch:
        return spark.createDataFrame(
            out,
            "column string, codec_mix string, n_blocks long, enc_bytes long,"
            " enc_share double, ndv long, min_val long, max_val long",
        )
    sk = read_ndv_sketch(spark, path)
    cur = mf.current_snapshot(path, spark)
    cur_id = int(cur["snapshot_id"]) if cur else None
    cols_sk = (
        sk["columns"]
        if sk is not None and sk.get("snapshot_id") == cur_id
        else {}
    )
    out = [
        r + (cols_sk.get(r[0], {}).get("ndv_est"),)
        for r in out
    ]
    return spark.createDataFrame(
        out,
        "column string, codec_mix string, n_blocks long, enc_bytes long,"
        " enc_share double, ndv long, min_val long, max_val long,"
        " ndv_est long",
    )


# ------------------------------------------------- NDV sketch (ANALYZE) ----

# KMV (k-minimum-values) distinct-count sketch — the Iceberg
# compute_table_stats / Puffin-stats analog for the columns where
# column_stats' exact merged key sets are unavailable BY DESIGN (a url
# column at 10^12 rows keeps no per-block value set). The estimator is
# the classic bottom-k order statistic (Bar-Yossef et al. 2002):
# NDV ~= (k-1) * SPACE / h_k, with h_k the k-th smallest hash of the
# distinct values. Everything is integer: the hash is the first 10 hex
# chars (40 bits) of md5, the estimate is exact integer division — so
# any ANSI engine (DuckDB: ('0x'||substr(md5(v),1,10))::BIGINT) replays
# the sketch and the estimate bit-for-bit. 40 bits keeps (k-1)*SPACE
# inside int64 for k <= 2^22; the estimator's own ~1/sqrt(k) error
# dwarfs 40-bit birthday collisions up to ~10^10 distinct values.
NDV_SKETCH_K = 256
NDV_HASH_BITS = 40
NDV_SPACE = 1 << NDV_HASH_BITS
_NDV_STATS_FILE = "ndv.json"


def ndv_hash_col(col: Column) -> Column:
    """40-bit md5-prefix hash of a value, engine-portable (UTF-8 bytes
    of the string form; conv parses the hex prefix)."""
    return F.conv(
        F.substring(F.md5(F.encode(col.cast("string"), "UTF-8")), 1, 10), 16, 10
    ).cast("long")


def kmv_merge(a: list[int], b: list[int], k: int = NDV_SKETCH_K) -> list[int]:
    """Union two KMV sketches: the k smallest of the merged hash sets.
    Exactly the sketch of the concatenated inputs — the property that
    makes per-chunk sketches mergeable across appends."""
    return sorted(set(a) | set(b))[:k]


def kmv_estimate(hashes: list[int], k: int = NDV_SKETCH_K) -> int:
    """Integer-exact NDV estimate from a sorted KMV sketch. A sketch
    smaller than k IS the exact distinct-hash count."""
    if len(hashes) < k:
        return len(hashes)
    return (k - 1) * NDV_SPACE // hashes[k - 1]


def _kmv_of(df: DataFrame, col: str, k: int) -> list[int]:
    """k smallest distinct 40-bit hashes of a column — distinct is one
    well-distributed hash shuffle, the bottom-k is TakeOrderedAndProject
    (per-partition top-k merged on the driver, never a global sort);
    the driver holds k longs, nothing else."""
    c = F.col(col)
    rows = (
        df.where(c.isNotNull())
        .select(ndv_hash_col(c).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return [int(r["h"]) for r in rows]


def _ndv_stats_dir(path: str) -> str:
    return os.path.join(path, "_stats")


def read_ndv_sketch(spark: SparkSession, path: str) -> dict | None:
    """The persisted NDV sketch sidecar (or None): ``{"snapshot_id": n,
    "k": k, "columns": {col: {"hashes": [...], "ndv_est": n}}}``."""
    from . import fsio

    try:
        raw = fsio.read_bytes(spark, _ndv_stats_dir(path), _NDV_STATS_FILE)
    except Exception:
        return None
    return json.loads(raw.decode("utf-8"))


def analyze_ndv(
    spark: SparkSession,
    path: str,
    cols: list[str] | None = None,
    *,
    k: int = NDV_SKETCH_K,
    persist: bool = True,
    incremental: bool = False,
) -> DataFrame:
    """NDV sketches for high-cardinality columns of an encoded table —
    the decode-pass half of ANALYZE (Iceberg ``compute_table_stats``
    writing a Puffin stats file; ``column_stats`` stays the
    metadata-only half). One pruned decode per requested column (only
    that column's blobs are read), one KMV sketch each, persisted to
    ``_stats/ndv.json`` keyed by snapshot id so later reads are
    metadata-only.

    ``incremental=True`` is the 100 TB maintenance path: if a persisted
    sketch exists and every snapshot since it is an ``append``, only
    the appended chunks (``read_appended_between`` — partition-pruned,
    O(delta)) are scanned and their sketches KMV-merged into the
    persisted one; any delete/rewrite in between falls back to a full
    recompute (KMV unions are insert-only, the Iceberg stats caveat).

    Returns ``(column, n_hashes, kth_hash, ndv_est)`` — all integers,
    replayable exactly by any engine with md5."""
    man = read_manifest(spark, path)
    known = {c["name"] for c in man["columns"]}
    if cols is None:
        cols = [c["name"] for c in man["columns"] if c["kind"] == "string"]
    missing = [c for c in cols if c not in known]
    if missing:
        raise KeyError(f"unknown column(s) {missing}; table has {sorted(known)}")

    cur = mf.current_snapshot(path, spark)
    cur_id = int(cur["snapshot_id"]) if cur else None
    prev = read_ndv_sketch(spark, path) if incremental else None
    delta_blocks = None
    if prev is not None and cur_id is not None:
        snaps = mf.read_snapshots(path, spark)
        prev_id = int(prev["snapshot_id"])
        between = [
            snaps[i]
            for i in sorted(snaps)
            if prev_id < i <= cur_id and i in snaps
        ]
        appends_only = (
            prev_id in snaps
            and len(between) == cur_id - prev_id
            and all(s.get("op") == "append" for s in between)
            and int(prev.get("k", 0)) == k
            and all(c in prev.get("columns", {}) for c in cols)
        )
        if not appends_only:
            prev = None  # fall back to a full recompute
        elif prev_id == cur_id:
            delta_blocks = "none"
        else:
            delta_blocks = read_appended_between(spark, path, prev_id, cur_id)

    out: list[tuple] = []
    sketches: dict[str, dict] = {}
    for c in cols:
        if prev is not None and delta_blocks == "none":
            hashes = [int(h) for h in prev["columns"][c]["hashes"]]
        else:
            if prev is not None:
                src = decode_blocks(delta_blocks, man, [c])
            else:
                src = read_rows(spark, path, cols=[c], man=man)
            hashes = _kmv_of(src, c, k)
            if prev is not None:
                hashes = kmv_merge(
                    [int(h) for h in prev["columns"][c]["hashes"]], hashes, k
                )
        est = kmv_estimate(hashes, k)
        sketches[c] = {"hashes": hashes, "ndv_est": est}
        out.append((c, len(hashes), hashes[-1] if hashes else None, est))

    if persist:
        from . import fsio

        rec = {"snapshot_id": cur_id, "k": k, "columns": sketches}
        # merged-in columns from an older sketch stay valid (their
        # hashes were just unioned with the delta); unrequested columns
        # from the previous sketch are dropped — they would go stale
        fsio.write_bytes(
            spark,
            _ndv_stats_dir(path),
            _NDV_STATS_FILE,
            json.dumps(rec, sort_keys=True).encode("utf-8"),
        )
    return spark.createDataFrame(
        out, "column string, n_hashes long, kth_hash long, ndv_est long"
    )


def cat_value_counts(blocks: DataFrame, col: str) -> DataFrame:
    """Per-value counts of a low-cardinality column from the per-block
    ``cat_counts`` maps — decode-free GROUP BY (the per-block top-K stats
    idea of band_stats_v01.cpp:169-180 made exactly mergeable)."""
    m = F.col("cat_counts").getItem(col)
    return (
        blocks.where(m.isNotNull())
        .select(F.explode(m).alias("value", "n"))
        .groupBy("value")
        .agg(F.sum("n").alias("cnt"))
    )


def parent_key_expr(parent_res: int) -> Column:
    """Re-key a block to its parent cell at ``parent_res`` — pure Column
    bit arithmetic (quadbin_to_parent, quadbin.hpp:175-203); valid for
    any source resolution >= parent_res (the Morton prefix is shared)."""
    foot = bk.footer(parent_res)
    return (
        F.col(BLOCK)
        .bitwiseAND(F.lit(bk.MORTON_MASK ^ foot))
        .bitwiseOR(F.lit(bk.HEADER | (parent_res << bk.RES_SHIFT) | foot))
    )


def rollup_stats(
    blocks: DataFrame, man: dict, parent_res: int, stat_key: str
) -> DataFrame:
    """Decode-free pre-aggregation onto coarser parent cells — the
    overview-pyramid analog (/root/reference/src/raster/read_raster.cpp:
    1152-1163 builds coarser tiles so coarse queries touch few blocks;
    quadbin_to_parent re-keying, quadbin.hpp:175-203). Pure Column bit
    arithmetic re-keys every block to its parent cell, then per-block
    stats merge with a hash aggregate: count/sum/min/max are exactly
    mergeable, mean derived. No payload is decoded.

    Returns one row per parent block: (block, n_rows, cnt, sum, mean,
    min, max) for ``stat_key`` (see :func:`summary_stats`)."""
    res = man["key"]["resolution"]
    if not 0 <= parent_res <= res:
        raise ValueError(f"parent_res {parent_res} outside [0, {res}]")
    parent = parent_key_expr(parent_res)
    s = F.col("num_stats").getItem(stat_key)
    return (
        blocks.where(s.isNotNull())
        .groupBy(parent.alias(BLOCK))
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum(s.getField("cnt")).alias("cnt"),
            F.sum(s.getField("sum")).alias("sum"),
            F.min(s.getField("min")).alias("min"),
            F.max(s.getField("max")).alias("max"),
        )
        .withColumn("mean", F.col("sum") / F.col("cnt"))
    )


# --------------------------------------------------- decode->mask->re-encode ----


def _spread_block_rows(blocks: DataFrame, needed: list[str]) -> DataFrame:
    """Spread block rows over many partitions before a per-block
    decode->re-encode kernel. The blocks table is compact on disk (few
    parquet files), so a file-split scan gives far fewer tasks than
    cores; and a hash repartition on (block, salt) collides at small
    block counts (balls into bins — measured on the 2.6 GB table: 64
    block rows hashed into 64 partitions left some tasks with 2-3
    serial ~6 s re-encodes, max task 15.7 s vs 5.9 s median). Per-block
    codec cost also varies several-x with content (block sizes are
    Zipf-ish: the top-sized blocks re-encode ~4.7 s vs 0.35 s median),
    so small tables compute an exact LPT placement from one narrow
    metadata pass: greedy-pack blocks into byte-near-equal bins by
    encoded size (a monotone cost proxy — measured), heaviest bins at
    the lowest partition indices so they are scheduled first and never
    become a late-starting tail (decide placement on small rows, move
    the payload bytes once — guide §8; the assignment survives the
    shuffle because each target partition is addressed by a searched
    representative key, :func:`_partition_reps`). Large tables (where
    the metadata pass would not be narrow relative to the work)
    keyless-round-robin instead — with many rows per partition the
    content variance averages out. Shuffling the N KB-MB encoded
    payload rows is noise next to the codec CPU either way (guide
    §2.5)."""
    spark = blocks.sparkSession
    sc = spark.sparkContext
    p = max(1, sc.defaultParallelism)
    src = blocks.select(*needed)
    tot = None
    try:
        from urllib.parse import urlparse

        paths = [urlparse(f).path for f in src.inputFiles()]
        if paths:
            tot = sum(os.path.getsize(q) for q in paths)
    except OSError:
        tot = None
    # bin count sized so each bin holds ~2 MB of encoded payload: the
    # per-task Python-exec overhead (~0.1 s) stays a small fraction of
    # a codec-bound bin's work; floored at the session's cores, capped
    # at 8x them (measured: a fixed 8x width cost ~0.6 s of pure task
    # overhead on a 33 MB table)
    n = 4 * p if tot is None else max(p, min(8 * p, int(tot >> 21)))
    # below one wave of ~2 MB bins the placement cannot matter (and
    # the metadata pass would be a ~5% tax) — plain round-robin. The
    # upper bound exists only to skip the metadata pass on tables that
    # certainly exceed the driver row cap below; the pass itself reads
    # 3 narrow columns (block, salt, enc_bytes — KBs via parquet
    # pruning), so it stays noise next to the codec work it balances
    worth_planning = tot is not None and (p << 21) <= tot <= (1 << 34)
    if worth_planning and "stats" in blocks.columns:
        cap = 200_000  # driver-metadata bound
        meta = (
            blocks.select(BLOCK, SALT, F.col("stats.enc_bytes").alias("_sz"))
            .limit(cap + 1)
            .collect()
        )
        if 0 < len(meta) <= cap:
            # LPT greedy: per-bin byte sums near-equal (plain rank-
            # dealing left bin 0 with 3.3x the median bytes), heaviest
            # bins scheduled first (lowest partition indices)
            pids = _lpt_bins([int(r["_sz"] or 0) for r in meta], n)
            reps = _partition_reps(n)
            plan = [
                (int(r[BLOCK]), int(r[SALT]), reps[pid])
                for r, pid in zip(meta, pids)
            ]
            map_df = spark.createDataFrame(
                plan, schema=f"{BLOCK} long, {SALT} int, _px long"
            )
            # left join: a block row the metadata pass missed (out of
            # the immutable-table contract) still flows through, with
            # arbitrary placement, rather than being dropped
            return (
                src.join(F.broadcast(map_df), on=[BLOCK, SALT], how="left")
                .repartition(n, "_px")
                .drop("_px")
            )
    return src.repartition(n)


def transform_blocks(
    blocks: DataFrame,
    man: dict,
    row_filter,
    zlib_level: int = 6,
    filter_cols: list[str] | None = None,
) -> DataFrame:
    """decode -> row mask -> re-encode, block-local (ST_MaskBandValues*
    analog, /root/reference/src/raster/st_value_mask.cpp:116-237 — the
    round-trip pattern that proves encode/decode are bit-exact inverses).
    ``row_filter(pdf) -> bool mask`` runs on the decoded block frame.
    Blocks left empty by the mask are dropped (empty-block elision,
    read_raster.cpp:444-483).

    ``filter_cols`` names the columns the predicate actually reads: only
    those are materialized as pandas/Python objects; every other column
    stays in Arrow buffers from decode through re-encode (a full pandas
    round-trip of text/html payloads was ~5x the codec cost itself)."""
    import pyarrow as pa

    columns = man["columns"]
    specs = [(c["name"], c["spark_type"], c["kind"]) for c in columns]
    sort_cols = sort_cols_for(columns, man["url_col"], man["ts_col"])
    ts_col = man["ts_col"]
    effort = man.get("effort", selector.EFFORT_MAX)
    groups = man.get("column_groups") or None
    schema = blocks_schema(columns, groups)
    blob_names, payload_getter = _blob_plan(man, specs)
    fcols = list(filter_cols) if filter_cols else [n for n, _, _ in specs]
    p_of = {c["name"]: c.get("physical", c["name"]) for c in columns}
    col_specs = [
        (p_of[c["name"]], c["kind"], c.get("codec")) for c in columns
    ]
    dec = _evo_decode_fn(columns, specs)

    def fn(batches):
        for pdf in batches:
            out_rows = []
            # plain tuples + an index map: itertuples would mangle group
            # blob names like "text+html_blob" into positional attrs
            ix = {c: i for i, c in enumerate(pdf.columns)}
            for r in pdf.itertuples(index=False, name=None):
                n = int(r[ix["n_rows"]])

                def get_raw(b, r=r):
                    v = r[ix[b]]
                    return None if v is None else bytes(v)

                get = payload_getter(get_raw)
                arrays = {
                    name: dec(get, name, kind, n) for name, _, kind in specs
                }
                frame = pd.DataFrame(
                    {name: _arrow_to_pandas(arrays[name], kindmap[name]) for name in fcols}
                )
                mask = np.asarray(row_filter(frame), dtype=bool)
                if not mask.any():
                    continue
                # physical payload names (renamed columns) so re-encoded
                # blobs line up with blocks_schema
                tbl = pa.table({p_of[name]: arrays[name] for name, _, _ in specs})
                if not mask.all():
                    tbl = tbl.filter(pa.array(mask))
                out_rows.append(
                    encode_block_arrow(
                        tbl, col_specs, sort_cols, zlib_level,
                        int(r[ix[BLOCK]]), int(r[ix[SALT]]), ts_col, effort, groups,
                    )
                )
            if out_rows:
                yield pd.DataFrame(out_rows)

    kindmap = {c["name"]: c["kind"] for c in columns}
    needed = [BLOCK, SALT, "n_rows"] + blob_names
    src = _spread_block_rows(blocks, needed)
    return src.mapInPandas(fn, schema=schema)


def _arrow_to_pandas(arr, kind: str):
    """Arrow decode output -> the pandas view decode_column would give
    (predicate semantics must not depend on which decode path ran)."""
    import pyarrow as pa

    if kind == selector.KIND_STRING:
        return arr.cast(pa.large_string()).to_pandas()
    if kind == selector.KIND_DOUBLE:
        return arr.cast(pa.float64()).to_pandas()
    if kind == selector.KIND_INT and arr.null_count:
        # keep nullable ints integral (plain to_pandas would widen to
        # float64 and lose >2^53 precision)
        return arr.to_pandas(types_mapper={pa.int64(): pd.Int64Dtype()}.get)
    return arr.to_pandas()


def _masked_tri_state(
    blocks: DataFrame, man: dict, row_filter, all_match, none_match,
    filter_cols: list[str] | None = None,
) -> DataFrame:
    """Tri-state mask execution: blocks whose per-block stats PROVE the
    predicate for every row pass through with payloads untouched (no
    decode, no re-encode — the precomputed-stats passthrough pattern,
    /root/reference/src/raster/st_raster_stats.cpp:311-349); blocks
    proven to match no row are dropped JVM-side; only the undecidable
    remainder pays the Python decode->mask->re-encode path. At scale a
    selective mask touches a small fraction of blocks, so this turns an
    all-blocks Arrow round-trip into a metadata-only scan plus a narrow
    transform. ``all_match``/``none_match`` must be *proofs* (Columns),
    conservatively false when stats are absent.

    NOTE: NOT lazy — the narrow pre-count below runs a (stats-columns-
    only) Spark job at construction time and snapshots branch emptiness,
    so mask_values_* assumes the blocks table is an immutable committed
    raquet table (which the manifest-last write protocol guarantees for
    every table this engine produces). Tables mutated between mask
    construction and execution are out of contract."""
    # coalesce both proofs: a NULL stats lookup must mean "unproven"
    # (three-valued logic would otherwise drop the block from BOTH
    # branches — where(NULL) is false on each side)
    all_match = F.coalesce(all_match, F.lit(False))
    none_match = F.coalesce(none_match, F.lit(False))
    decided_all = all_match & ~none_match
    undecided = ~(decided_all | none_match)
    # cheap narrow pre-count (stats columns only): a branch that would be
    # empty still costs a full-width scan of every payload column inside
    # the union, so skip empty branches outright
    cnt = blocks.agg(
        F.sum(decided_all.cast("long")).alias("n_pass"),
        F.sum(undecided.cast("long")).alias("n_work"),
    ).first()
    n_pass, n_work = int(cnt["n_pass"] or 0), int(cnt["n_work"] or 0)
    passthrough = blocks.where(decided_all)
    if n_work == 0:
        cols = [
            f.name
            for f in blocks_schema(
                man["columns"], man.get("column_groups")
            ).fields
        ]
        return passthrough.select(*cols)
    worked = transform_blocks(
        blocks.where(undecided), man, row_filter, filter_cols=filter_cols
    )
    if n_pass == 0:
        return worked
    return worked.unionByName(passthrough.select(*worked.columns))


def _cat_covered(col: str):
    """cat_counts[col] exists and covers every row (no nulls)."""
    cc = F.col("cat_counts").getItem(col)
    total = F.aggregate(F.map_values(cc), F.lit(0).cast("long"), lambda a, x: a + x)
    return cc.isNotNull() & (total == F.col("n_rows"))


def mask_values_in(
    blocks: DataFrame, man: dict, col: str, allowed: list
) -> DataFrame:
    """Whitelist mask — ST_MaskBandValuesList analog (st_value_mask.cpp:116-172)."""
    allowed_set = set(allowed)
    lits = [F.lit(v) for v in allowed]
    cc = F.col("cat_counts").getItem(col)
    keys = F.map_keys(cc)
    in_allowed = lambda k: k.isin(*lits) if lits else F.lit(False)  # noqa: E731
    # every distinct value allowed AND no nulls -> whole block survives;
    # no distinct value allowed -> nothing survives (nulls never match)
    all_match = _cat_covered(col) & F.forall(keys, in_allowed)
    none_match = cc.isNotNull() & ~F.exists(keys, in_allowed)
    return _masked_tri_state(
        blocks,
        man,
        lambda pdf: pdf[col].isin(allowed_set).to_numpy(),
        all_match,
        none_match,
        filter_cols=[col],
    )


def mask_values_eq(blocks: DataFrame, man: dict, col: str, value) -> DataFrame:
    """Single-value mask — ST_MaskBandValuesEq analog (st_value_mask.cpp:239-280).

    ``value=None`` is rejected: NULL equals nothing here (the reference's
    nodata semantics — its masks never match nodata cells either), and
    silently delegating None to the isin path would *keep* null rows."""
    if value is None:
        raise ValueError("mask_values_eq(value=None): NULL matches no row")
    kind = next(c["kind"] for c in man["columns"] if c["name"] == col)
    if kind in (selector.KIND_STRING, selector.KIND_BINARY):
        return mask_values_in(blocks, man, col, [value])
    if kind != selector.KIND_INT:
        # num_stats store int64 *views* (epoch-us, IEEE bits) — the
        # proof below would compare mixed units; decode instead
        return transform_blocks(
            blocks, man,
            lambda pdf: (pdf[col] == value).fillna(False).to_numpy(),
            filter_cols=[col],
        )
    ns = F.col("num_stats").getItem(col)
    covered = ns.isNotNull() & (ns["cnt"] == F.col("n_rows"))
    v = F.lit(value)
    all_match = covered & (ns["min"] == v) & (ns["max"] == v)
    none_match = ns.isNotNull() & ((v < ns["min"]) | (v > ns["max"]))
    return _masked_tri_state(
        blocks,
        man,
        lambda pdf: (pdf[col] == value).fillna(False).to_numpy(),
        all_match,
        none_match,
        filter_cols=[col],
    )


def mask_values_range(
    blocks: DataFrame, man: dict, col: str, low=None, high=None
) -> DataFrame:
    """Range mask with NULL = open bound — ST_MaskBandValuesRange analog
    incl. its SPECIAL_HANDLING null semantics (st_value_mask.cpp:174-237)."""

    def pred(pdf: pd.DataFrame) -> np.ndarray:
        m = pdf[col].notna().to_numpy()
        if low is not None:
            m &= (pdf[col] >= low).fillna(False).to_numpy()
        if high is not None:
            m &= (pdf[col] <= high).fillna(False).to_numpy()
        return m

    kind = next(c["kind"] for c in man["columns"] if c["name"] == col)
    if kind != selector.KIND_INT:
        return transform_blocks(blocks, man, pred, filter_cols=[col])
    ns = F.col("num_stats").getItem(col)
    covered = ns.isNotNull() & (ns["cnt"] == F.col("n_rows"))
    all_match = covered
    none_match = F.lit(False)
    if low is not None:
        all_match = all_match & (ns["min"] >= F.lit(low))
        none_match = none_match | (ns.isNotNull() & (ns["max"] < F.lit(low)))
    if high is not None:
        all_match = all_match & (ns["max"] <= F.lit(high))
        none_match = none_match | (ns.isNotNull() & (ns["min"] > F.lit(high)))
    return _masked_tri_state(
        blocks, man, pred, all_match, none_match, filter_cols=[col]
    )


# --------------------------------------------- keep-shape null masking ----


def transform_blocks_to_null(
    blocks: DataFrame,
    man: dict,
    row_filter,
    null_cols: list[str],
    zlib_level: int = 6,
    filter_cols: list[str] | None = None,
) -> DataFrame:
    """decode -> predicate -> NULL out ``null_cols`` where the predicate
    fails -> re-encode, KEEP-SHAPE: every block keeps its row count and
    key, non-matching rows keep their coordinate columns and lose only
    the masked values — the ST_ClipMask analog (reference
    src/raster/st_clip.cpp:598-734: outside-polygon pixels become nodata,
    tile geometry preserved), vs :func:`transform_blocks` which is the
    row-dropping ST_Clip. Nulled columns re-encode through the NULLABLE
    codec wrapper automatically (null masks are part of every payload)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    columns = man["columns"]
    specs = [(c["name"], c["spark_type"], c["kind"]) for c in columns]
    sort_cols = sort_cols_for(columns, man["url_col"], man["ts_col"])
    ts_col = man["ts_col"]
    effort = man.get("effort", selector.EFFORT_MAX)
    groups = man.get("column_groups") or None
    schema = blocks_schema(columns, groups)
    blob_names, payload_getter = _blob_plan(man, specs)
    kindmap = {c["name"]: c["kind"] for c in columns}
    fcols = list(filter_cols) if filter_cols else [n for n, _, _ in specs]
    to_null = set(null_cols)
    unknown = to_null - {n for n, _, _ in specs}
    if unknown:
        raise ValueError(f"null_cols not in table: {sorted(unknown)}")
    p_of = {c["name"]: c.get("physical", c["name"]) for c in columns}
    col_specs = [
        (p_of[c["name"]], c["kind"], c.get("codec")) for c in columns
    ]
    dec = _evo_decode_fn(columns, specs)

    def fn(batches):
        for pdf in batches:
            out_rows = []
            ix = {c: i for i, c in enumerate(pdf.columns)}
            for r in pdf.itertuples(index=False, name=None):
                n = int(r[ix["n_rows"]])

                def get_raw(b, r=r):
                    v = r[ix[b]]
                    return None if v is None else bytes(v)

                get = payload_getter(get_raw)
                arrays = {
                    name: dec(get, name, kind, n) for name, _, kind in specs
                }
                frame = pd.DataFrame(
                    {name: _arrow_to_pandas(arrays[name], kindmap[name]) for name in fcols}
                )
                mask = pa.array(np.asarray(row_filter(frame), dtype=bool))
                cols = {}
                for name, _, kind in specs:
                    arr = arrays[name]
                    if name in to_null:
                        arr = pc.if_else(mask, arr, pa.scalar(None, type=arr.type))
                    cols[p_of[name]] = arr
                out_rows.append(
                    encode_block_arrow(
                        pa.table(cols), col_specs, sort_cols, zlib_level,
                        int(r[ix[BLOCK]]), int(r[ix[SALT]]), ts_col, effort, groups,
                    )
                )
            if out_rows:
                yield pd.DataFrame(out_rows)

    needed = [BLOCK, SALT, "n_rows"] + blob_names
    src = _spread_block_rows(blocks, needed)
    return src.mapInPandas(fn, schema=schema)


def mask_to_null_in(
    blocks: DataFrame, man: dict, col: str, allowed: list, null_cols: list[str]
) -> DataFrame:
    """Keep-shape whitelist mask: rows whose ``col`` is outside
    ``allowed`` keep their keys/coordinates but have ``null_cols`` set to
    NULL — ST_ClipMask with a value predicate. Blocks PROVEN all-match by
    cat_counts pass through untouched (stats short-circuit); everything
    else pays one decode->null->re-encode pass."""
    allowed_set = set(allowed)
    lits = [F.lit(v) for v in allowed]
    cc = F.col("cat_counts").getItem(col)
    keys = F.map_keys(cc)
    in_allowed = lambda k: k.isin(*lits) if lits else F.lit(False)  # noqa: E731
    all_match = F.coalesce(
        _cat_covered(col) & F.forall(keys, in_allowed), F.lit(False)
    )
    passthrough = blocks.where(all_match)
    worked = transform_blocks_to_null(
        blocks.where(~all_match),
        man,
        lambda pdf: pdf[col].isin(allowed_set).to_numpy(),
        null_cols,
        filter_cols=[col],
    )
    return worked.unionByName(passthrough.select(*worked.columns))


# ------------------------------------------------- fused column math ----


def column_math_stats(blocks: DataFrame, man: dict, cols: list[str], expr_fn) -> DataFrame:
    """Fused decode -> numpy expression -> aggregate, one pass — the
    ST_BandMath / ST_NormalizedDifferenceStats analog (reference
    src/raster/band_math.cpp:39-455 fuses the per-pixel expression with
    the stats accumulator so the derived band never materializes).

    Only the payloads named in ``cols`` are read (Parquet column
    pruning); each block row emits one 5-field partial
    (cnt/sum/sum_sq/min/max over the expression's finite values); a tiny
    hash aggregate merges them. The derived column never exists as a
    Spark column, never shuffles, never re-encodes. ``expr_fn`` receives
    a dict of float64 numpy arrays (NULL -> NaN) and returns one array;
    NaN/inf results are excluded from the stats (nodata semantics)."""
    specs = _colspecs(man, cols)
    blob_names, payload_getter = _blob_plan(man, specs)
    needed = ["n_rows"] + blob_names
    src = blocks.select(*needed)

    def fn(batches):
        import pyarrow as pa

        for rb in batches:
            n_rows_col = rb.column(rb.schema.get_field_index("n_rows"))
            payload_cols = {
                b: rb.column(rb.schema.get_field_index(b)) for b in blob_names
            }
            cnt = 0
            s = 0.0
            ss = 0.0
            mn = np.inf
            mx = -np.inf
            for i in range(rb.num_rows):
                n = n_rows_col[i].as_py()
                arrs = {}
                get = payload_getter(lambda b, i=i: bytes(payload_cols[b][i].as_py()))
                for name, _, kind in specs:
                    a = selector.decode_column_arrow(get(name), kind, n)
                    if pa.types.is_timestamp(a.type):
                        a = a.cast(pa.int64())  # epoch-us view
                    arrs[name] = a.cast(pa.float64()).to_numpy(zero_copy_only=False)
                y = np.asarray(expr_fn(arrs), dtype=np.float64)
                y = y[np.isfinite(y)]
                if len(y):
                    cnt += len(y)
                    s += float(y.sum())
                    ss += float(np.square(y).sum())
                    mn = min(mn, float(y.min()))
                    mx = max(mx, float(y.max()))
            if cnt:
                yield pa.RecordBatch.from_pylist(
                    [{"cnt": cnt, "sum": s, "sum_sq": ss, "min": mn, "max": mx}]
                )

    partials = src.mapInArrow(
        fn, schema="cnt long, sum double, sum_sq double, min double, max double"
    )
    agg = partials.agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum").alias("sum"),
        F.sum("sum_sq").alias("sum_sq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )
    return agg.select(
        "cnt",
        "sum",
        (F.col("sum") / F.col("cnt")).alias("mean"),
        "min",
        "max",
        F.sqrt(
            (F.col("sum_sq") - F.col("sum") * F.col("sum") / F.col("cnt"))
            / (F.col("cnt") - 1)
        ).alias("stddev"),
    )


# ------------------------------------------------- catalog-table surface ----


def _manifest_from_rows(rows) -> dict:
    mans = [mf.from_json(r[0]) for r in rows if r[0]]
    if not mans:
        raise ValueError("no manifest row (block = 0) found")
    return max(mans, key=lambda m: m.get("created_unix") or 0)


def register_table(spark: SparkSession, path: str, name: str) -> None:
    """Expose a raquet path as a SQL-addressable table (temp view) — the
    catalog-table read surface (the reference's ST_Raster over an
    already-loaded table, /root/reference/src/raquet_extension.cpp:106-156).
    On a real deployment this would be an Iceberg table; every reader in
    this module works identically on the registered view."""
    read_all(spark, path).createOrReplaceTempView(name)


def read_blocks_table(spark: SparkSession, name: str) -> DataFrame:
    """Data rows of a registered/catalog raquet table."""
    return spark.table(name).where(F.col(BLOCK) != bk.MANIFEST_BLOCK)


def register_rows_view(spark: SparkSession, path: str, name: str) -> None:
    """Expose a table's DECODED ROWS as a SQL view — `SELECT ... FROM
    name` is then the full table-level read (current snapshot, schema
    evolution applied, equality deletes anti-joined via
    :func:`read_rows`), the `read_raquet` table-macro analog at row
    granularity. The view pins the state at registration time;
    re-register after DML to see new commits."""
    read_rows(spark, path).createOrReplaceTempView(name)


def read_manifest_table(spark: SparkSession, name: str) -> dict:
    rows = (
        spark.table(name)
        .where(F.col(BLOCK) == bk.MANIFEST_BLOCK)
        .select("metadata")
        .collect()
    )
    return _manifest_from_rows(rows)


# ------------------------------------------------------------ compaction ----


def compact_blocks(
    blocks: DataFrame,
    man: dict,
    zlib_level: int = 6,
    max_rows_per_block: int = 262144,
) -> DataFrame:
    """Merge every block key's rows into canonical rows — the Iceberg
    ``rewrite_data_files`` / OPTIMIZE analog (the reference's answer is
    re-running ``read_raster`` over the table; here compaction never
    touches the raw source). This is the complement of the map-only
    encode path: ingest shuffle-free (K salted sub-rows per block per
    touching partition), then compact in the background to the layout a
    hash-shuffle encode would have produced — bit-identical when the
    table fits one salt, since block rows are deterministically sorted
    before encoding.

    Scale shape: only ENCODED payloads move through the groupBy shuffle
    (~5x smaller than raw); decode+merge+re-encode is block-local.
    Blocks already in a single row under the row cap pass through with
    payloads untouched (no decode — the stats-passthrough discipline of
    the mask path). Merges larger than ``max_rows_per_block`` split into
    contiguous salted sub-rows of the block-local sort order.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.pandas.types import to_arrow_schema

    columns = man["columns"]
    specs = [(c["name"], c["spark_type"], c["kind"]) for c in columns]
    # re-encode under the immutable PHYSICAL payload names (renamed
    # columns): decode resolves logical->physical via _blob_plan; the
    # merged table and encode kernel stay physical so rewritten blobs
    # line up with blocks_schema and with passthrough rows
    p_of = {c["name"]: c.get("physical", c["name"]) for c in columns}
    col_specs = [
        (p_of[c["name"]], c["kind"], c.get("codec")) for c in columns
    ]
    sort_cols = sort_cols_for(columns, man["url_col"], man["ts_col"])
    ts_col = man["ts_col"]
    effort = man.get("effort", selector.EFFORT_MAX)
    groups = man.get("column_groups") or None
    schema = blocks_schema(columns, groups)
    blob_names, payload_getter = _blob_plan(man, specs)
    arrow_schema = to_arrow_schema(schema)
    out_names = [f.name for f in arrow_schema]
    # schema evolution: pre-evolution blocks carry NULL payloads for
    # added columns — compaction materializes the default (the physical
    # backfill step, still block-local)
    defaults = {c["name"]: c.get("default") for c in columns}
    from pyspark.sql import types as _T

    logical_arrow = to_arrow_schema(
        _T._parse_datatype_string(
            ", ".join(f"`{n}` {t}" for n, t, _ in specs)
        )
    )

    def fn(key: tuple, tbl: "pa.Table") -> "pa.Table":
        block = key[0]
        block = int(block.as_py() if hasattr(block, "as_py") else block)
        n_rows_col = tbl["n_rows"].combine_chunks()
        total = int(pc.sum(n_rows_col).as_py() or 0)
        if tbl.num_rows == 1 and total <= max_rows_per_block:
            return tbl.select(out_names)  # passthrough: no decode
        per_col: dict[str, list] = {p_of[name]: [] for name, _, _ in specs}
        for r in range(tbl.num_rows):
            n = int(n_rows_col[r].as_py())
            get = payload_getter(lambda b, r=r: tbl[b][r].as_py())
            for name, _, kind in specs:
                raw = get(name)
                if raw is None:
                    d = defaults.get(name)
                    ftype = logical_arrow.field(name).type
                    arr = (
                        pa.nulls(n, ftype)
                        if d is None
                        else pa.array([d] * n, type=ftype)
                    )
                else:
                    arr = selector.decode_column_arrow(
                        bytes(raw) if not isinstance(raw, bytes) else raw,
                        kind,
                        n,
                    )
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                per_col[p_of[name]].append(arr)
        merged = pa.table(
            {
                p_of[name]: pa.concat_arrays(per_col[p_of[name]])
                for name, _, _ in specs
            }
        )
        # one deterministic sort up front; contiguous slices become the
        # salted sub-rows (encode_block_arrow's own sort is then a
        # stable no-op per slice)
        idx = pc.sort_indices(
            merged,
            sort_keys=[(c, "ascending") for c in sort_cols],
            null_placement="at_start",
        )
        merged = merged.take(idx)
        n_out = math.ceil(total / max_rows_per_block) if total else 1
        per = math.ceil(total / n_out) if total else 0
        rows = []
        for salt in range(n_out):
            part = merged.slice(salt * per, per)
            if part.num_rows == 0 and total:
                continue
            rows.append(
                encode_block_arrow(
                    part, col_specs, sort_cols, zlib_level, block, salt,
                    ts_col, effort, groups,
                )
            )
        arrays = [
            pa.array([r.get(f.name) for r in rows], type=f.type)
            for f in arrow_schema
        ]
        return pa.Table.from_arrays(arrays, schema=arrow_schema)

    return blocks.groupBy(BLOCK).applyInArrow(fn, schema=schema)


def compact_to_path(
    spark: SparkSession, src: str, dst: str, zlib_level: int = 6,
    max_rows_per_block: int = 262144,
) -> dict:
    """Compact a raquet table into a new committed table (sorted write,
    manifest row last — same write protocol as the encode job)."""
    from . import encode as enc

    man = read_manifest(spark, src)
    if man.get("delete_files"):
        # compaction collapses chunk ids, which would re-expose deleted
        # rows to the sequence rule (old keys land in chunk 0 <= seq)
        raise ValueError(
            f"{src} has equality-delete files; use purge_deletes to "
            "compact with deletes applied"
        )
    blocks = read_blocks(spark, src)
    compacted = compact_blocks(blocks, man, zlib_level, max_rows_per_block)
    base = {k: v for k, v in man.items() if k not in (
        "num_blocks", "num_rows", "raw_bytes", "enc_bytes",
        "codec_histogram", "created_unix",
    )}
    base.update({
        "num_blocks": None, "num_rows": None, "raw_bytes": None,
        "enc_bytes": None, "codec_histogram": {}, "created_unix": None,
        "compacted_from": src, "shuffle": "hash",
    })
    # clear the reused destination only right before the overwrite
    _clear_stale_table_meta(spark, src, dst)
    final = enc.write_blocks(compacted, dst, base, man["columns"])
    mf.write_chunk_lineage(
        dst, 0,
        {"chunk": 0, "rows": final["num_rows"], "raw_bytes": final["raw_bytes"],
         "enc_bytes": final["enc_bytes"], "compacted_from": src},
        spark,
    )
    return final


# ------------------------------------------------------------- overviews ----

OVERVIEW_SIDECAR = "_raquet_overviews.json"


def _overview_dir(path: str, res: int) -> str:
    return os.path.join(path, "overviews", f"res={res}")


def build_overviews(
    spark: SparkSession,
    path: str,
    levels: list[int] | None = None,
    man: dict | None = None,
) -> list[int]:
    """Materialize stats pyramids at coarser resolutions — the
    reference's overview tiles (read_raster.cpp:1152-1163: coarse
    queries touch few blocks). Webtext blocks have no "coarser pixels"
    to resample, so an overview level here is a blocks-SHAPED stats
    table (block, n_rows, num_stats, cat_counts — no payloads): every
    decode-free reader (summary_stats, cat_value_counts, rollup_stats)
    runs on it unchanged, over ~4^r rows instead of the full table.

    ``levels`` defaults to res-2, res-4, ..., >= 0 (quarter-steps: each
    level ~1/16 the cells of the previous). Derived data: levels live
    under ``overviews/res=<r>/`` with a JSON sidecar naming them; the
    committed data files and manifest are untouched, so overviews can
    be (re)built at any time after ingest/compaction."""
    import json as _json

    man = man or read_manifest(spark, path)
    res = man["key"]["resolution"]
    if levels is None:
        levels = [r for r in range(res - 2, -1, -2)]
        if not levels and res > 0:
            levels = [0]
    bad = [r for r in levels if not 0 <= r < res]
    if bad:
        raise ValueError(f"overview levels {bad} outside [0, {res - 1}]")
    blocks = read_blocks(spark, path)
    for r in sorted(set(levels), reverse=True):
        parent = parent_key_expr(r)
        rows = blocks.groupBy(parent.alias(BLOCK)).agg(
            F.sum("n_rows").alias("n_rows")
        )
        num = (
            blocks.select(parent.alias(BLOCK), F.explode("num_stats").alias("k", "v"))
            .groupBy(BLOCK, "k")
            .agg(
                F.min("v.min").alias("min"),
                F.max("v.max").alias("max"),
                F.sum("v.sum").alias("sum"),
                F.sum("v.sum_sq").alias("sum_sq"),
                F.sum("v.cnt").alias("cnt"),
            )
            .groupBy(BLOCK)
            .agg(
                F.map_from_entries(
                    F.collect_list(
                        F.struct(
                            F.col("k"),
                            F.struct("min", "max", "sum", "sum_sq", "cnt"),
                        )
                    )
                ).alias("num_stats")
            )
        )
        cat = (
            blocks.select(parent.alias(BLOCK), F.explode("cat_counts").alias("c", "m"))
            .select(BLOCK, "c", F.explode("m").alias("value", "n"))
            .groupBy(BLOCK, "c", "value")
            .agg(F.sum("n").alias("n"))
            .groupBy(BLOCK, "c")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("value", "n"))
                ).alias("m")
            )
            .groupBy(BLOCK)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("c", "m"))
                ).alias("cat_counts")
            )
        )
        out = (
            rows.join(num, BLOCK, "left")
            .join(cat, BLOCK, "left")
            .repartitionByRange(1, BLOCK)
            .sortWithinPartitions(BLOCK)
        )
        out.write.mode("overwrite").parquet(_overview_dir(path, r))
    built = sorted(set(levels))
    from . import fsio

    fsio.write_bytes(
        spark, path, OVERVIEW_SIDECAR,
        _json.dumps({"levels": built, "resolution": res}).encode(),
    )
    return built


def overview_levels(spark: SparkSession, path: str) -> list[int]:
    import json as _json

    from . import fsio

    if not fsio.exists(spark, path, OVERVIEW_SIDECAR):
        return []
    return list(
        _json.loads(fsio.read_bytes(spark, path, OVERVIEW_SIDECAR))["levels"]
    )


def read_overview(spark: SparkSession, path: str, res: int) -> DataFrame:
    return spark.read.parquet(_overview_dir(path, res))


def rollup_stats_served(
    spark: SparkSession,
    path: str,
    man: dict,
    parent_res: int,
    stat_key: str,
) -> DataFrame:
    """rollup_stats through the smallest materialized overview level
    that can serve ``parent_res`` (stats are exactly mergeable, so
    serving from an overview is bit-identical to serving from blocks);
    falls back to the blocks table when no level qualifies."""
    usable = [r for r in overview_levels(spark, path) if r >= parent_res]
    if usable:
        src = read_overview(spark, path, min(usable))
    else:
        src = read_blocks(spark, path)
    return rollup_stats(src, man, parent_res, stat_key)
