"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet
tables, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows: list[tuple], cols: list[str]):
    """Sort columns by name, then rows; round floats to kill last-ulp
    noise the driver's value-hash would also be subject to."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return v

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr), [cols[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # engine-artifact oracles (rollup/enc_metrics/ann_*) embed the
    # DRIVER fixture's /tmp path into their SQL at import time; point
    # them at the sf under test BEFORE the entry module builds them,
    # else a sf0.001 sweep diffs sf0.001 Spark vs sf0.01 DuckDB
    os.environ["RAQUET_DRIVER_SF_DIR"] = sf_dir

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:24s} rows={len(srows):6d} (rows-only, {t_spark:.1f}s)")
            if len(srows) == 0 and name not in ("dedup_simhash",):
                print(f"    WARNING: empty result for {name}")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_duck = time.time() - t0
        s_vals, s_names = normalize(srows, scols)
        o_vals, o_names = normalize(orows, ocols)
        ok_names = s_names == o_names
        ok_count = len(s_vals) == len(o_vals)
        ok_vals = s_vals == o_vals
        status = "OK " if (ok_names and ok_count and ok_vals) else "FAIL"
        print(
            f"  {name:24s} {status} rows={len(srows):6d}/{len(orows):6d} "
            f"cols={'=' if ok_names else f'{s_names} vs {o_names}'} "
            f"({t_spark:.1f}s spark, {t_duck:.1f}s duck)"
        )
        if not (ok_names and ok_count and ok_vals):
            failures.append(name)
            if ok_names and ok_count:
                for i, (a, b) in enumerate(zip(s_vals, o_vals)):
                    if a != b:
                        print(f"    first diff row {i}:\n      spark={a}\n      duck ={b}")
                        break
            elif not ok_count:
                sset = set(map(repr, s_vals))
                oset = set(map(repr, o_vals))
                print(f"    only-spark: {list(sset - oset)[:2]}")
                print(f"    only-duck : {list(oset - sset)[:2]}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
