#!/usr/bin/env python
"""Per-stage wall/task breakdown for one or more queries (round-6
optimization diagnostics; not part of the driver contract).

Usage: python tools/stage_profile.py --sf-dir DIR --queries a,b,c
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata_local/sf1.0")
    ap.add_argument("--queries", default="dedup_minhash,txt_dsir")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    import glob
    import shutil

    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    evdir = "/tmp/raquet_eventlog"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("raquet-stageprof")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.local.dir", "/dev/shm/raquet_spark_local")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    sc = spark.sparkContext

    def dump_stages(label, t0_ms, t1_ms):
        rows = []
        paths = [
            p
            for p in glob.glob(evdir + "/**", recursive=True)
            if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
        ]
        for path in paths:
            with open(path) as f:
                for line in f:
                    if '"SparkListenerStageCompleted"' not in line:
                        continue
                    ev = json.loads(line)
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if not sub or not comp or sub < t0_ms or comp > t1_ms + 1000:
                        continue
                    rows.append(
                        {
                            "stage": si["Stage ID"],
                            "wall_s": round((comp - sub) / 1000.0, 2),
                            "tasks": si["Number of Tasks"],
                            "name": si["Stage Name"][:60],
                        }
                    )
        rows.sort(key=lambda r: -r["wall_s"])
        print(f"== {label}: top stages by wall")
        for r in rows[:15]:
            print(
                f"  st{r['stage']:4d} wall={r['wall_s']:6.2f}s tasks={r['tasks']:4d}  {r['name']}"
            )
        print(f"  ({len(rows)} stages, sum wall {sum(r['wall_s'] for r in rows):.2f}s)")

    for name in args.queries.split(","):
        for rep in range(args.reps):
            spark.catalog.clearCache()
            sc._jvm.System.gc()
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            t_build = time.time() - t0
            df.agg({"*": "count"}).first()
            dt = time.time() - t0
            print(f"\n#### {name} rep{rep}: total {dt:.2f}s (build {t_build:.2f}s)")
            # flush the event log before parsing
            sc._jsc.sc().listenerBus().waitUntilEmpty(10000)
            dump_stages(name, int(t0 * 1000), int(time.time() * 1000))


if __name__ == "__main__":
    main()
