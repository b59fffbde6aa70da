#!/usr/bin/env python
"""Per-task profile of the bench encode / mask_reencode / decode rows
(round-6 diagnostics; not part of the driver contract — bench.py stays
the frozen harness).

Reuses bench.py's own make_spark/prepare_input/encode_run so the timed
shape is identical, but adds an event log and dumps the per-task time
distribution of every stage, which is what exposes group-placement skew
(64 encode groups hashed into 32 partitions).

Usage: python tools/encode_profile.py [--sf-dir /root/testdata_local/sf1.0]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/raquet_encprof_eventlog"


def dump_stages(label: str, t0_ms: float, t1_ms: float) -> None:
    rows = []
    paths = [
        p
        for p in glob.glob(EVDIR + "/**", recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    task_times: dict[int, list[float]] = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                if '"SparkListenerTaskEnd"' in line:
                    ev = json.loads(line)
                    ti = ev.get("Task Info", {})
                    sid = ev["Stage ID"]
                    dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                    if ti.get("Launch Time", 0) >= t0_ms:
                        task_times.setdefault(sid, []).append(dur)
                elif '"SparkListenerStageCompleted"' in line:
                    ev = json.loads(line)
                    si = ev["Stage Info"]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    if not sub or not comp or sub < t0_ms or comp > t1_ms + 1000:
                        continue
                    rows.append(
                        {
                            "stage": si["Stage ID"],
                            "wall_s": round((comp - sub) / 1000.0, 2),
                            "tasks": si["Number of Tasks"],
                            "name": si["Stage Name"][:70],
                        }
                    )
    rows.sort(key=lambda r: -r["wall_s"])
    print(f"== {label}: top stages by wall")
    for r in rows[:10]:
        ts = sorted(task_times.get(r["stage"], []), reverse=True)
        tstr = ""
        if ts:
            import statistics

            med = statistics.median(ts)
            tstr = (
                f" task max={ts[0]:.2f}s p75={ts[len(ts)//4]:.2f}s "
                f"med={med:.2f}s sum={sum(ts):.1f}s top5={[round(x,1) for x in ts[:5]]}"
            )
        print(
            f"  st{r['stage']:4d} wall={r['wall_s']:6.2f}s tasks={r['tasks']:4d}"
            f" {r['name'][:48]}{tstr}"
        )
    print(f"  ({len(rows)} stages, sum wall {sum(r['wall_s'] for r in rows):.2f}s)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata_local/sf1.0")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--which", default="encode,mask_reencode")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    import bench

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    # same confs as bench.make_spark + an event log
    from pyspark.sql import SparkSession

    cpus = args.cpus
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("raquet-encprof")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.local.dir", "/dev/shm/raquet_spark_local")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    sf = bench.sf_of(args.sf_dir)
    rows = args.rows or int(bench.ROWS_PER_SF * sf)
    input_path, ts_range = bench.prepare_input(spark, rows)
    which = set(args.which.split(","))

    from duckdb_raquet_spark import scan

    def run(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"\n#### {label}: {dt:.2f}s")
        sc._jsc.sc().listenerBus().waitUntilEmpty(10000)
        dump_stages(label, int(t0 * 1000), int(time.time() * 1000))
        return out

    if "warmup" not in which:
        bench.warmup(spark, input_path, rows, ts_range)

    man = None
    if "encode" in which:
        _, man = run(
            "encode",
            lambda: bench.encode_run(spark, input_path, rows, "head", ts_range),
        )
    if "mask_reencode" in which or "decode_full" in which:
        if man is None:
            _, man = bench.encode_run(spark, input_path, rows, "head", ts_range)
        enc_path = os.path.join(bench.TMP, "enc_head")
        blocks = scan.read_blocks(spark, enc_path)
        if "mask_reencode" in which:
            run(
                "mask_reencode",
                lambda: bench.force(
                    scan.mask_values_in(blocks, man, "lang", ["en", "de"])
                ),
            )
        if "decode_full" in which:
            run(
                "decode_full",
                lambda: bench.force(scan.decode_blocks(blocks, man, ["url", "text", "lang"])),
            )
    if "encode_fast" in which:
        run(
            "encode_fast",
            lambda: bench.encode_run(
                spark, input_path, rows, "headfast", ts_range, effort="fast"
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
