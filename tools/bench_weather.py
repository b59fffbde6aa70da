"""Weather-gated bench runner for shared-hypervisor hosts.

Wall times on a multi-tenant VM vary 2-4x at constant code. This tool
probes hypervisor steal UNDER LOAD (an idle /proc/stat sample is
misleading: with a tiny busy denominator, background kernel threads
read as 80-90% steal on a box that runs real work at 0%), launches the
sf0.1 suite only when the loaded steal share is <2%, and keeps the
first run whose own ``steal_pct`` (reported in-band by bench.py since
round 5) confirms the window stayed clean.

Usage: python tools/bench_weather.py [budget_seconds] [out_json]
"""
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ticks() -> tuple[int, int]:
    p = open("/proc/stat").readline().split()
    return int(p[1]) + int(p[2]) + int(p[3]), int(p[8])


def _spin(_):
    x = 0
    end = time.time() + 6
    while time.time() < end:
        x = (x * 31 + 7) % 1000003


def loaded_probe(n_procs: int = 8) -> float:
    """Steal share (%) of demanded CPU while n_procs cores spin for 6 s."""
    before = ticks()
    procs = [mp.Process(target=_spin, args=(i,)) for i in range(n_procs)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    after = ticks()
    busy, steal = after[0] - before[0], after[1] - before[1]
    return 100.0 * steal / max(busy + steal, 1)


def main() -> None:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 7200.0
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_clean.json"
    deadline = time.time() + budget
    attempt = 0
    while time.time() < deadline:
        w = loaded_probe()
        print(f"[weather] probe steal_share={w:.1f}%", flush=True)
        if w > 2.0:
            time.sleep(120)
            continue
        attempt += 1
        proc = subprocess.run(
            [sys.executable, "bench.py", "--sf-dir",
             os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")],
            capture_output=True, text=True, cwd=REPO,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            d = json.loads(line)
        except ValueError:
            print(f"[weather] attempt {attempt}: bench failed rc={proc.returncode}",
                  flush=True)
            time.sleep(60)
            continue
        sp = d.get("steal_pct")
        print(f"[weather] attempt {attempt}: wall={d['value']} steal_pct={sp}",
              flush=True)
        if sp is not None and sp < 3.0:
            with open(out, "w") as f:
                f.write(line + "\n")
            print(f"[weather] clean run captured -> {out}", flush=True)
            return
        time.sleep(90)
    print("[weather] budget exhausted without a clean run", flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
