"""Pair-order A/B (VERDICT r4 #6): is the left_didx-clustered pair list
actually faster to score than a scrambled one?

The scoring kernel probes the dense broadcast LongHashedRelation once per
pair side; a pair stream sorted by left_didx walks that row page near-
sequentially (compare.py:130-140's claim). This measures the claim:
interleaved clustered/shuffled kernel runs at one pinned width — same
parquet row set, same plan, only scan ORDER differs — with a CPU
calibration burn before/after to stamp host drift.

    python tools/kernel_order_ab.py [cpus] [n_entities] [reps]   # 8 100000 2

Prints one JSON line; >=1.10 speedup => order the production pair stream,
else document the null result.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import hw_calibration  # noqa: E402


def run_kernel(cpus: int, n_entities: int, order: str) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "tools", "kernel_once.py"),
           str(cpus), str(n_entities)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ, SPARK_GRAFT_PAIR_ORDER=order)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3000, env=env)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"kernel_once produced no JSON (order={order})")
    return json.loads(lines[-1])


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cal_before = hw_calibration(cpus)
    # warm both parquet twins (and the JVM/profile caches) once, untimed
    run_kernel(cpus, n_entities, "clustered")
    run_kernel(cpus, n_entities, "shuffled")
    runs: dict[str, list[float]] = {"clustered": [], "shuffled": []}
    for _ in range(reps):  # interleave so slow host drift cancels
        for order in ("clustered", "shuffled"):
            runs[order].append(run_kernel(cpus, n_entities, order)["kernel_pairs_per_sec"])
    cal_after = hw_calibration(cpus)
    med = {k: statistics.median(v) for k, v in runs.items()}
    print(json.dumps({
        "cpus": cpus,
        "n_entities": n_entities,
        "clustered_pairs_per_sec": med["clustered"],
        "shuffled_pairs_per_sec": med["shuffled"],
        "clustered_over_shuffled": round(med["clustered"] / med["shuffled"], 3),
        "runs": runs,
        "host_drift": round(cal_after / cal_before, 3),
        "cal_units_per_sec": round(cal_before, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
