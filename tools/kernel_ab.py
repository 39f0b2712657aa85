"""Kernel-only scaling A/B at two pinned widths, with per-leg CPU+memory
calibration — the fast iteration loop behind the full harness
(tools/bench_scaling.py). Prints one JSON line.

    python tools/kernel_ab.py [n_lo] [n_entities]     # default 2 -> 8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import hw_calibration, mem_calibration  # noqa: E402


def run_kernel(cpus: int, n_entities: int) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "tools", "kernel_once.py"),
           str(cpus), str(n_entities)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"kernel_once produced no JSON at cpus={cpus}")
    return json.loads(lines[-1])


def main() -> None:
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_hi = 4 * n_lo
    cal = {
        "cpu_lo": hw_calibration(n_lo), "cpu_hi": hw_calibration(n_hi),
        "mem_lo": mem_calibration(n_lo), "mem_hi": mem_calibration(n_hi),
    }
    r_lo = run_kernel(n_lo, n_entities)
    cal["cpu_hi_after_lo"] = hw_calibration(n_hi)
    r_hi = run_kernel(n_hi, n_entities)
    eff = r_hi["kernel_pairs_per_sec"] / (4 * r_lo["kernel_pairs_per_sec"])
    print(json.dumps({
        "n_lo": n_lo, "n_hi": n_hi,
        "kernel_eff": round(eff, 3),
        "hw_ceiling": round(cal["cpu_hi"] / (4 * cal["cpu_lo"]), 3),
        "mem_ceiling": round(cal["mem_hi"] / (4 * cal["mem_lo"]), 3),
        "drift": round(cal["cpu_hi_after_lo"] / cal["cpu_hi"], 3),
        "lo": r_lo, "hi": r_hi,
        "cal": {k: round(v, 2) for k, v in cal.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
