"""Scaling-efficiency evidence (north_rule: N -> 4N executors >= 0.8).

No real cluster exists in this sandbox; per the driver instruction the
same job runs at two parallelism levels — N=4 and 4N=16 cores — pinned
with taskset so the JVM task threads AND the Python UDF workers of each
run see exactly that many cores (without pinning, local[N]'s pandas-UDF
workers silently use extra cores and the comparison is bogus).

Throughput metric (BASELINE.json): candidate-pairs-scored/sec, measured
by the scoring kernel (fixed materialized pair list -> full comparator
vector incl. fuzzy pandas UDFs -> grade decision table), the stage a
large cluster spends its time in. The end-to-end pipeline time is
reported alongside. A pure-CPU calibration burn at both widths records
the HOST's own scaling ceiling (this VM's vCPUs are host-oversubscribed
above ~16), so the kernel efficiency can be read against what the
hardware permits.

    python tools/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_LO, N_HI = 4, 16


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def hw_calibration(procs: int, units: int = 6, work: int = 3_000_000) -> float:
    """Pure-CPU units/sec at `procs` processes — the host's real capacity."""
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [work] * procs * units)
    return procs * units / (time.time() - t0)


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.time()
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=4000)
    json_lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not json_lines:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
        raise RuntimeError(f"bench.py produced no JSON at cpus={cpus}")
    d = json.loads(json_lines[-1])
    d["subprocess_sec"] = round(time.time() - t0, 1)
    return d


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # The host is tenant-oversubscribed and its capacity DRIFTS between
    # the two legs (minutes apart). Calibrate at BOTH widths immediately
    # before EACH leg so the ceiling reflects what the hardware gave that
    # leg, and report a drift indicator alongside the raw efficiency.
    cal_before_lo = {str(N_LO): hw_calibration(N_LO), str(N_HI): hw_calibration(N_HI)}
    r_lo = run_bench(N_LO, sf_dir)
    cal_before_hi = {str(N_LO): hw_calibration(N_LO), str(N_HI): hw_calibration(N_HI)}
    r_hi = run_bench(N_HI, sf_dir)
    hw_lo = cal_before_lo[str(N_LO)]          # capacity the lo leg saw
    hw_hi = cal_before_hi[str(N_HI)]          # capacity the hi leg saw
    hw_eff = hw_hi / (4 * hw_lo)
    drift = cal_before_hi[str(N_HI)] / cal_before_lo[str(N_HI)]
    eff_kernel = r_hi["kernel_pairs_per_sec"] / (4 * r_lo["kernel_pairs_per_sec"])
    eff_e2e = r_hi["pairs_per_sec"] / (4 * r_lo["pairs_per_sec"])
    result = {
        "n_lo": N_LO, "n_hi": N_HI,
        "lo": r_lo, "hi": r_hi,
        "scaling_efficiency": round(eff_kernel, 3),
        "scaling_efficiency_e2e": round(eff_e2e, 3),
        "hw_calibration_units_per_sec": {
            "before_lo_leg": {k: round(v, 1) for k, v in cal_before_lo.items()},
            "before_hi_leg": {k: round(v, 1) for k, v in cal_before_hi.items()},
        },
        "hw_ceiling_efficiency": round(hw_eff, 3),
        "host_drift_between_legs": round(drift, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bench_scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)

    md = f"""# BENCH — measured baseline (this repo)

Scaling evidence per BASELINE.md: identical job + input at two
parallelism levels (N={N_LO} and 4N={N_HI} cores), each run pinned with
`taskset` so JVM task threads and Python UDF workers together get
exactly that many cores. Single host, separate JVM per run.

**Hardware note:** a pure-CPU calibration burn runs at both widths
immediately before EACH leg — the host is tenant-oversubscribed and its
capacity drifts between legs. Ceiling uses what each leg actually saw:
{round(hw_lo,1)} units/s at {N_LO} procs (before the lo leg) vs
{round(hw_hi,1)} at {N_HI} (before the hi leg) =
{result['hw_ceiling_efficiency']} ceiling efficiency; host drift between
legs (same-width {N_HI}-proc burn, hi/lo) =
{result['host_drift_between_legs']}. Above ~16 vCPUs the host
oversubscribes and no workload can scale linearly, which is why the
N/4N pair is 4/16.

## Scoring throughput (the BASELINE.json metric)

Kernel: fixed materialized candidate-pair list ({r_lo['kernel_pairs']}
pairs) -> attach both sides -> full 20-flag comparator vector + fuzzy
(Jaro-Winkler via the distinct-stem-pair table broadcast-joined back,
phonetic equalities, Levenshtein-ratio) -> grade decision table ->
hash-agg over every column (no pruning). No per-pair Python: the pair
stream never crosses the Arrow boundary.

| config | kernel wall (s) | pairs scored | pairs/sec |
|---|---|---|---|
| local[{N_LO}]  | {r_lo['kernel_sec']} | {r_lo['kernel_pairs']} | {r_lo['kernel_pairs_per_sec']} |
| local[{N_HI}] | {r_hi['kernel_sec']} | {r_hi['kernel_pairs']} | {r_hi['kernel_pairs_per_sec']} |

**Scaling efficiency ({N_LO} -> {N_HI} cores): {result['scaling_efficiency']}**
(target >= 0.8 per BASELINE.json north_rule; hardware ceiling {result['hw_ceiling_efficiency']})

## End-to-end pipeline (normalize -> 6-family blocking -> score -> CC)

sf={r_lo['sf']}, {r_lo['corpus_rows']} files, {r_lo['pairs_scored']} candidate pairs.

| config | wall (s) | pairs/sec | clusters |
|---|---|---|---|
| local[{N_LO}]  | {r_lo['value']} | {r_lo['pairs_per_sec']} | {r_lo['n_clusters']} |
| local[{N_HI}] | {r_hi['value']} | {r_hi['pairs_per_sec']} | {r_hi['n_clusters']} |

e2e scaling {result['scaling_efficiency_e2e']} — below the kernel because the
end-to-end run includes fixed-latency driver phases (AQE planning across
~110 stages, the CC driver loop, per-stage codegen) that a real
multi-node cluster amortizes over far more data per stage.

Per-query wall times at local[{N_HI}], sf dir {sf_dir}:

| query | sec |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in r_hi["queries"].items()) + """

Reproduce: `python tools/bench_scaling.py /root/testdata/sf0.1`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
