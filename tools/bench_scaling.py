"""Scaling-efficiency evidence (north_rule: N vs 4N executors >= 0.8).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels — local[8] and local[32] — on the
SAME input; efficiency = throughput(32) / (4 x throughput(8)). Each run is
a fresh subprocess (own JVM) so nothing is shared. Results land in
BENCH/BASELINE.md and bench_scaling.json.

    python tools/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.time()
    # Pin the whole process tree (JVM task threads AND Python UDF workers)
    # to exactly `cpus` cores — without affinity, local[8]'s pandas-UDF
    # workers silently use extra cores and the N-vs-4N comparison is bogus.
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=4000,
    )
    json_lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not json_lines:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
        raise RuntimeError(f"bench.py produced no JSON at cpus={cpus}")
    line = json_lines[-1]
    d = json.loads(line)
    d["subprocess_sec"] = round(time.time() - t0, 1)
    return d


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    r8 = run_bench(8, sf_dir)
    r32 = run_bench(32, sf_dir)
    eff = r32["pairs_per_sec"] / (4 * r8["pairs_per_sec"])
    result = {"local8": r8, "local32": r32, "scaling_efficiency": round(eff, 3)}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bench_scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)

    md = f"""# BENCH — measured baseline (this repo)

Scaling evidence per BASELINE.md: identical job + input at two parallelism
levels (single host, separate JVM per run; no real cluster in sandbox).

Headline job: full linkage pipeline (normalize -> 6-family blocking ->
pairwise comparators incl. fuzzy -> grade decision table -> connected
components) on the deterministic synthetic corpus, sf={r8['sf']}
({r8['corpus_rows']} files, {r8['pairs_scored']} candidate pairs scored).

| config | wall (s) | pairs scored | pairs/sec |
|---|---|---|---|
| local[8]  | {r8['value']} | {r8['pairs_scored']} | {r8['pairs_per_sec']} |
| local[32] | {r32['value']} | {r32['pairs_scored']} | {r32['pairs_per_sec']} |

**Scaling efficiency (8 -> 32 threads): {result['scaling_efficiency']}**
(target >= 0.8 per BASELINE.json north_rule)

Per-query wall times at local[32], sf dir {sf_dir}:

| query | sec |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in r32["queries"].items()) + """

Reproduce: `python tools/bench_scaling.py /root/testdata/sf0.1`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
