"""Independently-bracketed e2e scaling legs + calibration-parity pairing.

Why this exists: the contiguous-window harness (tools/bench_scaling.py)
needs ~18 clean minutes for cal -> hi leg -> settle -> lo leg -> settle
-> cal, and 25 preserved attempts (BENCH/E2E_SCALING_NOTES.md) show this
tenant-oversubscribed host rarely stays flat that long. But a scaling
RATIO never needed temporal adjacency — it needs both legs to run at the
SAME host capacity, and adjacency was only ever a proxy for that. So:

* ``leg <width>`` runs ONE e2e leg inside its own short window,
  bracketed by pure-CPU calibration burns at BOTH widths before and
  after (start gates: absolute floors + lo->hi ceiling; end gates:
  per-width drift + ceiling). Every leg — accepted or rejected — is
  preserved as ``BENCH/e2e_leg_w{width}_{n}.json``.
* ``pair`` scans the banked legs and accepts a (lo, hi) pair when the
  two legs' bracket calibrations agree within a parity band at BOTH
  widths — i.e. the host demonstrably delivered the same capacity to
  each leg, minutes or hours apart. Pair choice is pre-registered as
  "parity closest to 1.0" (NOT max efficiency) so banking many legs
  cannot cherry-pick a flattering ratio. The merged result reuses the
  banked kernel window verbatim and goes through the same
  write_outputs() as the contiguous harness.
* ``watch`` probes the host and fires ``leg`` runs at clean moments,
  trying ``pair`` after each accepted leg; exits 0 on the first
  accepted pair.

The hunt thus shrinks from "one flat 18-minute span" to "one clean
~7-minute hi window and one clean ~13-minute lo window at matching
capacity, in any order, any distance apart" — and a clean leg is never
lost to the other leg's bad luck.

    python tools/bench_leg.py leg 8 [--sf-dir D] [gates...]
    python tools/bench_leg.py pair [--sf-dir D] [gates...]
    python tools/bench_leg.py watch [--sf-dir D] [--max-minutes M] [gates...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import (  # noqa: E402
    hw_calibration, hw_calibration_med, hw_calibration_pinned, mem_calibration,
    run_bench, write_outputs,
)

BENCH = os.path.join(REPO, "BENCH")
# leg widths: N and 4N (north_rule). The banked kernel window is 2->8,
# and `pair` asserts the merged file keeps matching legs.
LO = int(os.environ.get("SPARK_GRAFT_N_LO", "2"))
HI = 4 * LO


def _bracket() -> dict:
    """Calibration burns at both widths: the host capacity right now.
    Median-of-N per width — the lo burn is ~1.3 s and a single sample
    swings ±30% (ledger: c_lo 6.7–11.8 on the same quiet host), which
    was the dominant cause of false window-open rejects. 5 reps at the
    cheap lo width, 3 at hi (~11 s per bracket, vs a 9-min leg)."""
    return {
        str(LO): round(hw_calibration_med(LO, reps=5), 1),
        str(HI): round(hw_calibration_med(HI, reps=3), 1),
    }


def _ceiling(cal: dict) -> float:
    return round(cal[str(HI)] / (4 * cal[str(LO)]), 3)


def _leg_path(width: int) -> str:
    n = 1
    while os.path.exists(os.path.join(BENCH, f"e2e_leg_w{width}_{n}.json")):
        n += 1
    return os.path.join(BENCH, f"e2e_leg_w{width}_{n}.json")


def _mem_cal_med(reps: int = 3) -> tuple[float, list[float]]:
    """Median-of-``reps`` memory-system calibration at the hi width.

    The original single-sample stamp swung ±35% INSIDE accepted legs
    (w8_10: 4.50 start, 2.87 end) — far wider than the 0.12 pair parity
    band it feeds, so pairing on it was a lottery dominated by estimator
    noise, not host state (w8_8/w8_9/w8_10 all CPU-parity-matched w2_12
    and all failed mem parity, at ratios 0.79/1.21/1.26). Median-of-3 is
    the same fix the CPU brackets and the settle break already use; the
    band itself is unchanged. Raw samples are stamped into the leg
    record for transparency."""
    vals = sorted(round(mem_calibration(HI), 2) for _ in range(reps))
    return vals[reps // 2], vals


def run_leg(width: int, args) -> dict:
    """One bracketed e2e leg at `width` cores. Returns the leg record
    (also written to BENCH/ whether accepted or not)."""
    rec: dict = {
        "width": width,
        "sf_dir": args.sf_dir,
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "accepted": False,
        "reject_reason": None,
    }
    cal_s = _bracket()
    rec["cal_start"], rec["ceiling_start"] = cal_s, _ceiling(cal_s)
    if cal_s[str(HI)] < args.min_cap or cal_s[str(LO)] < args.min_cap_lo:
        rec["reject_reason"] = (
            f"window opened degraded: {cal_s[str(LO)]}/{cal_s[str(HI)]} u/s "
            f"at {LO}/{HI} procs < floors {args.min_cap_lo}/{args.min_cap}"
        )
        return _finish(rec)
    if rec["ceiling_start"] < args.min_ceiling:
        rec["reject_reason"] = (
            f"window opened with ceiling {rec['ceiling_start']} < {args.min_ceiling}"
        )
        return _finish(rec)

    # The pure-CPU burn can't see co-tenant MEMORY pressure (lo-leg walls
    # vary ±15% at identical CPU cals across the ledger) — stamp the
    # memory-system burn at the hi width in both brackets; pairing gates
    # on its cross-leg parity.
    rec["mem_cal_start"], rec["mem_cal_start_reps"] = _mem_cal_med()
    # The in-leg fail-fast burn runs under the leg's `taskset -c 0-{w-1}`;
    # unpinned bracket burns float onto idle cores and read systematically
    # higher, so the bar it is gated against must be measured pinned too.
    bar = round(hw_calibration_pinned(width, reps=3), 1)
    rec["bar_pinned"] = bar
    try:
        bench = run_bench(width, args.sf_dir, sections="e2e", min_cal=0.93 * bar)
    except SystemExit as exc:  # bench.py exit-17 fail-fast (mid-window sag)
        rec["reject_reason"] = str(exc)
        return _finish(rec)
    except RuntimeError as exc:
        rec["reject_reason"] = f"bench error: {exc}"
        return _finish(rec)
    rec["bench"] = bench
    rec["leg_cal_ratio"] = round(bench["cal_units_per_sec"] / bar, 3)

    # Settle past the JVM-exit reclaim transient before the end bracket.
    # The break criterion is a MEDIAN-of-3, not a single burn: singles
    # swing ±30%, and a lucky sample exited this loop early while reclaim
    # was still in progress — the median end bracket then read the true
    # (still-sagged) state and rejected a healthy leg (w2_6: settle saw
    # one 38.5, bracket median 31.1, drift 0.791). Median-vs-median makes
    # the break bar and the bracket it guards use the same estimator.
    settle = []
    for _ in range(6):
        time.sleep(20)
        c = hw_calibration_med(HI, reps=3)
        settle.append(round(c, 1))
        if c >= 0.95 * cal_s[str(HI)]:
            break
    rec["settle_cals_end"] = settle
    cal_e = _bracket()
    rec["cal_end"], rec["ceiling_end"] = cal_e, _ceiling(cal_e)
    rec["mem_cal_end"], rec["mem_cal_end_reps"] = _mem_cal_med()
    rec["mem_drift"] = round(rec["mem_cal_end"] / rec["mem_cal_start"], 3)
    rec["drift"] = {
        w: round(cal_e[w] / cal_s[w], 3) for w in (str(LO), str(HI))
    }
    bad = [w for w, d in rec["drift"].items() if abs(d - 1.0) > args.drift_band]
    if bad:
        rec["reject_reason"] = f"bracket drift out of band at widths {bad}: {rec['drift']}"
    elif rec["ceiling_end"] < args.min_ceiling:
        rec["reject_reason"] = f"end-bracket ceiling {rec['ceiling_end']} < {args.min_ceiling}"
    else:
        rec["accepted"] = True
    return _finish(rec)


def _finish(rec: dict) -> dict:
    path = _leg_path(rec["width"])
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=2)
    rec["_path"] = path
    print(json.dumps({
        "leg": rec["width"], "accepted": rec["accepted"],
        "reject_reason": rec["reject_reason"], "file": os.path.basename(path),
        "cal_start": rec.get("cal_start"), "cal_end": rec.get("cal_end"),
        "leg_cal_ratio": rec.get("leg_cal_ratio"),
        "wall": rec.get("bench", {}).get("value"),
    }), flush=True)
    return rec


def _load_legs(width: int) -> list[dict]:
    legs = []
    for p in sorted(glob.glob(os.path.join(BENCH, f"e2e_leg_w{width}_*.json")),
                    key=lambda p: int(re.search(r"_(\d+)\.json$", p).group(1))):
        with open(p) as fh:
            d = json.load(fh)
        if d.get("accepted") and "bench" in d:
            d["_path"] = p
            legs.append(d)
    return legs


def _cal_mean(leg: dict, w: int) -> float:
    return (leg["cal_start"][str(w)] + leg["cal_end"][str(w)]) / 2


def _banked_kernel() -> dict:
    """The banked kernel window, from the COMMITTED headline (the on-disk
    file may hold a just-rejected contiguous attempt)."""
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:BENCH/bench_scaling.json"],
            capture_output=True, text=True, check=True,
        )
        return json.loads(out.stdout)
    except (subprocess.CalledProcessError, json.JSONDecodeError):
        with open(os.path.join(BENCH, "bench_scaling.json")) as fh:
            return json.load(fh)


def find_pair(args) -> tuple[dict, dict] | None:
    """Pre-registered choice: among parity-qualifying (lo, hi) leg pairs,
    the one whose parity product is closest to 1.0 — never max-eff."""
    lo_legs, hi_legs = _load_legs(LO), _load_legs(HI)
    best, best_score = None, None
    for lo in lo_legs:
        for hi in hi_legs:
            par = {
                str(w): round(_cal_mean(hi, w) / _cal_mean(lo, w), 3)
                for w in (LO, HI)
            }
            if any(abs(v - 1.0) > args.parity_band for v in par.values()):
                continue
            if lo["bench"]["pairs_scored"] != hi["bench"]["pairs_scored"] or \
               lo["bench"]["n_clusters"] != hi["bench"]["n_clusters"]:
                continue  # different code/input — not a pair
            mem_par = round(
                (hi["mem_cal_start"] + hi["mem_cal_end"])
                / (lo["mem_cal_start"] + lo["mem_cal_end"]), 3)
            if abs(mem_par - 1.0) > args.mem_parity_band:
                continue  # memory-system capacity differed between the legs
            par["mem"] = mem_par
            score = abs(par[str(LO)] - 1.0) + abs(par[str(HI)] - 1.0)
            if best_score is None or score < best_score:
                best, best_score = (lo, hi, par), score
    return best


def run_pair(args) -> int:
    got = find_pair(args)
    if not got:
        print(json.dumps({"pair": None, "reason": "no parity-qualifying (lo,hi) pair banked"}),
              flush=True)
        return 4
    lo, hi, par = got
    eff = round(hi["bench"]["pairs_per_sec"] / (4 * lo["bench"]["pairs_per_sec"]), 3)
    summary = {
        "pair": [os.path.basename(lo["_path"]), os.path.basename(hi["_path"])],
        "parity": par, "scaling_efficiency_e2e": eff,
    }
    if eff < args.min_e2e:
        summary["reason"] = f"best-parity pair eff {eff} < {args.min_e2e}"
        print(json.dumps(summary), flush=True)
        return 4

    prev = _banked_kernel()
    if prev["n_lo"] != LO or prev["n_hi"] != HI:
        raise SystemExit(f"banked kernel window is {prev['n_lo']}->{prev['n_hi']}, legs are {LO}->{HI}")

    def _kernel_leg(leg: dict) -> dict:
        d = {k: v for k, v in leg.items() if k.startswith("kernel")}
        d["cal_units_per_sec"] = leg["kernel_cal_units_per_sec"]
        d["subprocess_sec"] = leg["kernel_subprocess_sec"]
        return d

    def merge(e_leg: dict, k_leg: dict) -> dict:
        r = dict(e_leg)
        r.update({k: v for k, v in k_leg.items() if k.startswith("kernel")})
        r["kernel_cal_units_per_sec"] = k_leg["cal_units_per_sec"]
        r["kernel_subprocess_sec"] = k_leg["subprocess_sec"]
        return r

    k_lo, k_hi = _kernel_leg(prev["lo"]), _kernel_leg(prev["hi"])
    r_lo, r_hi = merge(lo["bench"], k_lo), merge(hi["bench"], k_hi)
    result = {
        "n_lo": LO, "n_hi": HI,
        "lo": r_lo, "hi": r_hi,
        "scaling_efficiency": prev["scaling_efficiency"],
        "scaling_efficiency_e2e": eff,
        "hw_calibration_units_per_sec": {
            "kernel_window_start": prev["hw_calibration_units_per_sec"]["kernel_window_start"],
            "kernel_window_end_hi": prev["hw_calibration_units_per_sec"]["kernel_window_end_hi"],
            # paired-legs: each leg's own bracket at its own width
            "e2e_window_start": {str(LO): lo["cal_start"][str(LO)],
                                 str(HI): hi["cal_start"][str(HI)]},
            "e2e_window_end_hi": hi["cal_end"][str(HI)],
        },
        "mem_calibration_units_per_sec": prev["mem_calibration_units_per_sec"],
        "leg_cal_ratio_e2e": {"lo": lo["leg_cal_ratio"], "hi": hi["leg_cal_ratio"]},
        "e2e_settle_cals": None,  # no inter-leg boundary in paired mode
        "e2e_settle_cals_end": {"lo": lo["settle_cals_end"], "hi": hi["settle_cals_end"]},
        "hw_ceiling_efficiency": prev["hw_ceiling_efficiency"],
        "hw_ceiling_efficiency_e2e_window": min(
            lo["ceiling_start"], lo["ceiling_end"], hi["ceiling_start"], hi["ceiling_end"]
        ),
        "mem_ceiling_efficiency": prev["mem_ceiling_efficiency"],
        "host_drift_between_legs": prev["host_drift_between_legs"],
        # paired-legs: cross-leg calibration parity at the hi width
        "host_drift_e2e_window": par[str(HI)],
        "e2e_method": "paired_legs",
        "e2e_parity": par,
        "e2e_leg_files": summary["pair"],
        "e2e_leg_windows": {
            "lo": {k: lo[k] for k in ("cal_start", "cal_end", "ceiling_start",
                                      "ceiling_end", "drift", "mem_cal_start",
                                      "mem_cal_end", "mem_drift", "started_utc")},
            "hi": {k: hi[k] for k in ("cal_start", "cal_end", "ceiling_start",
                                      "ceiling_end", "drift", "mem_cal_start",
                                      "mem_cal_end", "mem_drift", "started_utc")},
        },
    }
    write_outputs(result, args.sf_dir)
    summary["attempt_result"] = "ACCEPTED"
    print(json.dumps(summary), flush=True)
    return 0


def run_watch(args) -> int:
    deadline = time.time() + args.max_minutes * 60
    while time.time() < deadline:
        if run_pair(args) == 0:
            return 0
        n_lo, n_hi = len(_load_legs(LO)), len(_load_legs(HI))
        # Hunt order (revised after 10 straight lo-leg rejects, 2026-08-20
        # 07:30Z): the lo leg needs a ~13-minute clean window — exactly
        # what this host rarely gives — while the hi leg needs ~5-7. Bank
        # a hi leg FIRST (shortest exposure, and a banked leg is never
        # invalidated), then grind the long lo window; once one of each
        # is banked but parity misses, chase parity with cheap hi
        # attempts 2:1 before adding another lo capacity point.
        if n_hi == 0:
            width = HI
        elif n_lo == 0:
            width = LO
        else:
            width = HI if n_hi < 2 * n_lo + 2 else LO
        c_lo = hw_calibration_med(LO, reps=3)
        c_hi_a = hw_calibration_med(HI, reps=3)
        # flux probe: med-vs-med. The old single-burn repeat made this a
        # test of single-sample noise (±15% at hi), not of host flux —
        # quiet probes flapped at 1.09-1.10 against the 0.08 band.
        c_hi_b = hw_calibration_med(HI, reps=3)
        probe = {
            "c_lo": round(c_lo, 1), "c_hi": round(c_hi_a, 1),
            "stability": round(c_hi_b / c_hi_a, 3),
            "ceiling": round(c_hi_a / (4 * c_lo), 3),
            "target_width": width, "banked_legs": {"lo": n_lo, "hi": n_hi},
        }
        clean = (
            c_hi_a >= args.min_cap
            and c_lo >= args.min_cap_lo
            and abs(probe["stability"] - 1.0) <= args.stability
            and probe["ceiling"] >= args.min_ceiling
        )
        print(json.dumps({"probe": probe, "clean": clean}), flush=True)
        if clean:
            run_leg(width, args)
        else:
            time.sleep(args.probe_sec)
    print("deadline reached without an accepted pair", flush=True)
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=("leg", "pair", "watch"))
    ap.add_argument("width", nargs="?", type=int, help="leg width (cores) for `leg`")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--min-cap", type=float, default=30.0,
                    help="min hi-width units/s to open/keep a leg window")
    ap.add_argument("--min-cap-lo", type=float, default=8.2,
                    help="min lo-width units/s to open a leg window")
    ap.add_argument("--min-ceiling", type=float, default=0.82,
                    help="min lo->hi calibration ceiling to open/close a leg "
                         "window. The QUIET host measures an intrinsic "
                         "~0.84-0.86 width asymmetry (2-proc burns run ~20%% "
                         "faster per-core than 8-proc — few-core boost/"
                         "placement), so a 0.90 bar selected for windows where "
                         "co-tenant load suppressed the lo burn, and a bar AT "
                         "the intrinsic center (0.85) coin-flip-rejected quiet "
                         "windows on estimator noise alone (w2_9/w2_10: 0.827/"
                         "0.829 on a quiet host). 0.82 = intrinsic center "
                         "minus ~1 sigma of the median-estimator ratio; every "
                         "bracket ceiling is still stamped into the leg record "
                         "and the merged file's min, and the raw-efficiency "
                         "bar (--min-e2e) is unchanged")
    ap.add_argument("--drift-band", type=float, default=0.07,
                    help="max |end/start - 1| per width inside one leg's brackets")
    ap.add_argument("--parity-band", type=float, default=0.06,
                    help="max |hi-leg cal / lo-leg cal - 1| per width across the "
                         "pair (0.06 so the merged host_drift_e2e_window stamp "
                         "is guaranteed inside [0.94, 1.06])")
    ap.add_argument("--mem-parity-band", type=float, default=0.12,
                    help="max |hi-leg mem cal / lo-leg mem cal - 1| across the pair "
                         "(memory-system burn at the hi width; noisier than CPU)")
    ap.add_argument("--min-e2e", type=float, default=0.65)
    ap.add_argument("--stability", type=float, default=0.08,
                    help="watch: max |repeat-burn ratio - 1| in the probe")
    ap.add_argument("--probe-sec", type=int, default=75)
    ap.add_argument("--max-minutes", type=int, default=240)
    args = ap.parse_args()

    if args.cmd == "leg":
        if args.width not in (LO, HI):
            raise SystemExit(f"width must be {LO} or {HI}")
        rec = run_leg(args.width, args)
        return 0 if rec["accepted"] else 3
    if args.cmd == "pair":
        return run_pair(args)
    return run_watch(args)


if __name__ == "__main__":
    sys.exit(main())
