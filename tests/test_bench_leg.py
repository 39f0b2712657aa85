"""Pairing logic of tools/bench_leg.py (no Spark, no burns).

The paired-legs harness replaces temporal adjacency with a cross-leg
calibration-parity gate; these tests pin the acceptance rules:
pre-registered parity-closest pair choice (never max-eff), the parity
band, the identical-output guard, and the merged result's stamps.
"""

import importlib.util
import json
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)
spec = importlib.util.spec_from_file_location("bench_leg", os.path.join(TOOLS, "bench_leg.py"))
bench_leg = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_leg)


def _leg(width, n, cal, pps, pairs=15103852, clusters=96716, accepted=True, mem=7.0):
    c = {"2": cal[0], "8": cal[1]}
    return {
        "width": width,
        "accepted": accepted,
        "cal_start": c,
        "cal_end": c,
        "mem_cal_start": mem,
        "mem_cal_end": mem,
        "mem_drift": 1.0,
        "ceiling_start": round(cal[1] / (4 * cal[0]), 3),
        "ceiling_end": round(cal[1] / (4 * cal[0]), 3),
        "drift": {"2": 1.0, "8": 1.0},
        "leg_cal_ratio": 1.0,
        "settle_cals_end": [cal[1]],
        "started_utc": "2026-08-20T01:00:00Z",
        "bench": {
            "metric": "e2e_pipeline_sec", "unit": "sec", "sf": 0.1,
            "cpus": width, "value": 600.0 if width == 2 else 220.0,
            "cal_units_per_sec": cal[0] if width == 2 else cal[1],
            "corpus_rows": 265913, "pairs_scored": pairs,
            "pairs_per_sec": pps, "n_clusters": clusters,
            "queries": {"scored_pairs": 2.5},
            "subprocess_sec": 630.0,
        },
    }


def _write(bench_dir, rec, n):
    with open(os.path.join(bench_dir, f"e2e_leg_w{rec['width']}_{n}.json"), "w") as fh:
        json.dump(rec, fh)


@pytest.fixture()
def bank(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_leg, "BENCH", str(tmp_path))
    return str(tmp_path)


def _args(**kw):
    defaults = dict(parity_band=0.08, mem_parity_band=0.12, min_e2e=0.65, sf_dir="/tmp/x")
    defaults.update(kw)
    return type("A", (), defaults)()


def test_find_pair_prefers_parity_not_eff(bank):
    _write(bank, _leg(2, 1, (9.0, 35.0), pps=25000.0), 1)
    # hi leg A: parity 1.0, eff = 70000/(4*25000) = 0.70
    _write(bank, _leg(8, 1, (9.0, 35.0), pps=70000.0), 1)
    # hi leg B: better eff (0.80) but parity 1.07 at both widths
    _write(bank, _leg(8, 2, (9.6, 37.4), pps=80000.0), 2)
    lo, hi, par = bench_leg.find_pair(_args())
    assert os.path.basename(hi["_path"]) == "e2e_leg_w8_1.json"
    assert par == {"2": 1.0, "8": 1.0, "mem": 1.0}


def test_parity_band_rejects(bank):
    _write(bank, _leg(2, 1, (9.0, 35.0), pps=25000.0), 1)
    _write(bank, _leg(8, 1, (8.0, 31.0), pps=70000.0), 1)  # 8.0/9.0 = 0.889
    assert bench_leg.find_pair(_args()) is None


def test_output_mismatch_rejects(bank):
    _write(bank, _leg(2, 1, (9.0, 35.0), pps=25000.0), 1)
    _write(bank, _leg(8, 1, (9.0, 35.0), pps=70000.0, clusters=12345), 1)
    assert bench_leg.find_pair(_args()) is None


def test_mem_parity_rejects(bank):
    _write(bank, _leg(2, 1, (9.0, 35.0), pps=25000.0, mem=7.0), 1)
    # CPU cals identical but the memory-system burn differs 20%
    _write(bank, _leg(8, 1, (9.0, 35.0), pps=70000.0, mem=5.6), 1)
    assert bench_leg.find_pair(_args()) is None


def test_rejected_legs_ignored(bank):
    _write(bank, _leg(2, 1, (9.0, 35.0), pps=25000.0, accepted=False), 1)
    _write(bank, _leg(8, 1, (9.0, 35.0), pps=70000.0), 1)
    assert bench_leg.find_pair(_args()) is None


def test_run_pair_merges_banked_kernel(bank, monkeypatch, capsys):
    _write(bank, _leg(2, 1, (9.0, 35.0), pps=25000.0), 1)
    _write(bank, _leg(8, 1, (9.1, 34.5), pps=70000.0), 1)
    prev = {
        "n_lo": 2, "n_hi": 8,
        "lo": {"kernel_sec": 50.0, "kernel_pairs": 100, "kernel_pairs_per_sec": 2.0,
               "kernel_cal_units_per_sec": 9.0, "kernel_subprocess_sec": 60.0},
        "hi": {"kernel_sec": 15.0, "kernel_pairs": 100, "kernel_pairs_per_sec": 6.4,
               "kernel_cal_units_per_sec": 35.0, "kernel_subprocess_sec": 20.0},
        "scaling_efficiency": 0.801,
        "hw_calibration_units_per_sec": {
            "kernel_window_start": {"2": 9.4, "8": 37.7}, "kernel_window_end_hi": 36.3},
        "mem_calibration_units_per_sec": {"kernel_window": {"2": 2.14, "8": 6.97}},
        "hw_ceiling_efficiency": 1.003, "mem_ceiling_efficiency": 0.813,
        "host_drift_between_legs": 0.963,
    }
    monkeypatch.setattr(bench_leg, "_banked_kernel", lambda: prev)
    captured = {}
    monkeypatch.setattr(bench_leg, "write_outputs", lambda r, sf: captured.update(r))
    assert bench_leg.run_pair(_args()) == 0
    assert captured["e2e_method"] == "paired_legs"
    assert captured["scaling_efficiency"] == 0.801  # kernel carried verbatim
    assert captured["scaling_efficiency_e2e"] == 0.7
    assert captured["host_drift_e2e_window"] == captured["e2e_parity"]["8"]
    assert captured["lo"]["kernel_pairs_per_sec"] == 2.0  # merged kernel leg
    assert captured["lo"]["pairs_per_sec"] == 25000.0
    out = capsys.readouterr().out
    assert "ACCEPTED" in out


def test_run_pair_rejects_low_eff(bank, monkeypatch):
    _write(bank, _leg(2, 1, (9.0, 35.0), pps=25000.0), 1)
    _write(bank, _leg(8, 1, (9.0, 35.0), pps=60000.0), 1)  # eff 0.6 < 0.65
    monkeypatch.setattr(bench_leg, "_banked_kernel", lambda: {"n_lo": 2, "n_hi": 8})
    assert bench_leg.run_pair(_args()) == 4
