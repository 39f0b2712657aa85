"""Summarize a Spark event log: per-stage wall + task-time, grouped by job.

    python tools/analyze_eventlog.py /tmp/ims_eventlog
"""

from __future__ import annotations

import json
import os
import sys


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ims_eventlog"
    files = [os.path.join(d, f) for f in os.listdir(d) if not f.startswith(".")]
    if not files:
        raise SystemExit(f"no event logs in {d}")
    path = max(files, key=os.path.getmtime)
    paths = [path]
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if "appstatus" not in f and not f.startswith(".")
        )

    stages = {}       # stage_id -> dict
    jobs = {}         # job_id -> {stages: [...], t0, t1}
    stage_tasktime = {}

    def lines():
        import io
        for p in paths:
            if p.endswith(".zstd"):
                import subprocess

                proc = subprocess.Popen(
                    ["zstd", "-dc", p], stdout=subprocess.PIPE
                )
                yield from io.TextIOWrapper(proc.stdout, encoding="utf-8")
                proc.wait()
            else:
                with open(p) as fh2:
                    yield from fh2

    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "t0": ev.get("Submission Time", 0),
                }
            elif e == "SparkListenerJobEnd":
                jobs.setdefault(ev["Job ID"], {}).update(t1=ev.get("Completion Time", 0))
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0, t1 = si.get("Submission Time"), si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "wall": (t1 - t0) / 1000.0 if t0 and t1 else 0.0,
                    "tasks": si.get("Number of Tasks", 0),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                ti = ev.get("Task Info", {})
                rt = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                stage_tasktime[sid] = stage_tasktime.get(sid, 0.0) + max(rt, 0.0)

    print(f"log: {path}")
    print(f"{len(jobs)} jobs, {len(stages)} stages")
    # top stages by task-time (the real compute), with wall
    rows = [
        (stage_tasktime.get(sid, 0.0), st["wall"], sid, st["tasks"], st["name"][:110])
        for sid, st in stages.items()
    ]
    rows.sort(reverse=True)
    total_task = sum(r[0] for r in rows)
    total_wall = sum(r[1] for r in rows)
    print(f"sum task-time {total_task:.0f}s  sum stage-wall {total_wall:.0f}s")
    print(f"{'task_s':>8} {'wall_s':>7} {'sid':>5} {'ntask':>5}  name")
    for tt, w, sid, nt, name in rows[:40]:
        print(f"{tt:8.1f} {w:7.1f} {sid:5d} {nt:5d}  {name}")

    # per-job wall
    print("\nper-job wall (>1s):")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" in j and "t0" in j:
            w = (j["t1"] - j["t0"]) / 1000.0
            if w > 1.0:
                sids = j.get("stages", [])
                names = {stages[s]["name"].split(" ")[0] for s in sids if s in stages}
                print(f"job {jid:3d}: {w:7.1f}s stages={len(sids)} {sorted(names)[:4]}")


if __name__ == "__main__":
    main()
