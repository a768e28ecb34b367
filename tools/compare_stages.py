"""Compare per-stage executor metrics between two scaling-profile event logs.

The profile runs are deterministic (same input, same plan), so stage IDs
align across parallelism levels; for each stage this prints run/cpu time at
both levels and the per-stage scaling ratio — the stages whose ratio falls
far below the core ratio are the ones capping (thr_4N/thr_N)/4.

Usage: python tools/compare_stages.py /tmp/spark-events-1 /tmp/spark-events-4 [first_stage]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys


def parse(evdir: str):
    run: dict[int, dict] = {}
    name: dict[int, str] = {}
    jobs = []
    job_open: dict[int, float] = {}
    stage_of_job: dict[int, list[int]] = {}
    paths = glob.glob(os.path.join(evdir, "**", "events_*"), recursive=True) + [
        p for p in glob.glob(os.path.join(evdir, "*")) if os.path.isfile(p)
    ]
    for fn in paths:
        if fn.endswith(".zstd"):
            text = subprocess.run(["zstd", "-d", "-c", fn], capture_output=True,
                                  text=True).stdout
        else:
            with open(fn, errors="ignore") as f:
                text = f.read()
        for line in text.splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                d = run.setdefault(sid, dict(run=0.0, cpu=0.0, gc=0.0, n=0, swb=0, srb=0))
                d["run"] += m.get("Executor Run Time", 0)
                d["cpu"] += m.get("Executor CPU Time", 0) / 1e6
                d["gc"] += m.get("JVM GC Time", 0)
                d["n"] += 1
                sw = m.get("Shuffle Write Metrics") or {}
                sr = m.get("Shuffle Read Metrics") or {}
                d["swb"] += sw.get("Shuffle Bytes Written", 0)
                d["srb"] += sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                name[si["Stage ID"]] = si["Stage Name"]
            elif e == "SparkListenerJobStart":
                job_open[ev["Job ID"]] = ev["Submission Time"]
                stage_of_job[ev["Job ID"]] = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
            elif e == "SparkListenerJobEnd":
                j = ev["Job ID"]
                if j in job_open:
                    jobs.append((j, job_open[j], ev["Completion Time"]))
    return run, name, sorted(jobs, key=lambda j: j[1]), stage_of_job


def main() -> None:
    d1, d4 = sys.argv[1], sys.argv[2]
    first = int(sys.argv[3]) if len(sys.argv) > 3 else 102
    r1, n1, j1, _ = parse(d1)
    r4, n4, j4, _ = parse(d4)
    print(f"{'stage':>5} {'runA':>8} {'cpuA':>8} {'runB':>8} {'cpuB':>8} "
          f"{'runB/A':>6} {'cpuB/A':>6}  name")
    tot1 = tot4 = 0.0
    for sid in sorted(set(r1) & set(r4)):
        if sid < first:
            continue
        a, b = r1[sid], r4[sid]
        tot1 += a["run"] / 1000
        tot4 += b["run"] / 1000
        if a["run"] < 2000 and b["run"] < 2000:
            continue
        print(f"{sid:5d} {a['run']/1000:8.1f} {a['cpu']/1000:8.1f} "
              f"{b['run']/1000:8.1f} {b['cpu']/1000:8.1f} "
              f"{b['run']/max(1,a['run']):6.2f} {b['cpu']/max(1,a['cpu']):6.2f}"
              f"  {n1.get(sid,'?')[:50]}")
    print(f"total run A {tot1:.1f}s  B {tot4:.1f}s  (stages >= {first})")


if __name__ == "__main__":
    main()
