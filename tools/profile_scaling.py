"""Profile one scaling rep: where does the wall-clock go at local[k]?

Runs the same pipeline rep the scaling bench times (same input, same heap,
same partitioning), with Spark event logging on, then parses the event log
into a job timeline: per-job duration, executor task-time, and the GAPS
between jobs (driver-only serial time — query planning, action latency,
py4j round-trips).  The gap total is the Amdahl serial fraction that caps
(thr_4N/thr_N)/4; shrinking it is the real scaling lever.

Usage: python tools/profile_scaling.py <cores> [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jsonschema_jl_spark.config import DedupConfig
from jsonschema_jl_spark.session import get_spark, stop_spark
from jsonschema_jl_spark.operators.pipeline import dedup_pipeline

CFG = DedupConfig()


def main() -> None:
    cores = int(sys.argv[1])
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 864_000
    from bench import input_path  # reuse the cached deterministic input

    import shutil as _shutil

    evdir = f"/tmp/spark-events-{cores}"
    _shutil.rmtree(evdir, ignore_errors=True)  # stale rolling-log dirs too
    os.makedirs(evdir, exist_ok=True)

    gen = get_spark("profile_gen", cores=32)
    path = input_path(gen, n_rows)
    stop_spark(gen)
    from jsonschema_jl_spark.session import shutdown_jvm

    shutdown_jvm()

    spark = get_spark(
        f"profile_scale_{cores}", cores=cores, shuffle_partitions=48,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.driver.extraJavaOptions":
                f"-Xms8g -XX:ParallelGCThreads={cores} -XX:ConcGCThreads={max(1, cores // 4)}",
            "spark.sql.adaptive.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    df = spark.read.parquet(path)
    df.count()
    # small warmup (JIT, python workers) on a slice
    warm = df.limit(50_000)
    res = dedup_pipeline(warm, CFG, collect_metrics=False)
    res.labels.count()
    res.cleanup()
    # full-size warmup (heap shaping) — same as bench protocol
    res = dedup_pipeline(df, CFG, collect_metrics=False)
    res.labels.count()
    res.cleanup()

    mark = time.time() * 1000  # only analyze jobs after this
    t0 = time.time()
    res = dedup_pipeline(df, CFG, collect_metrics=False)
    res.labels.count()
    wall = time.time() - t0
    res.cleanup()
    stop_spark(spark)
    time.sleep(2)

    jobs = []  # (id, t_start, t_end, ntasks, task_time_ms)
    stage_task_time: dict[int, float] = {}
    stage_of_job: dict[int, list[int]] = {}
    job_open: dict[int, float] = {}
    # Spark 4 event logs are rolling dirs of zstd-compressed json lines
    import glob
    import subprocess

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
        if True:
            for line in text.splitlines():
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    job_open[ev["Job ID"]] = ev["Submission Time"]
                    stage_of_job[ev["Job ID"]] = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in job_open:
                        jobs.append((jid, job_open[jid], ev["Completion Time"]))
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    stage_task_time[sid] = stage_task_time.get(sid, 0.0) + (
                        m.get("Executor Run Time", 0)
                    )

    jobs = [j for j in jobs if j[1] >= mark]
    jobs.sort(key=lambda j: j[1])
    print(f"\n=== local[{cores}] rep: wall {wall:.1f}s, {len(jobs)} jobs ===")
    total_job = sum((e - s) / 1000 for _, s, e in jobs)
    # serial gaps assume sequential jobs; concurrent actions make
    # start[i] - end[i-1] negative, which would silently deflate the total —
    # clamp each gap at 0 and report the overlap separately
    gaps = []
    overlap = 0.0
    for i in range(1, len(jobs)):
        g = (jobs[i][1] - jobs[i - 1][2]) / 1000
        if g < 0:
            overlap += -g
            g = 0.0
        gaps.append((jobs[i][0], g))
    lead = (jobs[0][1] - mark) / 1000 if jobs else 0.0
    total_gap = sum(g for _, g in gaps) + lead
    print(f"in-job time  : {total_job:.1f}s")
    print(f"gap (serial) : {total_gap:.1f}s  (lead-in {lead:.1f}s, job overlap {overlap:.1f}s)")
    print("top gaps:")
    for jid, g in sorted(gaps, key=lambda x: -x[1])[:10]:
        print(f"  before job {jid}: {g:.2f}s")
    print("top jobs (duration s, task-time s, task/dur):")
    rows = []
    for jid, s, e in jobs:
        dur = (e - s) / 1000
        tt = sum(stage_task_time.get(sid, 0.0) for sid in stage_of_job.get(jid, [])) / 1000
        rows.append((jid, dur, tt))
    for jid, dur, tt in sorted(rows, key=lambda x: -x[1])[:15]:
        util = tt / (dur * cores) if dur > 0 else 0
        print(f"  job {jid}: {dur:7.2f}s  task {tt:8.1f}s  util {util:4.2f}")
    print(json.dumps({"cores": cores, "wall": round(wall, 1),
                      "in_job": round(total_job, 1), "serial_gap": round(total_gap, 1),
                      "job_overlap": round(overlap, 1), "n_jobs": len(jobs)}))


if __name__ == "__main__":
    main()
