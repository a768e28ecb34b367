"""One 10x-scale stress draw (round-5 ask #3): run the full dedup pipeline
once at ~6.5M rows — 10x the scaling-phase input — under the bench's probe
protocol, and record throughput, spill, peak JVM memory, and bucket-cap
metrics.  Every partition-count and cap argument in SCALE.md was previously
evidenced at <= 648k rows; this run is the first order-of-magnitude check.

Usage: python tools/stress_10x.py [n_rows]   (default 6_000_000 base rows;
writes one JSON line to stdout and appends nothing — BASELINE.md is updated
by hand from the output)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import input_path, _steal_jiffies_cores, _mem_bandwidth_gbs  # noqa: E402
from jsonschema_jl_spark.config import DedupConfig  # noqa: E402
from jsonschema_jl_spark.session import get_spark  # noqa: E402
from jsonschema_jl_spark.operators.pipeline import dedup_pipeline  # noqa: E402

CFG = DedupConfig()


def _stage_metrics(spark) -> dict:
    """Sum spill/shuffle/input bytes over all completed stages via the UI
    REST API (local mode: one app)."""
    base = spark.sparkContext.uiWebUrl
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=30
        ))
    except Exception as exc:  # UI disabled or unreachable: report why
        return {"error": str(exc)}
    agg = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0, "inputBytes": 0, "executorRunTime": 0}
    for st in stages:
        for k in agg:
            agg[k] += int(st.get(k, 0))
    return agg


def _jvm_peak_rss_gb(spark) -> float | None:
    """VmHWM of the in-process JVM (local mode: driver+executor are one)."""
    try:
        pid = spark._jvm.java.lang.ProcessHandle.current().pid()
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmHWM"):
                    return round(int(line.split()[1]) / 1024 / 1024, 2)
    except Exception:
        return None
    return None


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stress_10x", cores=cores,
                      extra_conf={"spark.ui.enabled": "true"})
    t0 = time.time()
    path = input_path(spark, n_rows)
    gen_s = round(time.time() - t0, 1)

    total_rows = n_rows + int(0.08 * n_rows)
    steal0 = _steal_jiffies_cores(cores)
    bw0 = _mem_bandwidth_gbs()
    t0 = time.time()
    res = dedup_pipeline(spark.read.parquet(path), CFG)
    labeled = res.labels.count()
    wall = round(time.time() - t0, 2)
    bw1 = _mem_bandwidth_gbs()
    steal_pct = round(
        100.0 * (_steal_jiffies_cores(cores) - steal0) / max(1.0, wall * 100.0 * cores), 2
    )
    comp = res.labels.select("component").distinct().count()
    skew = res.metrics.get("skew", {})
    gate = res.metrics.get("gate", {})
    res.cleanup()

    out = {
        "metric": "stress_10x",
        "n_rows_total": total_rows,
        "gen_s": gen_s,
        "pipeline_wall_s": wall,
        "rows_per_s": round(total_rows / wall),
        "labeled_rows": labeled,
        "components": comp,
        "skew": skew,
        "gate": gate,
        "steal_pct": steal_pct,
        "membw_gbs": [round(bw0, 1), round(bw1, 1)],
        "jvm_peak_rss_gb": _jvm_peak_rss_gb(spark),
        "stages": _stage_metrics(spark),
        "cores": cores,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
