"""Planted-truth recall at scale WITHOUT the O(n^2) oracle (round-5 ask #4).

The datagen sidecar (`truth_sidecar`, FIXTURES.md) plants dup pairs by id
arithmetic: a row at position p % 20 in {13, 15, 17, 19} duplicates row
id-1 (kinds substring / exact / caption / phash).  End-to-end recall is the
fraction of planted pairs (both members gate-valid) whose two members land
in the SAME pipeline component — checkable at any corpus size with two
joins, no quadratic oracle.

Prints one JSON line with per-kind and total recall plus the bucket-cap
(capped-mass) accounting from the pipeline's skew metrics.

Usage: python tools/recall_planted.py [n_rows]   (default 100_000 — the
bench input; use 6_000_000 for the 10x stress input)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import input_path  # noqa: E402
from jsonschema_jl_spark.config import DedupConfig  # noqa: E402
from jsonschema_jl_spark.session import get_spark  # noqa: E402
from jsonschema_jl_spark.datagen.images import truth_sidecar  # noqa: E402
from jsonschema_jl_spark.operators.pipeline import dedup_pipeline  # noqa: E402

CFG = DedupConfig()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("recall_planted", cores=cores,
                      extra_conf={"spark.driver.memory": "24g"})
    path = input_path(spark, n_rows)
    images = spark.read.parquet(path)

    t0 = time.time()
    res = dedup_pipeline(images, CFG)
    labels = res.labels.persist()
    labels.count()
    wall = round(time.time() - t0, 1)

    # planted pairs: exactly the dup-member rows, i.e. rows whose
    # dup_group_id differs from their own id (the group BASE carries the
    # same dup_kind label but is its own group — pairing it too would
    # manufacture false pairs with unrelated neighbors)
    truth = truth_sidecar(spark, n_rows)
    dup = truth.filter(
        F.col("dup_kind").isin("substring", "exact", "caption", "phash")
        & (F.col("dup_group_id")
           != F.expr("cast(substring(image_id, 4) as bigint)"))
    ).select(
        "image_id", "dup_kind",
        F.format_string("img%012d", F.col("dup_group_id")).alias("base_id"),
    )
    la = labels.select(F.col("image_id"), F.col("component").alias("c_dup"))
    lb = labels.select(
        F.col("image_id").alias("base_id"), F.col("component").alias("c_base")
    )
    joined = dup.join(la, "image_id").join(lb, "base_id")
    agg = (
        joined.groupBy("dup_kind")
        .agg(
            F.count("*").alias("planted"),
            F.sum((F.col("c_dup") == F.col("c_base")).cast("long")).alias("hit"),
        )
        .collect()
    )
    per_kind = {
        r.dup_kind: {"planted": r.planted, "hit": int(r.hit),
                     "recall": round(r.hit / r.planted, 4)}
        for r in agg
    }
    tot_p = sum(v["planted"] for v in per_kind.values())
    tot_h = sum(v["hit"] for v in per_kind.values())
    out = {
        "metric": "recall_planted",
        "n_rows": n_rows,
        "pipeline_wall_s": wall,
        "per_kind": per_kind,
        "recall_total": round(tot_h / tot_p, 4),
        "skew_capped": res.metrics.get("skew", {}),
    }
    labels.unpersist()
    res.cleanup()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
