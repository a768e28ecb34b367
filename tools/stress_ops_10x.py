"""10x-scale stress draws for the two contract ops that gained the
data-derived `num_partitions` floor in round 6: `ngram_token_pairs` and
`lsh_ann_pairs` (VERDICT round-5 ask #1 done-criterion — each op must
complete an order-of-magnitude-up draw with zero spill and no capped-grant
("Can't acquire ... bytes") errors).

Inputs are synthesized one order of magnitude above the ops' bench-scale
corpora:

  * documents: the sf1.0 documents table (50k rows) replicated K times
    with the replica index spliced into the id; interior token n-grams
    repeat across replicas, so anchors are K-times hotter than at sf1.0 —
    an adversarial gram-frequency profile, not a friendly one.
  * embeddings: n deterministic standard-normal float64 vectors (one
    numpy Generator per id, partitioning-independent), n_planes raised to
    16 so the candidate volume stays ~n^2/2^16 per table instead of
    exploding quadratically at 10x the corpus.

Both lanes run with the same data-derived floor the pipeline uses
(~50k rows/partition) and report wall, output rows, spill and peak RSS.

Usage: python tools/stress_ops_10x.py [n_docs] [n_vecs]
(defaults 500_000 docs / 1_000_000 vectors)
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import functions as F, types as T  # noqa: E402

from jsonschema_jl_spark.session import get_spark  # noqa: E402
from jsonschema_jl_spark.operators.similarity import (  # noqa: E402
    lsh_ann_pairs,
    ngram_token_pairs,
)
from tools.stress_10x import _jvm_peak_rss_gb, _stage_metrics  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stress_ops_10x", cores=cores,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.driver.memory": "24g"})
    out: dict = {"metric": "stress_ops_10x", "cores": cores}

    # ---- ngram_token_pairs over replicated documents ----
    base = spark.read.parquet("/root/testdata/sf1.0/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    k = max(1, n_docs // n_base)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    docs = base.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * k + F.col("rep")).alias("doc_id"), "text"
    )
    total_docs = n_base * k
    floor = max(cores, total_docs // 50_000)
    t0 = time.time()
    n_pairs = ngram_token_pairs(
        docs, n=3, anchor_cap=200, num_partitions=floor
    ).count()
    out["ngram"] = {
        "docs": total_docs, "replicas": k, "num_partitions": floor,
        "wall_s": round(time.time() - t0, 1), "pairs": n_pairs,
    }
    print(json.dumps({"progress": "ngram done", **out["ngram"]}), flush=True)

    # ---- lsh_ann_pairs over synthetic embeddings ----
    dim = 64

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def vec_udf(ids: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in ids:
            yield pd.Series([
                np.random.default_rng(int(i)).standard_normal(dim)
                for i in s
            ])

    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec_udf(F.col("id")).alias("embedding")
    )
    floor_v = max(cores, n_vecs // 50_000)
    t0 = time.time()
    n_ann = lsh_ann_pairs(
        vecs, dim=dim, n_planes=16, n_tables=4, min_cos=0.5,
        num_partitions=floor_v,
    ).count()
    out["ann"] = {
        "vectors": n_vecs, "num_partitions": floor_v,
        "wall_s": round(time.time() - t0, 1), "pairs": n_ann,
    }
    out["jvm_peak_rss_gb"] = _jvm_peak_rss_gb(spark)
    out["stages"] = _stage_metrics(spark)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
