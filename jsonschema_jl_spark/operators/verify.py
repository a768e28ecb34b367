"""Exact-Jaccard verification of candidate pairs (P7).

Candidates are joined back to their shingle sets (two shuffle joins on the
id — at scale these reuse the signature table's bucketing) and verified with
a vectorized pandas UDF: |a ∩ b| / |a ∪ b| over sorted uint64 arrays.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG


@F.pandas_udf(T.DoubleType())
def jaccard_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    for a_col, b_col in it:
        out = np.empty(len(a_col), dtype=np.float64)
        for i, (a, b) in enumerate(zip(a_col, b_col)):
            if a is None or b is None or len(a) == 0 or len(b) == 0:
                out[i] = 0.0
                continue
            aa = np.asarray(a, dtype=np.int64)
            bb = np.asarray(b, dtype=np.int64)
            inter = np.intersect1d(aa, bb, assume_unique=True).size
            out[i] = inter / (aa.size + bb.size - inter)
        yield pd.Series(out)


def verify_jaccard(
    pairs: DataFrame,
    signatures: DataFrame,
    id_col: str = "image_id",
    shingle_col: str = "shingles",
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(src, dst, jaccard) for pairs with exact Jaccard >= cfg.jaccard_tau."""
    s = signatures.select(F.col(id_col).alias("id"), F.col(shingle_col).alias("sh"))
    left = s.select(F.col("id").alias("src"), F.col("sh").alias("sh_src"))
    right = s.select(F.col("id").alias("dst"), F.col("sh").alias("sh_dst"))
    joined = pairs.join(left, "src").join(right, "dst")
    out = joined.withColumn("jaccard", jaccard_udf(F.col("sh_src"), F.col("sh_dst")))
    return out.filter(F.col("jaccard") >= F.lit(cfg.jaccard_tau)).select(
        "src", "dst", "jaccard"
    )


def _make_text_jaccard_udf(cfg: DedupConfig, normalized: bool = False):
    from jsonschema_jl_spark.operators.minhash import shingle_set_np

    @F.pandas_udf(T.DoubleType())
    def text_jaccard(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a_col, b_col in it:
            out = np.empty(len(a_col), dtype=np.float64)
            for i, (a, b) in enumerate(zip(a_col, b_col)):
                if a is None or b is None:
                    out[i] = 0.0
                    continue
                aa = shingle_set_np(a, cfg.shingle_k, normalized=normalized)
                bb = shingle_set_np(b, cfg.shingle_k, normalized=normalized)
                inter = np.intersect1d(aa, bb, assume_unique=True).size
                out[i] = inter / (aa.size + bb.size - inter)
            yield pd.Series(out)

    return text_jaccard


def verify_jaccard_text(
    pairs: DataFrame,
    texts: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    cfg: DedupConfig = DEFAULT_CONFIG,
    assume_normalized: bool = False,
) -> DataFrame:
    """Like verify_jaccard, but joins the candidate pairs back to the raw
    text and recomputes shingle sets inside the UDF — candidates are a tiny
    fraction of rows, so shipping ~150-byte captions for them beats
    materializing ~1 KB shingle arrays for EVERY row upstream."""
    t = texts.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    left = t.select(F.col("id").alias("src"), F.col("txt").alias("txt_src"))
    right = t.select(F.col("id").alias("dst"), F.col("txt").alias("txt_dst"))
    joined = pairs.join(left, "src").join(right, "dst")
    udf = _make_text_jaccard_udf(cfg, normalized=assume_normalized)
    out = joined.withColumn("jaccard", udf(F.col("txt_src"), F.col("txt_dst")))
    return out.filter(F.col("jaccard") >= F.lit(cfg.jaccard_tau)).select(
        "src", "dst", "jaccard"
    )
