"""Similarity search over embedding columns (array<float>).

  * cosine_topk       — exact brute-force top-k via a blocked cross join;
    the baseline and the oracle for the approximate path.  Native
    F.aggregate/F.zip_with dot products (JVM, no Python).
  * lsh_ann_topk      — scale path: random-hyperplane (SimHash) bucketing;
    only pairs sharing a hyperplane-sign bucket are scored.  At 10^12 rows
    the cross join is infeasible; signs shrink candidates to
    O(n * bucket_size) with tunable recall via (n_planes, n_tables).
  * exact_dedup       — hash-groupBy exact text dedup (documents table)
  * ngram_jaccard_pairs — n-gram token Jaccard near-dup candidates
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window, functions as F

from jsonschema_jl_spark.operators.textops import normalized_text, fingerprint


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cos) — exact top-k per query.

    queries defaults to the corpus itself (self top-k, excluding self).
    The corpus side is broadcast when small; at scale, block the corpus and
    loop (or use lsh_ann_topk)."""
    corpus = df.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    q = (queries or df).select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    scored = (
        q.crossJoin(corpus)
        .filter(F.col("qid") != F.col("nid"))
        # rank by the ROUNDED score with id tie-break: keeps the top-k
        # deterministic and bit-identical across engines (raw float sums can
        # differ in the last ulp between implementations)
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("nvec")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"),
                "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, table: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed + 7919 * table)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def signs_column(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket key: sign bits of <v, h_i> packed into a long — computed with
    native array expressions per plane (JVM-side)."""
    key = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(x)) for x in plane])
        dot = _dot(vec_col, lits)
        key = key + F.when(dot > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
    return key


def lsh_ann_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 4242,
    min_cos: float = 0.0,
    bucket_cap: int = 2000,
) -> DataFrame:
    """Candidate (src, dst, cos) pairs sharing a hyperplane-sign bucket in
    any of n_tables tables; exact cosine verified natively."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    keys = [
        signs_column(F.col("vec"), _hyperplanes(dim, n_planes, t, seed)) for t in range(n_tables)
    ]
    exploded = base.select(
        "id", "vec", F.posexplode(F.array(*keys)).alias("table", "bucket")
    )
    sizes = exploded.groupBy("table", "bucket").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= bucket_cap)).drop("n")
    member = exploded.join(ok, ["table", "bucket"])
    a, b = member.alias("a"), member.alias("b")
    return (
        a.join(b, ["table", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
        .dropDuplicates(["src", "dst"])
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by normalized-text fingerprint: canonical id = min id per
    group.  (fingerprint, canonical_id, n_dups)."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_dups"))
    )


def ngram_token_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    anchor_cap: int = 200,
) -> DataFrame:
    """Near-dup candidates: pairs sharing at least one token n-gram.
    (src, dst, shared_ngrams) — exact Jaccard can then verify.  n-grams are
    md5-hex (cross-engine deterministic)."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(size(split(regexp_replace(trim(lower({text_col})), '\\\\s+', ' '), ' ')) - {n - 1}, 1)),"
                    f" i -> md5(concat_ws(' ', slice(split(regexp_replace(trim(lower({text_col})), '\\\\s+', ' '), ' '), i, {n}))))"
                )
            )
        ).alias("g"),
    )
    sizes = grams.groupBy("g").agg(F.count("*").alias("cnt"))
    ok = sizes.filter((F.col("cnt") > 1) & (F.col("cnt") <= anchor_cap)).drop("cnt")
    grams = grams.join(ok, "g")
    a, b = grams.alias("a"), grams.alias("b")
    return (
        a.join(b, "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .agg(F.count("*").alias("shared_ngrams"))
    )
