"""phash Hamming-ball candidate generation + exact verification (P8).

Pigeonhole block join: to find all pairs within Hamming distance r of a
64-bit phash, split the 64 bits into r+1 disjoint blocks — any pair within
distance r agrees exactly on at least one block (pigeonhole), so equi-joins
on (block_id, block_bits) find every candidate with zero recall loss.
Exact verify is native: bit_count(a.phash ^ b.phash) <= r (Spark 4
`bit_count`, whole-stage codegen).

At 10^12 rows each block join is a standard shuffle equi-join on a 64/(r+1)-
bit key — well-distributed for real phashes; degenerate keys (e.g. the
all-zero phash of blank images) are capped like LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG


def phash_blocks(
    df: DataFrame, id_col: str = "image_id", phash_col: str = "phash",
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(id, phash, block, key): r+1 pigeonhole blocks per row."""
    nblocks = cfg.hamming_radius + 1
    width = cfg.phash_bits // nblocks
    keys = []
    for i in range(nblocks):
        shift = i * width
        w = width if i < nblocks - 1 else cfg.phash_bits - shift
        mask = (1 << w) - 1
        keys.append(F.shiftrightunsigned(F.col(phash_col), shift).bitwiseAND(F.lit(mask)))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(phash_col).alias("ph"),
        F.posexplode(F.array(*keys)).alias("block", "key"),
    )


def phash_pairs(
    df: DataFrame, id_col: str = "image_id", phash_col: str = "phash",
    cfg: DedupConfig = DEFAULT_CONFIG, block_cap: int = 10_000,
    cache_registry: list | None = None,
) -> DataFrame:
    """Distinct (src, dst, hamming) pairs with Hamming(phash) <= radius.

    With a cache_registry the exploded block rows are persisted so the
    block-size count and the self-join share one computation (same
    partial-agg-exchange reuse failure as lsh.candidate_pairs; see there);
    the caller unpersists."""
    blocks = phash_blocks(df, id_col, phash_col, cfg)
    if cache_registry is not None:
        blocks = blocks.persist()
        cache_registry.append(blocks)
    sizes = blocks.groupBy("block", "key").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= block_cap)).drop("n")
    member = blocks.join(ok, ["block", "key"])
    a, b = member.alias("a"), member.alias("b")
    return (
        a.join(b, ["block", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("hamming", F.bit_count(F.col("a.ph").bitwiseXOR(F.col("b.ph"))))
        .filter(F.col("hamming") <= F.lit(cfg.hamming_radius))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"), "hamming")
        .dropDuplicates(["src", "dst"])
    )
