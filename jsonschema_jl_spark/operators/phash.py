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
    cache_registry: list | None = None, num_partitions: int | None = None,
) -> DataFrame:
    """Distinct (src, dst, hamming) pairs with Hamming(phash) <= radius.

    ONE exchange of the block rows, ZERO sorts — the same shape as
    lsh.candidate_pairs: hash-partition (id, ph, block, key) once, filter
    to shared non-capped blocks with a SHUFFLE_HASH join against the tiny
    survivor set, then collect_list + map-side nested-transform expansion
    emits each pair WITH both phashes (the payload is one 8-byte long per
    member, so carrying it through the list costs nothing), and the native
    bit_count verify runs inside the same stage.  This replaces the
    two-sided membership self-join, which paid an extra exchange of the
    full membership on each side.

    With a cache_registry the block rows are repartitioned on the block
    key and persisted so the size count and the collect_list share one
    exchange (same partial-agg-exchange reuse failure as
    lsh.candidate_pairs; see there); the caller unpersists."""
    blocks = phash_blocks(df, id_col, phash_col, cfg)
    par = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if cache_registry is not None or num_partitions is not None:
        # data-sized exchange (see lsh.candidate_pairs): the explicit
        # partitioning propagates through the size agg, survivor join, and
        # collect_list, bounding per-task hash-join builds at any scale
        blocks = blocks.repartition(par, "block", "key")
    if cache_registry is not None:
        blocks = blocks.persist()
        cache_registry.append(blocks)
    sizes = blocks.groupBy("block", "key").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= block_cap)).drop("n")
    member = blocks.join(ok.hint("SHUFFLE_HASH"), ["block", "key"])
    grouped = member.groupBy("block", "key").agg(
        F.collect_list(F.struct("id", "ph")).alias("ms")
    )
    # per-member pair expansion: posexplode the membership and emit one
    # O(cap) slice per member — the flatten(transform(...)) single-array
    # shape materializes all C(n,2) pair structs of a block as ONE array
    # value, and at block_cap=10_000 a cap-sized degenerate block (e.g.
    # blank-image phashes) would build a ~5e7-struct (~1+ GB) array in a
    # single task row.  Member rows stream through the two Generates inside
    # one codegen stage, so per-row state is O(cap), total work unchanged.
    # (lsh.candidate_pairs keeps the single-array template: bucket_cap=64
    # bounds it at 2,016 structs.)
    return (
        grouped.select(F.col("ms"), F.posexplode("ms").alias("i", "x"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(ms, i + 2, size(ms)), y -> struct("
                    "least(x.id, y.id) AS src, greatest(x.id, y.id) AS dst,"
                    " bit_count(x.ph ^ y.ph) AS hamming))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst", "p.hamming")
        .filter(F.col("hamming") <= F.lit(cfg.hamming_radius))
        .dropDuplicates(["src", "dst"])
    )
