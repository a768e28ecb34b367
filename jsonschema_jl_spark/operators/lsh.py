"""LSH banding, bucket grouping, skew-aware candidate pair generation (P4-P6).

Spark-first design:
  * banding is a native posexplode of precomputed bucket keys — the
    signature kernel emits them vectorized (minhash.band_keys_np), so the
    explode carries no per-row hashing; a JVM-side xxhash64-over-slices
    fallback serves callers holding bare signatures;
  * candidate pairs come from a self-equi-join on the bucket key (the band
    id is folded into the bucket hash, so `bucket` alone is the join key),
    which AQE can skew-split; the join's shuffle partitioning on `bucket` is
    reused from the size-filter aggregation, so the extra skew pass costs no
    extra shuffle of the big side;
  * skew handling (north rule, BASELINE.json:6): bucket sizes are measured
    first; buckets above cfg.bucket_cap are excluded from pairing and
    reported as metrics (count + dropped row mass).  Stop-shingle buckets at
    web scale otherwise explode quadratically — a size-s bucket yields
    s(s-1)/2 pairs, so a single 1M-row bucket would emit 5*10^11 pairs.
    Capped mass is recall-accounted by the oracle harness at identical
    config, and the phash/containment passes still cover capped rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG


def band_buckets(
    df: DataFrame, id_col: str = "image_id", sig_col: str = "minhash",
    cfg: DedupConfig = DEFAULT_CONFIG, bands_col: str | None = None,
) -> DataFrame:
    """(id, band, bucket) — one row per band.  The band index is folded INTO
    the bucket hash (salted by the band id), so the bucket alone is a valid
    join/grouping key; `band` is informational only (candidate_pairs
    projects it off before the big exchange and nothing downstream consumes
    it).

    Two equivalent paths (same pair-set semantics — candidates are pairs
    agreeing on a band's CONTENT, the hash is just an internal join key):
      * bands_col given: the signature kernel already emitted the bucket
        keys (minhash.band_keys_np, one vectorized fold per band) — banding
        is a plain posexplode.  The pipeline hot path: the alternative's
        num_bands slice+xxhash64 expressions over num_perm-long arrays
        measured 147 s CPU per 108k rows, ~40x the kernel fold.
      * sig_col only: JVM-side xxhash64 over signature slices — no Python,
        used by callers holding bare signatures (e.g. resumed checkpoints
        written before banding, ad-hoc salted-pair queries)."""
    if bands_col is not None:
        return df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.col(bands_col)).alias("band", "bucket"),
        )
    slices = [
        F.xxhash64(F.slice(F.col(sig_col), b * cfg.rows_per_band + 1, cfg.rows_per_band), F.lit(b))
        for b in range(cfg.num_bands)
    ]
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.array(*slices)).alias("band", "bucket"),
    )


@dataclass
class SkewMetrics:
    capped_buckets: int
    capped_rows: int

    def as_dict(self) -> dict:
        return {"capped_buckets": self.capped_buckets, "capped_rows": self.capped_rows}


def candidate_pairs(
    buckets: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG, with_metrics: bool = False,
    cache_registry: list | None = None, num_partitions: int | None = None,
):
    """Distinct (src, dst) candidate pairs (src < dst) from shared buckets.

    ONE shuffle of the big side: the bucket rows are hash-partitioned once;
    a per-bucket hash-aggregated count filters to rows in shared, non-capped
    buckets FIRST (shuffled-hash join against the tiny survivor-bucket set,
    reusing the same exchange), then collect_list + map-side nested-transform
    pair expansion run on that (small) survivor set — no second exchange and
    NO SORT anywhere (a count window would sort all rows x bands).

    Ordering matters twice at scale: (a) collect_list's object buffers are
    ~10x costlier per row than scalar aggs, so list-building must see only
    the shared-bucket minority, not all O(rows x bands) bucket rows; (b) a
    giant stop-shingle bucket would otherwise materialize its entire
    membership as one array before the cap could drop it — the row-level
    pre-filter caps memory per task regardless of bucket skew.

    This replaces the classic bucket self-join, which costs an extra
    size-filter aggregation plus join exchanges of the full membership.

    Returns df, or (df, SkewMetrics) when with_metrics=True (metrics trigger
    one extra action over the per-bucket counts only)."""
    # ONE exchange, ZERO sorts: hash-partition the bucket rows once; the
    # per-bucket count (hash agg), the survivor filter (shuffled-hash join —
    # SMJ would re-sort both sides), and the collect_list all reuse that
    # partitioning.  The previous formulation used a count window, whose
    # WindowExec must SORT all O(rows x bands) bucket rows inside each
    # partition — measured as the single largest non-kernel cost at 25.6M
    # bucket rows; hash aggregation needs no order.
    #
    # `rows` MUST be persisted for the sharing to actually happen: without
    # it, Catalyst plans the count branch as partial-agg -> exchange of
    # (bucket, n) — a DIFFERENT exchange from the raw-row one — so exchange
    # reuse never fires and the whole upstream MinHash/banding subtree runs
    # TWICE (event-log profile at 864k rows: two MapInArrow stages, 80s +
    # 31s task-time, plus a redundant 286 MB partial-agg exchange).  The
    # persisted bucket rows are ~0.8C of fixed-width longs (SCALE.md shuffle
    # budget); at cluster scale this materialization is the banding slice of
    # the P13 signature checkpoint.  Caller owns the unpersist via
    # `cache_registry` (the pipeline unpersists after the edge checkpoint);
    # with no registry the persist is skipped to avoid leaking caches in
    # long-lived sessions (plan falls back to the double-compute).
    # `num_partitions` sizes the bucket-row exchange to the DATA (the
    # pipeline derives it from the gated row count): the explicit
    # repartition's partitioning propagates through the size agg, the
    # survivor hash join, and the collect_list — all downstream exchanges
    # of this chain inherit it, which bounds per-task state no matter how
    # far the input outgrows the session's shuffle-partition conf (the 10x
    # stress draw failed exactly here-abouts before this floor existed)
    par = num_partitions or int(
        buckets.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # band is metrics-only downstream of banding (the band id is already
    # folded into the bucket hash) — project it off BEFORE the big exchange:
    # at b bands the bucket rows are the pipeline's widest fixed-width
    # shuffle, and the spare int is ~20% of its bytes
    rows = buckets.select("id", "bucket").repartition(par, "bucket")
    if cache_registry is not None:
        rows = rows.persist()
        cache_registry.append(rows)
    counts = rows.groupBy("bucket").agg(F.count("*").alias("n"))
    shared = counts.filter((F.col("n") > 1) & (F.col("n") <= cfg.bucket_cap)).drop("n")
    ok_rows = rows.join(shared.hint("SHUFFLE_HASH"), "bucket")
    grouped = ok_rows.groupBy("bucket").agg(F.collect_list("id").alias("ids"))
    pairs = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)), y ->"
                    " struct(least(x, y) AS src, greatest(x, y) AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .dropDuplicates(["src", "dst"])
    )
    if not with_metrics:
        return pairs
    # reuse `counts` (same persisted bucket rows / same agg subtree) — a
    # fresh buckets.groupBy here re-ran MinHash + banding a third time
    capped = (
        counts.filter(F.col("n") > cfg.bucket_cap)
        .agg(F.count("*").alias("b"), F.coalesce(F.sum("n"), F.lit(0)).alias("r"))
        .collect()[0]
    )
    return pairs, SkewMetrics(capped_buckets=capped["b"], capped_rows=int(capped["r"]))


def salted_candidate_pairs(
    buckets: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG, num_salts: int = 8
) -> DataFrame:
    """Alternative skew path (P6): instead of capping, shard each oversized
    bucket into `num_salts` salt groups and pair across the salt grid
    (si <= sj), so no single task materializes the whole quadratic bucket.
    Emits ALL pairs (no recall loss) at ~2x shuffle volume for hot buckets;
    use when dropped mass from capping is unacceptable."""
    sizes = buckets.groupBy("bucket").agg(F.count("*").alias("n"))
    hot = sizes.filter(F.col("n") > cfg.bucket_cap).drop("n")
    cold_pairs = candidate_pairs(buckets.join(hot, ["bucket"], "left_anti"), cfg)
    hot_rows = buckets.join(hot, ["bucket"]).withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(num_salts))
    )
    grid = (
        hot_rows.sparkSession.range(num_salts).select(F.col("id").cast("int").alias("si"))
        .crossJoin(
            hot_rows.sparkSession.range(num_salts).select(F.col("id").cast("int").alias("sj"))
        )
        .filter(F.col("si") <= F.col("sj"))
    )
    left = hot_rows.join(F.broadcast(grid), hot_rows.salt == grid.si)
    right = hot_rows.select(
        F.col("bucket").alias("bucket_r"),
        F.col("id").alias("id_r"), F.col("salt").alias("salt_r"),
    )
    hot_pairs = (
        left.join(
            right,
            (F.col("bucket") == F.col("bucket_r")) & (F.col("sj") == F.col("salt_r")),
        )
        # canonicalize with least/greatest, NOT `id < id_r`: the grid visits
        # each unordered salt pair once (si <= sj), so a pair whose smaller
        # id carries the LARGER salt only ever appears as (id > id_r) — an
        # id-order filter would silently drop ~half the cross-salt pairs
        # (caught by the doc_skew_salted_pairs contract oracle)
        .filter(F.col("id") != F.col("id_r"))
        .select(
            F.least("id", "id_r").alias("src"), F.greatest("id", "id_r").alias("dst")
        )
    )
    return cold_pairs.unionByName(hot_pairs).dropDuplicates(["src", "dst"])
