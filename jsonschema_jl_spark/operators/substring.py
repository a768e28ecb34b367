"""Exact-substring caption containment (P9).

Two implementations of "caption A is an exact substring of caption B":

1. `containment_pairs` (primary, shuffle-friendly): anchor-gram join.
   A ⊆ B implies A's first g characters occur as some g-gram of B.  So:
   explode every document's distinct g-gram hashes (O(total_chars) longs),
   equi-join against the g-char *prefix* hash of each candidate contained
   caption, then verify natively with instr(B, A) > 0.  This is the
   suffix-array idea re-expressed as a distributed hash join: the anchor
   gram plays the role of the suffix-array lookup of A's prefix among B's
   suffixes, with exact verification replacing the LCP walk.  No quadratic
   blow-up, no global sort, fully JVM-side.

2. `suffix_array_containment_partition` (reference-style kernel): a
   per-partition suffix array built in numpy inside applyInPandas after
   range-partitioning suffix keys — kept as a tested alternative and a
   cross-check at small scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG
from jsonschema_jl_spark.operators.minhash import normalize_text, normalize_udf


def containment_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    cfg: DedupConfig = DEFAULT_CONFIG,
    anchor_cap: int = 10_000,
    assume_normalized: bool = False,
    cache_registry: list | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) with normalized src caption a strict substring of dst's.

    src/dst ordering: src is the contained (shorter) caption.
    assume_normalized=True takes text_col as already normalize_text'd —
    the pipeline normalizes once into its persisted projection, and this
    DataFrame is referenced four times below (probe, grams, both text
    fetches), so skipping re-normalization here avoids four extra full
    string passes at scale."""
    g = cfg.anchor_gram
    s = cfg.anchor_stride
    assert cfg.min_contained_len >= g + s - 1, "stride must fit the shortest probe"
    txt = F.col(text_col) if assume_normalized else normalize_udf(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), txt.alias("txt")).filter(
        F.length("txt") >= cfg.min_contained_len
    )

    # Sparse-anchor scheme (winnowing-style, EXACT): the container emits
    # g-grams only at positions 1, 1+s, 1+2s, ...; the probe emits its first
    # s g-grams.  If A occurs in B at offset o, A's gram at position p
    # (1<=p<=s) lands at container position o+p-1... and exactly one p puts
    # that on the container's stride grid — so every true containment
    # survives with s*fewer exploded container rows.
    #
    # Round-5 redesign (found by the 10x stress draw): candidate rows are
    # FIXED-WIDTH through every exchange.  On window-sharing corpora the
    # candidate count grows ~quadratically with the corpus (measured 1.29e9
    # candidates from 6.5M template-generated captions with NO key above
    # the anchor cap — window-frequency capping would have dropped 39-72%
    # of probes, unacceptable recall), so the old shape — fetch both texts
    # per candidate, verify with instr — shipped hundreds of GB of caption
    # bytes.  Instead both sides carry POSITIONS and the probe carries a
    # full-text hash: a key match derives the exact alignment offset
    # o = pos_b - p + 1, the container-side verify recomputes
    # xxhash64(substr(txt_b, o, len)) with ONE corpus-sized text exchange
    # (probe text never moves), and only the hash-matched minority fetches
    # the probe text for the exact string-equality confirm — containment is
    # EXACT, never hash-trusted.
    probe = base.select(
        "id",
        F.length("txt").alias("len"),
        F.xxhash64("txt").alias("h1"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, {s}), i -> xxhash64(substr(txt, i, {g})))"
            )
        ).alias("p0", "key"),
    ).withColumn("p", F.col("p0") + 1).drop("p0")
    grams = base.select(
        F.col("id").alias("id_b"),
        F.length("txt").alias("len_b"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(txt) - {g - 1}, 1), {s}),"
                f" i -> xxhash64(substr(txt, i, {g})))"
            )
        ).alias("gpos", "key"),
    ).withColumn("pos_b", F.col("gpos") * s + 1).drop("gpos")
    # cap degenerate anchors (e.g. a ubiquitous phrase) like LSH buckets.
    # All four joins below carry SHUFFLE_HASH hints on their smaller side:
    # the default sort-merge strategy would SORT the multi-million-row gram
    # and text relations at every join, and hash joins need no order — at
    # bench scale the sorts were the dominant non-kernel cost of this pass.
    #
    # Like the LSH bucket rows (lsh.py), the gram explode is referenced by
    # BOTH the anchor-size count and the candidate join; without a
    # materialization barrier Catalyst plans the count branch as its own
    # partial-agg exchange and the whole strided-gram explode (one
    # substr+xxhash64 pass over every container position — 22M rows at the
    # 864k-row bench) runs twice.  Caller owns the unpersist via
    # cache_registry; with no registry the old double-compute plan stands.
    # `num_partitions` sizes the hash-join exchanges to the DATA: the probe
    # relation (s anchor keys PER DOCUMENT) is the build side of the
    # candidate join and grows linearly with the corpus — at a fixed
    # session partition count its per-task hash map grows unboundedly (the
    # 10x stress draw failed HERE: "Can't acquire 536870912 bytes memory to
    # build hash relation" at 6.5M rows x 32 partitions).  Repartitioning
    # both join inputs on the join key at a data-derived count bounds every
    # build; at bench scale num_partitions equals the session conf and the
    # plans are unchanged.
    if num_partitions is not None:
        probe = probe.repartition(num_partitions, "key")
        grams = grams.repartition(num_partitions, "key")
    if cache_registry is not None:
        grams = grams.persist()
        cache_registry.append(grams)
    sizes = grams.groupBy("key").agg(F.count("*").alias("n"))
    # Cap filter as a BROADCAST ANTI-join against the HOT anchors, not an
    # inner join against the survivors: the survivor set (n <= cap) is
    # corpus-proportional — at 6.5M docs it is ~100M+ distinct anchors, and
    # building it as a SHUFFLE_HASH hash relation blew the per-task memory
    # grant in the 10x stress draw ("Can't acquire 536870912 bytes").  The
    # HOT set (n > cap) is bounded by total_gram_rows / cap BY CONSTRUCTION
    # (<= ~18k keys at 175M gram rows, cap 10k) — broadcastable at ANY
    # corpus size, and the anti-join is map-side: one fewer shuffle of the
    # multi-hundred-million-row gram relation.
    hot = sizes.filter(F.col("n") > anchor_cap).drop("n")
    grams = grams.join(F.broadcast(hot), "key", "left_anti")
    # candidates: fixed-width rows (id, id_b, o, len, h1) — the alignment
    # offset is DERIVED, so the verify checks one exact position, not an
    # O(len_a * len_b) instr scan
    cand = (
        probe.hint("SHUFFLE_HASH").join(grams, "key")
        .withColumn("o", F.col("pos_b") - F.col("p") + 1)
        .filter(
            (F.col("id") != F.col("id_b"))
            & (F.col("len") < F.col("len_b"))
            & (F.col("o") >= 1)
            & (F.col("o") + F.col("len") - 1 <= F.col("len_b"))
        )
        .select("id", "id_b", "o", "len", "h1")
    )
    b = base.select(F.col("id").alias("id_b2"), F.col("txt").alias("txt_b"))
    a = base.select(F.col("id"), F.col("txt"))
    if num_partitions is not None:
        # the container-text side pins the (data-derived) partition count;
        # the candidate side co-partitions to match.  Hash-join BUILD sides
        # are the TEXT relations (bounded per task: ~50k texts x ~300 B),
        # NEVER the candidate relation — building candidates blew the
        # 512 MB per-task grant in the 10x stress draw.
        b = b.repartition(num_partitions, "id_b2")
        a = a.repartition(num_partitions, "id")
    # container-side hash verify: ONE corpus-sized text exchange total;
    # candidates cross as 40-byte rows.  The hash-matched minority (true
    # pairs + ~n*2^-64 collisions) then fetches the probe text for the
    # exact equality confirm at the derived offset.
    hashed = (
        cand.join(b.hint("SHUFFLE_HASH"), cand.id_b == b.id_b2)
        .filter(F.expr("xxhash64(substring(txt_b, o, len))") == F.col("h1"))
        .select("id", "id_b", "o", "len", "txt_b")
    )
    # dedup only AFTER the exact confirm: deduping on the hash-matched set
    # could (at 2^-64 odds) keep a colliding offset and discard the true
    # one — the final pair set must never depend on a hash
    return (
        hashed.join(a.hint("SHUFFLE_HASH"), "id")
        .filter(F.expr("substring(txt_b, o, len)") == F.col("txt"))
        .select(F.col("id").alias("src"), F.col("id_b").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


_SUFFIX_OUT = "src string, dst string"


def suffix_array_containment(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    cfg: DedupConfig = DEFAULT_CONFIG,
    num_ranges: int | None = None,
    max_contained_len: int | None = None,
) -> DataFrame:
    """Reference-style distributed suffix-array pass.

    ADMISSION BOUND (SCALE.md round 6): this kernel is the small-scale
    CROSS-CHECK for `containment_pairs`, not an alternative at scale — the
    per-probe searchsorted loop is row-at-a-time inside each range
    partition and exploded-suffix volume is O(total_chars *
    max_contained_len) bytes.  Use up to ~10^6 documents at cap 1024;
    beyond that, `containment_pairs` is the only supported path.

    Suffix keys are range-partitioned on their leading anchor_gram chars;
    each partition lexsorts its suffixes into a suffix array and resolves
    every probe with two `np.searchsorted` calls — a suffix starts with
    probe P iff it sorts inside [P, P + U+10FFFF), so the prefix walk is the
    classic suffix-array range lookup, not a scan.  Containment pairs whose
    anchor falls in the partition's key range are emitted exactly once (an
    anchor lives in one range).

    Scale bounds: suffixes are truncated to `max_contained_len` chars at the
    explode (prefix containment never inspects more of a suffix than the
    longest probe), so exploded byte volume is O(total_chars * C) instead of
    the O(total_chars^2) of full suffixes, and suffix rows carry the
    container's LENGTH, not its text; suffixes shorter than
    cfg.min_contained_len cannot contain any probe and are dropped.  The cap
    defaults to cfg.max_contained_len — a CONFIG constant, not a driver agg
    over the data, so one pathological 1 MB document can never inflate the
    explode for the whole corpus (it is simply not eligible as the contained
    side; choose a cap >= the data's max text length for exact parity with
    `containment_pairs`, as the contract queries do).

    Parallelism: with num_ranges=None the range count scales with the input
    (ceil(rows / docs_per_range), docs_per_range itself shrinking as the cap
    grows since exploded bytes are ~rows * avg_len * cap), clamped to
    [8, 4096] — one metadata-cheap count(), no data collect()."""
    g = cfg.anchor_gram
    cap = int(max_contained_len if max_contained_len is not None else cfg.max_contained_len)
    base = df.select(
        F.col(id_col).alias("id"), normalize_udf(F.col(text_col)).alias("txt")
    ).filter(F.length("txt") >= cfg.min_contained_len)

    if num_ranges is None:
        # ~6.4 GB of exploded (truncated) suffix bytes per range at
        # avg_len~300: docs_per_range * avg_len * cap; the constant keeps a
        # 50k-doc corpus at cap=128 in 8 ranges and a 10M-doc corpus at
        # cap=1024 in ~1280
        docs_per_range = max(2_000, (50_000 * 128) // max(cap, 1))
        num_ranges = int(min(4096, max(8, math.ceil(df.count() / docs_per_range))))

    suffixes = (
        base.select(
            "id",
            F.length("txt").cast("long").alias("txt_len"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(txt)), i -> substr(txt, i, {cap}))"
                )
            ).alias("suffix"),
        )
        .filter(F.length("suffix") >= cfg.min_contained_len)
        .withColumn("anchor", F.substring("suffix", 1, g))
    )
    probes = (
        base.filter(F.length("txt") <= cap)
        .select("id", F.col("txt").alias("ptxt"))
        .withColumn("anchor", F.substring("ptxt", 1, g))
    )

    tagged = suffixes.select(
        "anchor", "id", "txt_len", "suffix", F.lit(None).cast("string").alias("ptxt")
    ).unionByName(
        probes.select(
            "anchor", "id", F.lit(None).cast("long").alias("txt_len"),
            F.lit(None).cast("string").alias("suffix"), "ptxt",
        )
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        suf = pdf[pdf["suffix"].notna()]
        prb = pdf[pdf["ptxt"].notna()]
        if not len(suf) or not len(prb):
            return pd.DataFrame({"src": [], "dst": []}, dtype=object)
        sarr = suf["suffix"].to_numpy()
        order = np.argsort(sarr)
        sarr = sarr[order]
        sids = suf["id"].to_numpy()[order]
        slens = suf["txt_len"].to_numpy()[order]
        srcs: list = []
        dsts: list = []
        for pid, ptxt in zip(prb["id"].to_numpy(), prb["ptxt"].to_numpy()):
            lo = np.searchsorted(sarr, ptxt, side="left")
            hi = np.searchsorted(sarr, ptxt + chr(0x10FFFF), side="left")
            if hi <= lo:
                continue
            cand_ids = sids[lo:hi]
            keep = (cand_ids != pid) & (len(ptxt) < slens[lo:hi])
            for d in np.unique(cand_ids[keep]):
                srcs.append(pid)
                dsts.append(d)
        # ids may be string (images) or int64 (documents) — schema says string
        return pd.DataFrame({"src": srcs, "dst": dsts}, dtype=object).astype(str)

    out = (
        tagged.repartitionByRange(num_ranges, "anchor")
        .groupBy(F.spark_partition_id().alias("part"))
        .applyInPandas(lambda pdf: emit(pdf), schema=_SUFFIX_OUT)
    )
    return out.dropDuplicates(["src", "dst"])
