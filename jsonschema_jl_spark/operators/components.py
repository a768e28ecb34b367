"""Iterative connected components — hash-partitioned min-label propagation
(P11) with per-iteration lineage truncation.

Algorithm: every edge-touched vertex starts labeled with its own id; each
round, labels flow across edges (symmetrized) and each vertex keeps the min
label seen.  Converges in O(component diameter) rounds — dup clusters are
shallow (near-clique candidate graphs), so 3-5 rounds dominate in practice;
`max_iters` bounds pathological chains.

Scale design:
  * **only edge-touched vertices iterate** — at web scale the overwhelming
    majority of rows are singletons; they join the labeling once at the end
    with their own id, never entering the loop;
  * every round is one shuffle join (edges ⋈ labels on the vertex id) + one
    shuffle min-agg on the same key — Spark reuses the exchange partitioning;
  * the convergence signal rides INSIDE the same aggregation (old label is
    folded in as a tagged message), so each round costs exactly one
    materializing action plus a counted filter over the cached result;
  * lineage is truncated each round (localCheckpoint; swap in a reliable
    checkpoint/Iceberg write via `checkpoint_fn` on a real cluster);
  * min-label agg does map-side partial aggregation, so a giant component's
    min vertex is no hot reducer.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 25,
    checkpoint_fn: Callable[[DataFrame, int], DataFrame] | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """edges: (src, dst).  Returns (id, component) — component is the min
    vertex id reachable; singleton vertices (when `vertices` is given) keep
    their own id.

    `shuffle_partitions` sizes the iteration's shuffles to the EDGE data
    (a property of the data, like every other partition count here): edges
    are orders of magnitude smaller than the corpus, and running the
    per-round join/agg over the corpus-sized partition count makes each
    round scheduling-latency-bound — measured ~11s of near-constant CC tail
    at 48 partitions regardless of core count, i.e. pure Amdahl serial
    fraction in the scaling ratio.  Scoping is PER-PLAN, not session conf:
    the symmetrized edges are hash-repartitioned once on the join key and
    the per-round aggregation input is explicitly repartitioned on `id`, so
    every loop exchange runs at the edge-sized count while concurrent
    queries planned on the same SparkSession keep the session's own
    `spark.sql.shuffle.partitions` untouched.  (Earlier rounds mutated the
    session conf around the loop; the explicit repartition retires that
    single-threaded-driver caveat.)  The explicit pre-agg exchange carries
    raw label messages (<= 2|E| + |V| fixed-width rows) instead of
    map-side-combined partials — an acceptable trade at edge scale, where
    the loop's cost is scheduling latency, not shuffle volume."""
    if max_iters < 1:
        # the loop must run at least once: with zero iterations the initial
        # lazy labels checkpoint would never materialize before
        # sym.unpersist(), so the caller's first action would recompute the
        # entire upstream edge cascade
        max_iters = 1
    return _cc_min_label(
        edges, vertices, max_iters, checkpoint_fn, shuffle_partitions
    )


def _cc_min_label(
    edges: DataFrame,
    vertices: DataFrame | None,
    max_iters: int,
    checkpoint_fn: Callable[[DataFrame, int], DataFrame] | None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    ).distinct()
    if shuffle_partitions is not None:
        # hash-partition the symmetric edge list on the per-round join key at
        # the edge-sized count; the persisted partitioning is reused by every
        # iteration's join (no per-round exchange of the edge side)
        sym = sym.repartition(shuffle_partitions, "u")
    # sym is re-joined EVERY iteration — materialize it once, or each round
    # re-runs the entire upstream candidate/verify cascade (at cluster scale
    # this is the P10 Iceberg edge-table write)
    sym = sym.persist()

    if checkpoint_fn is None:
        # LAZY lineage cut: the per-iteration `changed` count is the next
        # action anyway, so let it materialize the checkpoint — one Spark
        # job per round instead of two (each extra job is pure driver
        # latency at edge scale; CC's tail is latency-bound, not
        # compute-bound, and acts as Amdahl serial time in the scaling
        # ratio).  A reliable-checkpoint `checkpoint_fn` on a real cluster
        # (Iceberg label-table write) is eager by nature — only the
        # sandbox default gets the merge.
        checkpoint_fn = lambda df, i: df.localCheckpoint(eager=False)  # noqa: E731

    labels = checkpoint_fn(
        sym.select(F.col("u").alias("id")).distinct().select("id", F.col("id").alias("component")),
        0,
    )
    for it in range(1, max_iters + 1):
        prop = (
            sym.join(labels, sym.u == labels.id)
            .select(F.col("v").alias("id"), F.col("component"), F.lit(False).alias("is_old"))
        )
        msgs = prop.unionByName(labels.withColumn("is_old", F.lit(True)))
        if shuffle_partitions is not None:
            # the one per-round exchange, sized to the edges: the groupBy
            # below then aggregates in place (its required distribution is
            # already satisfied), so no session-conf-sized shuffle appears
            # anywhere in the loop
            msgs = msgs.repartition(shuffle_partitions, "id")
        agg = (
            msgs
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("is_old"), F.col("component"))).alias("old_component"),
            )
        )
        agg = checkpoint_fn(agg, it)
        changed = agg.filter(F.col("component") != F.col("old_component")).count()
        labels = agg.select("id", "component")
        if changed == 0:
            break
    sym.unpersist()

    if vertices is None:
        return labels
    verts = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
    singletons = verts.join(labels.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return labels.unionByName(singletons)


def connected_components_twophase(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 50,
    checkpoint_fn: Callable[[DataFrame, int], DataFrame] | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Alternating large-star / small-star connected components.

    The two-round primitive from "Connected Components in MapReduce and
    Beyond" (Kiveris et al., SoCC'14): converges in O(log n) rounds even on
    high-diameter graphs (paths, meshes), where plain min-label propagation
    needs O(diameter) rounds.  Each round is a groupBy-min + join on the
    node id — the same shuffle key throughout.

      large-star: every neighbor v > u links to min(N(u) ∪ {u})
      small-star: every neighbor v <= u (and u) links to min(N<=(u) ∪ {u})

    `shuffle_partitions` sizes the loop's shuffles to the EDGE data with
    PER-PLAN scoping, exactly like `connected_components`: every exchange
    inside the loop comes from an explicit repartition on the round key
    `a` (which the dedup/groupBy/join downstream all reuse — hash
    partitioning on a subset of the clustering keys satisfies their
    required distribution), so concurrent queries planned on the same
    session keep their own `spark.sql.shuffle.partitions`.

    Kept alongside `connected_components` as the scale path for adversarial
    graph shapes; dup-cluster graphs are shallow so both perform similarly.
    """
    if checkpoint_fn is None:
        checkpoint_fn = lambda df, i: df.localCheckpoint(eager=True)  # noqa: E731

    def _scoped(df: DataFrame) -> DataFrame:
        # one explicit edge-sized exchange on the round key; a no-op
        # pass-through when unscoped (session conf governs, as before)
        if shuffle_partitions is not None:
            return df.repartition(shuffle_partitions, "a")
        return df

    # directed representation: (a, b) with a > b after the first small-star
    e = (
        _scoped(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        )
        .dropDuplicates(["a", "b"])
    )
    e = checkpoint_fn(e, 0)
    prev_sig = None
    for it in range(1, max_iters + 1):
        # ---- large-star over the symmetric view ----
        sym = _scoped(
            e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        mins = mins.select("a", F.least("a", "mn").alias("m"))
        ls = (
            _scoped(
                sym.join(mins, "a")
                .filter(F.col("b") > F.col("a"))
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .filter(F.col("a") != F.col("b"))
            )
            .dropDuplicates(["a", "b"])
        )
        # ---- small-star over the directed (big -> small) view ----
        mins2 = ls.groupBy("a").agg(F.min("b").alias("m"))
        ss = (
            _scoped(
                ls.join(mins2, "a")
                .filter(F.col("b") != F.col("m"))
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .unionByName(mins2.select(F.col("a"), F.col("m").alias("b")))
                .filter(F.col("a") != F.col("b"))
            )
            .dropDuplicates(["a", "b"])
        )
        e = checkpoint_fn(ss, it)
        # convergence signature: (edge count, XOR of full 64-bit edge hashes).
        # Edges are distinct so XOR cancellation can't hide changes; two
        # different edge sets colliding on both fields is a 2^-64 event
        # (the earlier `sum(h % 1_000_003)` needlessly threw away hash bits).
        sig = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        cur = (sig["n"], sig["h"])
        if cur == prev_sig:
            break
        prev_sig = cur

    roots = e.select(F.col("b").alias("id")).distinct().join(
        e.select(F.col("a").alias("id")).distinct(), "id", "left_anti"
    )
    labels = e.select(F.col("a").alias("id"), F.col("b").alias("component")).unionByName(
        roots.select("id", F.col("id").alias("component"))
    )
    if vertices is None:
        return labels
    verts = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
    singletons = verts.join(labels.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return labels.unionByName(singletons)
