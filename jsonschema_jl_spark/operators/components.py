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
) -> DataFrame:
    """edges: (src, dst).  Returns (id, component) — component is the min
    vertex id reachable; singleton vertices (when `vertices` is given) keep
    their own id."""
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    ).distinct()
    # sym is re-joined EVERY iteration — materialize it once, or each round
    # re-runs the entire upstream candidate/verify cascade (at cluster scale
    # this is the P10 Iceberg edge-table write)
    sym = sym.persist()

    if checkpoint_fn is None:
        checkpoint_fn = lambda df, i: df.localCheckpoint(eager=True)  # noqa: E731

    labels = checkpoint_fn(
        sym.select(F.col("u").alias("id")).distinct().select("id", F.col("id").alias("component")),
        0,
    )
    for it in range(1, max_iters + 1):
        prop = (
            sym.join(labels, sym.u == labels.id)
            .select(F.col("v").alias("id"), F.col("component"), F.lit(False).alias("is_old"))
        )
        agg = (
            prop.unionByName(labels.withColumn("is_old", F.lit(True)))
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
