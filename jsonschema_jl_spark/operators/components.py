"""Iterative connected components — hash-partitioned min-label propagation
(P11) with per-iteration lineage truncation.

Algorithm: every vertex starts labeled with its own id; each round, labels
flow across edges (symmetrized) and each vertex keeps the min label seen.
Converges in O(component diameter) rounds — dup clusters are shallow (near-
clique candidate graphs), so 3-5 rounds dominate in practice; cfg.cc_max_iters
bounds pathological chains.

Scale notes:
  * every round is one shuffle join (edges ⋈ labels on src) + one shuffle
    min-agg, both on the vertex id — the same key every round, so Spark
    reuses the exchange partitioning;
  * lineage is truncated each round (localCheckpoint, or a reliable
    checkpoint/Iceberg write via the `checkpoint_fn` hook at cluster scale)
    — without this the plan tree doubles per iteration;
  * convergence is detected with a cheap count on a changed-labels join;
  * min-label over a giant component funnels through its min vertex only in
    the agg's reduce side, which map-side partial aggregation (partial_min)
    flattens — no single hot reducer.
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
    vertex id reachable; singleton vertices (if `vertices` given) keep their
    own id."""
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    ).distinct()
    if vertices is not None:
        verts = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
    else:
        verts = sym.select(F.col("u").alias("id")).distinct()
    labels = verts.select("id", F.col("id").alias("component"))
    if checkpoint_fn is None:
        checkpoint_fn = lambda df, i: df.localCheckpoint(eager=True)  # noqa: E731

    labels = checkpoint_fn(labels, 0)
    for it in range(1, max_iters + 1):
        prop = (
            sym.join(labels, sym.u == labels.id)
            .select(F.col("v").alias("id"), F.col("component"))
        )
        new_labels = (
            prop.unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        new_labels = checkpoint_fn(new_labels, it)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
