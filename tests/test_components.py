"""Connected-components correctness: label propagation vs two-phase
large-star/small-star vs a driver-side union-find oracle."""

from __future__ import annotations

import random

import pytest

from jsonschema_jl_spark.operators.components import (
    connected_components,
    connected_components_twophase,
)


def _oracle(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in vertices}


def _check(spark, edges, vertices):
    edf = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    if not edges:
        edf = edf.filter("src != src")
    vdf = spark.createDataFrame([(v,) for v in vertices], "id string")
    want = _oracle(edges, vertices)
    for fn in (connected_components, connected_components_twophase):
        got = {r.id: r.component for r in fn(edf, vertices=vdf).collect()}
        assert got == want, f"{fn.__name__} mismatch"


def test_planted_clusters(spark):
    vertices = [f"v{i:03d}" for i in range(60)]
    edges = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(0, 30, 3)]
    edges += [("v040", "v041"), ("v041", "v042"), ("v040", "v042")]
    _check(spark, edges, vertices)


def test_long_chain(spark):
    # high-diameter path: two-phase must converge well under O(n) rounds
    n = 120
    vertices = [f"c{i:03d}" for i in range(n)]
    edges = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    vdf = spark.createDataFrame([(v,) for v in vertices], "id string")
    got = {r.id: r.component for r in connected_components_twophase(edf, vertices=vdf, max_iters=12).collect()}
    assert set(got.values()) == {"c000"}
    assert len(got) == n


def test_random_graph(spark):
    rng = random.Random(7)
    vertices = [f"r{i:03d}" for i in range(80)]
    edges = [
        (vertices[rng.randrange(80)], vertices[rng.randrange(80)]) for _ in range(50)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges, vertices)


def test_no_edges(spark):
    vertices = ["a", "b", "c"]
    _check(spark, [], vertices)


def test_convergence_signature_distinguishes(spark):
    """The twophase convergence signature (count, bit_xor of full xxhash64)
    must separate distinct same-size edge sets — the retired
    `sum(hash % 1_000_003)` form threw away most hash bits."""
    from pyspark.sql import functions as F

    def sig(rows):
        df = spark.createDataFrame(rows, "a string, b string")
        r = df.agg(
            F.count("*").alias("n"), F.expr("bit_xor(xxhash64(a, b))").alias("h")
        ).collect()[0]
        return (r["n"], r["h"])

    s1 = sig([("a", "b"), ("c", "d")])
    s2 = sig([("a", "b"), ("c", "e")])
    assert s1 != s2          # same count, different edges -> different hash
    assert s1 == sig([("c", "d"), ("a", "b")])  # order-insensitive


def test_shuffle_partitions_override_restored(spark):
    """connected_components(shuffle_partitions=...) scopes the edge-sized
    partition count to its own plans — the session conf is never touched
    (round-5: explicit repartition replaced the conf mutation)."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    from jsonschema_jl_spark.operators.components import connected_components

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = connected_components(edges, shuffle_partitions=2)
    rows = {(r.id, r.component) for r in out.collect()}
    assert rows == {("a", "a"), ("b", "a"), ("c", "a")}
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_shuffle_partitions_scoped_not_session_global(spark):
    """A concurrent query planned MID-LOOP keeps the session's own
    shuffle-partition count (the round-4 caveat this round retires), while
    the loop's own per-round aggregation runs at the edge-sized count."""
    import re

    from pyspark.sql import functions as F

    from jsonschema_jl_spark.operators.components import connected_components

    session_par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cc_par = 3
    assert session_par != cc_par
    seen: dict = {"concurrent": [], "loop": []}

    def probing_cp(df, i):
        # conf is untouched mid-loop...
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == session_par
        # ...and a concurrent aggregation plans at the SESSION count
        q = spark.range(100).groupBy((F.col("id") % 7).alias("k")).count()
        qplan = q._jdf.queryExecution().executedPlan().toString()
        seen["concurrent"] += re.findall(r"hashpartitioning\([^)]*?(\d+)\)", qplan)
        # while the loop's own label aggregation is edge-sized
        if i > 0:
            lplan = df._jdf.queryExecution().executedPlan().toString()
            seen["loop"] += re.findall(r"hashpartitioning\([^)]*?(\d+)\)", lplan)
        return df.localCheckpoint(eager=False)

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "src long, dst long"
    )
    out = connected_components(
        edges, shuffle_partitions=cc_par, checkpoint_fn=probing_cp
    )
    comps = {(r.id, r.component) for r in out.collect()}
    assert (1, 0) in comps and (40, 40) not in comps
    assert seen["concurrent"] and all(
        int(n) == session_par for n in seen["concurrent"]
    ), seen["concurrent"]
    # the lazy-checkpoint lineage still shows the ONE-TIME setup exchange
    # (sym's distinct, legitimately session-sized); every other loop
    # exchange — repartition + agg — must be edge-sized
    counts = {int(n) for n in seen["loop"]}
    assert cc_par in counts and counts <= {cc_par, session_par}, counts


def test_twophase_shuffle_partitions_scoped(spark):
    """connected_components_twophase(shuffle_partitions=...) (round 6):
    the large/small-star loop's exchanges are edge-sized per-plan, a
    concurrent aggregation planned mid-loop keeps the session count, and
    labels are identical to the unscoped run."""
    import re

    from pyspark.sql import functions as F

    from jsonschema_jl_spark.operators.components import (
        connected_components_twophase,
    )

    session_par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cc_par = 3
    assert session_par != cc_par
    seen: dict = {"concurrent": [], "loop": []}

    def probing_cp(df, i):
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == session_par
        q = spark.range(100).groupBy((F.col("id") % 7).alias("k")).count()
        qplan = q._jdf.queryExecution().executedPlan().toString()
        seen["concurrent"] += re.findall(r"hashpartitioning\([^)]*?(\d+)\)", qplan)
        if i > 0:
            lplan = df._jdf.queryExecution().executedPlan().toString()
            seen["loop"] += re.findall(r"hashpartitioning\([^)]*?(\d+)\)", lplan)
        return df.localCheckpoint(eager=True)

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "src long, dst long"
    )
    out = connected_components_twophase(
        edges, shuffle_partitions=cc_par, checkpoint_fn=probing_cp
    )
    scoped = {(r.id, r.component) for r in out.collect()}
    unscoped = {
        (r.id, r.component)
        for r in connected_components_twophase(edges).collect()
    }
    assert scoped == unscoped
    assert (1, 0) in scoped and (40, 40) not in scoped
    assert seen["concurrent"] and all(
        int(n) == session_par for n in seen["concurrent"]
    ), seen["concurrent"]
    # every loop exchange (scoped repartitions + the aggs/dedups reusing
    # them) is edge-sized; the eager checkpoint truncates lineage so no
    # session-sized setup exchange should survive in the probed plans
    counts = {int(n) for n in seen["loop"]}
    assert counts == {cc_par}, counts
