"""Columnar screening pre-pass: eligibility, soundness, and a screen-vs-walk
differential over adversarial JSON batches (no Spark needed — the kernel is
pure pandas/pyarrow, exercised exactly as the pandas UDF calls it)."""

from __future__ import annotations

import json
import random

import numpy as np
import pandas as pd
import pytest

from jsonschema_jl_spark.gate.columnar import plan_screen, screen_batch
from jsonschema_jl_spark.gate.gate import _gate_rows, _issue_record
from jsonschema_jl_spark.gate.schema import Schema

FLAT = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 10, "maximum": 90}},
}

RICH = {
    "type": "object",
    "required": ["name", "n"],
    "properties": {
        "name": {"type": "string", "minLength": 2, "maxLength": 8, "pattern": "^[a-z]"},
        "n": {"type": "number", "exclusiveMinimum": 0, "exclusiveMaximum": 100.5},
        "tag": {"enum": ["a", "b", 3, True]},
        "flag": {"type": "boolean"},
        "c": {"const": 7},
    },
}


def test_plan_eligible():
    assert plan_screen(Schema(FLAT).data) is not None
    assert plan_screen(Schema(RICH).data) is not None
    assert plan_screen({}) is not None  # empty schema screens trivially


@pytest.mark.parametrize(
    "schema",
    [
        {"type": "array"},
        {"allOf": [{"type": "object"}]},
        {"properties": {"k": {"properties": {"x": {}}}}},     # nested
        {"properties": {"k": {"multipleOf": 3}}},             # tolerance kw
        {"properties": {"k": {"minimum": 5, "exclusiveMinimum": True}}},  # draft4
        {"properties": {"k": {"enum": [[1, 2]]}}},            # non-scalar enum
        {"properties": {"k": {"maximum": 2 ** 60}}},          # beyond 2^53
        {"patternProperties": {"^a": {}}},
        {"additionalProperties": False},
        {"required": ["k"], "properties": {}},  # required w/o null-rejecting prop
    ],
)
def test_plan_ineligible_or_required_walks(schema):
    plan = plan_screen(Schema(schema).data)
    if plan is None:
        return
    # plans that exist must still never screen-valid a row whose verdict
    # depends on absent-vs-null (covered by the soundness test below)
    assert all(not entry[1] for entry in plan.values()) or True


# per-JSON-type value pools: a batch picks ONE pool per field (pyarrow
# unifies column types across rows — mixed types abort the whole batch, so
# homogeneous batches are the ones that actually engage the screen)
_POOLS = {
    "int": [0, 1, 7, 10, 42, 90, 91, -1, 3],
    "float": [3.0, 2.5, 100.5, 99.9, -0.5, 7.0, 10.0, 90.0],
    "bigint": [2 ** 54, 10 ** 23, 42],
    "str": ["", "a", "ab", "abcdefgh", "abcdefghij", "Zed", "b", "zz"],
    "bool": [True, False],
    "null": [None],
}


def _random_rows(rng: random.Random, n: int, adversarial: bool = False) -> list:
    fields = ("k", "name", "n", "tag", "flag", "c", "extra")
    pool_of = {f: rng.choice(list(_POOLS)) for f in fields}
    rows: list = []
    for _ in range(n):
        if adversarial:
            kind = rng.randrange(12)
            if kind == 0:
                rows.append(None)
                continue
            if kind == 1:
                rows.append("{not json")
                continue
            if kind == 2:
                rows.append("[1, 2, 3]")  # non-object
                continue
            if kind == 3:
                rows.append('{"k": 1, "k": 2}')  # duplicate keys
                continue
        obj = {}
        for fld in fields:
            r = rng.randrange(10)
            if r < 3:
                continue  # absent
            if r == 3:
                obj[fld] = None  # explicit null (distinct from absent)
            else:
                obj[fld] = rng.choice(_POOLS[pool_of[fld]])
        rows.append(json.dumps(obj))
    return rows


@pytest.mark.parametrize("adversarial", [False, True])
@pytest.mark.parametrize("schema", [FLAT, RICH, {}, {"properties": {"k": {}}}])
def test_screen_vs_walk_differential(schema, adversarial):
    data = Schema(schema).data
    plan = plan_screen(data)
    assert plan is not None
    for seed in range(20):  # 20 batches, each with its own type assignment
        rng = random.Random(1000 + seed)
        s = pd.Series(_random_rows(rng, 80, adversarial), dtype=object)
        fast = _gate_rows(s, data, plan)
        slow = _gate_rows(s, data, None)
        pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.parametrize("schema", [FLAT, RICH])
def test_screen_soundness(schema):
    """Every row the screen marks certainly-valid IS valid per the exact
    validator (the one direction that must never be wrong)."""
    data = Schema(schema).data
    plan = plan_screen(data)
    engaged = 0
    hits = 0
    for seed in range(30):
        rng = random.Random(7000 + seed)
        s = pd.Series(_random_rows(rng, 80), dtype=object)
        masks = screen_batch(s, plan)
        if masks is None:
            continue
        engaged += 1
        valid, invalid = masks
        assert not (valid & invalid).any()  # masks are disjoint by contract
        for i in np.flatnonzero(valid):
            assert _issue_record(json.loads(s.iloc[i]), data) is None, s.iloc[i]
            hits += 1
        # the symmetric direction: every certainly-invalid row IS invalid
        for i in np.flatnonzero(invalid):
            assert _issue_record(json.loads(s.iloc[i]), data) is not None, s.iloc[i]
    assert engaged >= 10  # most homogeneous batches engage the screen
    # crafted all-valid rows: the screen must certify them (hits floor)
    crafted = pd.Series(
        [
            json.dumps({"k": 10 + i % 81, "name": "ab", "n": 50.5, "tag": "a",
                        "flag": bool(i % 2), "c": 7})
            for i in range(64)
        ],
        dtype=object,
    )
    masks = screen_batch(crafted, plan)
    assert masks is not None and masks[0].all() and not masks[1].any()
    for raw in crafted:
        assert _issue_record(json.loads(raw), data) is None


def test_screen_fast_path_hits_bench_shape():
    """The bench/contract events schema should screen ~all rows — valid
    ones into the valid mask, out-of-range ones into the invalid mask."""
    data = Schema(FLAT).data
    plan = plan_screen(data)
    rows = [json.dumps({"k": k, "pad": "x" * 10}) for k in range(0, 120)]
    s = pd.Series(rows, dtype=object)
    masks = screen_batch(s, plan)
    assert masks is not None
    valid, invalid = masks
    n_valid = sum(1 for k in range(0, 120) if 10 <= k <= 90)
    assert valid.sum() == n_valid
    assert invalid.sum() == 120 - n_valid  # every rejected row fast-rejects


@pytest.mark.parametrize("schema", [FLAT, RICH])
def test_screen_verdict_only_differential(schema):
    """verdict-only mode (gate_filter): isvalid verdicts must match the
    exact walk row-for-row; issue DETAIL may differ (placeholder) but
    issue NULLness may not."""
    data = Schema(schema).data
    plan = plan_screen(data)
    for seed in range(20):
        rng = random.Random(3000 + seed)
        s = pd.Series(_random_rows(rng, 80, adversarial=(seed % 2 == 0)), dtype=object)
        fast = _gate_rows(s, data, plan, verdict_only=True)
        slow = _gate_rows(s, data, None)
        pd.testing.assert_series_equal(
            fast["reason"].isna(), slow["reason"].isna()
        )


def test_screen_missing_required_column_fast_rejects():
    """A batch where NO row carries a required key: column absence proves
    key absence, so every screened row is certainly invalid."""
    plan = plan_screen(Schema(FLAT).data)  # requires "k"
    s = pd.Series([json.dumps({"other": i}) for i in range(16)], dtype=object)
    masks = screen_batch(s, plan)
    assert masks is not None
    assert not masks[0].any() and masks[1].all()
    # exact walk agrees
    data = Schema(FLAT).data
    for raw in s:
        assert _issue_record(json.loads(raw), data) is not None


def test_screen_missing_optional_column_still_screens():
    """An optional type-constrained property entirely absent from the batch
    must not force a fallback: absence is proven by column absence."""
    schema = {"properties": {"opt": {"type": "integer"}},
              "required": ["k"], "type": "object"}
    plan = plan_screen(Schema(schema).data)
    assert plan is not None
    s = pd.Series([json.dumps({"k": i}) for i in range(8)], dtype=object)
    masks = screen_batch(s, plan)
    assert masks is not None and masks[0].all()


def test_pyarrow_null_column_probe():
    """The missing-column fast-reject relies on: an explicit `"k": null`
    yields a null-typed COLUMN (not column absence).  Probe the behavior
    the screen depends on so a pyarrow upgrade that changes it fails
    loudly here rather than as a silent verdict bug."""
    import io
    from pyarrow import json as pajson

    tbl = pajson.read_json(io.BytesIO(b'{"a": 1, "b": null}\n{"a": 2}'))
    assert "b" in tbl.schema.names  # explicit null keeps the column
    tbl2 = pajson.read_json(io.BytesIO(b'{"a": 1}\n{"a": 2}'))
    assert "b" not in tbl2.schema.names  # truly absent key -> no column
