"""Gate conformance: suite-format fixtures through BOTH backends.

Mirrors the reference's test strategy (reference test/runtests.jl:146-158:
assert isvalid(schema, data) == valid for every case of every group), plus
the vectorization-parity check the north star demands: each case replicated
into a multi-row DataFrame shuffled among decoys must produce identical
per-row verdicts (FIXTURES.md §4).
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from jsonschema_jl_spark.gate import Schema, is_valid, validate, diagnose
from jsonschema_jl_spark.gate.gate import apply_gate

_FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

GROUPS = []
for _name in ("suite_cases.json", "suite_cases_extra.json"):
    with open(os.path.join(_FIXTURE_DIR, _name), encoding="utf-8") as fh:
        GROUPS.extend(json.load(fh))

CASES = [
    pytest.param(
        g["schema"],
        t["data"],
        t["valid"],
        id=f"{g['description']} | {t['description']}",
    )
    for g in GROUPS
    for t in g["tests"]
]


@pytest.mark.parametrize(("schema", "data", "valid"), CASES)
def test_single_instance(schema, data, valid):
    s = Schema(schema)
    assert is_valid(s, data) == valid, diagnose(data, s)


def test_issue_shape():
    s = Schema({"required": ["foo"]})
    issue = validate(s, {"bar": 1})
    assert issue is not None
    assert issue.path == ""
    assert issue.reason == "required"
    assert issue.val == ["foo"]
    text = str(issue)
    assert "Validation failed:" in text and "top-level" in text


def test_spark_batch_parity(spark):
    """All fixture cases at once through the dynamic-mode pandas-UDF gate,
    one DataFrame per schema group, rows shuffled among the group's cases —
    the vectorized verdicts must equal the single-row verdicts."""
    mismatches = []
    for gi, g in enumerate(GROUPS):
        schema = g["schema"]
        rows = [
            (i, json.dumps(t["data"]), t["valid"])
            for i, t in enumerate(g["tests"])
        ]
        # replicate each row 3x to exercise batching
        rows = rows * 3
        df = spark.createDataFrame(rows, "case_id int, data_json string, expected boolean")
        out = (
            apply_gate(df.repartition(3), schema, json_col="data_json")
            .select("case_id", "expected", "isvalid")
            .collect()
        )
        for r in out:
            if r.isvalid != r.expected:
                mismatches.append((g["description"], g["tests"][r.case_id]["description"], r.expected, r.isvalid))
    assert not mismatches, mismatches


def test_typed_native_matches_dynamic(spark):
    """The native Column backend and the pandas-UDF backend agree on a typed
    table with planted violations."""
    schema = {
        "type": "object",
        "required": ["image_id", "w", "h", "fmt", "caption", "phash"],
        "properties": {
            "image_id": {"type": "string", "pattern": "^img[0-9]{12}$"},
            "w": {"type": "integer", "minimum": 1, "maximum": 65535},
            "h": {"type": "integer", "minimum": 1, "maximum": 65535},
            "fmt": {"enum": ["png", "jpeg", "webp"]},
            "caption": {"type": "string", "minLength": 3, "maxLength": 2048},
            "phash": {"type": "integer"},
        },
    }
    rows = [
        ("img000000000001", 10, 10, "png", "a cat sits", 1),
        ("nope", 10, 10, "png", "a cat sits", 1),
        ("img000000000002", 0, 10, "png", "a cat sits", 1),
        ("img000000000003", 10, 70000, "png", "a cat sits", 1),
        ("img000000000004", 10, 10, "bmp", "a cat sits", 1),
        ("img000000000005", 10, 10, "png", None, 1),
        ("img000000000006", 10, 10, "png", "ab", 1),
        (None, 10, 10, "png", "a cat sits", 1),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string, phash long"
    )
    native = apply_gate(df, schema).select("image_id", "isvalid", "issue.reason")
    # force the dynamic path by going through to_json on the same rows
    dyn_df = df.withColumn("row_json", F.to_json(F.struct(*df.columns)))
    dynamic = apply_gate(dyn_df, schema, json_col="row_json").select(
        "image_id", F.col("isvalid").alias("isvalid_dyn"), F.col("issue.reason").alias("reason_dyn")
    )
    joined = native.join(dynamic, on=[native.image_id.eqNullSafe(dynamic.image_id)], how="inner").collect()
    assert len(joined) == len(rows)
    for r in joined:
        assert r.isvalid == r.isvalid_dyn, r
        assert r.reason == r.reason_dyn, r


def test_native_plan_has_no_python(spark):
    """Native gate compiles to pure Catalyst expressions — the physical plan
    must not contain a Python evaluation node."""
    schema = {
        "type": "object",
        "required": ["fmt"],
        "properties": {"fmt": {"enum": ["png", "jpeg"]}, "w": {"minimum": 1, "type": "integer"}},
    }
    df = spark.createDataFrame([("png", 2)], "fmt string, w int")
    out = apply_gate(df, schema)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


def test_gate_filter_prefilter_pushdown(spark, tmp_path):
    """gate_filter on a native schema pushes comparisons into the parquet
    scan (PushedFilters visible in the plan)."""
    from jsonschema_jl_spark.gate.gate import gate_filter

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("a", 5), ("b", -1), (None, 3)], "name string, v int"
    ).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    schema = {"type": "object", "required": ["name", "v"], "properties": {"v": {"minimum": 0, "type": "integer"}}}
    out = gate_filter(df, schema)
    assert out.count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan
