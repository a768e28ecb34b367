"""Native variant-based dynamic gate (gate/dynamic_native.py): probe pins
for the PySpark 4.1.2 variant behaviors the compiler relies on, admission
boundaries, and verdict differentials native-vs-walk over corner corpora."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_jl_spark.gate import GateMetrics, apply_gate, gate_filter
from jsonschema_jl_spark.gate.dynamic_native import plan_dynamic

FLAT = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 10, "maximum": 90}},
}


# ---------------------------------------------------------------------------
# probe pins: the variant behaviors the compiler's soundness rests on
# ---------------------------------------------------------------------------

def test_variant_probe_pins(spark):
    rows = [
        (1, '{"a": 5}', "BIGINT"),
        (2, '{"a": 5.5}', "DECIMAL(2,1)"),
        (3, '{"a": 1.0}', "DECIMAL(1,0)"),       # trailing zeros trimmed
        (4, '{"a": 1e400}', "DOUBLE"),            # overflow -> DOUBLE Inf
        (5, '{"a": "2021-01-01"}', "STRING"),     # never timestamp-inferred
        (6, '{"a": true}', "BOOLEAN"),
        (7, '{"a": null}', "VOID"),
        (8, '{"a": [1]}', "ARRAY(BIGINT)"),
        (9, '{"a": {"x":1}}', "OBJECT"),
        (10, '{"a": 99999999999999999999999}', "DECIMAL(23,0)"),
    ]
    df = spark.createDataFrame([(i, s) for i, s, _ in rows], "id long, js string")
    got = {
        r.id: r.t
        for r in df.select(
            "id",
            F.schema_of_variant(
                F.variant_get(F.try_parse_json("js"), "$.a", "variant")
            ).alias("t"),
        ).collect()
    }
    assert got[1] == "BIGINT"
    assert got[2] == "DECIMAL(2,1)"
    assert got[3] == "DECIMAL(1,0)"
    assert got[4] == "DOUBLE"
    assert got[5] == "STRING"
    assert got[6] == "BOOLEAN"
    assert got[7] == "VOID"
    assert got[8].startswith("ARRAY<")
    assert got[9].startswith("OBJECT<")
    assert got[10] == "DECIMAL(23,0)"


def test_variant_probe_absent_vs_null_and_dup_keys(spark):
    df = spark.createDataFrame(
        [(1, '{"a": null}'), (2, "{}"), (3, '{"a": 1, "a": 2}'), (4, "not json"),
         (5, None)],
        "id long, js string",
    )
    pv = F.variant_get(F.try_parse_json("js"), "$.a", "variant")
    got = {
        r.id: (r.vnull, r.absent, r.jnull)
        for r in df.select(
            "id",
            F.try_parse_json("js").isNull().alias("vnull"),
            pv.isNull().alias("absent"),
            F.is_variant_null(pv).alias("jnull"),
        ).collect()
    }
    assert got[1] == (False, False, True)   # explicit null: present, JSON null
    assert got[2] == (False, True, False)   # absent: SQL null variant
    assert got[3][0] is True                # duplicate keys: variant REFUSES
    assert got[4][0] is True                # malformed: refused
    assert got[5][0] is True                # NULL text: null variant


def test_variant_probe_string_casts_and_length(spark):
    df = spark.createDataFrame(
        [(1, '{"a": "café"}'), (2, '{"a": 5}'), (3, '{"a": true}')],
        "id long, js string",
    )
    got = {
        r.id: (r.s, r.ln)
        for r in df.select(
            "id",
            F.try_variant_get(F.try_parse_json("js"), "$.a", "string").alias("s"),
            F.length(
                F.try_variant_get(F.try_parse_json("js"), "$.a", "string")
            ).alias("ln"),
        ).collect()
    }
    assert got[1] == ("café", 4)   # codepoints, like Python len
    assert got[2][0] == "5"        # non-strings cast to their JSON text --
    assert got[3][0] == "true"     # string checks MUST gate on type STRING


# ---------------------------------------------------------------------------
# admission
# ---------------------------------------------------------------------------

def test_admission():
    assert plan_dynamic(FLAT) is not None
    # combinators of scalar members admit
    assert plan_dynamic({
        "type": "object",
        "properties": {"k": {"anyOf": [{"type": "string", "minLength": 2},
                                       {"type": "integer", "minimum": 0}]}},
    }) is not None
    # extras walk
    assert plan_dynamic({"type": "object", "additionalProperties": False}) is None
    assert plan_dynamic({"type": "object", "minProperties": 1}) is None
    # array/object property subschemas walk (screen handles them)
    assert plan_dynamic({
        "type": "object",
        "properties": {"k": {"type": "array", "minItems": 1}},
    }) is None
    # regex outside the dialect-safe subset walks
    assert plan_dynamic({
        "type": "object", "properties": {"k": {"pattern": "\\d+"}},
    }) is None
    assert plan_dynamic({
        "type": "object", "properties": {"k": {"pattern": "^ab(c|d)+ e?$"}},
    }) is not None
    # property names unsafe for a variant path walk
    assert plan_dynamic({
        "type": "object", "properties": {"a.b": {"type": "string"}},
    }) is None
    # container enum entries walk
    assert plan_dynamic({
        "type": "object", "properties": {"k": {"enum": [[1, 2]]}},
    }) is None
    # huge schema literals walk (walk compares exact ints)
    assert plan_dynamic({
        "type": "object", "properties": {"k": {"minimum": 2 ** 60}},
    }) is None


# ---------------------------------------------------------------------------
# verdict differentials: native gate_filter == walk gate_filter == apply_gate
# ---------------------------------------------------------------------------

def _diff(spark, schema, docs):
    assert plan_dynamic(schema) is not None, "schema must take the native path"
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, js string"
    )
    native = {
        r.id
        for r in gate_filter(
            df, schema, json_col="js", dynamic_native=True
        ).collect()
    }
    walk = {
        r.id
        for r in gate_filter(
            df, schema, json_col="js", dynamic_native=False
        ).collect()
    }
    gate = {
        r.id
        for r in apply_gate(df, schema, json_col="js").filter("isvalid").collect()
    }
    assert native == walk == gate, (
        f"native-only: {sorted(native - walk)}, walk-only: {sorted(walk - native)}"
    )
    return native


CORNER_DOCS = [
    '{"k": 50}', '{"k": 9}', '{"k": 91}', '{"k": 10}', '{"k": 90}',
    '{"k": 50.0}', '{"k": 50.5}', '{"k": true}', '{"k": "50"}',
    '{"k": null}', "{}", '{"k": [50]}', '{"k": {"x": 50}}',
    '{"k": 50, "extra": 1}', '{"k": 1e400}', '{"k": -0.0}',
    '{"k": 50, "k": 9}', '{"k": 9, "k": 50}',       # dup keys: walk lane
    "not json", "", "   ", "null", "true", "3.14", '"str"', "[1,2]",
    None,
    '{"k": 9007199254740993}',                        # 2^53+1: refused lane
    '{"k": 9007199254740994.0}',
]


def test_differential_flat_schema(spark):
    valid = _diff(spark, FLAT, CORNER_DOCS)
    docs = {i: d for i, d in enumerate(CORNER_DOCS)}
    # spot semantics: dup-key doc '{"k": 50, "k": 9}' is last-wins -> 9 -> invalid
    assert docs[16] == '{"k": 50, "k": 9}'
    assert 16 not in valid
    assert 17 in valid                       # last-wins -> 50 -> valid
    assert 26 not in valid                   # 2^53+1 > 90


def test_differential_no_type_schema(spark):
    # without type:object, non-object instances are vacuously valid
    schema = {"required": ["k"], "properties": {"k": {"type": "string"}}}
    valid = _diff(spark, schema, CORNER_DOCS)
    for i, d in enumerate(CORNER_DOCS):
        if d in ("null", "true", "3.14", '"str"', "[1,2]", None):
            assert i in valid, d


def test_differential_keyword_zoo(spark):
    schema = {
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string", "minLength": 2, "maxLength": 6,
                     "pattern": "^[a-z ]+$"},
            "n": {"type": ["integer", "null"], "multipleOf": 3},
            "mode": {"enum": ["a", "b", 2, True, None]},
            "score": {"exclusiveMinimum": 0, "exclusiveMaximum": 1},
            "flag": {"const": False},
        },
    }
    docs = [
        '{"name": "ab"}', '{"name": "a"}', '{"name": "abcdefg"}',
        '{"name": "AB"}', '{"name": "ab", "n": 9}', '{"name": "ab", "n": 9.0}',
        '{"name": "ab", "n": 10}', '{"name": "ab", "n": null}',
        '{"name": "ab", "n": 9.3}', '{"name": "ab", "n": "9"}',
        '{"name": "ab", "mode": "a"}', '{"name": "ab", "mode": "c"}',
        '{"name": "ab", "mode": 2}', '{"name": "ab", "mode": 2.0}',
        '{"name": "ab", "mode": true}', '{"name": "ab", "mode": false}',
        '{"name": "ab", "mode": null}', '{"name": "ab", "mode": 1}',
        '{"name": "ab", "score": 0.5}', '{"name": "ab", "score": 0}',
        '{"name": "ab", "score": 1}', '{"name": "ab", "score": "x"}',
        '{"name": "ab", "flag": false}', '{"name": "ab", "flag": true}',
        '{"name": "ab", "flag": 0}', '{"name": 5}', '{"name": null}', "{}",
        '{"name": "café"}',
    ]
    _diff(spark, schema, docs)


def test_differential_combinators(spark):
    schema = {
        "type": "object",
        "properties": {
            "v": {
                "anyOf": [
                    {"type": "string", "minLength": 3},
                    {"type": "integer", "minimum": 100},
                ],
            },
            "w": {"oneOf": [{"type": "number", "minimum": 0},
                            {"type": "number", "maximum": 0}]},
            "x": {"not": {"type": "boolean"}},
            "y": {"if": {"type": "integer"}, "then": {"minimum": 5},
                  "else": {"type": "string"}},
        },
    }
    docs = [
        '{"v": "abc"}', '{"v": "ab"}', '{"v": 100}', '{"v": 99}',
        '{"v": true}', '{"v": null}',
        '{"w": 5}', '{"w": -5}', '{"w": 0}',       # 0 matches BOTH -> oneOf fails
        '{"w": "z"}',                               # matches neither
        '{"x": true}', '{"x": 5}', '{"x": "s"}',
        '{"y": 7}', '{"y": 3}', '{"y": "s"}', '{"y": 3.3}', '{"y": true}',
        "{}",
    ]
    _diff(spark, schema, docs)


def test_differential_top_level_combinators(spark):
    """Top-level anyOf/oneOf/not/if-then-else of object schemas — the
    screened-combo shape (entry's _COMBO_SCHEMA class) through the native
    path.  Unlike the pyarrow screen, the variant path judges the
    required-vs-null ambiguity exactly, so no row needs the walk."""
    schema = {
        "type": "object",
        "required": ["k"],
        "properties": {
            "k": {"type": ["integer", "null"], "multipleOf": 2,
                  "oneOf": [{"maximum": 60}, {"minimum": 30}]},
            "tag": {"type": "string", "minLength": 5},
        },
        "anyOf": [
            {"required": ["tag"]},
            {"properties": {"k": {"minimum": 10}}},
        ],
        "not": {"properties": {"k": {"const": 44}}},
    }
    docs = [
        '{"k": 20}', '{"k": 44}', '{"k": 40}', '{"k": 21}', '{"k": 8}',
        '{"k": 62}', '{"k": 30}', '{"k": 50, "tag": "abcde"}',
        '{"k": 4, "tag": "abcde"}', '{"k": 4, "tag": "abc"}',
        '{"k": null}', '{"k": null, "tag": "abcde"}', "{}",
        '{"tag": "abcde"}', '{"k": 44, "tag": "abcde"}', "null", "true",
        '{"k": 50.0}', '{"k": 1e400}', None, "not json",
    ]
    _diff(spark, schema, docs)
    # the walk lane sees ONLY the variant-refused row ('not json'); every
    # ambiguity the screen would walk (the null-vs-absent k under required)
    # is judged natively
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, js string")
    m = GateMetrics(spark)
    gate_filter(df, schema, json_col="js", metrics=m, dynamic_native=True).count()
    d = m.as_dict()
    assert d["walked"] + d["screened_valid"] + d["screened_invalid"] <= 2, d


def test_differential_ite_top_level(spark):
    schema = {
        "type": "object",
        "if": {"required": ["a"]},
        "then": {"properties": {"b": {"type": "integer"}}},
        "else": {"required": ["c"]},
    }
    docs = [
        '{"a": 1, "b": 2}', '{"a": 1, "b": "x"}', '{"a": 1}',
        '{"b": "x", "c": 1}', '{"b": "x"}', '{"c": 1}', "{}",
        '{"a": null, "b": 2.5}', "[1]", "null",
    ]
    _diff(spark, schema, docs)


def test_refused_lane_dup_keys_and_huge_ints(spark):
    """Variant-refused rows go through the exact walk and still land in the
    output when valid."""
    df = spark.createDataFrame(
        [(1, '{"k": 9, "k": 50}'),      # dup keys, last-wins valid
         (2, '{"k": 50, "k": 9}'),      # dup keys, last-wins invalid
         (3, '{"k": 50}')],
        "id long, js string",
    )
    m = GateMetrics(spark)
    kept = {
        r.id
        for r in gate_filter(
            df, FLAT, json_col="js", metrics=m, dynamic_native=True
        ).collect()
    }
    assert kept == {1, 3}
    d = m.as_dict()
    assert d["walked"] >= 2 and d["walked"] <= 2 * 2  # only the dup-key rows


def test_native_path_runs_zero_python_on_clean_corpus(spark):
    """On a corpus variant accepts entirely, the walk lane is empty: the
    GateMetrics counters (which only the Python stage increments) stay 0."""
    docs = [json.dumps({"k": i}) for i in range(500)]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, js string")
    m = GateMetrics(spark)
    n = gate_filter(df, FLAT, json_col="js", metrics=m, dynamic_native=True).count()
    assert n == len([i for i in range(500) if 10 <= i <= 90])
    d = m.as_dict()
    assert d["walked"] == 0 and d["screened_valid"] == 0 and d["fallback_rows"] == 0


def test_fuzz_differential_native_vs_walk(spark):
    """Randomized docs over the keyword-zoo schema: native and walk verdict
    sets must be identical."""
    import random

    rng = random.Random(4242)
    schema = {
        "type": "object",
        "required": ["a"],
        "properties": {
            "a": {"type": ["integer", "string"], "minimum": -5, "maximum": 5,
                  "minLength": 1, "maxLength": 3},
            "b": {"enum": [0, "0", False, None, 2.5]},
            "c": {"multipleOf": 0.1},
        },
    }
    vals = [
        "-5", "-6", "5", "6", "0", "0.0", "0.5", "2.5", "-0.0", "true",
        "false", "null", '"x"', '"xyz"', '"wxyz"', '""', "[1]", '{"z":1}',
        "1e400", "9007199254740993",
    ]
    docs = []
    for _ in range(300):
        parts = []
        for key in ("a", "b", "c"):
            mode = rng.random()
            if mode < 0.2:
                continue  # absent
            parts.append(f'"{key}": {rng.choice(vals)}')
        docs.append("{" + ", ".join(parts) + "}")
    _diff(spark, schema, docs)


def test_pattern_class_dialect_admission():
    """Round-6 fix: character classes whose meaning differs between Python
    `re` (the exact walk) and Java `Pattern` (rlike) must NOT be admitted
    to the native path — '[' inside an open class is a Python literal but
    a Java nested-class union; class-leading ']' is a Python literal but a
    Java compile error."""
    def schema_with(pattern):
        return {"type": "object",
                "properties": {"s": {"type": "string", "pattern": pattern}}}

    # divergent shapes walk
    for bad in ("[a[b]]", "[]a]", "[^]a]", "[ab", "a]["):
        assert plan_dynamic(schema_with(bad)) is None, bad
    # dialect-identical classes stay native
    for ok in ("^a[b-d]+$", "x[0-9]?y", "[abc]|[de]", "a]b", "plain"):
        assert plan_dynamic(schema_with(ok)) is not None, ok


def test_suite_differential_native_vs_walk(spark):
    """Round-6 (VERDICT ask #6): every vendored-suite schema that
    plan_dynamic admits runs its group's cases through BOTH the native
    variant backend and the exact walk via gate_filter; kept-row sets must
    be identical.  The admitted rate is reported so shrinkage of the native
    subset is visible."""
    import json
    import os

    from jsonschema_jl_spark.gate.gate import gate_filter

    fixture_dir = os.path.join(os.path.dirname(__file__), "fixtures")
    groups = []
    for name in ("suite_cases.json", "suite_cases_extra.json"):
        with open(os.path.join(fixture_dir, name), encoding="utf-8") as fh:
            groups.extend(json.load(fh))

    admitted = 0
    checked_cases = 0
    for g in groups:
        plan = plan_dynamic(g["schema"])
        if plan is None:
            continue
        admitted += 1
        rows = [
            (i, json.dumps(t["data"]), bool(t["valid"]))
            for i, t in enumerate(g["tests"])
        ]
        df = spark.createDataFrame(rows, "i int, js string, valid boolean")
        walk = {r.i for r in gate_filter(df, g["schema"], json_col="js").collect()}
        native = {
            r.i for r in gate_filter(
                df, g["schema"], json_col="js", dynamic_native=True
            ).collect()
        }
        expect = {i for i, _, v in rows if v}
        assert native == walk == expect, (
            g["description"], sorted(native), sorted(walk), sorted(expect)
        )
        checked_cases += len(rows)
    rate = admitted / len(groups)
    print(f"\nnative-admitted {admitted}/{len(groups)} groups "
          f"({rate:.1%}), {checked_cases} cases verdict-identical")
    # the suite is dominated by array/object/$ref groups the native path
    # deliberately refuses; the flat-scalar subset (9 groups at round 6)
    # must not silently vanish
    assert admitted >= 8
