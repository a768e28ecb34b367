"""Differential fuzzing of the gate's dict-tree validator against the
independent `jsonschema` package (Draft 6/7 semantics — the draft whose type
lattice matches the reference: 1.0 IS an integer, src/validation.jl:492).

The generator is seeded and fully deterministic: a fixed grid of random
schemas over the implemented keyword surface (SURVEY §2.3-2.8) x random +
near-miss instances.  The engine verdict comes from `validator._validate` —
the exact closure the Arrow gate UDF executes per batch (gate.py), already
exercised through Spark by the suite conformance tests.

Deliberate generator restrictions (documented semantic edges, not bugs):
  * multipleOf divisors come from {1, 2, 5, 0.5, 0.25} — the reference's
    isapprox tolerance (src/validation.jl:530-533) accepts float-noise
    multiples that strict modulo arithmetic rejects, so pathological
    divisors (0.0001) would flag a KNOWN, intended divergence;
  * no NaN/Inf instances (not JSON);
  * draft-4 boolean exclusiveMinimum/Maximum are fuzzed separately against
    Draft4Validator without any `type` keyword (draft 4's integer excludes
    1.0 while the reference deliberately includes it).
"""

from __future__ import annotations

import random

import pytest

jsonschema = pytest.importorskip("jsonschema")

from jsonschema_jl_spark.gate.schema import Schema
from jsonschema_jl_spark.gate.validator import _validate

N_CASES = 4000
SEED = 20260816


def engine_valid(schema_dict, instance) -> bool:
    return _validate(instance, Schema(schema_dict).data, "") is None


def lib_valid(schema_dict, instance, draft=None) -> bool:
    cls = draft or jsonschema.Draft7Validator
    return cls(schema_dict).is_valid(instance)


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

WORDS = ["ab", "cde", "fgh1", "x y", "", "Zz", "éé", "abcabc", "k-9"]
KEYS = ["a", "b", "cc", "dd"]


def rand_value(rng: random.Random, depth: int = 0):
    pool = ["int", "float", "str", "bool", "null"]
    if depth < 2:
        pool += ["arr", "obj"]
    kind = rng.choice(pool)
    if kind == "int":
        return rng.randint(-20, 60)
    if kind == "float":
        return rng.choice([0.0, 1.0, 2.5, -3.5, 7.0, 12.25, 19.5])
    if kind == "str":
        return rng.choice(WORDS)
    if kind == "bool":
        return rng.random() < 0.5
    if kind == "null":
        return None
    if kind == "arr":
        return [rand_value(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    return {rng.choice(KEYS): rand_value(rng, depth + 1) for _ in range(rng.randint(0, 3))}


def rand_subschema(rng: random.Random, depth: int = 0) -> dict | bool:
    roll = rng.random()
    if roll < 0.05:
        return rng.random() < 0.5
    opts = ["type", "bounds", "string", "enum", "const", "multiple"]
    if depth < 2:
        opts += ["array", "object", "combinator", "conditional"]
    kind = rng.choice(opts)
    if kind == "type":
        types = ["string", "integer", "number", "boolean", "null", "array", "object"]
        n = rng.randint(1, 2)
        picked = rng.sample(types, n)
        return {"type": picked[0] if n == 1 else picked}
    if kind == "bounds":
        s: dict = {}
        if rng.random() < 0.7:
            s["minimum" if rng.random() < 0.5 else "exclusiveMinimum"] = rng.randint(-10, 20)
        if rng.random() < 0.7:
            s["maximum" if rng.random() < 0.5 else "exclusiveMaximum"] = rng.randint(10, 50)
        return s or {"minimum": 0}
    if kind == "string":
        s = {}
        if rng.random() < 0.6:
            s["minLength"] = rng.randint(0, 4)
        if rng.random() < 0.6:
            s["maxLength"] = rng.randint(2, 8)
        if rng.random() < 0.4:
            s["pattern"] = rng.choice(["^a", "b$", "[0-9]", "^[a-z ]+$", "c.e"])
        return s or {"minLength": 1}
    if kind == "enum":
        return {"enum": [rand_value(rng, 2) for _ in range(rng.randint(1, 4))]}
    if kind == "const":
        return {"const": rand_value(rng, 2)}
    if kind == "multiple":
        return {"multipleOf": rng.choice([1, 2, 5, 0.5, 0.25])}
    if kind == "array":
        s = {}
        r = rng.random()
        if r < 0.4:
            s["items"] = rand_subschema(rng, depth + 1)
        elif r < 0.6:
            s["items"] = [rand_subschema(rng, depth + 1) for _ in range(rng.randint(1, 3))]
            if rng.random() < 0.5:
                s["additionalItems"] = rand_subschema(rng, depth + 1)
        if rng.random() < 0.3:
            s["contains"] = rand_subschema(rng, depth + 1)
        if rng.random() < 0.4:
            s["minItems"] = rng.randint(0, 3)
        if rng.random() < 0.4:
            s["maxItems"] = rng.randint(1, 5)
        if rng.random() < 0.3:
            s["uniqueItems"] = True
        return s or {"minItems": 0}
    if kind == "object":
        s = {}
        if rng.random() < 0.7:
            s["properties"] = {
                k: rand_subschema(rng, depth + 1)
                for k in rng.sample(KEYS, rng.randint(1, 3))
            }
        if rng.random() < 0.4:
            s["required"] = rng.sample(KEYS, rng.randint(1, 2))
        if rng.random() < 0.3:
            s["additionalProperties"] = rand_subschema(rng, depth + 1)
        if rng.random() < 0.25:
            s["patternProperties"] = {rng.choice(["^a", "^[bc]"]): rand_subschema(rng, depth + 1)}
        if rng.random() < 0.25:
            s["propertyNames"] = {"minLength": rng.randint(0, 3)}
        if rng.random() < 0.25:
            s["minProperties"] = rng.randint(0, 2)
        if rng.random() < 0.25:
            s["maxProperties"] = rng.randint(1, 4)
        if rng.random() < 0.25:
            dep_kind = rng.random()
            s["dependencies"] = {
                rng.choice(KEYS): (
                    rng.sample(KEYS, 1) if dep_kind < 0.5 else rand_subschema(rng, depth + 1)
                )
            }
        return s or {"minProperties": 0}
    if kind == "combinator":
        op = rng.choice(["allOf", "anyOf", "oneOf", "not"])
        if op == "not":
            return {"not": rand_subschema(rng, depth + 1)}
        return {op: [rand_subschema(rng, depth + 1) for _ in range(rng.randint(1, 3))]}
    # conditional
    s = {"if": rand_subschema(rng, depth + 1)}
    if rng.random() < 0.8:
        s["then"] = rand_subschema(rng, depth + 1)
    if rng.random() < 0.8:
        s["else"] = rand_subschema(rng, depth + 1)
    return s


def biased_instance(rng: random.Random, schema) -> object:
    """Instance shaped to the schema's keyword family, so object/array/string
    keyword branches are exercised, not just type mismatches."""
    if not isinstance(schema, dict) or not schema:
        return rand_value(rng)
    if any(k in schema for k in (
        "properties", "required", "dependencies", "patternProperties",
        "propertyNames", "additionalProperties", "minProperties", "maxProperties",
    )):
        return {rng.choice(KEYS + ["zz"]): rand_value(rng, 1) for _ in range(rng.randint(0, 4))}
    if any(k in schema for k in (
        "items", "contains", "additionalItems", "minItems", "maxItems", "uniqueItems",
    )):
        return [rand_value(rng, 1) for _ in range(rng.randint(0, 5))]
    if any(k in schema for k in ("minLength", "maxLength", "pattern")):
        return rng.choice(WORDS)
    if any(k in schema for k in (
        "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
    )):
        return rng.choice([rng.randint(-15, 55), rng.choice([0.0, 2.5, 10.0, 12.25, 20.5, 40.0])])
    return rand_value(rng)


def test_differential_vs_jsonschema_draft7():
    rng = random.Random(SEED)
    mismatches = []
    for i in range(N_CASES):
        schema = rand_subschema(rng)
        for instance in (rand_value(rng), biased_instance(rng, schema), biased_instance(rng, schema)):
            ours = engine_valid(schema, instance)
            theirs = lib_valid(schema, instance)
            if ours != theirs:
                mismatches.append((i, schema, instance, ours, theirs))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def test_differential_refs_vs_jsonschema():
    """$ref parity: the engine INLINES refs at Schema-compile time
    (schema.py resolve_refs, mirroring src/schema.jl:136-185); the library
    resolves them at validation time.  Fuzz schemas whose leaves are $ref
    pointers into definitions (including ref-through-ref chains) and
    compare verdicts — this exercises build_id_map/find_ref/get_element on
    randomized shapes, not just the hand-written fixtures."""
    rng = random.Random(SEED + 2)
    mismatches = []
    for i in range(800):
        defs = {
            f"d{j}": rand_subschema(rng, depth=1) for j in range(rng.randint(1, 3))
        }
        names = list(defs)
        # ref-through-ref: one definition may itself be a pointer to another
        if len(names) > 1 and rng.random() < 0.3:
            defs[names[0]] = {"$ref": f"#/definitions/{names[1]}"}
        leaf = {"$ref": f"#/definitions/{rng.choice(names)}"}
        roll = rng.random()
        if roll < 0.35:
            schema = {"definitions": defs, "properties": {rng.choice(KEYS): leaf}}
        elif roll < 0.6:
            schema = {"definitions": defs, "items": leaf}
        elif roll < 0.8:
            schema = {"definitions": defs, "allOf": [leaf]}
        else:
            schema = {"definitions": defs, **leaf}
        for instance in (rand_value(rng), biased_instance(rng, defs[names[-1]])):
            ours = engine_valid(schema, instance)
            theirs = lib_valid(schema, instance)
            if ours != theirs:
                mismatches.append((i, schema, instance, ours, theirs))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def test_differential_draft4_boolean_exclusives():
    rng = random.Random(SEED + 1)
    mismatches = []
    for i in range(300):
        schema = {"minimum": rng.randint(-5, 10), "maximum": rng.randint(5, 25)}
        if rng.random() < 0.7:
            schema["exclusiveMinimum"] = rng.random() < 0.5
        if rng.random() < 0.7:
            schema["exclusiveMaximum"] = rng.random() < 0.5
        instance = rng.choice(
            [rng.randint(-10, 30), rng.choice([0.0, 5.0, 10.0, 12.5, 25.0])]
        )
        ours = engine_valid(schema, instance)
        theirs = lib_valid(schema, instance, jsonschema.Draft4Validator)
        if ours != theirs:
            mismatches.append((i, schema, instance, ours, theirs))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"
