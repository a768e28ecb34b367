"""Schema -> Catalyst Column compiler (the engine's one "optimizer rule").

Splits a compiled Schema into:
  * a **native** issue-expression chain (pure `pyspark.sql.functions`,
    whole-stage-codegen'd, pushdown-friendly) when every keyword used is
    exactly translatable over typed columns, and
  * a **residual** Arrow pandas-UDF path (the dict-tree validator from
    validator.py run per batch) for everything else — dynamic JSON columns,
    combinators over mixed types, nested applicators.

Catalyst then does the rest (ConstantFolding, BooleanSimplification, filter
pushdown into the parquet/Iceberg scan).  Pandas-UDF predicates never push
down, so `necessary_condition()` additionally derives a conjunction of
native *necessary* conditions for validity — used by `gate_filter` to
prefilter at the scan before rows ever reach the Python worker.

Typed-column semantic narrowing (documented, SURVEY.md §2.8): a SQL NULL in a
typed column is treated as an *absent* key — `required` fails on it, and all
per-property checks are NULL-tolerant (a property check never fires on an
absent key), exactly matching the reference where `properties` only validates
keys present in the instance (src/validation.jl:364-380) while `required`
checks presence (src/validation.jl:755-766).

Draft-4 boolean `exclusiveMaximum`/`exclusiveMinimum` are normalized at
compile time into strict bounds (reference keeps dual runtime methods,
src/validation.jl:565-576,606-617).
"""

from __future__ import annotations

import json
import math
from typing import Any

from pyspark.sql import Column, functions as F, types as T

from jsonschema_jl_spark.gate.schema import Schema

_REL_TOL = math.sqrt(2.220446049250313e-16)  # isapprox default rtol

# keywords the native typed-column backend translates exactly
_NATIVE_PROP_KEYWORDS = {
    "type", "enum", "const", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
}
_NATIVE_TOP_KEYWORDS = {"type", "required", "properties"}

_SCALAR_JSON_TYPES = {"string", "integer", "number", "boolean", "null"}

ISSUE_TYPE = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("instance", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


class GateCheck:
    """One compiled keyword check: a fail-condition Column + issue payload.

    Invariant: `fail` never evaluates to NULL — every per-property condition
    is guarded as `isNotNull(col) & ...` (false-dominant AND), and required/
    boolean-schema checks are IsNull/literal based.  This lets consumers use
    plain `~fail` (no coalesce), which Catalyst can De-Morgan into
    `IsNull(col) OR <bound>` conjuncts that translate into parquet/Iceberg
    scan PushedFilters; a coalesce() wrapper would block pushdown entirely."""

    __slots__ = ("fail", "path", "reason", "value_json", "instance_col")

    def __init__(self, fail: Column, path: str, reason: str, value: Any, instance_col: Column):
        self.fail = fail
        self.path = path
        self.reason = reason
        self.value_json = json.dumps(value)
        self.instance_col = instance_col

    def issue_struct(self) -> Column:
        return F.struct(
            F.lit(self.path).alias("path"),
            self.instance_col.cast("string").alias("instance"),
            F.lit(self.reason).alias("reason"),
            F.lit(self.value_json).alias("value"),
        )


class NotNativelyCompilable(Exception):
    pass


def _spark_type_check(col: Column, dtype: T.DataType, want: str) -> Column:
    """Boolean Column: non-null value of `col` (Spark type `dtype`) conforms
    to JSON type `want`.  Static where the dtype decides it."""
    if want == "null":
        return F.lit(False)  # non-null value is never JSON null
    if isinstance(dtype, T.StringType):
        return F.lit(want == "string")
    if isinstance(dtype, T.BooleanType):
        return F.lit(want == "boolean")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.lit(want in ("integer", "number"))
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        if want == "number":
            return F.lit(True)
        if want == "integer":
            # 1.0 counts as integer (src/validation.jl:492); NaN/Inf are not
            # (Spark's NaN==NaN is true, so guard explicitly)
            return (~F.isnan(col)) & (F.abs(col) != F.lit(float("inf"))) & (col == F.floor(col))
        return F.lit(False)
    if isinstance(dtype, T.DecimalType):
        if want == "number":
            return F.lit(True)
        if want == "integer":
            return col == F.floor(col)
        return F.lit(False)
    if isinstance(dtype, T.BinaryType):
        # binary has no JSON type; the gate treats it as an opaque present
        # value — only `required` applies.  `type` checks on binary are not
        # natively compilable.
        raise NotNativelyCompilable("type check on binary column")
    raise NotNativelyCompilable(f"type check on {dtype.simpleString()} column")


def _enum_native(col: Column, dtype: T.DataType, vals: list) -> Column:
    # typed columns cannot hold mixed JSON types, so scalar isin is exact —
    # the bool!=number trap (src/validation.jl:121-127) cannot fire when the
    # column dtype and the enum literal types are partitioned here.
    is_bool_col = isinstance(dtype, T.BooleanType)
    is_num_col = isinstance(
        dtype,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType),
    )
    ok_vals = []
    for v in vals:
        if isinstance(v, bool):
            if is_bool_col:
                ok_vals.append(v)
        elif isinstance(v, (int, float)):
            if is_num_col:
                ok_vals.append(v)
        elif isinstance(v, str):
            if isinstance(dtype, T.StringType):
                ok_vals.append(v)
        elif v is None:
            continue  # NULL column value = absent; enum never fires on it
        else:
            raise NotNativelyCompilable("non-scalar enum value")
    if not ok_vals:
        return F.lit(False)
    return col.isin(*ok_vals)


def _multiple_of_native(col: Column, v: Any) -> Column:
    if not isinstance(v, (int, float)) or isinstance(v, bool):
        raise NotNativelyCompilable("multipleOf with non-numeric divisor")
    if v == 0:
        return F.lit(False)
    y = col.cast("double") / F.lit(float(v))
    r = F.round(y, 0)
    tol = F.lit(_REL_TOL) * F.greatest(F.abs(y), F.abs(r))
    return (F.abs(y - r) <= tol) & ~F.isnan(y)


def compile_native_checks(schema: Schema | dict, df_schema: T.StructType) -> list[GateCheck]:
    """Compile a typed-column object schema into ordered native checks.

    Raises NotNativelyCompilable if any construct falls outside the exactly-
    translatable subset — caller then routes the whole gate to the pandas-UDF
    backend (to_json -> dict-tree validator)."""
    data = schema.data if isinstance(schema, Schema) else schema
    if isinstance(data, bool):
        if data:
            return []
        return [GateCheck(F.lit(True), "", "schema", False, F.lit(None))]
    if not isinstance(data, dict):
        raise NotNativelyCompilable("schema is not an object")
    unknown = set(data) - _NATIVE_TOP_KEYWORDS - {"$schema", "$id", "id", "title", "description", "definitions"}
    if unknown:
        raise NotNativelyCompilable(f"top-level keywords {sorted(unknown)}")
    if "type" in data and data["type"] != "object":
        raise NotNativelyCompilable("top-level type must be 'object' for typed mode")

    fields = {f.name: f for f in df_schema.fields}
    checks: list[GateCheck] = []

    # keyword order: required before properties (validator._KEYWORD_ORDER)
    req = data.get("required", [])
    if req:
        if not isinstance(req, list):
            raise NotNativelyCompilable("required must be a list")
        missing_static = [k for k in req if k not in fields]
        if missing_static:
            checks.append(GateCheck(F.lit(True), "", "required", req, F.lit(None)))
        else:
            fail = None
            for k in req:
                c = F.col(k).isNull()
                fail = c if fail is None else (fail | c)
            checks.append(GateCheck(fail, "", "required", req, F.lit(None)))

    props = data.get("properties", {})
    if not isinstance(props, dict):
        raise NotNativelyCompilable("properties must be an object")
    for name in sorted(props):
        sub = props[name]
        if name not in fields:
            continue  # absent column: property checks never fire
        col = F.col(name)
        dtype = fields[name].dataType
        checks.extend(_compile_prop(name, col, dtype, sub))
    return checks


def _compile_prop(name: str, col: Column, dtype: T.DataType, sub: Any) -> list[GateCheck]:
    path = f"[{name}]"
    if isinstance(sub, bool):
        if sub:
            return []
        return [GateCheck(col.isNotNull(), path, "schema", False, col)]
    if not isinstance(sub, dict):
        raise NotNativelyCompilable(f"property {name}: schema must be dict/bool")
    unknown = set(sub) - _NATIVE_PROP_KEYWORDS - {"$schema", "title", "description"}
    if unknown:
        raise NotNativelyCompilable(f"property {name}: keywords {sorted(unknown)}")

    # draft-4 normalization: boolean exclusive bounds tighten siblings
    minimum, maximum = sub.get("minimum"), sub.get("maximum")
    excl_min, excl_max = sub.get("exclusiveMinimum"), sub.get("exclusiveMaximum")
    if isinstance(excl_max, bool):
        excl_max = maximum if (excl_max and maximum is not None) else None
        maximum = None if excl_max is not None else maximum
    if isinstance(excl_min, bool):
        excl_min = minimum if (excl_min and minimum is not None) else None
        minimum = None if excl_min is not None else minimum

    present = col.isNotNull()
    checks: list[GateCheck] = []

    def add(fail_if_present: Column, reason: str, value: Any) -> None:
        checks.append(GateCheck(present & fail_if_present, path, reason, value, col))

    # canonical keyword order (validator._KEYWORD_ORDER)
    if "type" in sub:
        want = sub["type"]
        wants = [want] if isinstance(want, str) else list(want)
        if not all(w in _SCALAR_JSON_TYPES for w in wants):
            raise NotNativelyCompilable(f"property {name}: non-scalar type {wants}")
        ok = None
        for w in wants:
            c = _spark_type_check(col, dtype, w)
            ok = c if ok is None else (ok | c)
        add(~ok, "type", want)
    if "enum" in sub:
        add(~_enum_native(col, dtype, sub["enum"]), "enum", sub["enum"])
    if "const" in sub:
        v = sub["const"]
        if isinstance(v, (dict, list)) or v is None:
            raise NotNativelyCompilable(f"property {name}: non-scalar const")
        if isinstance(v, bool) != isinstance(dtype, T.BooleanType):
            add(F.lit(True), "const", v)  # bool/number mismatch never equal
        else:
            add(~(col == F.lit(v)), "const", v)
    if "multipleOf" in sub:
        add(~_multiple_of_native(col, sub["multipleOf"]), "multipleOf", sub["multipleOf"])
    if maximum is not None:
        add(col > F.lit(maximum), "maximum", sub.get("maximum"))
    if excl_max is not None:
        add(col >= F.lit(excl_max), "exclusiveMaximum", sub.get("exclusiveMaximum"))
    if minimum is not None:
        add(col < F.lit(minimum), "minimum", sub.get("minimum"))
    if excl_min is not None:
        add(col <= F.lit(excl_min), "exclusiveMinimum", sub.get("exclusiveMinimum"))
    if "maxLength" in sub:
        if not isinstance(dtype, T.StringType):
            raise NotNativelyCompilable(f"property {name}: maxLength on non-string")
        add(F.length(col) > F.lit(sub["maxLength"]), "maxLength", sub["maxLength"])
    if "minLength" in sub:
        if not isinstance(dtype, T.StringType):
            raise NotNativelyCompilable(f"property {name}: minLength on non-string")
        add(F.length(col) < F.lit(sub["minLength"]), "minLength", sub["minLength"])
    if "pattern" in sub:
        if not isinstance(dtype, T.StringType):
            raise NotNativelyCompilable(f"property {name}: pattern on non-string")
        # Java regex dialect; unanchored search like the reference's occursin
        # (src/validation.jl:659).  Dialect caveat documented in SURVEY §7.
        add(~col.rlike(sub["pattern"]), "pattern", sub["pattern"])

    # numeric bound checks on non-numeric columns never fire in the
    # reference (x::Number dispatch); Spark comparisons on strings would
    # coerce, so reject those at compile time instead.
    if any(k in sub for k in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf")):
        if not isinstance(
            dtype,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType),
        ):
            raise NotNativelyCompilable(f"property {name}: numeric keyword on {dtype.simpleString()}")
    return checks


def checks_to_issue_column(checks: list[GateCheck]) -> Column:
    """Ordered first-failure issue struct; NULL when the row passes."""
    issue = F.lit(None).cast(ISSUE_TYPE)
    for chk in reversed(checks):
        issue = F.when(chk.fail, chk.issue_struct()).otherwise(issue)
    return issue


def checks_to_valid_column(checks: list[GateCheck]) -> Column:
    ok = None
    for chk in checks:
        c = ~chk.fail  # fail is never NULL (GateCheck invariant) — keep the
        ok = c if ok is None else (ok & c)  # shape pushdown-translatable
    return F.lit(True) if ok is None else ok


def necessary_condition(schema: Schema | dict, df_schema: T.StructType) -> Column | None:
    """Best-effort native conjunction implied by validity — safe to push into
    the scan ahead of a residual pandas-UDF gate.  Returns None if nothing is
    derivable."""
    try:
        checks = compile_native_checks(schema, df_schema)
    except NotNativelyCompilable:
        data = schema.data if isinstance(schema, Schema) else schema
        if not isinstance(data, dict):
            return None
        # derive from the translatable subset only
        sub_schema = {
            k: v for k, v in data.items() if k in ("required",)
        }
        props = data.get("properties")
        if isinstance(props, dict):
            keep_props = {}
            for pname, psub in props.items():
                if isinstance(psub, dict):
                    keep = {k: v for k, v in psub.items() if k in _NATIVE_PROP_KEYWORDS}
                    if keep:
                        keep_props[pname] = keep
            if keep_props:
                sub_schema["properties"] = keep_props
        if not sub_schema:
            return None
        try:
            checks = compile_native_checks(sub_schema, df_schema)
        except NotNativelyCompilable:
            return None
    if not checks:
        return None
    return checks_to_valid_column(checks)
