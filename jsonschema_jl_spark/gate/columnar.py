"""Columnar screening pre-pass for the dynamic-JSON gate.

The dynamic gate's exact backend is a per-row dict-tree walk (json.loads +
keyword dispatch) — correct but the slowest kernel per core in the engine.
For the common flat-object schemas (type/required/properties with scalar
keyword checks), this module screens whole Arrow batches columnar-ly:

  1. the batch's JSON texts are parsed ONCE by pyarrow.json.read_json
     (C++, simdjson-class throughput) into a columnar table;
  2. each planned property runs vectorized checks (pyarrow.compute /
     numpy) over its column;
  3. rows the screen proves CERTAINLY VALID get a NULL issue with no Python
     per-row work; rows it proves CERTAINLY INVALID can — in verdict-only
     consumers like `gate_filter`, where the issue struct is dropped — skip
     the walk too; every other row falls back to the exact dict-walk.

Soundness contract, both directions: the screen may only declare a row
valid (resp. invalid) when the exact validator would — any ambiguity
(parse surprises, unhandled column types, absent-vs-null when the two
verdicts differ, numeric magnitude beyond float64's exact-integer range,
enum corner cases) routes the row (or whole batch) to the dict walk.  The
invalid mask is only consumed where the caller needs no issue detail; a
certainly-invalid bit requires a DEFINITIVE keyword failure (wrong-typed
present value, out-of-range number, length/pattern/enum miss, a required
field whose null-AND-absent interpretations are both invalid, or a
required column entirely missing from the parsed batch).  False
"maybe-invalid"/"maybe-valid" verdicts cost only time; the walk recomputes
them exactly, including the precise first-failure issue.  Verdict-changing
bugs are therefore only possible as false-valids or false-invalids, which
the conformance suite + differential fuzz (tests/test_gate_*) and the
dedicated screen-vs-walk differentials (tests/test_gate_columnar.py, both
modes) guard.

Known pyarrow.json behaviors relied on (probed on pyarrow 16, see tests):
  * duplicate keys, mixed-type columns, non-object rows, >double numbers,
    blank interior lines -> batch-level ArrowInvalid => full fallback;
  * ints beyond int64 silently become double => the +-2^53 magnitude gate
    refuses to screen such columns;
  * ISO-date-like strings are inferred as timestamp => unhandled type =>
    fallback.
"""

from __future__ import annotations

import io
import re
from typing import Any

import numpy as np
import pandas as pd

_MAX_EXACT = 2 ** 53  # float64 exact-integer range

_ALLOWED_TOP = {"type", "required", "properties"}
_ALLOWED_KW = {
    "type", "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
    "minLength", "maxLength", "pattern", "enum", "const",
}
_SCALAR_TYPES = {"integer", "number", "string", "boolean"}


def _is_exact_number(v: Any) -> bool:
    return (
        isinstance(v, (int, float))
        and not isinstance(v, bool)
        and abs(v) <= _MAX_EXACT
    )


def plan_screen(schema_data: Any) -> dict | None:
    """Compile a screening plan, or None when the schema is not screenable.

    The plan maps property name -> (subschema, null_ok, required,
    null_invalid) where null_ok means "a row whose field is null-or-absent
    is certainly valid" (requires the absent verdict AND the null verdict to
    both be valid — pyarrow cannot distinguish the two); `required` is the
    absent verdict's invalidity, and `null_invalid` the explicit-null
    verdict's (null fails a scalar `type` or a None-free enum/const), so
    `required and null_invalid` symmetrically means "null-or-absent is
    certainly INVALID"."""
    if not isinstance(schema_data, dict):
        return None
    if set(schema_data) - _ALLOWED_TOP:
        return None
    if "type" in schema_data and schema_data["type"] != "object":
        return None
    req = schema_data.get("required", [])
    if not isinstance(req, list) or not all(isinstance(r, str) for r in req):
        return None
    props = schema_data.get("properties", {})
    if not isinstance(props, dict):
        return None

    plan: dict[str, tuple[dict, bool, bool, bool]] = {}
    req_set = set(req)
    for name, sub in props.items():
        if not isinstance(sub, dict) or (set(sub) - _ALLOWED_KW):
            return None
        t = sub.get("type")
        if t is not None and t not in _SCALAR_TYPES:
            return None
        for kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
            if kw in sub and not _is_exact_number(sub[kw]):
                return None  # incl. draft-4 bool exclusive* forms
        for kw in ("minLength", "maxLength"):
            if kw in sub and (isinstance(sub[kw], bool) or not isinstance(sub[kw], int)):
                return None
        if "pattern" in sub:
            if not isinstance(sub["pattern"], str):
                return None
            try:
                re.compile(sub["pattern"])
            except re.error:
                return None
        allowed = sub.get("enum", [sub["const"]] if "const" in sub else None)
        if allowed is not None:
            if not isinstance(allowed, list):
                return None
            for e in allowed:
                if isinstance(e, (list, dict)):
                    return None
                if isinstance(e, (int, float)) and not isinstance(e, bool) \
                        and not _is_exact_number(e):
                    return None
        # null-or-absent verdict: valid only if BOTH interpretations are
        # valid — not required (absent ok) and null passes every check;
        # symmetrically, certainly-invalid only if BOTH are invalid
        null_invalid = t is not None  # null fails any scalar type
        if allowed is not None and not any(e is None for e in allowed):
            null_invalid = True
        null_ok = name not in req_set and not null_invalid
        plan[name] = (sub, null_ok, name in req_set, null_invalid)

    # required fields without a properties entry: absent -> invalid,
    # null -> valid; screening can't tell them apart, so such rows walk
    # (unless the whole column is missing from the batch: all-absent is
    # then proven, handled in screen_batch)
    for r in req:
        if r not in plan:
            plan[r] = ({}, False, True, False)
    return plan


def _to_np(arrow_bool) -> np.ndarray:
    return arrow_bool.fill_null(False).to_numpy(zero_copy_only=False)


def screen_batch(raws: pd.Series, plan: dict) -> tuple[np.ndarray, np.ndarray] | None:
    """(certainly_valid, certainly_invalid) boolean masks over the batch, or
    None when the whole batch must fall back to the dict walk.  The two
    masks are disjoint; rows in neither walk.  certainly_invalid carries no
    issue detail — consume it only where the verdict alone suffices
    (gate_filter)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyarrow import json as pajson

    n = len(raws)
    vals = raws.to_numpy(dtype=object)
    # rows screenable by the line-oriented reader: non-null single-line
    # strings that LOOK like objects (anything else walks).  The object
    # check matters twice: a non-object row would abort the whole batch's
    # parse (one stray `3.14` un-screening everything), and a bare `null`
    # line SEGFAULTS pyarrow 16's json reader outright.
    screenable = np.fromiter(
        (
            isinstance(v, str)
            and "\n" not in v and "\r" not in v
            and v.lstrip()[:1] == "{"
            for v in vals
        ),
        dtype=bool,
        count=n,
    )
    out = np.zeros(n, dtype=bool)
    inv_out = np.zeros(n, dtype=bool)
    idx = np.flatnonzero(screenable)
    if idx.size == 0:
        return out, inv_out
    try:
        blob = "\n".join(vals[i] for i in idx).encode("utf-8")
        tbl = pajson.read_json(
            io.BytesIO(blob),
            # use_threads=False: Spark's forked python workers inherit a
            # parent-process pyarrow thread pool that is unusable post-fork
            # (worker crash, observed as executor EOFException); the batch
            # is one task's slice anyway, so intra-read parallelism would
            # only fight the executor's task parallelism
            read_options=pajson.ReadOptions(use_threads=False),
            parse_options=pajson.ParseOptions(newlines_in_values=False),
        )
    except Exception:
        return None
    if tbl.num_rows != idx.size:
        return None

    ok = np.ones(idx.size, dtype=bool)
    inv = np.zeros(idx.size, dtype=bool)
    names = set(tbl.schema.names)
    for name, (sub, null_ok, required, null_invalid) in plan.items():
        if name not in names:
            # no row mentions the key at all (an explicit `"k": null` would
            # have produced a null-typed column, so column absence proves
            # key absence for every screened row — probed in tests):
            # required -> every screened row definitively fails `required`;
            # optional -> absent satisfies the property, no constraint
            if required:
                ok[:] = False
                inv[:] = True
            continue
        arr = tbl.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        is_num = pa.types.is_integer(t) or pa.types.is_floating(t)
        is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
        is_bool = pa.types.is_boolean(t)
        if not (is_num or is_str or is_bool or pa.types.is_null(t)):
            return None  # nested / timestamp-inferred / unexpected
        nullm = arr.is_null().to_numpy(zero_copy_only=False)
        if not null_ok:
            ok &= ~nullm
        if required and null_invalid:
            # both readings of a null cell (explicit null / absent key) are
            # invalid under this property -> definitive
            inv |= nullm
        if pa.types.is_null(t):
            continue
        present = ~nullm
        bad = np.zeros(idx.size, dtype=bool)

        arrf = None
        if is_num:
            # exact-integer range gate: ints beyond 2^53 (or doubles pyarrow
            # silently demoted huge JSON ints into) can't be compared exactly
            mm = pc.min_max(arr).as_py()
            if mm["min"] is not None and (
                abs(mm["min"]) > _MAX_EXACT or abs(mm["max"]) > _MAX_EXACT
            ):
                return None
            arrf = pc.cast(arr, pa.float64())

        typ = sub.get("type")
        if typ == "integer":
            if is_num:
                if pa.types.is_floating(t):
                    bad |= _to_np(pc.not_equal(arr, pc.floor(arr)))
            else:
                bad |= present
        elif typ == "number":
            if not is_num:
                bad |= present
        elif typ == "string":
            if not is_str:
                bad |= present
        elif typ == "boolean":
            if not is_bool:
                bad |= present

        if is_num:
            if "minimum" in sub:
                bad |= _to_np(pc.less(arrf, float(sub["minimum"])))
            if "maximum" in sub:
                bad |= _to_np(pc.greater(arrf, float(sub["maximum"])))
            if "exclusiveMinimum" in sub:
                bad |= _to_np(pc.less_equal(arrf, float(sub["exclusiveMinimum"])))
            if "exclusiveMaximum" in sub:
                bad |= _to_np(pc.greater_equal(arrf, float(sub["exclusiveMaximum"])))
        if is_str:
            if "minLength" in sub:
                bad |= _to_np(pc.less(pc.utf8_length(arr), sub["minLength"]))
            if "maxLength" in sub:
                bad |= _to_np(pc.greater(pc.utf8_length(arr), sub["maxLength"]))
            if "pattern" in sub:
                s = pd.Series(arr.to_pandas(), copy=False).astype(object)
                hit = s.str.contains(sub["pattern"], regex=True, na=False)
                bad |= ~hit.to_numpy(dtype=bool)

        allowed = sub.get("enum", [sub["const"]] if "const" in sub else None)
        if allowed is not None:
            if is_bool:
                permitted = {e for e in allowed if isinstance(e, bool)}
                v = _to_np(arr)
                hit = np.zeros(idx.size, dtype=bool)
                if True in permitted:
                    hit |= v & present
                if False in permitted:
                    hit |= (~v) & present
                bad |= ~hit
            elif is_num:
                nums = [
                    float(e) for e in allowed
                    if isinstance(e, (int, float)) and not isinstance(e, bool)
                ]
                bad |= ~_to_np(
                    pc.is_in(arrf, value_set=pa.array(nums, pa.float64()))
                )
            elif is_str:
                strs = [e for e in allowed if isinstance(e, str)]
                bad |= ~_to_np(pc.is_in(arr, value_set=pa.array(strs, t)))

        # every `bad` bit above is a DEFINITIVE keyword failure on a present
        # value (wrong-typed column, range/length/pattern/enum miss, float
        # with a fractional part vs `type: integer`) — the same checks the
        # exact walk runs, just vectorized — so it feeds both masks
        bad &= present
        ok &= ~bad
        inv |= bad

    out[idx] = ok
    inv_out[idx] = inv
    return out, inv_out
