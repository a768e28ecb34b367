"""Schema construction: parse + $id map + $ref inlining.

Re-implements the compile-time semantics of the reference's schema.jl
(reference src/schema.jl:249-264): deep-copy the user dict, build a map of
every `id` (draft 4) / `$id` (draft 6+) URI to its subschema
(src/schema.jl:187-226), then recursively replace each `"$ref"` string value
with the referenced subschema *object* (src/schema.jl:136-185).  After
construction, evaluation never resolves URIs — the analog of Catalyst view/CTE
inlining done in our Python compiler before any DataFrame op.

Notable reference behaviors reproduced:
  - a schema containing `$ref` ignores its sibling keywords (the runtime
    dispatcher chases the ref first, src/validation.jl:78-81,100-111);
  - ref resolution never descends into `enum`/`const` bodies (they are data,
    not schema — src/schema.jl:178-179,220-222);
  - a resolved ref is marked so it is never re-resolved (src/schema.jl:156-165)
    which also makes self-referential (recursive) schemas work;
  - chains of $ref -> $ref -> ... are chased at validation time with a
    cycle check (src/validation.jl:100-110).
JSON Pointer walking (src/schema.jl:45-77) is 0-indexed for arrays and
unescapes ~0/~1/%XX (src/schema.jl:7-16).
"""

from __future__ import annotations

import copy
import json
import os
import re
import warnings
from typing import Any
from urllib.parse import urljoin, urlparse, urldefrag, unquote


class SchemaError(ValueError):
    pass


def unescape_jpath(raw: str) -> str:
    """JSON Pointer unescaping: ~0 -> ~, ~1 -> /, %XX -> char.

    (reference src/schema.jl:7-16)"""
    s = raw.replace("~0", "~").replace("~1", "/")
    if "%" in s:
        s = unquote(s)
    return s


def _recurse_get_element(schema: Any, path: str) -> Any:
    """Walk one JSON-Pointer path through dicts (key lookup) and arrays
    (0-indexed integer index) — reference src/schema.jl:45-77."""
    if path == "":
        return schema
    part, _, rest = path.partition("/")
    key = unescape_jpath(part)
    if isinstance(schema, dict):
        if key not in schema:
            raise SchemaError(
                f"missing property '{key}' in $ref path; available: {sorted(schema)}"
            )
        return _recurse_get_element(schema[key], rest)
    if isinstance(schema, list):
        try:
            idx = int(key)
        except ValueError:
            raise SchemaError(f"expected integer array index, got '{key}'") from None
        if idx < 0 or idx >= len(schema):
            raise SchemaError(f"array index {idx} out of bounds")
        return _recurse_get_element(schema[idx], rest)
    raise SchemaError(
        f"unmanaged type in ref resolution: cannot index into {type(schema).__name__}"
    )


def get_element(schema: Any, path: str) -> Any:
    return _recurse_get_element(schema, path.lstrip("/"))


def update_id(base_uri: str, s: str) -> str:
    """Base-URI update for nested id/$id (reference src/schema.jl:22-43)."""
    return urljoin(base_uri, s)


def _id_keys_of(schema: dict) -> list[str]:
    # draft 4 uses `id`; draft 6+ uses `$id` (reference src/schema.jl:209-218)
    out = []
    if isinstance(schema.get("id"), str):
        out.append(schema["id"])
    if isinstance(schema.get("$id"), str):
        out.append(schema["$id"])
    return out


def build_id_map(schema: dict) -> dict[str, Any]:
    """Index every id/$id URI -> subschema (reference src/schema.jl:187-226).

    Skips enum/const bodies (data, not schema)."""
    id_map: dict[str, Any] = {"": schema}

    def walk(node: Any, base_uri: str) -> None:
        if isinstance(node, dict):
            for raw in _id_keys_of(node):
                base_uri = update_id(base_uri, raw)
                id_map[base_uri.rstrip("#")] = node
            for k, v in node.items():
                if k in ("enum", "const"):
                    continue
                walk(v, base_uri)
        elif isinstance(node, list):
            for v in node:
                walk(v, base_uri)

    walk(schema, "")
    return id_map


def get_remote_schema(url: str) -> "Schema":
    """Fetch + compile a remote schema at Schema-build time (reference
    src/schema.jl:79-92).  This runs ONLY on the driver, once per distinct
    URI per Schema build (results are cached in the id_map, mirroring the
    reference's `id_map[string(uri2)] = ...` insert) — executors never see a
    $ref, they receive the fully inlined tree."""
    from urllib.request import urlopen

    try:
        with urlopen(url, timeout=30) as resp:
            status = getattr(resp, "status", 200)
            if status != 200:
                raise SchemaError(
                    f"Unable to get remote schema at {url}: HTTP status code {status}"
                )
            body = resp.read().decode("utf-8")
    except SchemaError:
        raise
    except OSError as exc:  # URLError/HTTPError/socket errors
        raise SchemaError(f"Unable to get remote schema at {url}: {exc}") from exc
    return Schema(json.loads(body))


def find_ref(uri: str, id_map: dict[str, Any], path: str, parent_dir: str) -> Any:
    """Resolve one $ref string (reference src/schema.jl:94-132).

    Order: exact id_map hit; root '#'/''; JSON-Pointer '#/...'; remote
    http(s) fetch (driver-side, compile-time, cached in id_map); local
    file."""
    if path in id_map:
        return id_map[path]
    if path in ("", "#"):
        return id_map[""]
    if path.startswith("#/"):
        return get_element(id_map[uri.rstrip("#")] if uri else id_map[""], path[2:])
    # absolute-ish URI: try id_map with fragment handling, else local file
    full = update_id(uri, path)
    base, frag = urldefrag(full)
    if base in id_map:
        target = id_map[base]
        return get_element(target, frag.lstrip("/")) if frag else target
    parsed = urlparse(full)
    if parsed.scheme in ("http", "https"):
        if base not in id_map:
            id_map[base] = get_remote_schema(base).data
        target = id_map[base]
        return get_element(target, frag.lstrip("/")) if frag else target
    # local file (file: scheme or bare relative path)
    fpath = parsed.path if parsed.scheme == "file" else full.split("#")[0]
    if not os.path.isabs(fpath):
        fpath = os.path.join(parent_dir, fpath)
    if os.path.exists(fpath):
        with open(fpath, encoding="utf-8") as fh:
            sub = json.load(fh)
        sub_schema = Schema(sub, parent_dir=os.path.dirname(fpath)).data
        return get_element(sub_schema, frag.lstrip("/")) if frag else sub_schema
    raise SchemaError(f"unable to resolve $ref '{path}' (base uri '{uri}')")


def resolve_refs(
    schema: Any,
    uri: str,
    id_map: dict[str, Any],
    parent_dir: str,
    _seen: set[int] | None = None,
) -> None:
    """In-place: replace every `"$ref": "<uri>"` string with the referenced
    subschema object; each dict node is visited once (src/schema.jl:136-185
    marks resolved refs) so recursive/self-referential schemas terminate."""
    if _seen is None:
        _seen = set()
    if id(schema) in _seen:
        return
    _seen.add(id(schema))
    if isinstance(schema, dict):
        for raw in _id_keys_of(schema):
            uri = update_id(uri, raw)
        for k in list(schema.keys()):
            if k in ("enum", "const"):
                continue
            v = schema[k]
            if k == "$ref" and isinstance(v, str):
                target = find_ref(uri, id_map, v, parent_dir)
                schema["$ref"] = target
                resolve_refs(target, uri, id_map, parent_dir, _seen)
            else:
                resolve_refs(v, uri, id_map, parent_dir, _seen)
    elif isinstance(schema, list):
        for v in schema:
            resolve_refs(v, uri, id_map, parent_dir, _seen)


class Schema:
    """Compiled schema: parsed dict tree with all $refs inlined.

    Mirrors the reference's `Schema` (src/schema.jl:244-265): the payload is
    either a dict or a bare bool (`true` accept-all / `false` reject-all)."""

    def __init__(
        self, schema: Any, parent_dir: str = ".", parentFileDirectory: str | None = None
    ) -> None:
        if parentFileDirectory is not None:
            # deprecation shim kept for reference API parity (src/schema.jl:249-259)
            warnings.warn(
                "kwarg `parentFileDirectory` is deprecated. Use `parent_dir` instead.",
                DeprecationWarning,
                stacklevel=2,
            )
            parent_dir = parentFileDirectory
        if isinstance(schema, str):
            schema = json.loads(schema)
        if isinstance(schema, bool):
            self.data: Any = schema
            return
        if not isinstance(schema, dict):
            raise SchemaError(f"schema must be dict/bool/JSON text, got {type(schema)}")
        data = copy.deepcopy(schema)  # never mutate user input (src/schema.jl:260)
        id_map = build_id_map(data)
        resolve_refs(data, "", id_map, os.path.abspath(parent_dir))
        self.data = data

    def __repr__(self) -> str:  # reference src/schema.jl:297
        return "A JSONSchema"
