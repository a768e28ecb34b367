"""Local-file $ref resolution fixtures — mirrors the reference's generated
local-ref tests (reference test/runtests.jl:40-132: relative paths, nested
ref-through-ref, escaped pointers) plus error paths (test/runtests.jl:238-291).
"""

from __future__ import annotations

import json

import pytest

from jsonschema_jl_spark.gate import Schema, is_valid
from jsonschema_jl_spark.gate.schema import SchemaError, get_element, unescape_jpath


def _write(p, obj):
    p.write_text(json.dumps(obj), encoding="utf-8")


def test_local_file_ref(tmp_path):
    _write(tmp_path / "defs.json", {"positive": {"type": "integer", "minimum": 1}})
    s = Schema(
        {"properties": {"n": {"$ref": "defs.json#/positive"}}},
        parent_dir=str(tmp_path),
    )
    assert is_valid(s, {"n": 2})
    assert not is_valid(s, {"n": 0})


def test_nested_ref_through_ref_files(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    _write(sub / "leaf.json", {"type": "string", "minLength": 2})
    _write(tmp_path / "mid.json", {"$ref": "sub/leaf.json"})
    s = Schema({"properties": {"v": {"$ref": "mid.json"}}}, parent_dir=str(tmp_path))
    assert is_valid(s, {"v": "ab"})
    assert not is_valid(s, {"v": "a"})
    assert not is_valid(s, {"v": 5})


def test_relative_parent_traversal(tmp_path):
    (tmp_path / "a").mkdir()
    _write(tmp_path / "defs.json", {"type": "boolean"})
    s = Schema({"$ref": "../defs.json"}, parent_dir=str(tmp_path / "a"))
    assert is_valid(s, True)
    assert not is_valid(s, 1)


def test_missing_ref_target_errors():
    with pytest.raises(SchemaError):
        Schema({"$ref": "#/definitions/nope"})


def test_bad_array_index_errors():
    with pytest.raises(SchemaError):
        Schema({"items": [{"type": "string"}], "$ref": "#/items/5"})


def test_scalar_pointer_target_errors():
    with pytest.raises(SchemaError):
        Schema({"maxLength": 3, "$ref": "#/maxLength/0"})


def test_remote_http_ref_rejected():
    with pytest.raises(SchemaError, match="remote"):
        Schema({"$ref": "http://example.com/schema.json"})


def test_unescape_jpath():
    assert unescape_jpath("a~1b") == "a/b"
    assert unescape_jpath("c~0d") == "c~d"
    assert unescape_jpath("sp%20ace") == "sp ace"


def test_get_element_array_indexing():
    schema = {"items": [{"a": 1}, {"b": 2}]}
    assert get_element(schema, "items/1") == {"b": 2}
    with pytest.raises(SchemaError):
        get_element(schema, "items/x")


def test_repr():
    assert repr(Schema({})) == "A JSONSchema"
