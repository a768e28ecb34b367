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


# --- remote http(s) $ref: compile-time driver-side fetch ------------------
# mirrors the reference's local-HTTP-server suite setup
# (test/runtests.jl:165-178 serves remotes/ on 127.0.0.1 and runs the
# refRemote cases through it)

@pytest.fixture(scope="module")
def remote_server(tmp_path_factory):
    import functools
    import http.server
    import threading

    root = tmp_path_factory.mktemp("remotes")
    _write(root / "integer.json", {"type": "integer"})
    _write(
        root / "subSchemas.json",
        {"definitions": {"positive": {"type": "integer", "minimum": 1}}},
    )

    hits: dict[str, int] = {}

    class Handler(http.server.SimpleHTTPRequestHandler):
        def do_GET(self):  # count fetches per path for the caching test
            hits[self.path] = hits.get(self.path, 0) + 1
            super().do_GET()

        def log_message(self, *a):  # keep pytest output clean
            pass

    handler = functools.partial(Handler, directory=str(root))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", hits
    srv.shutdown()


def test_remote_ref_whole_document(remote_server):
    url, _ = remote_server
    s = Schema({"$ref": f"{url}/integer.json"})
    assert is_valid(s, 3)
    assert not is_valid(s, "3")


def test_remote_ref_fragment(remote_server):
    url, _ = remote_server
    s = Schema(
        {"properties": {"n": {"$ref": f"{url}/subSchemas.json#/definitions/positive"}}}
    )
    assert is_valid(s, {"n": 2})
    assert not is_valid(s, {"n": 0})


def test_remote_ref_relative_to_id_base(remote_server):
    url, _ = remote_server
    s = Schema({"$id": f"{url}/root.json", "properties": {"n": {"$ref": "integer.json"}}})
    assert is_valid(s, {"n": 1})
    assert not is_valid(s, {"n": "x"})


def test_remote_ref_fetched_once_per_build(remote_server):
    url, hits = remote_server
    hits.clear()
    Schema(
        {
            "properties": {
                "a": {"$ref": f"{url}/integer.json"},
                "b": {"$ref": f"{url}/integer.json"},
            }
        }
    )
    assert hits.get("/integer.json") == 1  # cached in the id_map


def test_remote_ref_404_errors(remote_server):
    url, _ = remote_server
    with pytest.raises(SchemaError, match="Unable to get remote schema"):
        Schema({"$ref": f"{url}/nope.json"})


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


def test_inverse_argument_order():
    # reference test/runtests.jl:325-338 ("Inverse argument order")
    from jsonschema_jl_spark.gate import validate

    schema = Schema({"properties": {"foo": {}, "bar": {}}, "required": ["foo"]})
    data_pass = {"foo": True}
    data_fail = {"bar": 12.5}
    assert validate(data_pass, schema) is None
    assert validate(data_fail, schema) is not None
    assert is_valid(data_pass, schema)
    assert not is_valid(data_fail, schema)


def test_diagnose_text():
    # reference src/JSONSchema.jl:17-28: diagnose returns the 4-line text
    from jsonschema_jl_spark.gate import diagnose

    schema = Schema({"properties": {"foo": {}, "bar": {}}, "required": ["foo"]})
    assert diagnose({"foo": True}, schema) is None
    txt = diagnose({"bar": 12.5}, schema)
    assert txt.startswith("Validation failed:")
    assert "schema key:   required" in txt


def test_parent_file_directory_deprecation(tmp_path):
    # reference src/schema.jl:249-259: the deprecated kwarg still works but warns
    (tmp_path / "leaf.json").write_text('{"type": "integer"}')
    root = {"properties": {"x": {"$ref": "leaf.json"}}}
    with pytest.warns(DeprecationWarning, match="parentFileDirectory"):
        s = Schema(root, parentFileDirectory=str(tmp_path))
    assert s.data["properties"]["x"]["$ref"] == {"type": "integer"}
    # and the modern kwarg resolves identically, silently
    s2 = Schema(root, parent_dir=str(tmp_path))
    assert s2.data == s.data
