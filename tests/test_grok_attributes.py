"""Grok compiler + attributes/redaction processor tests."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.functions.grok import compile_grok
from opentelemetry_collector_contrib_ray.stages.attributes import AttributesProcessor, Redaction
from opentelemetry_collector_contrib_ray.stages.parse import GrokParser


def test_compile_grok_nested_and_types():
    regex, types = compile_grok(r"%{NUMBER:v:float} %{WORD:w}")
    assert types == {"v": "float64"}
    import re

    m = re.search(regex, "12.5 abc")
    assert m.group("v") == "12.5" and m.group("w") == "abc"


def test_compile_grok_custom_definitions():
    regex, _ = compile_grok(r"%{MYID:id}", definitions={"MYID": r"id-\d+"})
    import re

    assert re.search(regex, "x id-42 y").group("id") == "id-42"


def test_compile_grok_unknown_raises():
    with pytest.raises(ValueError):
        compile_grok(r"%{NOPE:x}")


def test_grok_parser_stage():
    t = pa.table({"text": ["GET 12 apples", "garbage"]})
    p = GrokParser(r"%{WORD:verb} %{INT:n:int}", parse_from="text", on_error="drop")
    out = p.fn(t)
    assert out.num_rows == 1
    assert out["verb"][0].as_py() == "GET" and out["n"][0].as_py() == 12


def test_attributes_actions():
    t = pa.table({"a": ["x", None], "b": [1, 2], "num": ["10", "20"]})
    stage = AttributesProcessor([
        {"action": "insert", "key": "a", "value": "filled"},
        {"action": "upsert", "key": "c", "value": "v"},
        {"action": "convert", "key": "num", "converted_type": "int64"},
        {"action": "extract", "key": "a", "pattern": r"(?P<first>^.)"},
        {"action": "delete", "key": "b"},
    ])
    out = stage.fn(t)
    assert out["a"].to_pylist() == ["x", "filled"]
    assert out["c"].to_pylist() == ["v", "v"]
    assert out["num"].to_pylist() == [10, 20]
    assert out["first"].to_pylist() == ["x", "f"]
    assert "b" not in out.column_names


def test_attributes_update_only_existing():
    t = pa.table({"a": ["x", None]})
    out = AttributesProcessor([{"action": "update", "key": "a", "value": "u"}]).fn(t)
    assert out["a"].to_pylist() == ["u", None]


def test_redaction():
    t = pa.table({
        "text": ["card 4111-1111-1111-1111 ok", "clean"],
        "secret": ["s", "t"],
        "n": [1, 2],
    })
    out = Redaction(["text", "n"], blocked_value_patterns=[r"\d{4}-\d{4}-\d{4}-\d{4}"]).fn(t)
    assert out.column_names == ["text", "n"]
    assert out["text"].to_pylist() == ["card **** ok", "clean"]
    assert out["n"].to_pylist() == [1, 2]  # non-string column untouched
