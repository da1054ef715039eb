"""Unit tests: predicate DSL and OTTL-lite transform editors."""

import datetime

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.expr import col, compile_predicate
from opentelemetry_collector_contrib_ray.stages.transform import FilterStage, Statement, TransformStage


@pytest.fixture
def t():
    return pa.table(
        {
            "role": ["user", "assistant", "tool", None],
            "status": [200, 500, None, 404],
            "dur": [1.5, 250.0, 50.0, None],
            "text": ["abc123", "x9y", "zz", "a1"],
            "ts": pa.array(
                [datetime.datetime(2026, 1, 1, 5, 42, 7)] * 4, pa.timestamp("us")
            ),
        }
    )


def test_predicates_null_is_no_match(t):
    p = compile_predicate((">=", col("status"), 400))
    assert p(t).to_pylist() == [False, True, False, True]  # null -> False
    p2 = compile_predicate(("and", ("==", col("role"), "tool"), (">", col("dur"), 10.0)))
    assert p2(t).to_pylist() == [False, False, True, False]
    p3 = compile_predicate(("not", ("==", col("role"), "user")))
    # NOT(null == 'user') -> NOT(no-match) -> True (row 3)
    assert p3(t).to_pylist() == [False, True, True, True]
    p4 = compile_predicate(("in", col("role"), ["user", "tool"]))
    assert p4(t).to_pylist() == [True, False, True, False]
    p5 = compile_predicate(("match", col("text"), r"\d"))
    assert p5(t).to_pylist() == [True, True, False, True]
    assert compile_predicate(("is_null", col("status")))(t).to_pylist() == [False, False, True, False]


def test_set_where_masks_rows(t):
    out = Statement("set", {"target": "flag", "value": "hot"}, where=(">", col("dur"), 100.0))(t)
    assert out["flag"].to_pylist() == [None, "hot", None, None]


def test_editors_chain(t):
    stage = TransformStage(
        [
            {"editor": "upper", "args": {"target": "role_up", "src": "role"}},
            {"editor": "copy", "args": {"src": "status", "dst": "status2"}},
            {"editor": "rename", "args": {"src": "status2", "dst": "code"}},
            {"editor": "replace_pattern", "args": {"target": "text", "pattern": r"\d+", "replacement": "#"}},
            {"editor": "truncate_time", "args": {"target": "hour", "src": "ts", "unit": "hour"}},
            {"editor": "concat", "args": {"target": "key", "parts": [col("role"), col("text")], "sep": "|"}},
            {"editor": "coalesce", "args": {"target": "dur2", "sources": [col("dur")], "default": 0.0}},
            {"editor": "substring", "args": {"target": "head", "src": "text", "start": 0, "length": 2}},
            {"editor": "truncate_all", "args": {"keys": ["role_up"], "limit": 3}},
            {"editor": "delete_keys", "args": {"keys": ["status"]}},
        ]
    )
    out = stage.fn(t)
    assert out["role_up"].to_pylist() == ["USE", "ASS", "TOO", None]
    assert out["code"].to_pylist() == [200, 500, None, 404]
    assert out["text"].to_pylist() == ["abc#", "x#y", "zz", "a#"]
    assert out["hour"].to_pylist() == [datetime.datetime(2026, 1, 1, 5)] * 4
    assert out["dur2"].to_pylist() == [1.5, 250.0, 50.0, 0.0]
    assert out["head"].to_pylist() == ["ab", "x#", "zz", "a#"]
    assert "status" not in out.column_names


def test_keep_keys(t):
    out = Statement("keep_keys", {"keys": ["role", "status"]})(t)
    assert out.column_names == ["role", "status"]


def test_extract_patterns(t):
    out = Statement("extract_patterns", {"src": "text", "pattern": r"(?P<alpha>[a-z]+)(?P<num>\d+)"})(t)
    assert out["alpha"].to_pylist() == ["abc", "x", None, "a"]
    assert out["num"].to_pylist() == ["123", "9", None, "1"]


def test_hash_matches_duckdb(t):
    import duckdb

    out = Statement("hash", {"target": "h", "src": "text"})(t)
    want = [duckdb.sql(f"select md5_number_lower('{s}')").fetchone()[0] for s in t["text"].to_pylist()]
    assert out["h"].to_pylist() == want


def test_filter_stage_modes(t):
    drop = FilterStage(("==", col("role"), "user"), mode="drop").fn(t)
    assert drop.num_rows == 3
    keep = FilterStage((">=", col("status"), 400), mode="keep").fn(t)
    assert keep.num_rows == 2


def test_error_mode_propagate():
    t = pa.table({"s": ["abc"]})
    stage = TransformStage(
        [{"editor": "cast", "args": {"target": "s", "to": "int64"}}], error_mode="propagate"
    )
    with pytest.raises(Exception):
        stage.fn(t)
    # ignore mode leaves batch unchanged
    stage2 = TransformStage(
        [{"editor": "cast", "args": {"target": "s", "to": "int64"}}], error_mode="ignore"
    )
    out = stage2.fn(t)
    assert out["s"].to_pylist() == ["abc"]


def test_unquote_and_sanitize_utf8():
    t = pa.table({"s": ['"hello"', "'s'", "plain", '"unbalanced', None]})
    out = Statement("unquote", {"target": "s"})(t)
    # strconv.Unquote semantics (round 4): single quotes only unquote
    # a single char; bare/unbalanced values are send-mode pass-through
    assert out["s"].to_pylist() == ["hello", "s", "plain", '"unbalanced', None]
    t2 = pa.table({"b": pa.array([b"ok", b"bad\xff", None], pa.binary())})
    out2 = Statement("sanitize_utf8", {"target": "clean", "src": "b"})(t2)
    vals = out2["clean"].to_pylist()
    assert vals[0] == "ok" and "�" in vals[1] and vals[2] is None
