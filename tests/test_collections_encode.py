"""OTTL collection + hash/encode editor cases, mirroring
pkg/ottl/ottlfuncs func_*_test.go and pkg/ottl/e2e/e2e_test.go."""

import base64
import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.transform import Statement, TransformStage


def _one(tbl: pa.Table, statements) -> pa.Table:
    stage = TransformStage(statements, error_mode="propagate")
    return stage.fn(tbl)


# ---------------------------------------------------------------- hashes

def test_hash_editors_match_stdlib():
    # e2e_test.go: SHA1/SHA256/SHA512/MD5 over attribute strings
    vals = ["pass123", "", "x" * 100, "unicode ✓"]
    t = pa.table({"v": vals})
    out = _one(t, [
        {"editor": "sha1", "args": {"target": "h1", "src": "v"}},
        {"editor": "sha256", "args": {"target": "h256", "src": "v"}},
        {"editor": "sha512", "args": {"target": "h512", "src": "v"}},
        {"editor": "md5_hex", "args": {"target": "hmd5", "src": "v"}},
    ])
    for col, href in [("h1", hashlib.sha1), ("h256", hashlib.sha256),
                      ("h512", hashlib.sha512), ("hmd5", hashlib.md5)]:
        assert out[col].to_pylist() == [href(s.encode()).hexdigest() for s in vals]


def test_base64_and_hex_editors():
    vals = ["hello", "", "a", "ab", "abc", "padding=="]
    t = pa.table({"v": vals})
    out = _one(t, [
        {"editor": "base64_encode", "args": {"target": "b64", "src": "v"}},
        {"editor": "hex_encode", "args": {"target": "hx", "src": "v"}},
    ])
    assert out["b64"].to_pylist() == [base64.b64encode(s.encode()).decode() for s in vals]
    assert out["hx"].to_pylist() == [s.encode().hex() for s in vals]
    out2 = _one(out, [{"editor": "base64_decode", "args": {"target": "raw", "src": "b64"}}])
    assert [bytes(x).decode() for x in out2["raw"].to_pylist()] == vals


def test_murmur3_editor_reference_vectors():
    # func_murmur3_hash_test.go: LE-hex of Sum32
    t = pa.table({"v": ["Hello World", ""]})
    out = _one(t, [{"editor": "murmur3", "args": {"target": "h", "src": "v"}}])
    assert out["h"].to_pylist() == ["ce837619", "00000000"]


def test_uuid_editor_format_and_uniqueness():
    t = pa.table({"v": ["a"] * 50})
    out = _one(t, [{"editor": "uuid", "args": {"target": "id"}}])
    ids = out["id"].to_pylist()
    pat = re.compile(r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")
    assert all(pat.fullmatch(i) for i in ids)
    assert len(set(ids)) == 50


# ------------------------------------------------------------ collections

def _list_tbl():
    return pa.table({
        "xs": pa.array([[3, 1, 2], [], [9], [5, 5, 4, 8]], pa.list_(pa.int64())),
        "ss": pa.array([["b", "a"], ["z"], [], ["d", "c", "e"]], pa.list_(pa.string())),
    })


def test_list_sort_asc_desc():
    # func_sort_test.go: asc / desc over int and string slices
    out = _one(_list_tbl(), [
        {"editor": "list_sort", "args": {"target": "xa", "src": "xs"}},
        {"editor": "list_sort", "args": {"target": "xd", "src": "xs", "order": "desc"}},
        {"editor": "list_sort", "args": {"target": "sa", "src": "ss"}},
    ])
    assert out["xa"].to_pylist() == [[1, 2, 3], [], [9], [4, 5, 5, 8]]
    assert out["xd"].to_pylist() == [[3, 2, 1], [], [9], [8, 5, 5, 4]]
    assert out["sa"].to_pylist() == [["a", "b"], ["z"], [], ["c", "d", "e"]]


def test_list_index_len_delete():
    # func_index_test.go / func_len_test.go / func_delete_index_test.go
    out = _one(_list_tbl(), [
        {"editor": "list_index", "args": {"target": "first", "src": "xs", "index": 0}},
        {"editor": "list_index", "args": {"target": "third", "src": "xs", "index": 2}},
        {"editor": "list_len", "args": {"target": "n", "src": "xs"}},
        {"editor": "delete_index", "args": {"target": "rest", "src": "xs", "index": 1}},
    ])
    assert out["first"].to_pylist() == [3, None, 9, 5]
    assert out["third"].to_pylist() == [2, None, None, 4]
    assert out["n"].to_pylist() == [3, 0, 1, 4]
    assert out["rest"].to_pylist() == [[3, 2], [], [9], [5, 4, 8]]


def test_list_filter_and_flatten():
    t = pa.table({
        "xs": pa.array([[3, 1, 2], [], [9], [5, 5, 4, 8]], pa.list_(pa.int64())),
        "nested": pa.array([[[1, 2], [3]], [[4]], [], [[], [5, 6]]],
                           pa.list_(pa.list_(pa.int64()))),
    })
    out = _one(t, [
        {"editor": "list_filter", "args": {"target": "big", "src": "xs", "op": ">=", "value": 3}},
        {"editor": "list_flatten_one", "args": {"target": "flat", "src": "nested"}},
    ])
    assert out["big"].to_pylist() == [[3], [], [9], [5, 5, 4, 8]]
    assert out["flat"].to_pylist() == [[1, 2, 3], [4], [], [5, 6]]


def test_keys_values_struct_and_map():
    # func_keys_test.go / func_values_test.go
    st = pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}],
                  pa.struct([("a", pa.int64()), ("b", pa.string())]))
    mp = pa.array([[("k1", 1), ("k2", 2)], [("k3", 3)]],
                  pa.map_(pa.string(), pa.int64()))
    t = pa.table({"st": st, "mp": mp})
    out = _one(t, [
        {"editor": "keys", "args": {"target": "sk", "src": "st"}},
        {"editor": "values", "args": {"target": "sv", "src": "st"}},
        {"editor": "keys", "args": {"target": "mk", "src": "mp"}},
        {"editor": "values", "args": {"target": "mv", "src": "mp"}},
    ])
    assert out["sk"].to_pylist() == [["a", "b"], ["a", "b"]]
    assert out["sv"].to_pylist() == [["1", "x"], ["2", "y"]]
    assert out["mk"].to_pylist() == [["k1", "k2"], ["k3"]]
    assert out["mv"].to_pylist() == [[1, 2], [3]]


def test_slice_to_map():
    # func_slice_to_map_test.go: slice of maps keyed by a field
    els = pa.array(
        [[{"name": "foo", "v": 1}, {"name": "bar", "v": 2}], [{"name": "baz", "v": 3}]],
        pa.list_(pa.struct([("name", pa.string()), ("v", pa.int64())])))
    out = _one(pa.table({"els": els}),
               [{"editor": "slice_to_map", "args": {"target": "m", "src": "els",
                                                    "key_field": "name"}}])
    got = out["m"].to_pylist()
    assert got[0] == [("foo", {"name": "foo", "v": 1}), ("bar", {"name": "bar", "v": 2})]
    assert got[1] == [("baz", {"name": "baz", "v": 3})]


def test_editors_compose_in_one_stage():
    # e2e-style chain: sort -> index -> hash of a list-derived value
    t = pa.table({"xs": pa.array([[3, 1, 2], [7, 6]], pa.list_(pa.int64()))})
    out = _one(t, [
        {"editor": "list_sort", "args": {"target": "xs", "src": "xs", "order": "desc"}},
        {"editor": "list_index", "args": {"target": "top", "src": "xs", "index": 0}},
        {"editor": "cast", "args": {"target": "top_s", "to": "str", "src": "top"}},
        {"editor": "sha256", "args": {"target": "h", "src": "top_s"}},
    ])
    assert out["top"].to_pylist() == [3, 7]
    assert out["h"].to_pylist() == [hashlib.sha256(b"3").hexdigest(),
                                    hashlib.sha256(b"7").hexdigest()]


def test_list_any_all_find():
    # OTTL Any/All/Find over list elements
    t = pa.table({"xs": pa.array([[3, 1, 2], [], [9], [5, 5]], pa.list_(pa.int64()))})
    out = _one(t, [
        {"editor": "list_any", "args": {"target": "any3", "src": "xs", "op": ">=", "value": 3}},
        {"editor": "list_all", "args": {"target": "all3", "src": "xs", "op": ">=", "value": 3}},
        {"editor": "list_find", "args": {"target": "f3", "src": "xs", "op": ">=", "value": 3}},
    ])
    assert out["any3"].to_pylist() == [True, False, True, True]
    assert out["all3"].to_pylist() == [False, True, True, True]  # empty = vacuous true
    assert out["f3"].to_pylist() == [3, None, 9, 5]
