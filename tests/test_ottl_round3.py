"""Round-3 OTTL function breadth: case conversion, prefix/suffix,
time extraction, unix converters, duration, luhn, CIDR, user-agent,
key-value string, limit, append, format — engine vs row oracles."""

import math
from datetime import datetime

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.ottl import parse_statement
from opentelemetry_collector_contrib_ray.stages.transform import Statement


def run(editor, args, tbl):
    return Statement(editor, args)(tbl)


def col(tbl, name):
    return tbl[name].to_pylist()


def test_convert_case():
    t = pa.table({"s": ["XMLHttpRequest", "already_snake", "with space",
                        "kebab-case", None]})
    out = run("convert_case", {"target": "o", "src": "s", "case": "snake"}, t)
    assert col(out, "o") == ["xml_http_request", "already_snake",
                             "with_space", "kebab_case", None]
    out = run("convert_case", {"target": "o", "src": "s", "case": "camel"}, t)
    assert col(out, "o")[1] == "AlreadySnake"
    assert col(out, "o")[4] is None
    out = run("convert_case", {"target": "o", "src": "s", "case": "upper"}, t)
    assert col(out, "o")[1] == "ALREADY_SNAKE"


def test_prefix_suffix_ops():
    t = pa.table({"s": ["foo.bar", "bar.foo", "foo", None]})
    out = run("trim_prefix", {"target": "o", "src": "s", "prefix": "foo."}, t)
    assert col(out, "o") == ["bar", "bar.foo", "foo", None]
    out = run("trim_suffix", {"target": "o", "src": "s", "suffix": ".foo"}, t)
    assert col(out, "o") == ["foo.bar", "bar", "foo", None]
    out = run("has_prefix", {"target": "o", "src": "s", "prefix": "foo"}, t)
    assert col(out, "o") == [True, False, True, None]
    out = run("has_suffix", {"target": "o", "src": "s", "suffix": "foo"}, t)
    assert col(out, "o") == [False, True, True, None]


def test_time_extract_and_unix():
    ts = [datetime(2024, 3, 15, 10, 30, 45), datetime(1999, 12, 31, 23, 59, 59)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    for part, exp in [("year", [2024, 1999]), ("month", [3, 12]),
                      ("day", [15, 31]), ("hour", [10, 23]),
                      ("minute", [30, 59]), ("second", [45, 59])]:
        out = run("time_extract", {"target": "o", "src": "ts", "part": part}, t)
        assert col(out, "o") == exp, part
    out = run("time_extract", {"target": "o", "src": "ts", "part": "weekday"}, t)
    # Go time.Weekday: Sunday=0; python weekday(): Monday=0
    assert col(out, "o") == [(d.weekday() + 1) % 7 for d in ts]
    out = run("unix", {"target": "o", "src": "ts", "unit": "seconds"}, t)
    import calendar
    assert col(out, "o") == [calendar.timegm(d.timetuple()) for d in ts]
    out = run("unix", {"target": "o", "src": "ts", "unit": "milliseconds"}, t)
    assert col(out, "o") == [calendar.timegm(d.timetuple()) * 1000 for d in ts]


def test_duration():
    t = pa.table({"d": ["1h2m3s", "300ms", "1.5h", "90s", "10us", "bogus", None]})
    out = run("duration", {"target": "o", "src": "d"}, t)
    got = col(out, "o")
    exp = [3723.0, 0.3, 5400.0, 90.0, 1e-5, None, None]
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e)


def test_log():
    t = pa.table({"v": [math.e, 1.0, 0.0, -5.0, None]})
    out = run("log", {"target": "o", "src": "v"}, t)
    got = col(out, "o")
    assert got[0] == pytest.approx(1.0) and got[1] == 0.0
    assert got[2] is None and got[3] is None and got[4] is None


def test_is_valid_luhn():
    t = pa.table({"c": ["79927398713", "4539578763621486",
                        "79927398710", "abc", "", None]})
    out = run("is_valid_luhn", {"target": "o", "src": "c"}, t)
    assert col(out, "o") == [True, True, False, False, False, None]


def test_is_in_cidr():
    t = pa.table({"ip": ["10.1.2.3", "11.0.0.1", "10.255.255.255",
                         "999.1.1.1", "nope", None]})
    out = run("is_in_cidr", {"target": "o", "src": "ip", "cidr": "10.0.0.0/8"}, t)
    # unparseable addresses are FALSE like the reference
    # (func_is_in_cidr_test.go "non IP string"); null input stays null
    assert col(out, "o") == [True, False, True, False, False, None]


UAS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/16.1 Safari/605.1.15",
    "curl/8.4.0",
    "weird-client/1.0",
]


def test_useragent():
    t = pa.table({"ua": UAS})
    out = run("useragent", {"src": "ua"}, t)
    # round 4: the generic product/version fallback names
    # "weird-client/1.0" like ua-parser (was "Other"); versions
    # truncate to major.minor.patch
    assert col(out, "user_agent.name") == \
        ["Chrome", "Firefox", "Safari", "curl", "weird-client"]
    assert col(out, "user_agent.version")[:4] == \
        ["120.0.0", "115.0", "16.1", "8.4.0"]
    assert col(out, "user_agent.os") == \
        ["Windows", "Linux", "macOS", "Other", "Other"]


def test_to_key_value_string_limit_map_keys():
    t = pa.table({"m": pa.array([{"a": "1", "b": "x"}, {"a": None, "b": "y"}],
                                pa.struct([("a", pa.string()), ("b", pa.string())]))})
    out = run("to_key_value_string", {"target": "o", "src": "m"}, t)
    assert col(out, "o") == ["a=1 b=x", "a= b=y"]
    out = run("limit", {"src": "m", "max_keys": 1, "priority_keys": ["b"]}, t)
    assert [list(r) for r in col(out, "m")] == [["b"], ["b"]]
    out = run("map_keys", {"src": "m", "case": "upper"}, t)
    assert list(col(out, "m")[0]) == ["A", "B"]


def test_append_and_contains_value():
    t = pa.table({"l": pa.array([[1, 2], [], [7]], pa.list_(pa.int64())),
                  "x": pa.array([10, 20, 30], pa.int64())})
    out = run("append", {"target": "l", "value": 9}, t)
    assert col(out, "l") == [[1, 2, 9], [9], [7, 9]]
    from opentelemetry_collector_contrib_ray.expr import col as C
    out = run("append", {"target": "l", "value": C("x")}, t)
    assert col(out, "l") == [[1, 2, 10], [20], [7, 30]]
    out = run("contains_value", {"target": "o", "src": "l", "value": 7}, t)
    assert col(out, "o") == [False, False, True]


def test_format():
    from opentelemetry_collector_contrib_ray.expr import col as C
    t = pa.table({"name": ["a", "b"], "n": pa.array([1, 2], pa.int64())})
    out = run("format", {"target": "o", "fmt": "ev:%s #%d!",
                         "args": [C("name"), C("n")]}, t)
    assert col(out, "o") == ["ev:a #1!", "ev:b #2!"]


def test_replace_match_glob():
    t = pa.table({"s": ["hello world", "hello there", "bye", None]})
    out = run("replace_match", {"target": "s", "pattern": "hello*",
                                "replacement": "greeting"}, t)
    assert col(out, "s") == ["greeting", "greeting", "bye", None]
    t2 = pa.table({"a": ["x1", "y2"], "b": ["x3", "zz"],
                   "n": pa.array([1, 2], pa.int64())})
    out = run("replace_all_matches", {"pattern": "x?",
                                      "replacement": "R", "keys": None}, t2)
    assert col(out, "a") == ["R", "y2"]
    assert col(out, "b") == ["R", "zz"]
    assert col(out, "n") == [1, 2]  # non-string untouched


def test_duration_units():
    t = pa.table({"d": ["90m", "2h", "1500ms"]})
    out = run("duration", {"target": "o", "src": "d", "unit": "hours"}, t)
    assert col(out, "o") == pytest.approx([1.5, 2.0, 1500 / 3.6e6])
    out = run("duration", {"target": "o", "src": "d", "unit": "milliseconds"}, t)
    assert col(out, "o") == pytest.approx([90 * 60e3, 2 * 3600e3, 1500.0])


def test_parse_simplified_xml():
    t = pa.table({"x": ["<order><id>123</id><qty>4</qty></order>",
                        "not xml", None]})
    out = run("parse_simplified_xml", {"target": "o", "src": "x"}, t)
    got = col(out, "o")
    import json
    assert json.loads(got[0]) == {"order": {"id": "123", "qty": "4"}}
    assert got[1] is None and got[2] is None


def test_uuid7_deterministic_and_sortable():
    import uuid as _uuid

    ts = [datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 0, 0, 1),
          datetime(2024, 6, 1)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "k": ["a", "b", "c"]})
    out1 = run("uuid7", {"target": "o", "src": "ts", "entropy_cols": ["k"]}, t)
    out2 = run("uuid7", {"target": "o", "src": "ts", "entropy_cols": ["k"]}, t)
    got = col(out1, "o")
    assert got == col(out2, "o")  # deterministic
    for g in got:
        u = _uuid.UUID(g)
        assert u.version == 7 and u.variant == _uuid.RFC_4122
    assert got == sorted(got)  # time-ordered prefix sorts
    # ms prefix encodes the timestamp
    ms = int(ts[0].timestamp() * 1000)
    assert got[0].replace("-", "")[:12] == f"{ms:012x}"


def test_list_map_and_stringify():
    t = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64())),
                  "s": pa.array([["a", "b"], ["c"]], pa.list_(pa.string())),
                  "n": pa.array([7, 8], pa.int64()),
                  "txt": ["x", "y"]})
    out = run("list_map", {"target": "l", "src": "l", "op": "mul",
                           "operand": 10}, t)
    assert col(out, "l") == [[10, 20], [30]]
    out = run("list_map", {"target": "s", "src": "s", "op": "upper"}, t)
    assert col(out, "s") == [["A", "B"], ["C"]]
    out = run("stringify_all", {"keys": None}, t)
    assert col(out, "n") == ["7", "8"]
    assert col(out, "txt") == ["x", "y"]  # strings untouched
    # nested values render as compact JSON (e2e corpus stringify_all)
    assert col(out, "l") == ["[1,2]", "[3]"]


def test_xml_edit_family():
    doc = "<a><b>1</b><c><b>2</b></c><d>x</d></a>"
    t = pa.table({"x": [doc, "bad<", None]})
    out = run("get_xml", {"target": "o", "src": "x", "xpath": ".//b"}, t)
    assert col(out, "o")[0] == "<b>1</b><b>2</b>"
    assert col(out, "o")[1] is None and col(out, "o")[2] is None
    out = run("remove_xml", {"target": "o", "src": "x", "xpath": ".//b"}, t)
    assert "<b>" not in col(out, "o")[0] and "<d>x</d>" in col(out, "o")[0]
    out = run("insert_xml", {"target": "o", "src": "x", "xpath": "d",
                             "sub_document": "<e>9</e>"}, t)
    assert "<d>x<e>9</e></d>" in col(out, "o")[0]


def test_decode():
    t = pa.table({"h": ["68656c6c6f", "6F6B", "xyz", "abc", None],
                  "b": ["aGVsbG8=", "b2s=", "", None, "b2s="]})
    out = run("decode", {"target": "o", "src": "h", "encoding": "hex"}, t)
    assert col(out, "o") == ["hello", "ok", None, None, None]
    out = run("decode", {"target": "o", "src": "b", "encoding": "base64"}, t)
    assert col(out, "o")[:2] == ["hello", "ok"]


def test_community_id():
    import base64 as b64
    import hashlib
    import struct

    rows = [("1.2.3.4", 1122, "3.4.5.6", 3344),
            ("3.4.5.6", 3344, "1.2.3.4", 1122),   # swapped -> same id
            ("10.0.0.1", 80, "10.0.0.1", 9),      # equal ips, port order
            ("bad", 1, "1.2.3.4", 2),             # invalid ip -> null
            ("1.2.3.4", 70000, "5.6.7.8", 1)]     # bad port -> null

    def ref(sip, sp, dip, dp, proto=6, seed=0):
        a = bytes(map(int, sip.split("."))), sp
        b = bytes(map(int, dip.split("."))), dp
        if a[0] > b[0] or (a[0] == b[0] and a[1] > b[1]):
            a, b = b, a
        t = struct.pack(">H", seed) + a[0] + b[0] + bytes([proto, 0]) + \
            struct.pack(">HH", a[1], b[1])
        return "1:" + b64.b64encode(hashlib.sha1(t).digest()).decode()

    t = pa.table({"sip": [r[0] for r in rows],
                  "sp": pa.array([r[1] for r in rows], pa.int64()),
                  "dip": [r[2] for r in rows],
                  "dp": pa.array([r[3] for r in rows], pa.int64())})
    out = run("community_id", {"target": "o", "src_ip": "sip",
                               "src_port": "sp", "dst_ip": "dip",
                               "dst_port": "dp"}, t)
    got = col(out, "o")
    assert got[0] == ref(*rows[0]) and got[1] == ref(*rows[1])
    assert got[0] == got[1]  # direction-invariant
    assert got[2] == ref(*rows[2])
    assert got[3] is None and got[4] is None


def test_textual_ottl_round3():
    t = pa.table({"s": ["FooBar"], "d": ["2m"],
                  "ts": pa.array([datetime(2024, 1, 2, 3, 4, 5)], pa.timestamp("us")),
                  "card": ["79927398713"]})
    cases = [
        ('set(snake, ConvertCase(s, "snake"))', "snake", "foo_bar"),
        ('set(secs, Duration(d))', "secs", 120.0),
        ('set(y, Year(ts))', "y", 2024),
        ('set(u, UnixSeconds(ts))', "u", 1704164645),
        ('set(ok, IsValidLuhn(card))', "ok", True),
        ('set(pre, TrimPrefix(s, "Foo"))', "pre", "Bar"),
        ('set(hrs, Hours(d))', "hrs", 2 / 60.0),
        ('replace_match(s, "Foo*", "matched")', "s", "matched"),
        ('set(f, Format("%s/%d", [s, y]))', "f", None),  # uses y from prior
    ]
    for stmt_text, out_col, want in cases[:-1]:
        t = parse_statement(stmt_text)(t)
        assert t[out_col][0].as_py() == want, stmt_text
    t = parse_statement(cases[-1][0])(t)
    assert t["f"][0].as_py() == "matched/2024"
