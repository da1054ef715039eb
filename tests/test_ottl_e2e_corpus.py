"""Table-driven port of the reference OTTL e2e corpus
(pkg/ottl/e2e/e2e_test.go) through the TEXTUAL front-end: each case is
a statement string pasted verbatim from the corpus (minus the shapes
the columnar subset rejects, which raise OTTLParseError — see
test_unsupported_shapes_fail_loud), executed against a one-row table
mirroring constructLogTransformContext (e2e_test.go:2754-2822), with
the corpus's expected mutation asserted on the output."""

from datetime import datetime, timezone

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.ottl import (
    OTTLParseError,
    parse_statement,
    transform_from_ottl,
)


def base_table() -> pa.Table:
    # constructLogTransformContext: each attribute is a column
    return pa.table({
        "body": ["operationA"],
        "time": pa.array([datetime(2020, 2, 11, 20, 26, 12, 321000,
                                   tzinfo=timezone.utc)],
                         pa.timestamp("us", "UTC")),
        "http.method": ["get"],
        "http.path": ["/health"],
        "http.url": ["http://localhost/health"],
        "flags": ["A|B|C"],
        "total.string": ["123456789"],
        "encoding": ["base64"],
        "split_delimiter": ["|"],
        "val": ["val2"],
        "int_value": [0],
        "foo": pa.array([{"bar": "pass", "flags": "pass"}]),
        "things": pa.array([[{"name": "foo", "value": 2},
                             {"name": "bar", "value": 5}]]),
        "slice2": pa.array([["val", "foo", "bar", "baz"]]),
        "slices": pa.array([["slice1", "slice2", "name"]]),
        "padded": ["  get  "],
        "array": pa.array([["looong"]]),
        "values_int": pa.array([[1, 2, 3]]),
    })


def run1(statement: str, tbl: pa.Table | None = None) -> pa.Table:
    stage = transform_from_ottl([statement], error_mode="propagate")
    return stage.fn(tbl if tbl is not None else base_table())


def got(out: pa.Table, colname: str):
    return out[colname][0].as_py()


# (statement pasted from e2e_test.go, column to check, expected value)
SET_CASES = [
    # --- literals / paths ---
    ('set(attributes["test"], "pass")', "test", "pass"),
    ('set(attributes["test"], "nil")', "test", "nil"),
    ('set(attributes["test"], "pass") where body == "operationA"', "test", "pass"),
    ('set(attributes["test"], String(attributes["http.method"]))', "test", "get"),
    # --- hash / encode family ---
    ('set(attributes["test"], Base64Encode("pass"))', "test", "cGFzcw=="),
    ('set(attributes["test"], Base64Encode("data+values/items", "base64-url"))',
     "test", "ZGF0YSt2YWx1ZXMvaXRlbXM="),
    ('set(attributes["test"], Base64Decode("cGFzcw=="))', "test", "pass"),
    ('set(attributes["test"], Decode("cGFzcw==", "base64"))', "test", "pass"),
    ('set(attributes["test"], MD5("pass"))', "test",
     "1a1dc91c907325c69271ddf0c944bc72"),
    ('set(attributes["test"], SHA1("pass"))', "test",
     "9d4e1e23bd5b727046a9e3b4b7db57bd8d6ee684"),
    ('set(attributes["test"], SHA256("pass"))', "test",
     "d74ff0ee8da3b9806b18c877dbf29bbde50b5bd8e4dad7a3a725000feb82e8f1"),
    ('set(attributes["test"], SHA512("pass"))', "test",
     "5b722b307fce6c944905d132691d5e4a2214b7fe92b738920eb3fce3a90420a19511c3010a0e7712b054daef5b57bad59ecbd93b3280f210578f547f4aed4d25"),
    # func_murmur3_hash_test.go / func_murmur3_hash128_test.go vectors
    ('set(attributes["test"], Murmur3Hash("Hello World"))', "test", "ce837619"),
    ('set(attributes["test"], Murmur3Hash128("Hello World"))', "test",
     "dbc2a0c1ab26631a27b4c09fcf1fe683"),
    ('set(attributes["test"], Hex("12"))', "test", "3132"),
    # --- case / string family ---
    ('set(attributes["test"], Concat(["A","B"], ":"))', "test", "A:B"),
    ('set(attributes["test"], ConvertCase(attributes["http.method"], "upper"))',
     "test", "GET"),
    ('set(attributes["test"], ConvertCase("PASS", "lower"))', "test", "pass"),
    ('set(attributes["test"], ConvertCase("fooBar", "snake"))', "test", "foo_bar"),
    ('set(attributes["test"], ConvertCase("foo_bar", "camel"))', "test", "FooBar"),
    ('set(attributes["test"], ToCamelCase("foo_bar"))', "test", "FooBar"),
    ('set(attributes["test"], ToSnakeCase("fooBar"))', "test", "foo_bar"),
    ('set(attributes["test"], ToUpperCase(attributes["http.method"]))', "test", "GET"),
    ('set(attributes["test"], ToLowerCase("PASS"))', "test", "pass"),
    ('set(attributes["test"], Substring("pass", 0, 2))', "test", "pa"),
    ('set(attributes["test"], Split(attributes["flags"], "|"))', "test",
     ["A", "B", "C"]),
    ('set(attributes["test"], Format("%03d-%s", [7, "test"]))', "test", "007-test"),
    ('set(attributes["test"], ExtractPatterns("aa123bb", "(?P<numbers>\\\\d+)"))',
     "test", {"numbers": "123"}),
    ('set(attributes["indexof"], Index("opentelemetry", "telemetry"))',
     "indexof", 4),
    # --- cast family ---
    ('set(attributes["test"], Double(1.0))', "test", 1.0),
    ('set(attributes["test"], Double("1"))', "test", 1.0),
    ('set(attributes["test"], Double(true))', "test", 1.0),
    ('set(attributes["test"], Double(1))', "test", 1.0),
    ('set(attributes["test"], Int(1.0))', "test", 1),
    ('set(attributes["test"], Int("1"))', "test", 1),
    ('set(attributes["test"], Int(true))', "test", 1),
    ('set(attributes["test"], Int(1))', "test", 1),
    ('set(attributes["test"], String("test"))', "test", "test"),
    ('set(attributes["test"], String(true))', "test", "true"),
    # --- duration family ---
    ('set(attributes["test"], Hours(Duration("90m")))', "test", 1.5),
    ('set(attributes["test"], Microseconds(Duration("1ms")))', "test", 1000.0),
    ('set(attributes["test"], Milliseconds(Duration("1s")))', "test", 1000.0),
    ('set(attributes["test"], Minutes(Duration("1h")))', "test", 60.0),
    ('set(attributes["test"], Nanoseconds(Duration("1ms")))', "test", 1000000.0),
    ('set(attributes["test"], Seconds(Duration("1m")))', "test", 60.0),
    # --- misc converters ---
    ('set(attributes["test"], Log(1))', "test", 0.0),
    ('set(attributes["test"], IsValidLuhn("17893729974"))', "test", True),
    # --- XML family ---
    ('set(attributes["test"], ConvertAttributesToElementsXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>"))',
     "test", "<Log><Message>This is a log message!</Message><id>1</id></Log>"),
    ('set(body, ConvertTextToElementsXML("<a><b/>foo</a>"))', "body",
     "<a><b></b><value>foo</value></a>"),
    ('set(attributes["test"], GetXML("<a><b>1</b><c><b>2</b></c></a>", "/a//b"))',
     "test", "<b>1</b><b>2</b>"),
    ('set(attributes["test"], RemoveXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>", "/Log/Message"))',
     "test", '<Log id="1"></Log>'),
    ('set(attributes["test"], InsertXML("<a></a>", "/a", "<b></b>"))',
     "test", "<a><b></b></a>"),
    # --- Sort (literal fold) ---
    ('set(attributes["test"], Sort([3, 6, 9], "desc"))', "test", [9, 6, 3]),
    ('set(attributes["test"], Sort([true, false, false]))', "test",
     [False, False, True]),
    ('set(attributes["test"], Sort([Double(1.5), Double(10.2), Double(2.3), Double(0.5)]))',
     "test", [0.5, 1.5, 2.3, 10.2]),
    ('set(attributes["test"], Sort([Int(11), Double(2.2), Double(-1)]))',
     "test", [-1, 2.2, 11]),
    # --- map / struct converters over paths ---
    ('set(attributes["test"], Sort(Keys({"foo": "bar", "baz": "foo"})))',
     "test", ["baz", "foo"]),
    ('set(attributes["test"], ToKeyValueString(attributes["foo"]))', "test",
     "bar=pass flags=pass"),
    # --- Reduce (func_reduce.go through the lambda front-end) ---
    ('set(attributes["slice_sum"], Reduce([1, 2, 3], 0, (acc, _, v) => acc + Int(v)))',
     "slice_sum", 6),
    ('set(attributes["labels_str"], Reduce({"env": "prod"}, "", (acc, k, v) => Concat([acc, k, "=", String(v), ";"], "")))',
     "labels_str", "env=prod;"),
    ('set(attributes["total"], Reduce(attributes["values_int"], 0, (acc, _, v) => acc + Int(v)))',
     "total", 6),
    # --- Coalesce / ParseInt / Hex / Index ---
    ('set(attributes["test"], Coalesce([attributes["http.method"], attributes["http.path"], "fallback"]))',
     "test", "get"),
    ('set(attributes["test"], Coalesce([attributes["nonexistent"], attributes["http.method"], "fallback"]))',
     "test", "get"),
    ('set(attributes["test"], Coalesce([attributes["nonexistent"], attributes["also.missing"], "fallback"]))',
     "test", "fallback"),
    ('set(attributes["test"], ParseInt("0xAF", 0))', "test", 175),
    ('set(attributes["test"], ParseInt("12345", 10))', "test", 12345),
    ('set(attributes["test"], ParseInt("AF", 16))', "test", 175),
    ('set(attributes["test"], Hex(1.0))', "test", "3ff0000000000000"),
    ('set(attributes["test"], Hex(true))', "test", "01"),
    ('set(attributes["test"], Hex(12))', "test", "000000000000000c"),
    ('set(attributes["indexof"], Index(attributes["slices"], "name"))',
     "indexof", 2),
    ('set(attributes["indexof"], Index(attributes["slices"], "slice2"))',
     "indexof", 1),
    # --- ParseKeyValue / ParseJSON / ParseCSV / ToKeyValueString / Time ---
    ('set(attributes["test"], ParseKeyValue("k1=v1 k2=v2"))', "test",
     {"k1": "v1", "k2": "v2"}),
    ('set(attributes["test"], ParseKeyValue("k1!v1_k2!v2", "!", "_"))', "test",
     {"k1": "v1", "k2": "v2"}),
    ('set(attributes["test"], ParseKeyValue("k1!v1_k2!\\"v2__!__v2\\"", "!", "_"))',
     "test", {"k1": "v1", "k2": "v2__!__v2"}),
    ('set(attributes["test"], ParseJSON("{\\"id\\":1}"))', "test", {"id": 1}),
    ('set(attributes["test"], ParseJSON("[\\"value1\\",\\"value2\\"]"))', "test",
     ["value1", "value2"]),
    ('set(attributes["test"], ParseCSV("val1;val2;val3","header1|header2|header3",";","|","strict"))',
     "test", {"header1": "val1", "header2": "val2", "header3": "val3"}),
    ('set(attributes["test"], ParseCSV("val1,val2,val3","header1|header2|header3",headerDelimiter="|",mode="strict"))',
     "test", {"header1": "val1", "header2": "val2", "header3": "val3"}),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), "=", " ", true))',
     "test", "k1=v1 k2=v2"),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1:v1,k2:v2", ":" , ","), ":", ",", true))',
     "test", "k1:v1,k2:v2"),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), "!", "+", true))',
     "test", "k1!v1+k2!v2"),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2=v3"), "=", " ", true))',
     "test", 'k1=v1 k2="v2=v3"'),
    ('set(attributes["test"], Hour(Time("12", "%H")))', "test", 12),
    # --- literal map/list set values + Len over literals ---
    ('set(attributes["test"], {"list":[{"foo":"bar"}]})', "test",
     {"list": [{"foo": "bar"}]}),
    ('set(attributes["test"], Len([{"list":[{"foo":"bar"}]}, {"bar":"baz"}]))',
     "test", 2),
    # --- nested converters over paths (scratch-column chaining) ---
    ('set(attributes["test"], Sort(Split(attributes["flags"], "|"), "desc"))',
     "test", ["C", "B", "A"]),
    ('set(attributes["test"], Upper(Trim(attributes["padded"])))',
     "test", "GET"),
    ('set(attributes["test"], SHA256(ToUpperCase(attributes["http.method"])))',
     "test",
     "14e30cd163c732912e048c4c837e15c4e90c062ebb795ab947d57706e2d10dd8"),
    ('set(attributes["test"], Len(Split(attributes["flags"], "|")))',
     "test", 3),
    # --- Is* predicates in where-clauses ---
    ('set(attributes["test"], "pass") where IsBool(false)', "test", "pass"),
    ('set(attributes["test"], "pass") where IsDouble(1.0)', "test", "pass"),
    ('set(attributes["test"], "pass") where IsMap(attributes["foo"])',
     "test", "pass"),
    ('set(attributes["test"], "pass") where IsList(attributes["things"])',
     "test", "pass"),
    ('set(attributes["test"], "pass") where IsMatch("aa123bb", "\\\\d{3}")',
     "test", "pass"),
    ('set(attributes["test"], "pass") where IsString("")', "test", "pass"),
    ('set(attributes["test"], "pass") where IsEmpty("")', "test", "pass"),
    ('set(attributes["test"], "pass") where not IsEmpty(attributes["foo"])',
     "test", "pass"),
]


@pytest.mark.parametrize("statement,colname,expected", SET_CASES,
                         ids=[c[0][:60] for c in SET_CASES])
def test_corpus_set_statement(statement, colname, expected):
    out = run1(statement)
    assert got(out, colname) == expected


def test_corpus_sort_keys_literal_fold():
    # Sort(Keys({...})) folds entirely at compile time
    st = parse_statement('set(attributes["list"], Sort(Keys({"foo": "bar", "baz": "foo"})))')
    assert st.args["value"] == ["baz", "foo"]


# --- editor statements mutating the whole attribute set -------------

def test_corpus_delete_key():
    out = run1('delete_key(attributes, "http.method")')
    assert "http.method" not in out.column_names
    assert "http.path" in out.column_names


def test_corpus_delete_matching_keys():
    out = run1('delete_matching_keys(attributes, "^http")')
    assert not [c for c in out.column_names if c.startswith("http")]
    assert "flags" in out.column_names


def test_corpus_keep_matching_keys():
    out = run1('keep_matching_keys(attributes, "^http")')
    assert sorted(out.column_names) == ["http.method", "http.path", "http.url"]


def test_corpus_keep_keys():
    out = run1('keep_keys(attributes, ["flags", "total.string"])')
    assert sorted(out.column_names) == ["flags", "total.string"]


def test_corpus_truncate_all():
    out = run1("truncate_all(attributes, 100)")
    assert got(out, "total.string") == "123456789"  # limit=100: untouched
    out = run1("truncate_all(attributes, 1)")
    assert got(out, "total.string") == "1"
    assert got(out, "http.method") == "g"


def test_corpus_replace_match_and_patterns():
    out = run1('replace_match(attributes["http.path"], "*/*", "test")')
    assert got(out, "http.path") == "test"
    out = run1('replace_pattern(attributes["http.path"], "/", "@")')
    assert got(out, "http.path") == "@health"
    out = run1('replace_all_matches(attributes, "*/*", "test")')
    assert got(out, "http.path") == "test"
    assert got(out, "http.url") == "test"
    assert got(out, "http.method") == "get"  # no '/'


def test_corpus_useragent_literal():
    # `set(attributes["test"], UserAgent("curl/7.81.0"))`
    out = run1('set(attributes["test"], UserAgent("curl/7.81.0"))')
    v = got(out, "test")
    assert v["user_agent.original"] == "curl/7.81.0"
    assert v["user_agent.name"] == "curl"
    assert v["user_agent.version"] == "7.81.0"


def test_corpus_slice_to_map():
    # `set(attributes["test"], SliceToMap(attributes["things"], ["name"]))`
    out = run1('set(attributes["test"], SliceToMap(attributes["things"], ["name"]))')
    m = dict(got(out, "test"))
    assert m == {"foo": {"name": "foo", "value": 2},
                 "bar": {"name": "bar", "value": 5}}


def test_corpus_replace_pattern_with_hash_function():
    # `replace_pattern(attributes["http.path"], "/", "@", SHA256)` —
    # the Function hashes the expanded replacement per match
    import hashlib

    out = run1('replace_pattern(attributes["http.path"], "/", "@", SHA256)')
    assert got(out, "http.path") == hashlib.sha256(b"@").hexdigest() + "health"
    with pytest.raises(OTTLParseError):  # $-backref + Function: per-match
        parse_statement('replace_pattern(body, "(a)", "$1", SHA256)')


def test_corpus_merge_maps():
    # merge_maps(attributes, attributes["foo"], strategy) — the corpus
    # merges a nested map into the top-level one; columnar model:
    # two struct columns
    tbl = pa.table({
        "attributes": pa.array([{"http.method": "get", "flags": None}]),
        "foo": pa.array([{"bar": "pass", "flags": "pass"}]),
    })
    out = run1('merge_maps(attributes, foo, "insert")', tbl)
    assert got(out, "attributes") == {"http.method": "get", "flags": "pass",
                                      "bar": "pass"}
    out = run1('merge_maps(attributes, foo, "update")', tbl)
    assert got(out, "attributes") == {"http.method": "get", "flags": None}
    out = run1('merge_maps(attributes, foo, "upsert")', tbl)
    assert got(out, "attributes") == {"http.method": "get", "flags": "pass",
                                      "bar": "pass"}


def test_corpus_append():
    out = run1('append(attributes["array"], "sample_value")')
    assert got(out, "array") == ["looong", "sample_value"]


def test_corpus_delete_index():
    out = run1('delete_index(attributes["slice2"], 0)')
    assert got(out, "slice2") == ["foo", "bar", "baz"]


def test_corpus_time_truncate_and_format():
    out = run1('set(time, TruncateTime(time, Duration("1s")))')
    assert got(out, "time").microsecond == 0
    out = run1('set(attributes["time"], FormatTime(time, "%Y-%m-%d"))')
    assert got(out, "time") == "2020-02-11"


def test_corpus_where_unix_converters():
    # where UnixMicro(time) > 0 etc gate on the timestamp column
    for conv in ("UnixMicro", "UnixMilli", "UnixNano", "UnixSeconds"):
        out = run1(f'set(attributes["test"], "pass") where {conv}(time) > 0')
        assert got(out, "test") == "pass", conv


def test_corpus_xxh_vectors():
    # func_xxh3.go / func_xxh128.go: hex of the big-endian digest;
    # pinned against the system libxxhash in tests/test_xxh_hashes.py
    out = run1('set(attributes["test"], XXH3(body))')
    assert got(out, "test") == "e482c2e5a62c3cdf"  # XXH3("operationA")
    out = run1('set(attributes["test"], XXH128(body))')
    assert got(out, "test") == "77e70e155a37ea73f2a881ffc51a7e8e"


def test_nested_string_paths():
    # reads resolve through struct columns; writes create the flat
    # dotted column, which subsequent reads find by exact-name priority
    tbl = pa.table({"foo": pa.array([{"bar": "pass",
                                      "nested": {"test": "pass"},
                                      "slice": ["val"]}])})
    out = parse_statement('set(attributes["test"], attributes["foo"]["bar"])')(tbl)
    assert got(out, "test") == "pass"
    out = parse_statement(
        'set(attributes["test"], attributes["foo"]["nested"]["test"])')(tbl)
    assert got(out, "test") == "pass"
    out = parse_statement('set(attributes["foo"]["test"], "pass")')(tbl)
    assert got(out, "foo.test") == "pass"
    out = parse_statement(
        'set(attributes["test"], "pass") where IsList(attributes["foo"]["slice"])')(tbl)
    assert got(out, "test") == "pass"
    out = parse_statement(
        'set(attributes["test"], Len(attributes["foo"]["slice"]))')(tbl)
    assert got(out, "test") == 1


def test_unsupported_shapes_fail_loud():
    # corpus shapes the columnar subset rejects must raise, not mis-run
    for bad in [
        'set(attributes["array"][0.0], "bar")',     # float index
        'set(attributes["things"][1], "x")',        # integer index
        'set(attributes[attributes["flags"]], "x")',  # dynamic key
    ]:
        with pytest.raises(OTTLParseError):
            parse_statement(bad)
