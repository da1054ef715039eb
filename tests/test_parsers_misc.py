"""Unit tests for the kv/csv/uri/trace/json parser stages and the
severity mapper (table-driven, mirroring the reference's per-operator
test style, pkg/stanza/operator/parser/*/parser_test.go)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.functions.severity import (
    SEVERITY_NUMBER,
    SeverityMapper,
    http_status_severity,
)
from opentelemetry_collector_contrib_ray.stages.parse import (
    CsvParser,
    JsonParser,
    KeyValueParser,
    TraceParser,
    UriParser,
)


def test_severity_default_tokens():
    m = SeverityMapper()
    toks = pa.array(["info", "WARN", "err", "warning3", "17", "nope", None])
    nums = m.map_tokens(toks).to_pylist()
    assert nums == [9, 13, 17, 15, 17, 0, 0]


def test_severity_http_ranges():
    m = http_status_severity()
    nums = m.map_ints(pa.array([200, 299, 301, 404, 500, 599, 700])).to_pylist()
    assert nums == [9, 9, 10, 13, 17, 17, 0]


def test_severity_text_roundtrip():
    nums = pa.array(list(range(25)), pa.int8())
    texts = SeverityMapper.number_to_text(nums).to_pylist()
    assert texts[0] == "DEFAULT" and texts[9] == "INFO" and texts[24] == "FATAL4"
    assert all(SEVERITY_NUMBER[t] == i for i, t in enumerate(texts))


def test_kv_parser_drop():
    t = pa.table({"s": ["a=1 b=2", "none", "b=9"]})
    out = KeyValueParser("s", {"a": "int64", "b": "int64"}, on_error="drop").fn(t)
    assert out.num_rows == 2  # row without ANY requested key dropped
    assert out["a"].to_pylist() == [1, None]


def test_csv_parser_short_rows():
    t = pa.table({"s": ["a,b,c", "x", None]})
    out = CsvParser("s", ["f1", "f2", "f3"], on_error="drop").fn(t)
    assert out.num_rows == 1
    out2 = CsvParser("s", ["f1", "f2", "f3"], on_error="send").fn(t)
    assert out2.num_rows == 3
    assert out2["f2"].to_pylist() == ["b", "", ""]


def test_uri_parser():
    t = pa.table({"u": ["http://h:80/p?q=1", "nope"]})
    out = UriParser("u").fn(t)
    assert out["scheme"].to_pylist() == ["http", None]
    assert out["port"].to_pylist() == ["80", None]


def test_trace_parser_widths():
    t = pa.table({"tid": ["ab" * 16, "ab" * 8, "zz", None]})
    out = TraceParser(trace_col="tid").fn(t)
    vals = out["trace_id"].to_pylist()
    assert vals[0] is not None and vals[1] is None and vals[2] is None and vals[3] is None


def test_json_parser_errors():
    t = pa.table({"j": ['{"k": 5}', "notjson", None, '{"other": 1}']})
    send = JsonParser("j", {"k": "int64"}, on_error="send").fn(t)
    assert send["k"].to_pylist() == [5, None, None, None]
    drop = JsonParser("j", {"k": "int64"}, on_error="drop").fn(t)
    assert drop.num_rows == 2  # valid JSON rows kept (key may be absent)


def test_jsonarray_parser():
    from opentelemetry_collector_contrib_ray.stages.parse import JsonArrayParser

    t = pa.table({"j": ['[1, "x", 2.5]', "[7]", "notjson", None]})
    p = JsonArrayParser("j", [("a", "int64"), ("b", "string"), ("c", "float64")])
    out = p.fn(t)
    assert out["a"].to_pylist() == [1, 7, None, None]
    assert out["b"].to_pylist() == ["x", None, None, None]
    drop = JsonArrayParser("j", [("a", "int64")], on_error="drop").fn(t)
    assert drop.num_rows == 2


def test_flatten_struct_editor():
    from opentelemetry_collector_contrib_ray.stages.transform import Statement

    s = pa.array([{"x": 1, "y": "a"}, {"x": 2, "y": "b"}])
    t = pa.table({"id": [10, 11], "nested": s})
    out = Statement("flatten", {"src": "nested"})(t)
    assert out.column_names == ["id", "x", "y"]
    assert out["x"].to_pylist() == [1, 2]


def test_key_value_parser_quoted_values():
    # parseutils quoting: double-quoted values keep embedded
    # spaces/delimiters, quotes dropped
    from opentelemetry_collector_contrib_ray.stages.parse import KeyValueParser

    t = pa.table({"raw": ['k1=v1 k2="v2 with space" n=5',
                          'k2="x=y" k1=plain n="7"',
                          'k1=a', None]})
    out = KeyValueParser("raw", {"k1": "string", "k2": "string",
                                 "n": "int64"}).fn(t)
    assert out["k1"].to_pylist() == ["v1", "plain", "a", None]
    assert out["k2"].to_pylist() == ["v2 with space", "x=y", None, None]
    assert out["n"].to_pylist() == [5, 7, None, None]


def test_rawtext_encodings_round_trip(ray_session, tmp_path):
    # filelog `encoding:` (internal/coreinternal/textutils/encoding.go)
    # — the same log content written as utf-16 and latin-1 round-trips
    # to identical line tables
    import pytest

    from opentelemetry_collector_contrib_ray.sources.rawtext import (
        lookup_encoding,
        read_log_lines,
        read_multiline_entries,
    )

    lines = ["2024-01-01 INFO héllo wörld", "    ... continuation £1",
             "2024-01-02 ERROR boom"]
    content = "\n".join(lines) + "\n"
    p8 = tmp_path / "log_utf8.log"
    p16 = tmp_path / "log_utf16.log"
    pl1 = tmp_path / "log_latin1.log"
    p8.write_bytes(content.encode("utf-8"))
    p16.write_bytes(content.encode("utf-16-le"))
    pl1.write_bytes(content.encode("latin-1"))

    def rows(path, enc):
        ds = read_log_lines([str(path)], encoding=enc)
        return [r["line"] for r in
                sorted(ds.take_all(), key=lambda r: r["line_no"])]

    assert rows(p8, "utf-8") == lines
    assert rows(p16, "utf-16") == lines
    assert rows(pl1, "latin-1") == lines
    # multiline join honors the decode too
    ds = read_multiline_entries([str(p16)], is_first_regex=r"^\d{4}-",
                                encoding="utf16")
    ents = sorted((r["line"] for r in ds.take_all()))
    assert ents == ["2024-01-01 INFO héllo wörld\n    ... continuation £1",
                    "2024-01-02 ERROR boom"]
    # unknown encodings fail loud like LookupEncoding
    with pytest.raises(ValueError):
        lookup_encoding("definitely-not-a-charset")
    assert lookup_encoding("nop") == "latin-1"  # byte passthrough
