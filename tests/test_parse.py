"""Composite parse stage vs a row-at-a-time pure-Python oracle.

Table-driven, mirroring the reference's operator unit-test style
(pkg/stanza/operator/parser/regex/parser_test.go)."""

import re
from datetime import datetime

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.functions.severity import default_token_map
from opentelemetry_collector_contrib_ray.schema import TEXT_REGEX
from opentelemetry_collector_contrib_ray.sources.transcripts import generate_transcripts
from opentelemetry_collector_contrib_ray.stages.parse import RegexParser, TranscriptParser

ORACLE_RE = re.compile(TEXT_REGEX)


def oracle_parse_row(text):
    m = ORACLE_RE.match(text)
    if m is None:
        return None
    d = m.groupdict()
    d["status"] = int(d["status"])
    d["dur"] = float(d["dur"])
    d["event_ts"] = datetime.strptime(d["time"], "%Y-%m-%d %H:%M:%S")
    tm = default_token_map()
    d["severity_number"] = tm.get(d["level"].lower(), 0)
    s = d["status"]
    d["http_severity_number"] = 9 if s < 300 else 10 if s < 400 else 13 if s < 500 else 17
    return d


@pytest.fixture(scope="module")
def table():
    return generate_transcripts(4000)


def test_send_keeps_all_rows(table):
    out = TranscriptParser(on_error="send").fn(table)
    assert out.num_rows == table.num_rows
    # unparsed rows keep original text, null extracted fields
    bad = out.filter(pa.compute.is_null(out["level"]))
    assert bad.num_rows > 0
    assert all(t is not None for t in bad["text"].to_pylist())


def test_drop_removes_only_malformed(table):
    out = TranscriptParser(on_error="drop").fn(table)
    expected = sum(1 for t in table["text"].to_pylist() if ORACLE_RE.match(t))
    assert out.num_rows == expected


def test_parse_matches_oracle_rowwise(table):
    out = TranscriptParser(on_error="send").fn(table).to_pylist()
    for row in out[:500]:
        o = oracle_parse_row(row["text"])
        if o is None:
            assert row["level"] is None and row["status"] is None
            continue
        for k in ["level", "actor", "tool_tag", "payload"]:
            assert row[k] == o[k], k
        assert row["status"] == o["status"]
        assert row["dur"] == o["dur"]
        assert row["event_ts"] == o["event_ts"]
        assert row["severity_number"] == o["severity_number"]
        assert row["http_severity_number"] == o["http_severity_number"]


def test_event_ts_roundtrips_ts(table):
    out = TranscriptParser(on_error="drop").fn(table)
    assert out["event_ts"].to_pylist() == out["ts"].to_pylist()


def test_regex_parser_generic(table):
    p = RegexParser(regex=r"^(?P<level>[A-Z]+) ", on_error="drop")
    out = p.fn(table)
    assert set(out["level"].to_pylist()) <= {"TRACE", "DEBUG", "INFO", "WARN", "ERROR"}


def test_parse_on_ray_dataset(table):
    ds = ray.data.from_arrow(table)
    out = TranscriptParser(on_error="drop").apply(ds)
    assert out.count() == TranscriptParser(on_error="drop").fn(table).num_rows
