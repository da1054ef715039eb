"""Textual OTTL statement parsing — statement strings from the
reference's e2e corpus (pkg/ottl/e2e/e2e_test.go) compiled and
EXECUTED against a table."""

import hashlib

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.ottl import (
    OTTLParseError,
    parse_statement,
    transform_from_ottl,
)


def _tbl():
    return pa.table({
        "body": ["operationA", "operationB", "something else"],
        "http.method": ["get", "post", "get"],
        "http.path": ["/health", "/api", "/"],
        "flags": ["A|B|C", "C|D", None],
        "total.string": ["123456789", "345678", "1"],
        "user": ["alice", "bob", "carol"],
    })


def _run(statements, tbl=None):
    stage = transform_from_ottl(statements, error_mode="propagate")
    return stage.fn(tbl if tbl is not None else _tbl())


def test_set_literal_with_where():
    # e2e: set(attributes["test"], "pass") where body == "operationA"
    out = _run(['set(attributes["test"], "pass") where body == "operationA"'])
    assert out["test"].to_pylist() == ["pass", None, None]


def test_set_from_path_and_nil_where():
    out = _run(['set(attributes["dup"], attributes["http.method"]) where flags != nil'])
    assert out["dup"].to_pylist() == ["get", "post", None]


def test_delete_and_matching_keys():
    # e2e: delete_key(attributes, "http.method") / delete_matching_keys / keep_matching_keys
    out = _run(['delete_key(attributes, "http.method")'])
    assert "http.method" not in out.column_names
    out2 = _run(['delete_matching_keys(attributes, "^http")'])
    assert [c for c in out2.column_names if c.startswith("http")] == []
    out3 = _run(['keep_matching_keys(attributes, "^http")'])
    assert sorted(out3.column_names) == ["http.method", "http.path"]


def test_keep_keys_and_truncate_all():
    out = _run(['keep_keys(attributes, ["body", "total.string"])',
                'truncate_all(attributes, 4)'])
    assert sorted(out.column_names) == ["body", "total.string"]
    assert out["total.string"].to_pylist() == ["1234", "3456", "1"]


def test_converters_in_set():
    out = _run([
        'set(attributes["up"], Upper(attributes["http.method"]))',
        'set(attributes["sha"], SHA256(attributes["user"]))',
        'set(attributes["mur"], Murmur3Hash(attributes["user"]))',
        'set(attributes["b64"], Base64Encode(attributes["user"]))',
    ])
    assert out["up"].to_pylist() == ["GET", "POST", "GET"]
    assert out["sha"].to_pylist()[0] == hashlib.sha256(b"alice").hexdigest()
    assert len(out["mur"].to_pylist()[0]) == 8
    assert out["b64"].to_pylist()[1] == "Ym9i"


def test_replace_pattern_and_ismatch_where():
    # e2e-style: replace_pattern + IsMatch condition
    out = _run(['replace_pattern(attributes["http.path"], "^/api", "/v2") '
                'where IsMatch(body, "^operation")'])
    assert out["http.path"].to_pylist() == ["/health", "/v2", "/"]


def test_compound_where():
    out = _run(['set(attributes["t"], 1) where '
                'body == "operationA" or (flags != nil and http.method == "post")'])
    assert out["t"].to_pylist() == [1, 1, None]


def test_via_dataset():
    ds = ray.data.from_arrow(_tbl())
    out = transform_from_ottl(
        ['set(attributes["test"], "pass") where body == "operationA"']
    ).apply(ds).to_pandas()
    assert out["test"].tolist() == ["pass", None, None]


def test_unsupported_syntax_fails_loud():
    with pytest.raises(OTTLParseError):
        parse_statement('set(attributes["a"][0], "pass")')  # integer index
    with pytest.raises(OTTLParseError):
        parse_statement('set(attributes["x"], UnknownConverter(body))')
    with pytest.raises(OTTLParseError):
        parse_statement('definitely not ottl')


def test_pipeline_from_yaml_stanza_chain():
    """A stanza-style operators: YAML wires a real chain (regex parse
    -> textual-OTTL transform -> filter-free) and runs on a Dataset."""
    from opentelemetry_collector_contrib_ray.pipelines.config import pipeline_from_yaml

    yaml_text = """
operators:
  - type: regex_parser
    regex: '^(?P<level>[A-Z]+) (?P<msg>.*)$'
    parse_from: line
    on_error: drop
  - type: transform
    statements:
      - 'set(attributes["msg_upper"], Upper(attributes["msg"])) where level == "ERROR"'
      - 'set(attributes["sev"], 17) where level == "ERROR"'
"""
    pipe = pipeline_from_yaml(yaml_text)
    ds = ray.data.from_arrow(pa.table({
        "line": ["ERROR disk full", "INFO all fine", "not a log line"]}))
    out = pipe(ds).to_pandas().sort_values("line").reset_index(drop=True)
    assert len(out) == 2  # on_error drop removed the garbage line
    err = out[out["level"] == "ERROR"].iloc[0]
    assert err["msg_upper"] == "DISK FULL" and err["sev"] == 17
    info = out[out["level"] == "INFO"].iloc[0]
    assert pd.isna(info["msg_upper"]) and pd.isna(info["sev"])  # where skipped


def test_pipeline_from_yaml_unknown_type():
    from opentelemetry_collector_contrib_ray.pipelines.config import pipeline_from_yaml

    with pytest.raises(ValueError, match="unknown operator types"):
        pipeline_from_yaml("operators:\n  - type: not_a_real_operator\n")


def test_filter_from_ottl_conditions():
    from opentelemetry_collector_contrib_ray.ottl import filter_from_ottl

    stage = filter_from_ottl(['body == "operationA"', 'IsMatch(user, "^b")'])
    out = stage.fn(_tbl())
    # rows matching ANY condition dropped: operationA (row0), bob (row1)
    assert out["user"].to_pylist() == ["carol"]


def test_router_yaml_with_expr_strings():
    from opentelemetry_collector_contrib_ray.pipelines.config import pipeline_from_yaml

    pipe = pipeline_from_yaml("""
operators:
  - type: router
    routes:
      - expr: 'level == "ERROR"'
        sink: errors
      - expr: 'IsMatch(msg, "slow")'
        sink: slow
""")
    ds = ray.data.from_arrow(pa.table({
        "level": ["ERROR", "INFO", "INFO"],
        "msg": ["boom", "slow query", "fine"]}))
    out = pipe(ds).to_pandas().sort_values("msg").reset_index(drop=True)
    got = dict(zip(out["msg"], out["sink"]))
    assert got["boom"] == "errors" and got["slow query"] == "slow"
    assert got["fine"] not in ("errors", "slow")


def test_filter_yaml_with_condition_string():
    from opentelemetry_collector_contrib_ray.pipelines.config import pipeline_from_yaml

    pipe = pipeline_from_yaml("""
operators:
  - type: filter
    condition: 'level == "DEBUG"'
""")
    ds = ray.data.from_arrow(pa.table({"level": ["DEBUG", "INFO", "DEBUG"]}))
    assert pipe(ds).to_pandas()["level"].tolist() == ["INFO"]


def test_yaml_reaches_new_operator_types():
    """The YAML loader must resolve EVERY registering stage module —
    round-2 caught syslog/container/failover missing from the
    registry autoload list."""
    from opentelemetry_collector_contrib_ray.pipelines.config import pipeline_from_yaml

    pipe = pipeline_from_yaml("""
operators:
  - type: syslog_parser
    protocol: rfc5424
    parse_from: line
""")
    ds = ray.data.from_arrow(pa.table({
        "line": ["<34>1 2003-10-11T22:14:15.003Z host app - ID47 - hello"]}))
    out = pipe(ds).to_pandas()
    assert out.iloc[0]["severity_text"] == "crit" and out.iloc[0]["msg_id"] == "ID47"


def test_yaml_pipeline_round4_statements(ray_session):
    # the YAML operator-chain loader drives the round-4 textual
    # surface end-to-end: When/Bool, nested-map keep_keys, flatten
    # over the whole set, and the consistent sampler via the registry
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.pipelines.config import (
        pipeline_from_yaml,
    )

    yaml_text = """
operators:
  - type: transform
    error_mode: propagate
    statements:
      - set(verdict, When(() => value > 10.0, "hi", "lo"))
      - set(is_hi, Bool(When(() => verdict == "hi", "true", "false")))
      - keep_keys(attributes["meta"], ["keep"])
      - flatten(attributes)
"""
    t = pa.table({
        "value": [5.0, 20.0],
        "meta": pa.array([{"keep": "a", "drop": "x"},
                          {"keep": "b", "drop": "y"}]),
    })
    apply = pipeline_from_yaml(yaml_text)
    out = apply(ray.data.from_arrow(t)).to_pandas()
    assert list(out["verdict"]) == ["lo", "hi"]
    assert list(out["is_hi"]) == [False, True]
    assert list(out["meta.keep"]) == ["a", "b"]
    assert "meta.drop" not in out.columns and "meta" not in out.columns
