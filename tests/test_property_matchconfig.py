"""Property test: the legacy MatchConfig predicate
(pipelines/config._legacy_log_match + expr.compile_predicate) agrees
with a row-wise Python transliteration of the reference's matcher
(internal/filter/filterlog/filterlog.go Eval +
filtermatcher/attributematcher.go Match) on random tables and random
match configs. Pure-table evaluation — no Ray."""

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.expr import compile_predicate
from opentelemetry_collector_contrib_ray.pipelines.config import _legacy_log_match

_BODIES = ["timeout upstream", "disk full", "oom killed", "", "超时 错误"]
_SEVS = ["INFO", "ERROR", "WARN", "DEBUG", None]
_ATTR_VALS = ["yes", "no", "maybe", None]

rows_st = st.lists(
    st.tuples(st.sampled_from(_BODIES), st.sampled_from(_SEVS),
              st.integers(0, 24), st.sampled_from(_ATTR_VALS)),
    min_size=1, max_size=20)

props_st = st.fixed_dictionaries({}, optional={
    "match_type": st.sampled_from(["strict", "regexp"]),
    "log_bodies": st.lists(
        st.sampled_from(["timeout.*", "disk full", "oom.*", "超时.*"]),
        min_size=1, max_size=3),
    "log_severity_texts": st.lists(
        st.sampled_from(["ERROR", "WARN"]), min_size=1, max_size=2),
    "log_severity_number": st.fixed_dictionaries(
        {"min": st.sampled_from(["WARN", "ERROR", 9])},
        optional={"match_undefined": st.booleans()}),
    "record_attributes": st.lists(
        st.fixed_dictionaries({"key": st.just("flag"),
                               "value": st.sampled_from(["yes", "no"])}),
        min_size=1, max_size=1),
})

_SEV_NUM = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17}


def _py_match(props, body, sev_text, sev_num, flag):
    """Row-wise transliteration of filterlog.go Eval."""
    mt = props.get("match_type", "strict")

    def one(val, pat):
        if val is None:
            return False
        if mt == "regexp" and isinstance(pat, str):
            return re.search(pat, val) is not None
        return val == pat

    if props.get("log_bodies") is not None:
        if not any(one(body, p) for p in props["log_bodies"]):
            return False
    if props.get("log_severity_texts") is not None:
        if not any(one(sev_text, p) for p in props["log_severity_texts"]):
            return False
    sn = props.get("log_severity_number")
    if sn is not None:
        mn = sn["min"]
        mn = mn if isinstance(mn, int) else _SEV_NUM[mn]
        ok = sev_num >= mn
        if sn.get("match_undefined") and sev_num == 0:
            ok = True
        if not ok:
            return False
    for a in props.get("record_attributes") or []:
        if flag is None or flag != a["value"]:
            return False
    return True


@settings(max_examples=200, deadline=None)
@given(rows=rows_st, props=props_st)
def test_legacy_match_agrees_with_rowwise_reference(rows, props):
    if not (set(props) - {"match_type"}):
        # config.go:131: a config with no match group (match_type
        # alone doesn't count) is a VALIDATION ERROR, not a matcher
        import pytest

        with pytest.raises(ValueError, match="at least one of"):
            _legacy_log_match(dict(props))
        return
    tbl = pa.table({
        "body": pa.array([r[0] for r in rows], pa.string()),
        "severity_text": pa.array([r[1] for r in rows], pa.string()),
        "severity_number": pa.array([r[2] for r in rows], pa.int64()),
        "flag": pa.array([r[3] for r in rows], pa.string()),
    })
    pred = compile_predicate(_legacy_log_match(dict(props)))
    got = pred(tbl).to_pylist()
    exp = [_py_match(props, *r) for r in rows]
    assert got == exp
