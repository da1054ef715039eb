"""logdedupprocessor golden tests ported
(processor/logdedupprocessor/processor_test.go + testdata/): the three
input corpora and their expected outputs, minus wall-clock timestamps
(the goldens' first/last_observed are process times; the columnar
engine uses event time, so structure/counts/representatives are the
portable assertions)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages.dedup import dedup_windowed

_TS = pd.Timestamp("2024-10-04T19:21:47Z").tz_localize(None)


def _ds(rows: dict) -> ray.data.Dataset:
    n = len(next(iter(rows.values())))
    rows = dict(rows)
    rows.setdefault("event_id", list(range(n)))
    rows.setdefault("ts", [_TS] * n)
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)


def test_basic_exclude_fields():
    # testdata/input/basicLogs.yaml -> expected/basicLogs.yaml: two
    # logs identical except the excluded remove_me attr dedup to ONE
    # row with log_count=2; remove_me is absent from the output
    ds = _ds({
        "one": ["1", "1"],
        "body": ["Body of the log"] * 2,
        "severity_text": ["info"] * 2,
        "str": ["attr str"] * 2,
        "bool": [True, True],
        "remove_me": [None, False],
    })
    out = dedup_windowed(ds, "event_id", "ts",
                         exclude_fields=["remove_me"]).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["log_count"] == 2 and r["keep_id"] == 0
    assert r["first_observed"] == r["last_observed"] == _TS
    assert "remove_me" not in out.columns
    assert r["body"] == "Body of the log" and r["one"] == "1"


def _condition_input() -> ray.data.Dataset:
    # testdata/input/conditionLogs.yaml: log1 x2, log2 x2, log3 x2
    return _ds({
        "ID": ["1", "2", "1", "2", "3", "3"],
        "body": [f"Body of the log{i}" for i in ("1", "2", "1", "2", "3", "3")],
        "severity_text": ["info"] * 6,
        "str": ["attr str"] * 6,
        "bool": [True] * 6,
    })


def test_condition_dedup_and_passthrough():
    # processor_test.go TestProcessorConditions + expected/
    # conditionDedupedLogs.yaml / conditionConsumedLogs.yaml:
    # condition ID=="1" -> log1 pair deduped (count 2); log2/log3
    # pairs pass through UNCHANGED — still duplicated, no counting
    out = dedup_windowed(_condition_input(), "event_id", "ts",
                         condition=("==", col("ID"), "1")).to_pandas()
    deduped = out[out["ID"] == "1"]
    assert len(deduped) == 1 and int(deduped.iloc[0]["log_count"]) == 2
    passed = out[out["ID"] != "1"]
    assert sorted(passed["body"]) == ["Body of the log2", "Body of the log2",
                                      "Body of the log3", "Body of the log3"]
    assert set(passed["log_count"]) == {1}


def test_multiple_conditions_or():
    # expected/multipleConditionsDedupedLogs.yaml: ID==1 OR ID==3
    # deduped (one row each, count 2); log2 pair passes through
    out = dedup_windowed(
        _condition_input(), "event_id", "ts",
        condition=("or", ("==", col("ID"), "1"), ("==", col("ID"), "3")),
    ).to_pandas()
    d1 = out[out["ID"] == "1"]
    d3 = out[out["ID"] == "3"]
    assert len(d1) == 1 and int(d1.iloc[0]["log_count"]) == 2
    assert len(d3) == 1 and int(d3.iloc[0]["log_count"]) == 2
    passed = out[out["ID"] == "2"]
    assert len(passed) == 2 and set(passed["log_count"]) == {1}


def test_include_fields():
    # testdata/input/includeFieldsLogs.yaml -> expected/
    # includeFieldsLogs.yaml: dedup on ONLY the two dedup_key attrs;
    # the unique_id difference does not split the group, and the
    # representative is the FIRST record (keep_id -> unique_id 1)
    ds = _ds({
        "one": ["1", "1"],
        "dedup_key": ["abc", "abc"],
        "dedup_key1": ["def", "def"],
        "unique_id": [1, 2],
    })
    out = dedup_windowed(ds, "event_id", "ts",
                         include_fields=["dedup_key", "dedup_key1"]).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["log_count"]) == 2
    assert r["keep_id"] == 0  # first record = the unique_id=1 log


def test_exclude_include_mutually_exclusive():
    # config.go:85-86
    ds = _ds({"a": ["x"], "b": ["y"]})
    with pytest.raises(ValueError, match="cannot define both"):
        dedup_windowed(ds, "event_id", "ts",
                       exclude_fields=["a"], include_fields=["b"])
