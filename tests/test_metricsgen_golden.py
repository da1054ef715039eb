"""metricsgeneration calculate golden tests ported
(processor/metricsgenerationprocessor/testdata/): the metric2_zero_*
operation matrix and the match_attributes enabled/disabled pairing
corpus, expected datapoints transcribed from the expected.yaml files."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.metricsgen import (
    generate_matched_metric,
)

LABELS = ["device", "encrypted", "bool_test", "double_test", "int_test", "owner"]


def _m1() -> ray.data.Dataset:
    # capacity.total datapoints (match_attributes/metrics_input.yaml)
    t = pa.table({
        "device": pa.array([None, "/dev/disk1", "/dev/disk2"], pa.string()),
        "encrypted": pa.array([None, None, True], pa.bool_()),
        "bool_test": pa.array([None, None, None], pa.bool_()),
        "double_test": pa.array([None, None, None], pa.float64()),
        "int_test": pa.array([None, None, None], pa.int64()),
        "owner": pa.array([None, None, None], pa.string()),
        "value": pa.array([1000.0, 2000.0, 3000.0]),
    })
    return ray.data.from_arrow(t).repartition(2)


def _m2() -> pa.Table:
    # capacity.used datapoints
    return pa.table({
        "device": pa.array([None, "/dev/disk1", "/dev/disk4", "/dev/disk2",
                            "/dev/disk2", "/dev/disk1"], pa.string()),
        "encrypted": pa.array([None, None, None, True, False, True], pa.bool_()),
        "bool_test": pa.array([None, None, None, None, None, True], pa.bool_()),
        "double_test": pa.array([None, None, None, None, None, 200.0], pa.float64()),
        "int_test": pa.array([None, None, None, None, None, 100], pa.int64()),
        "owner": pa.array([None, None, None, None, None, "foo"], pa.string()),
        "value": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
    })


def _got(out, labels=LABELS) -> set:
    df = out.to_pandas()
    rows = set()
    for _, r in df.iterrows():
        attrs = tuple((k, r[k]) for k in labels if not pd.isna(r[k]))
        rows.add((attrs, float(r["value"])))
    return rows


BIG = (("device", "/dev/disk1"), ("encrypted", True), ("bool_test", True),
       ("double_test", 200.0), ("int_test", 100), ("owner", "foo"))
D1 = (("device", "/dev/disk1"),)
D2T = (("device", "/dev/disk2"), ("encrypted", True))
D2F = (("device", "/dev/disk2"), ("encrypted", False))
D4 = (("device", "/dev/disk4"),)


def test_match_attributes_enabled():
    # match_attributes_enabled_expected.yaml: dp1 pairs with dp2
    # unless a key present on BOTH differs; labels merge with dp2
    # winning
    got = _got(generate_matched_metric(_m1(), _m2(), LABELS, "add"))
    assert got == {
        ((), 1010.0), (D1, 1020.0), (D1, 2010.0), (D1, 2020.0),
        (D4, 1030.0), (D2F, 1050.0), (D2T, 1040.0), (D2T, 3010.0),
        (D2T, 3040.0), (BIG, 1060.0), (BIG, 2060.0),
    }


def test_match_attributes_disabled_first_datapoint():
    # match_attributes_disabled_expected.yaml: every metric1 datapoint
    # pairs with metric2's FIRST datapoint only; labels stay metric1's
    got = _got(generate_matched_metric(_m1(), _m2(), LABELS, "add",
                                       match_attributes=False))
    assert got == {((), 1010.0), (D1, 2010.0), (D2T, 3010.0)}


@pytest.mark.parametrize("operation,expected", [
    ("add", {50.0}),
    ("subtract", {50.0}),
    ("multiply", {0.0}),
    ("divide", set()),   # metric2_zero_divide_expected.yaml: absent
    ("percent", set()),  # metric2_zero_percent_expected.yaml: absent
])
def test_metric2_zero_operations(operation, expected):
    # metric2_zero_*/: capacity.total=50 vs capacity.used=0
    m1 = ray.data.from_arrow(pa.table({
        "device": pa.array([None], pa.string()),
        "value": pa.array([50.0]),
    }))
    m2 = pa.table({"device": pa.array([None], pa.string()),
                   "value": pa.array([0.0])})
    got = {v for _, v in _got(generate_matched_metric(m1, m2, ["device"], operation),
                              labels=["device"])}
    assert got == expected
