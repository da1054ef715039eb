"""countconnector logs→metrics golden tests ported verbatim
(connector/countconnector/connector_test.go TestLogsToMetrics +
testdata/logs/*.yaml): 4 resources x 4 logs crossing attribute
presence, each case's expected per-Resource datapoints transcribed
from the golden files. The columnar replay flattens resource + log
attributes into one row per log record; absent attribute = null."""

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages.aggregate import (
    MetricDef,
    run_metric_def,
)

# testdata/logs/input.yaml: resources (resource.required, resource.optional)
_RESOURCES = [("foo", "bar"), ("foo", "notbar"), ("notfoo", None), (None, None)]
# ...each carrying the same 4 log records (log.required, log.optional)
_LOGS = [("foo", "bar"), ("foo", "notbar"), ("notfoo", None), (None, None)]

_RES_KEYS = ["resource.required", "resource.optional"]


def _input_table() -> pa.Table:
    rows = {"resource.required": [], "resource.optional": [],
            "log.required": [], "log.optional": []}
    for rr, ro in _RESOURCES:
        for lr, lo in _LOGS:
            rows["resource.required"].append(rr)
            rows["resource.optional"].append(ro)
            rows["log.required"].append(lr)
            rows["log.optional"].append(lo)
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


def _run(def_: MetricDef) -> set:
    ds = ray.data.from_arrow(_input_table()).repartition(3)
    out = run_metric_def(ds, def_).to_pandas()
    dims = [d for d, _ in def_.dims]
    got = set()
    for _, r in out.iterrows():
        res = tuple((k, r[k]) for k in _RES_KEYS if r[k] is not None)
        attrs = tuple((k, r[k]) for k in dims)
        got.add((res, attrs, int(r[def_.out_col()])))
    return got


def _expect(rows) -> set:
    return {(tuple(res), tuple(attrs), n) for res, attrs, n in rows}


R1 = [("resource.required", "foo"), ("resource.optional", "bar")]
R2 = [("resource.required", "foo"), ("resource.optional", "notbar")]
R3 = [("resource.required", "notfoo")]
R4 = []
NOT_NULL_RES_OPT = ("not_null", col("resource.optional"))
NOT_NULL_LOG_OPT = ("not_null", col("log.optional"))


def test_zero_conditions():
    # golden logs/zero_conditions.yaml: every resource counts all 4
    got = _run(MetricDef(name="log.record.count", resource_keys=_RES_KEYS))
    assert got == _expect([(R1, [], 4), (R2, [], 4), (R3, [], 4), (R4, [], 4)])


def test_one_condition():
    # golden logs/one_condition.yaml: resource.optional != nil
    got = _run(MetricDef(name="count.if", resource_keys=_RES_KEYS,
                         conditions=[NOT_NULL_RES_OPT]))
    assert got == _expect([(R1, [], 4), (R2, [], 4)])


def test_multiple_conditions_or_semantics():
    # golden logs/multiple_conditions.yaml: conditions are OR-ed —
    # resources without resource.optional still count the 2 logs that
    # have log.optional
    got = _run(MetricDef(name="count.if", resource_keys=_RES_KEYS,
                         conditions=[NOT_NULL_RES_OPT, NOT_NULL_LOG_OPT]))
    assert got == _expect([(R1, [], 4), (R2, [], 4), (R3, [], 2), (R4, [], 2)])


def test_multiple_metrics():
    # golden logs/multiple_metrics.yaml: two defs over one stream
    got_all = _run(MetricDef(name="count.all", resource_keys=_RES_KEYS))
    got_if = _run(MetricDef(name="count.if", resource_keys=_RES_KEYS,
                            conditions=[NOT_NULL_RES_OPT]))
    assert got_all == _expect([(R1, [], 4), (R2, [], 4), (R3, [], 4), (R4, [], 4)])
    assert got_if == _expect([(R1, [], 4), (R2, [], 4)])


def test_one_attribute():
    # golden logs/one_attribute.yaml: dim log.required, missing -> skip
    got = _run(MetricDef(name="log.count.by_attr", resource_keys=_RES_KEYS,
                         dims=[("log.required", None)]))
    exp = []
    for res in (R1, R2, R3, R4):
        exp += [(res, [("log.required", "foo")], 2),
                (res, [("log.required", "notfoo")], 1)]
    assert got == _expect(exp)


def test_multiple_attributes():
    # golden logs/multiple_attributes.yaml: both dims required — the
    # (notfoo, -) and (-, -) logs are skipped
    got = _run(MetricDef(name="log.count.by_attr", resource_keys=_RES_KEYS,
                         dims=[("log.required", None), ("log.optional", None)]))
    exp = []
    for res in (R1, R2, R3, R4):
        exp += [(res, [("log.required", "foo"), ("log.optional", "bar")], 1),
                (res, [("log.required", "foo"), ("log.optional", "notbar")], 1)]
    assert got == _expect(exp)


def test_default_attribute_value():
    # golden logs/default_attribute_value.yaml: log.optional defaults
    # to "other"; log.required still has no default -> last log skipped
    got = _run(MetricDef(name="log.count.by_attr", resource_keys=_RES_KEYS,
                         dims=[("log.required", None), ("log.optional", "other")]))
    exp = []
    for res in (R1, R2, R3, R4):
        exp += [(res, [("log.required", "foo"), ("log.optional", "bar")], 1),
                (res, [("log.required", "foo"), ("log.optional", "notbar")], 1),
                (res, [("log.required", "notfoo"), ("log.optional", "other")], 1)]
    assert got == _expect(exp)


def test_condition_and_attribute():
    # golden logs/condition_and_attribute.yaml
    got = _run(MetricDef(name="log.count.if.by_attr", resource_keys=_RES_KEYS,
                         conditions=[NOT_NULL_RES_OPT],
                         dims=[("log.required", None)]))
    exp = []
    for res in (R1, R2):
        exp += [(res, [("log.required", "foo")], 2),
                (res, [("log.required", "notfoo")], 1)]
    assert got == _expect(exp)


# ---------------------------------------------------------------- sum
# sumconnector logs→metrics goldens (connector/sumconnector/
# connector_test.go TestLogsToMetrics + testdata/logs/*.yaml): same
# 4x4 input but each log carries a "beep" source attribute —
# double 2.1 / unparseable string "astring" / int 2 / absent — and
# sum.go:40-57 counts absent/unparseable as 0 (missing_source_as_zero).
# Columnar encoding: beep is a string column; null = absent.

_BEEP = {  # (resource_idx, log_idx) -> beep value (string column)
    (0, 0): "2.1", (0, 1): "astring", (0, 2): "2", (0, 3): None,
    (1, 0): "2.1", (1, 1): "2", (1, 2): "2", (1, 3): None,
    (2, 0): "2.1", (2, 1): "2", (2, 2): "2", (2, 3): None,
    (3, 0): "2.1", (3, 1): "2", (3, 2): "2", (3, 3): None,
}


def _sum_input_table() -> pa.Table:
    rows = {"resource.required": [], "resource.optional": [],
            "log.required": [], "log.optional": [], "beep": []}
    for ri, (rr, ro) in enumerate(_RESOURCES):
        for li, (lr, lo) in enumerate(_LOGS):
            rows["resource.required"].append(rr)
            rows["resource.optional"].append(ro)
            rows["log.required"].append(lr)
            rows["log.optional"].append(lo)
            rows["beep"].append(_BEEP[(ri, li)])
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


def _run_sum(def_: MetricDef) -> dict:
    ds = ray.data.from_arrow(_sum_input_table()).repartition(3)
    out = run_metric_def(ds, def_).to_pandas()
    dims = [d for d, _ in def_.dims]
    got = {}
    for _, r in out.iterrows():
        res = tuple((k, r[k]) for k in _RES_KEYS if r[k] is not None)
        attrs = tuple((k, r[k]) for k in dims)
        got[(res, attrs)] = float(r[def_.out_col()])
    return got


def _sum_def(name, **kw):
    return MetricDef(name=name, agg="sum", source="beep",
                     resource_keys=_RES_KEYS, missing_source_as_zero=True, **kw)


def test_sum_one_condition():
    # golden sumconnector logs/one_condition.yaml: 4.1 = 2.1 + 0
    # ("astring" parses to 0) + 2 + 0 (absent beep)
    got = _run_sum(_sum_def("sum.if", conditions=[NOT_NULL_RES_OPT]))
    assert got == {(tuple(R1), ()): pytest.approx(4.1),
                   (tuple(R2), ()): pytest.approx(6.1)}


def test_sum_multiple_conditions():
    got = _run_sum(_sum_def("sum.if",
                            conditions=[NOT_NULL_RES_OPT, NOT_NULL_LOG_OPT]))
    assert got == {(tuple(R1), ()): pytest.approx(4.1),
                   (tuple(R2), ()): pytest.approx(6.1),
                   (tuple(R3), ()): pytest.approx(4.1),
                   (tuple(R4), ()): pytest.approx(4.1)}


def test_sum_one_attribute():
    got = _run_sum(_sum_def("log.sum.by_attr", dims=[("log.required", None)]))
    exp = {}
    for i, res in enumerate((R1, R2, R3, R4)):
        foo = 2.1 if i == 0 else 4.1  # R1's second log is "astring" -> 0
        exp[(tuple(res), (("log.required", "foo"),))] = pytest.approx(foo)
        exp[(tuple(res), (("log.required", "notfoo"),))] = pytest.approx(2.0)
    assert got == exp


def test_sum_default_attribute_value():
    got = _run_sum(_sum_def("log.sum.by_attr",
                            dims=[("log.required", None),
                                  ("log.optional", "other")]))
    # DELIBERATE DIVERGENCE: the reference's increment adds sumVal once
    # PER CONFIGURED ATTRIBUTE KEY (sum.go:122-127 iterates
    # attrs.AsRaw()), so every 2-dim golden value is exactly DOUBLED
    # (logs/default_attribute_value.yaml: the single (foo,bar,2.1) log
    # shows as 4.2). We sum each record once — correct math — and this
    # test pins golden == ours x n_dims to prove the quirk is
    # understood, not missed. (Single-dim goldens multiply by 1 and
    # match ours exactly — see the tests above.)
    golden = {
        (tuple(R1), (("log.required", "foo"), ("log.optional", "bar"))): 4.2,
        (tuple(R1), (("log.required", "foo"), ("log.optional", "notbar"))): 0.0,
        (tuple(R1), (("log.required", "notfoo"), ("log.optional", "other"))): 4.0,
        (tuple(R2), (("log.required", "foo"), ("log.optional", "bar"))): 4.2,
        (tuple(R2), (("log.required", "foo"), ("log.optional", "notbar"))): 4.0,
        (tuple(R2), (("log.required", "notfoo"), ("log.optional", "other"))): 4.0,
        (tuple(R3), (("log.required", "foo"), ("log.optional", "bar"))): 4.2,
        (tuple(R3), (("log.required", "foo"), ("log.optional", "notbar"))): 4.0,
        (tuple(R3), (("log.required", "notfoo"), ("log.optional", "other"))): 4.0,
        (tuple(R4), (("log.required", "foo"), ("log.optional", "bar"))): 4.2,
        (tuple(R4), (("log.required", "foo"), ("log.optional", "notbar"))): 4.0,
        (tuple(R4), (("log.required", "notfoo"), ("log.optional", "other"))): 4.0,
    }
    n_dims = 2
    assert set(got) == set(golden)
    for k, v in golden.items():
        assert got[k] * n_dims == pytest.approx(v)


def test_sum_condition_and_attribute():
    got = _run_sum(_sum_def("log.sum.if.by_attr",
                            conditions=[NOT_NULL_RES_OPT],
                            dims=[("log.required", None)]))
    assert got == {
        (tuple(R1), (("log.required", "foo"),)): pytest.approx(2.1),
        (tuple(R1), (("log.required", "notfoo"),)): pytest.approx(2.0),
        (tuple(R2), (("log.required", "foo"),)): pytest.approx(4.1),
        (tuple(R2), (("log.required", "notfoo"),)): pytest.approx(2.0),
    }


# ------------------------------------------------- signaltometrics
# signaltometricsconnector logs sum goldens (connector/
# signaltometricsconnector/testdata/logs/{logs.yaml,sum/}): one
# resource, four log records; include_resource_attributes narrows the
# structural resource keys; conditions are OR-ed; a dim without a
# value skips the record.

def _s2m_input() -> ray.data.Dataset:
    t = pa.table({
        "resource.foo": pa.array(["foo"] * 4, pa.string()),
        "resource.bar": pa.array(["bar"] * 4, pa.string()),
        "log.foo": pa.array(["foo", "foo", "notfoo", None], pa.string()),
        "log.bar": pa.array(["bar", "notbar", None, None], pa.string()),
        "log.duration": pa.array([101.5, 11.4, 8.1, 7.0]),
    })
    return ray.data.from_arrow(t).repartition(2)


def _s2m_run(def_: MetricDef) -> set:
    out = run_metric_def(_s2m_input(), def_).to_pandas()
    dims = def_.resource_keys + [d for d, _ in def_.dims]
    return {tuple((k, r[k]) for k in dims if r[k] is not None)
            + ((def_.out_col(), int(r[def_.out_col()])),)
            for _, r in out.iterrows()}


def test_signaltometrics_sum_goldens():
    res_keys = ["resource.foo", "resource.bar"]
    # total.logrecords.sum: constant value 1 == count, all 4 records
    got = _s2m_run(MetricDef(name="n", resource_keys=res_keys))
    assert got == {(("resource.foo", "foo"), ("resource.bar", "bar"), ("n", 4))}
    # include_resource_attributes: [resource.foo] narrows the resource
    got = _s2m_run(MetricDef(name="n", resource_keys=["resource.foo"]))
    assert got == {(("resource.foo", "foo"), ("n", 4))}
    # log.foo.sum: dim skips the attr-less record
    got = _s2m_run(MetricDef(name="n", resource_keys=["resource.foo"],
                             dims=[("log.foo", None)]))
    assert got == {(("resource.foo", "foo"), ("log.foo", "foo"), ("n", 2)),
                   (("resource.foo", "foo"), ("log.foo", "notfoo"), ("n", 1))}
    # log.bar.sum: OR-ed conditions, one false one true -> processed
    got = _s2m_run(MetricDef(
        name="n", resource_keys=["resource.foo"], dims=[("log.bar", None)],
        conditions=[("not_null", col("404.attribute")),
                    ("not_null", col("resource.foo"))]))
    assert got == {(("resource.foo", "foo"), ("log.bar", "bar"), ("n", 1)),
                   (("resource.foo", "foo"), ("log.bar", "notbar"), ("n", 1))}
    # ignored.sum: all conditions false -> no datapoints at all
    got = _s2m_run(MetricDef(
        name="n", resource_keys=["resource.foo"], dims=[("log.bar", None)],
        conditions=[("not_null", col("404.attribute"))]))
    assert got == set()
