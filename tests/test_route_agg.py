"""Routing + count/sum connector conformance vs a row-at-a-time oracle.

Models the reference's sink-equality tests
(connector/routingconnector/logs_test.go:230-307: exact per-sink row
sets) and countconnector golden tests."""

import collections
from datetime import datetime, timedelta

import pytest
import ray.data

from opentelemetry_collector_contrib_ray.pipelines.flagship import (
    METRIC_DEFS,
    ROUTE_CONFIGS,
    build_routed,
)
from opentelemetry_collector_contrib_ray.sources.transcripts import generate_transcripts
from opentelemetry_collector_contrib_ray.stages.aggregate import add_hour_column, run_metric_def
from opentelemetry_collector_contrib_ray.stages.parse import TranscriptParser
from opentelemetry_collector_contrib_ray.stages.route import Router
from tests.test_parse import oracle_parse_row


def oracle_route(rows):
    """Row-at-a-time first-match-wins move / pass-through copy
    (routingconnector/logs.go:64-173 semantics)."""
    out = []
    for r in rows:
        p = oracle_parse_row(r["text"]) or {}
        sev = "ERROR" if p.get("severity_number") == 17 else p.get("level")
        routed = None
        copies = []
        # route 0: move
        if (sev == "ERROR") or (p.get("status") is not None and p["status"] >= 500):
            routed = "errors"
        else:
            # route 1: copy
            if r["role"] == "tool" and r["tool"] != "":
                copies.append("tools")
            # route 2: move
            if p.get("dur") is not None and p["dur"] > 100.0:
                routed = "slow"
        if routed is None:
            routed = "default"
        out.append((r["conv_id"], r["turn_idx"], routed))
        for c in copies:
            out.append((r["conv_id"], r["turn_idx"], c))
    return out


@pytest.fixture(scope="module")
def table():
    return generate_transcripts(6000)


@pytest.fixture(scope="module")
def routed_tbl(table):
    parsed = TranscriptParser(on_error="send").fn(table)
    return Router(ROUTE_CONFIGS).fn(parsed)


def test_routed_row_equality(table, routed_tbl):
    got = sorted(zip(routed_tbl["conv_id"].to_pylist(),
                     routed_tbl["turn_idx"].to_pylist(),
                     routed_tbl["sink"].to_pylist()))
    want = sorted(oracle_route(table.to_pylist()))
    assert got == want


def test_copy_rows_duplicated_not_moved(routed_tbl):
    # every copy row's original must still exist under a move/default sink
    per_key = collections.defaultdict(set)
    for c, t, s in zip(routed_tbl["conv_id"].to_pylist(),
                       routed_tbl["turn_idx"].to_pylist(),
                       routed_tbl["sink"].to_pylist()):
        per_key[(c, t)].add(s)
    for key, sinks in per_key.items():
        if "tools" in sinks:
            assert sinks & {"errors", "slow", "default"}, key


def oracle_metrics(rows):
    counts = {d.name: collections.Counter() for d in METRIC_DEFS}
    sums = collections.Counter()
    for r in rows:
        p = oracle_parse_row(r["text"]) or {}
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        tool = r["tool"] if r["tool"] else "-"
        counts["turn_count"][(r["role"], tool, hour)] += 1
        if p.get("level") == "ERROR":
            counts["error_count"][(r["role"], hour)] += 1
        if p.get("dur") is not None:
            sums[(r["role"], tool, hour)] += p["dur"]
    return counts, sums


def test_count_sum_defs_match_oracle(table):
    parsed = TranscriptParser(on_error="send").fn(table)
    ds = add_hour_column(ray.data.from_arrow(parsed), "ts", "hour")
    counts, sums = oracle_metrics(table.to_pylist())

    turn = {(r["role"], r["tool"], r["hour"]): r["turn_count"]
            for r in run_metric_def(ds, METRIC_DEFS[0]).take_all()}
    assert turn == dict(counts["turn_count"])

    err = {(r["role"], r["hour"]): r["error_count"]
           for r in run_metric_def(ds, METRIC_DEFS[1]).take_all()}
    assert err == dict(counts["error_count"])

    dsum = {(r["role"], r["tool"], r["hour"]): r["dur_sum"]
            for r in run_metric_def(ds, METRIC_DEFS[2]).take_all()}
    assert dsum == dict(sums)  # dur is multiples of 0.25 -> exact sums


def test_metric_def_empty_result(table):
    """Conditions matching nothing must yield an empty result, not an
    error (exercises tree_merge_groupby's all-empty-partials path)."""
    from opentelemetry_collector_contrib_ray.expr import col
    from opentelemetry_collector_contrib_ray.stages.aggregate import MetricDef

    parsed = TranscriptParser(on_error="send").fn(table)
    ds = add_hour_column(ray.data.from_arrow(parsed), "ts", "hour")
    d = MetricDef(name="never", agg="count",
                  conditions=[("==", col("role"), "nobody")],
                  dims=[("role", None), ("hour", None)])
    out = run_metric_def(ds, d)
    assert out.count() == 0


def test_router_attach_attributes(table):
    """Per-route attach attributes (stanza router,
    transformer/router/config.go:55-61)."""
    from opentelemetry_collector_contrib_ray.expr import col as c

    parsed = TranscriptParser(on_error="send").fn(table)
    routes = [
        {"condition": (">=", c("status"), 500), "sink": "errors", "action": "move",
         "attributes": {"priority": "high"}},
        {"condition": ("==", c("role"), "tool"), "sink": "tools", "action": "copy",
         "attributes": {"mirrored": "yes"}},
    ]
    out = Router(routes).fn(parsed)
    import collections

    by_sink = collections.defaultdict(list)
    for s, p, m in zip(out["sink"].to_pylist(), out["priority"].to_pylist(),
                       out["mirrored"].to_pylist()):
        by_sink[s].append((p, m))
    assert all(p == "high" and m is None for p, m in by_sink["errors"])
    assert all(p is None and m == "yes" for p, m in by_sink["tools"])
    assert all(p is None and m is None for p, m in by_sink["default"])


def test_aggregate_labels_types(ray_session):
    # metricstransform aggregate_labels: every aggregation_type over a
    # small grouped-metric table, checked against hand computation
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.aggregate import (
        aggregate_label_values,
        aggregate_labels,
    )

    tbl = pa.table({
        "state": ["used", "used", "free", "free", "cached"],
        "host": ["a", "b", "a", "b", "a"],
        "v": [10.0, 20.0, 1.0, 3.0, 5.0],
    })
    ds = ray.data.from_arrow(tbl).repartition(3)

    def got(out):
        return {r["state"]: r[[c for c in out.schema().names
                               if c != "state"][0]]
                for r in out.take_all()}

    assert got(aggregate_labels(ds, ["state"], "v", "sum")) == \
        {"used": 30.0, "free": 4.0, "cached": 5.0}
    assert got(aggregate_labels(ds, ["state"], "v", "min")) == \
        {"used": 10.0, "free": 1.0, "cached": 5.0}
    assert got(aggregate_labels(ds, ["state"], "v", "max")) == \
        {"used": 20.0, "free": 3.0, "cached": 5.0}
    assert got(aggregate_labels(ds, ["state"], "v", "count")) == \
        {"used": 2, "free": 2, "cached": 1}
    assert got(aggregate_labels(ds, ["state"], "v", "mean")) == \
        {"used": 15.0, "free": 2.0, "cached": 5.0}
    med = got(aggregate_labels(ds, ["state"], "v", "median"))
    assert med == {"used": 10.0, "free": 1.0, "cached": 5.0}  # quantile_disc

    # aggregate_label_values: collapse used+cached into 'allocated'
    out = aggregate_label_values(
        ds, label="state", aggregated_values=["used", "cached"],
        new_value="allocated", label_set=["state"], value_col="v",
        aggregation_type="sum")
    assert got(out) == {"allocated": 35.0, "free": 4.0}


def test_combine_metrics_reference_example(ray_session):
    # the README's iis.requests example: per-http-method metrics merge
    # into one metric with an http_method label (submatch_case: lower)
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.aggregate import (
        combine_metrics,
    )

    tbl = pa.table({
        "metric_name": [
            "Web Service (*)/Total Delete Requests",
            "Web Service (*)/Total Get Requests",
            "Web Service (*)/Total Get Requests",
            "Web Service (*)/Total Post Requests",
            "unrelated.metric",
        ],
        "host": ["a", "a", "a", "b", "a"],
        "v": [1.0, 2.0, 3.0, 4.0, 9.0],
    })
    out = combine_metrics(
        ray.data.from_arrow(tbl).repartition(2),
        include=r"^Web Service \(\*\)/Total (?P<http_method>.*) Requests$",
        new_name="iis.requests", label_set=["host"], value_col="v",
        aggregation_type="sum", submatch_case="lower")
    rows = {(r["metric_name"], r["host"], r["http_method"]): r["v"]
            for r in out.take_all()}
    assert rows == {
        ("iis.requests", "a", "delete"): 1.0,
        ("iis.requests", "a", "get"): 5.0,
        ("iis.requests", "b", "post"): 4.0,
        ("unrelated.metric", "a", None): 9.0,
    }


def test_slow_sql_and_metrics_as_logs(ray_session):
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.convertlogs import (
        metrics_as_logs,
        slow_sql_logs,
    )

    t = pa.table({
        "dur_ns": [5e9, 1e9, 9e9, 8e9],
        "sys": ["mysql", "mysql", "oracle", "postgres"],
        "stmt": ["SELECT 1", "SELECT 2", "SELECT 3", "SELECT 4"],
        "svc": ["a", "a", "a", None],   # last row: no service -> skip
        "name": ["q1", "q2", "q3", "q4"],
    })
    out = slow_sql_logs(ray.data.from_arrow(t), duration_col="dur_ns",
                        threshold=2e9, db_system_col="sys",
                        db_statement_col="stmt",
                        db_systems=["mysql", "postgres"],
                        service_col="svc", span_name_col="name")
    rows = out.take_all()
    # q1 slow mysql kept; q2 under threshold; q3 system not configured;
    # q4 slow postgres but resource has no service.name
    assert [r["span.name"] for r in rows] == ["q1"]
    assert rows[0]["severity_text"] == "SLOW"
    assert rows[0]["severity_number"] == 17
    assert rows[0]["statement.exec.duration"] == 5_000_000_000

    m = pa.table({"mname": ["a", "b"], "v": [1, 2], "hour": [0, 1]})
    out = metrics_as_logs(ray.data.from_arrow(m), name_col="mname",
                          value_col="v", metric_type="sum", unit="1",
                          keep_cols=["hour"]).take_all()
    assert out[0]["body"] == "metric converted to log"
    assert out[1]["metric.name"] == "b" and out[1]["metric.value"] == 2.0


def test_metricstransform_small_ops_compose(ray_session):
    # the remaining metricstransform operations are compositions of
    # existing editors (README:96-110): add_label = set, update_label
    # = rename, delete_label_value = filter, toggle_scalar_data_type
    # = cast — prove each composition end-to-end
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.transform import (
        FilterStage,
        Statement,
        TransformStage,
    )
    from opentelemetry_collector_contrib_ray.expr import col

    t = pa.table({"state": ["used", "idle", "free"],
                  "v": [1, 2, 3]})
    ds = ray.data.from_arrow(t)
    # add_label + update_label + toggle_scalar_data_type
    stage = TransformStage([
        Statement("set", {"target": "source", "value": "kubelet"}),
        Statement("rename", {"src": "state", "dst": "cpu.state"}),
        Statement("cast", {"target": "v", "to": "float64"}),
    ], error_mode="propagate")
    out = stage.apply(ds).to_pandas()
    assert list(out["source"]) == ["kubelet"] * 3
    assert "cpu.state" in out.columns and out["v"].dtype == "float64"
    # delete_label_value: drop datapoints whose label has the value
    kept = FilterStage(("==", col("state"), "idle"), mode="drop") \
        .apply(ds).to_pandas()
    assert sorted(kept["state"]) == ["free", "used"]
