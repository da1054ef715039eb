"""Metric start-time processor vs a row-at-a-time oracle."""

from datetime import datetime, timedelta

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.pipelines.config import logs_transform
from opentelemetry_collector_contrib_ray.stages.starttime import metric_start_time

T0 = datetime(2024, 1, 1)


def _tbl():
    rows = []
    for k in ("a", "b"):
        for i in range(6):
            rows.append((k, T0 + timedelta(seconds=10 * i), 100.0 + i * 5))
    rows.append(("c", T0, 7.0))  # single-point series
    return pa.table({"series": pa.array([r[0] for r in rows]),
                     "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                     "value": pa.array([r[2] for r in rows], pa.float64())})


def test_true_reset_point(ray_session):
    ds = ray.data.from_arrow(_tbl()).repartition(3)
    out = metric_start_time(ds, ["series"], "ts", "value",
                            strategy="true_reset_point").to_pandas()
    assert len(out) == 13  # nothing dropped
    for s, g in out.groupby("series"):
        assert (g.start_time == g.ts.min()).all()
    # first point: start == end
    first_a = out[(out.series == "a")].sort_values("ts").iloc[0]
    assert first_a.start_time == first_a.ts


def test_subtract_initial_point(ray_session):
    ds = ray.data.from_arrow(_tbl()).repartition(4)
    out = metric_start_time(ds, ["series"], "ts", "value",
                            strategy="subtract_initial_point").to_pandas()
    # first point of each series dropped (c vanishes entirely)
    assert set(out.series) == {"a", "b"}
    assert len(out) == 10
    for s, g in out.groupby("series"):
        g = g.sort_values("ts")
        assert list(g.value) == [5.0, 10.0, 15.0, 20.0, 25.0]
        assert (g.start_time == T0).all()
        assert (g.ts > T0).all()


def test_logs_transform_alias(ray_session):
    apply = logs_transform([
        {"type": "transform", "statements": ['set(flag, Upper(series))']},
    ])
    out = apply(ray.data.from_arrow(_tbl())).to_pandas()
    assert set(out.flag) == {"A", "B", "C"}


def test_subtract_keeps_same_ts_different_value(ray_session):
    # two points share the series-min ts with DIFFERENT values: only the
    # initial point (min value at min ts) is dropped; the other survives
    # with the subtraction applied.
    tbl = pa.table({
        "series": ["a", "a", "a"],
        "ts": pa.array([T0, T0, T0 + timedelta(seconds=10)], pa.timestamp("us")),
        "value": pa.array([100.0, 120.0, 130.0], pa.float64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = metric_start_time(ds, ["series"], "ts", "value",
                            strategy="subtract_initial_point").to_pandas()
    out = out.sort_values("ts")
    assert list(out.value) == [20.0, 30.0]
    assert (out.start_time == T0).all()
