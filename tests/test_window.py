"""last_value_per_window: distributed argmax via binary-packed max."""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.window import (
    _be8_to_us,
    _us_to_be8,
    last_value_per_window,
)

T0 = datetime(2024, 1, 1)


def test_be8_roundtrip_preserves_order():
    us = np.array([-10**17, -1, 0, 1, 10**17], np.int64)
    b = _us_to_be8(us)
    assert list(_be8_to_us(b)) == list(us)
    # byte order == numeric order
    raw = sorted(b.to_pylist())
    assert [int(x) for x in _be8_to_us(pa.array(raw, pa.binary()))] == sorted(us)


def _mk(n_users, per_user=5):
    rows = []
    for u in range(n_users):
        for i in range(per_user):
            # out-of-order timestamps; the latest is i==per_user-1
            ts = T0 + timedelta(minutes=7 * ((i * 3) % per_user) + u % 3)
            rows.append((f"u{u}", ts, float(u * 100 + ((i * 3) % per_user))))
    return pa.table({"user_id": [r[0] for r in rows],
                     "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                     "value": pa.array([r[2] for r in rows], pa.float64())})


def test_last_value_high_cardinality(ray_session):
    # one group per user-hour; cardinality == n_users (every group is
    # "unbounded" relative to blocks) — the old tree-reduce-to-driver
    # shape is gone, the merge is a distributed groupby.
    tbl = _mk(500)
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = last_value_per_window(ds, ["user_id"], "ts", "value").to_pandas()
    df = tbl.to_pandas()
    df["window_start"] = df.ts.dt.floor("h")
    i = df.groupby(["user_id", "window_start"]).ts.idxmax()
    exp = df.loc[i].rename(columns={"ts": "last_ts", "value": "last_value"})
    merged = out.merge(exp, on=["user_id", "window_start"],
                       suffixes=("", "_exp"))
    assert len(merged) == len(out) == len(exp)
    assert (merged.last_value == merged.last_value_exp).all()
    assert (merged.last_ts == merged.last_ts_exp).all()


def test_last_value_string_and_nulls(ray_session):
    tbl = pa.table({
        "k": ["a", "a", "a", "b", "b"],
        "ts": pa.array([T0, T0 + timedelta(minutes=1), T0 + timedelta(minutes=2),
                        T0, T0 + timedelta(minutes=1)], pa.timestamp("us")),
        "v": pa.array(["first", "mid", "last", "x", None]),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = last_value_per_window(ds, ["k"], "ts", "v").to_pandas()
    got = dict(zip(out.k, out.last_value))
    assert got["a"] == "last"
    # b's latest value is null -> presence flag 0, decodes to null
    assert pd.isna(got["b"])


def test_last_value_int_nulls(ray_session):
    tbl = pa.table({
        "k": ["a", "a"],
        "ts": pa.array([T0, T0 + timedelta(minutes=1)], pa.timestamp("us")),
        "v": pa.array([3, None], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = last_value_per_window(ds, ["k"], "ts", "v").to_pandas()
    assert len(out) == 1
    assert pd.isna(out.last_value.iloc[0])
