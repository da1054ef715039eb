"""Boundary-carry correctness for the distributed sorted-scan family
(stages/scan.py): many small blocks, keys spanning block boundaries,
including a Zipf-hot key covering most of the data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from opentelemetry_collector_contrib_ray.stages.scan import (
    keyed_cumsum,
    keyed_delta,
    keyed_rate,
    keyed_session_index,
)
from opentelemetry_collector_contrib_ray.stages.sessionize import sessionize


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(7)
    n = 5000
    # hot key 0 takes ~60% of rows; keys are ints (exercises native
    # block ordering, not string ordering)
    keys = np.where(rng.random(n) < 0.6, 0, rng.integers(1, 40, n)).astype(np.int64)
    ts = np.datetime64("2026-01-01", "us") + rng.integers(0, 86_400_000_000, n).astype(
        "timedelta64[us]")
    # force duplicate (key, ts) pairs to exercise the tiebreak
    ts[100:110] = ts[99]
    keys[100:110] = keys[99]
    vals = rng.integers(-50, 100, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table({"k": keys, "ts": ts, "v": vals, "eid": eid})
    df = tbl.to_pandas()
    return tbl, df


def _expected(df, fn):
    g = df.sort_values(["k", "ts", "eid"], kind="mergesort").groupby("k", sort=False)
    return fn(g)


def _ds(tbl, nblocks=8):
    return ray.data.from_arrow(tbl).repartition(nblocks)


def test_keyed_cumsum_matches_pandas(events):
    tbl, df = events
    out = keyed_cumsum(_ds(tbl), "k", "ts", "v", "run", tiebreak_col="eid").to_pandas()
    exp = df.sort_values(["k", "ts", "eid"], kind="mergesort")
    exp = exp.assign(run=exp.groupby("k", sort=False)["v"].cumsum())
    merged = out.set_index("eid")["run"]
    want = exp.set_index("eid")["run"]
    pd.testing.assert_series_equal(merged.sort_index(), want.sort_index())


def test_keyed_delta_matches_pandas(events):
    tbl, df = events
    out = keyed_delta(_ds(tbl), "k", "ts", "v", "d", tiebreak_col="eid").to_pandas()
    exp = df.sort_values(["k", "ts", "eid"], kind="mergesort")
    exp = exp.assign(d=exp.groupby("k", sort=False)["v"].diff())
    pd.testing.assert_series_equal(
        out.set_index("eid")["d"].sort_index(),
        exp.set_index("eid")["d"].sort_index(),
    )


def test_keyed_rate_nulls_on_zero_gap(events):
    tbl, df = events
    out = keyed_rate(_ds(tbl), "k", "ts", "v", "r", tiebreak_col="eid").to_pandas()
    exp = df.sort_values(["k", "ts", "eid"], kind="mergesort").copy()
    g = exp.groupby("k", sort=False)
    dv = g["v"].diff()
    dt = g["ts"].diff().dt.total_seconds()
    exp["r"] = (dv / dt.replace(0.0, np.nan)).where(dt > 0)
    pd.testing.assert_series_equal(
        out.set_index("eid")["r"].sort_index(),
        exp.set_index("eid")["r"].sort_index(),
    )
    # duplicate-ts rows (the tie block) must be null, never inf
    assert not np.isinf(out["r"].dropna()).any()


def test_session_index_and_sessionize(events):
    tbl, df = events
    gap_min = 60.0
    out = keyed_session_index(_ds(tbl), "k", "ts", gap_min, tiebreak_col="eid").to_pandas()
    exp = df.sort_values(["k", "ts", "eid"], kind="mergesort").copy()
    gap = pd.Timedelta(minutes=gap_min)
    exp["sidx"] = (
        exp.groupby("k", sort=False)["ts"].diff().gt(gap).astype("int64")
        .groupby(exp["k"], sort=False).cumsum()
    )
    pd.testing.assert_series_equal(
        out.set_index("eid")["session_idx"].sort_index(),
        exp.set_index("eid")["sidx"].sort_index(),
        check_names=False,
    )

    sess = sessionize(_ds(tbl), "k", "ts", gap_min, tiebreak_col="eid").to_pandas()
    want = (
        exp.groupby(["k", "sidx"])
        .agg(n_events=("ts", "size"), session_start=("ts", "min"), session_end=("ts", "max"))
        .reset_index()
        .rename(columns={"sidx": "session_idx"})
    )
    sess = sess.sort_values(["k", "session_idx"]).reset_index(drop=True)
    want = want.sort_values(["k", "session_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sess[["k", "session_idx", "n_events", "session_start", "session_end"]],
        want, check_dtype=False,
    )


def test_scan_summary_is_small(events):
    """The driver-side state is O(blocks), not O(keys or rows)."""
    from opentelemetry_collector_contrib_ray.stages.scan import _SortedScan

    tbl, _ = events
    scan = _SortedScan(_ds(tbl, nblocks=10), "k", "ts", "v", "eid")
    carry = ray.get(scan.carry_ref)
    # at most one carry entry per block
    assert len(carry) <= 10
