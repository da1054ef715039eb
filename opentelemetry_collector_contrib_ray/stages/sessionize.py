"""Event sessionization / windowed aggregates over the events table.

The reference's time-state processors (intervalprocessor,
deltatocumulative, tailsampling decision_wait) are timer-flushed
per-key state machines; on a finite table their semantics collapse to
per-key ordered scans (SURVEY.md §2.5 windows note). Implemented as
``groupby(key).map_groups`` over ts-sorted groups — the ordering
assumption (all events of a key in one group, sorted here) is
guaranteed by the shuffle, not by arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sessionize(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> ray.data.Dataset:
    """Assign session ids per key with a inactivity-gap rule; one row
    per session: (key, session_idx, n_events, session_start,
    session_end). Session boundaries: gap > gap_minutes."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        new_sess = g[ts_col].diff() > gap
        sess_idx = new_sess.cumsum().astype(np.int64)
        out = g.assign(session_idx=sess_idx).groupby("session_idx", sort=True).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        )
        out = out.reset_index()
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def cumulative_to_delta(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "delta",
) -> ray.data.Dataset:
    """cumulativetodeltaprocessor (processor/cumulativetodeltaprocessor):
    per-stream difference of consecutive cumulative points; the first
    point of a stream has no delta (null)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        return g.assign(**{out_col: g[value_col].diff()})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def delta_rate(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "rate_per_s",
) -> ray.data.Dataset:
    """deltatorateprocessor (processor/deltatorateprocessor): per-stream
    value delta divided by the elapsed seconds between consecutive
    points; the first point of a stream has no rate (null)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        dv = g[value_col].diff()
        # explicit microsecond epoch (pandas datetime unit varies)
        us = pd.Series(g[ts_col].values.astype("datetime64[us]").astype("int64"),
                       index=g.index)
        return g.assign(**{out_col: dv / (us.diff() / 1e6)})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def cumulative_sum(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "running_total",
) -> ray.data.Dataset:
    """deltatocumulative semantics (processor/deltatocumulativeprocessor
    /config.go:21-29: running sums per stream identity) — per-key
    ordered cumulative sum; eviction (max_stale/max_streams) is
    unnecessary on finite input."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        return g.assign(**{out_col: g[value_col].cumsum()})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
