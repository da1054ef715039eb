"""Event sessionization / per-stream delta family over the events table.

The reference's time-state processors (deltatocumulative,
cumulativetodelta, deltatorate) are timer-flushed per-key state
machines; on a finite table their semantics collapse to per-key
ordered scans (SURVEY.md §2.5). Round 1 ran them as
``groupby(key).map_groups`` — a pandas frame per key, billions of
~100us frames at 100 TB. They now delegate to stages/scan.py: ONE
sort by (key, ts, tiebreak), then segmented numpy kernels per block
with O(blocks) boundary carry — no per-group Python.

``tiebreak_col`` makes duplicate (key, ts) ordering deterministic and
SQL-replayable (ORDER BY ts, tiebreak) — ADVICE round-1.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

from .scan import keyed_cumsum, keyed_delta, keyed_rate, keyed_session_index


def sessionize(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """One row per session: (key, session_idx, n_events, session_start,
    session_end). Session boundaries: inactivity gap > gap_minutes.

    Shape: distributed session-index scan (stages/scan.py), then a
    per-block partial collapse to one row per session slice (sessions
    are contiguous runs in the sorted blocks) and a grouped merge of
    only the partial rows — the merge shuffle moves one row per
    session per block, not the event stream."""
    idx = keyed_session_index(ds, key_col, ts_col, gap_minutes, tiebreak_col)

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table({
                key_col: pa.array([], b.schema.field(key_col).type),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "session_start": pa.array([], b.schema.field(ts_col).type),
                "session_end": pa.array([], b.schema.field(ts_col).type),
            })
        keys = b[key_col].to_numpy(zero_copy_only=False)
        sidx = b["session_idx"].to_numpy(zero_copy_only=False)
        change = np.concatenate([[True], (keys[1:] != keys[:-1]) | (sidx[1:] != sidx[:-1])])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], len(keys)) - 1
        lens = np.append(starts[1:], len(keys)) - starts
        t = b[ts_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        k = b[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        starts_idx = pa.array(starts)
        return pa.table({
            key_col: k.take(starts_idx),
            "session_idx": pa.array(sidx[starts], pa.int64()),
            "n_events": pa.array(lens, pa.int64()),
            "session_start": t.take(starts_idx),
            "session_end": t.take(pa.array(ends)),
        })

    partials = idx.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    merged = partials.groupby([key_col, "session_idx"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Min("session_start", alias_name="session_start"),
        Max("session_end", alias_name="session_end"),
    )
    return merged


def cumulative_to_delta(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "delta",
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """cumulativetodeltaprocessor (processor/cumulativetodeltaprocessor):
    per-stream difference of consecutive cumulative points; the first
    point of a stream has no delta (null)."""
    return keyed_delta(ds, key_col, ts_col, value_col, out_col, tiebreak_col)


def delta_rate(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "rate_per_s",
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """deltatorateprocessor (processor/deltatorateprocessor): per-stream
    value delta / elapsed seconds; first point of a stream and
    0-second gaps yield null."""
    return keyed_rate(ds, key_col, ts_col, value_col, out_col, tiebreak_col)


def cumulative_sum(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "running_total",
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """deltatocumulative semantics (processor/deltatocumulativeprocessor
    /config.go:21-29: running sums per stream identity) — per-key
    ordered cumulative sum; eviction (max_stale/max_streams) is
    unnecessary on finite input."""
    return keyed_cumsum(ds, key_col, ts_col, value_col, out_col, tiebreak_col)
