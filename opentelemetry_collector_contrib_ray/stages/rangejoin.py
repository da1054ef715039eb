"""Range join — attach the interval containing each row's timestamp.

The third custom-join shape next to the equijoin (servicegraph) and
the as-of join: rows match intervals by containment
(``start <= ts < end``), the lookup-enrichment pattern for
maintenance windows, incident ranges, rate-limit windows.

Shape: the interval side is BROADCAST (ray.put once, read per task)
and must be non-overlapping — then containment is one
``np.searchsorted`` against the sorted starts plus an end check per
batch: O(log n_intervals) per row, fully vectorized, and the row
stream never shuffles (same scale posture as LookupEnrich). An
overlapping or corpus-sized interval set needs an interval-partitioned
join instead — the constructor fails LOUD on overlap rather than
silently picking a match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _ts_us_arr(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64()) \
        .to_numpy(zero_copy_only=False)


def range_join_broadcast(
    ds: ray.data.Dataset,
    ts_col: str,
    intervals: pa.Table,
    *,
    start_col: str,
    end_col: str,
    payload_cols: list[str],
    how: str = "inner",
) -> ray.data.Dataset:
    """Join rows to the (unique) interval with
    ``start <= ts < end``. ``how``: "inner" drops non-matching rows,
    "left" keeps them with null payload."""
    starts = _ts_us_arr(intervals[start_col])
    ends = _ts_us_arr(intervals[end_col])
    order = np.argsort(starts, kind="stable")
    starts, ends = starts[order], ends[order]
    if len(starts) > 1 and (ends[:-1] > starts[1:]).any():
        raise ValueError("range_join_broadcast: intervals overlap — "
                         "containment would be ambiguous")
    if (ends < starts).any():
        raise ValueError("range_join_broadcast: interval end before start")
    sorted_iv = intervals.take(pa.array(order))
    ref = ray.put((starts, ends, sorted_iv.select(payload_cols)))

    def join(b: pa.Table) -> pa.Table:
        s, e, payload = ray.get(ref)
        ts = _ts_us_arr(b[ts_col])
        idx = np.searchsorted(s, ts, side="right") - 1
        ok = (idx >= 0) & (ts < e[np.clip(idx, 0, None)])
        idx_arr = pa.array(np.where(ok, idx, 0), pa.int64())
        okp = pa.array(ok)
        for c in payload_cols:
            vals = pc.take(payload[c].combine_chunks()
                           if isinstance(payload[c], pa.ChunkedArray)
                           else payload[c], idx_arr)
            vals = pc.if_else(okp, vals, pa.nulls(b.num_rows, vals.type))
            b = b.append_column(c, vals)
        if how == "inner":
            b = b.filter(okp)
        return b

    return ds.map_batches(join, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
