"""Windowed per-stream state operators (interval / delta-to-cumulative).

Reference semantics: intervalprocessor keeps the LAST value per stream
identity and flushes every interval (processor/intervalprocessor/
processor.go:102-234); deltatocumulativeprocessor keeps running sums
per stream (processor/deltatocumulativeprocessor/config.go:21-29).
On a finite table the timer disappears (SURVEY.md §2.5): the interval
becomes an event-time window key and the state machine becomes a
per-key ordered scan after the shuffle. ``max_stale``/``max_streams``
eviction is unnecessary — group completeness is exact.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def last_value_per_window(
    ds: ray.data.Dataset,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    window: str = "hour",
) -> ray.data.Dataset:
    """intervalprocessor: one row per (keys, window) carrying the
    latest value by event time. Partial-per-batch (arrow max ts +
    join back) would need an argmax kernel; with bounded key-window
    cardinality a groupby.map_groups is the simple exact shape."""

    def add_window(b: pa.Table) -> pa.Table:
        col = b[ts_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return b.append_column("window_start", pc.floor_temporal(col, unit=window))

    ds = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        row = g.iloc[[-1]][key_cols + ["window_start", ts_col, value_col]]
        return row.rename(columns={ts_col: "last_ts", value_col: "last_value"})

    return ds.groupby(key_cols + ["window_start"]).map_groups(last, batch_format="pandas")
