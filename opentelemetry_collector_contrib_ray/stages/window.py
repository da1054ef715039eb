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
    latest value by event time.

    "last by ts" is associative, so this is the same partial-then-
    merge shape as the count/sum connectors (no per-group pandas
    frame — round-1 VERDICT #9): each block collapses to one row per
    (keys, window) with a vectorized groupby-idxmax, then a parallel
    tree reduce applies the same argmax combine to the partial rows.
    Only #groups x #blocks partial rows ever move."""
    group_cols_w = key_cols + ["window_start"]

    def add_window(b: pa.Table) -> pa.Table:
        col = b[ts_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return b.append_column("window_start", pc.floor_temporal(col, unit=window))

    ds = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: df[c] for c in group_cols_w}).assign(
                last_ts=df[ts_col], last_value=df[value_col])
        i = df.groupby(group_cols_w, sort=False)[ts_col].idxmax()
        out = df.loc[i, group_cols_w + [ts_col, value_col]]
        return out.rename(columns={ts_col: "last_ts", value_col: "last_value"})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def combine(tables: list[pa.Table]) -> pa.Table:
        import pyarrow as _pa

        merged = _pa.concat_tables([t for t in tables if t.num_rows] or tables[:1],
                                   promote_options="none")
        df = merged.to_pandas()
        if df.empty:
            return merged
        i = df.groupby(group_cols_w, sort=False)["last_ts"].idxmax()
        return _pa.Table.from_pandas(df.loc[i], preserve_index=False)

    from .aggregate import tree_reduce

    return ray.data.from_arrow(tree_reduce(partials, combine))
