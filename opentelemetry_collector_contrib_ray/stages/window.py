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


def hopping_window_aggregate(
    ds: ray.data.Dataset,
    ts_col: str,
    dims: list[str],
    *,
    width_s: int,
    slide_s: int,
    sum_cols: dict[str, str] | None = None,
    count_name: str = "n",
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Hopping-window grouped count/sums (width >= slide; width ==
    slide degenerates to the tumbling window events_hourly uses).

    The streaming-analytics shape the intervalprocessor family lacks:
    each row belongs to ``k = width/slide`` overlapping windows, so the
    per-batch combiner REPLICATES rows into their covering windows
    (one vectorized take per hop — k is a small constant) and
    pre-aggregates per (window, dims) before the tiny partial stream
    tree-merges. No all-to-all shuffle; the row stream never leaves
    its tasks, only #windows × #dims partial rows move.
    """
    if width_s % slide_s != 0:
        raise ValueError("width_s must be a multiple of slide_s")
    k = width_s // slide_s
    sum_cols = sum_cols or {}

    from .aggregate import grouped_count_sum

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(window_col,
                                   pa.array([], pa.timestamp("us")))
        ts = b[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        slide_us = slide_s * 1_000_000
        width_us = width_s * 1_000_000
        # latest window containing t starts at floor(t/slide)*slide;
        # the k covering windows step back by slide
        last_start = (us // slide_us) * slide_us
        parts = []
        for i in range(k):
            start = last_start - i * slide_us
            keep = us - start < width_us  # guard: always true when width=k*slide
            t_i = b.append_column(
                window_col, pc.cast(pa.array(start), pa.timestamp("us")))
            parts.append(t_i.filter(pa.array(keep & (start >= 0))))
        return pa.concat_tables(parts, promote_options="none")

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return grouped_count_sum(exploded, dims + [window_col],
                             sum_cols=sum_cols, count_name=count_name)
