"""Metric start-time processor — set cumulative-series start times.

Reference semantics (processor/metricstarttimeprocessor/README.md):
cumulative points arrive without a start time; per series,

  * ``true_reset_point``: the first observed point becomes the reset
    point (start == its own end timestamp) and every later point
    reuses that start timestamp;
  * ``subtract_initial_point``: the first point is DROPPED, its value
    subtracted from every later point, and its timestamp becomes the
    series start timestamp.

The reference keeps per-series first-point state in memory (gc'd on
an interval); the finite-table shape is the two-pass broadcast the
zscore/tail-sample stages use: pass 1 reduces the stream to one
(first_ts, first_val) row per series — per-batch ordered Arrow
``first`` partials, then a tree merge that re-sorts and takes first
again (associative because min-ts wins at every level) — and pass 2
rewrites the stream against the broadcast map. Series cardinality
must be broadcast-sized, exactly the reference's own in-memory map
bound. Duplicate (series, ts) first points are tie-broken by value
(the min value at the min ts is the initial point); in
``subtract_initial_point`` only rows matching the initial point on
BOTH ts and value are dropped — same-ts rows with a different value
survive with the subtraction applied. Rows fully identical to the
initial point carry no distinguishing id, so all of them are dropped
(the reference drops exactly one; with byte-identical duplicate
points the difference is unobservable in any downstream aggregate
except count).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .aggregate import tree_reduce
from .enrich import _composite_key


def metric_start_time(
    ds: ray.data.Dataset,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    strategy: str = "true_reset_point",
    out_col: str = "start_time",
) -> ray.data.Dataset:
    if strategy not in ("true_reset_point", "subtract_initial_point"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(key_cols + [ts_col, value_col])
        t = t.sort_by([(ts_col, "ascending"), (value_col, "ascending")])
        g = t.group_by(key_cols, use_threads=False).aggregate(
            [(ts_col, "first"), (value_col, "first")])
        return g.rename_columns(key_cols + ["first_ts", "first_val"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    def combine(tables: list[pa.Table]) -> pa.Table:
        merged = pa.concat_tables(
            [t for t in tables if t.num_rows] or tables[:1],
            promote_options="none")
        merged = merged.sort_by([("first_ts", "ascending"),
                                 ("first_val", "ascending")])
        g = merged.group_by(key_cols, use_threads=False).aggregate(
            [("first_ts", "first"), ("first_val", "first")])
        return g.rename_columns(key_cols + ["first_ts", "first_val"])

    firsts = tree_reduce(partials, combine)
    ref = ray.put((
        _composite_key(firsts, key_cols),
        firsts["first_ts"],
        firsts["first_val"].to_numpy(zero_copy_only=False),
    ))
    subtract = strategy == "subtract_initial_point"

    def rewrite(b: pa.Table) -> pa.Table:
        key_arr, first_ts, first_val = ray.get(ref)
        idx = pc.index_in(_composite_key(b, key_cols), value_set=key_arr)
        start = pc.take(first_ts, idx)
        b = b.append_column(out_col, start)
        if not subtract:
            return b
        ts = b[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        v = b[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        idx_np = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
        fv = pa.array(first_val[idx_np], v.type)
        # drop the initial point only: ts AND value must both match the
        # recorded first point. Same-ts rows with a different value are
        # distinct points and are kept (value - first_val); rows fully
        # identical to the first point are indistinguishable without a
        # stable id and are ALL dropped (documented in the module doc).
        is_first = pc.and_(pc.equal(ts, pc.cast(start, ts.type)),
                           pc.equal(v, fv))
        adj = pc.subtract(v, fv)
        b = b.set_column(b.column_names.index(value_col), value_col, adj)
        return b.filter(pc.invert(pc.fill_null(is_first, False)))

    return ds.map_batches(rewrite, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
