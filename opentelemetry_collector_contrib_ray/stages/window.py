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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_SIGN_FLIP = np.uint64(1) << np.uint64(63)


def _us_to_be8(us: np.ndarray) -> pa.Array:
    """int64 microseconds -> order-preserving 8-byte big-endian binary
    (two's-complement sign-bit flip makes unsigned byte order match
    signed integer order)."""
    be = (us.astype(np.int64).view(np.uint64) ^ _SIGN_FLIP).astype(">u8")
    fsb = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(8), len(us), [None, pa.py_buffer(be.tobytes())])
    return pc.cast(fsb, pa.binary())


def _be8_to_us(b: pa.Array) -> np.ndarray:
    b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
    n = len(b)
    offs = np.frombuffer(b.buffers()[1], np.int32, count=n + 1, offset=b.offset * 4)
    raw = np.frombuffer(b.buffers()[2], ">u8", count=n, offset=int(offs[0]))
    return (raw.astype(np.uint64) ^ _SIGN_FLIP).view(np.int64)


def last_value_per_window(
    ds: ray.data.Dataset,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    window: str = "hour",
) -> ray.data.Dataset:
    """intervalprocessor: one row per (keys, window) carrying the
    latest value by event time.

    "last by ts" is associative: each block collapses to one row per
    (keys, window) with a vectorized groupby-idxmax partial, and the
    final merge is a DISTRIBUTED ``ds.groupby(...).max()`` over a
    binary-packed ``ts || value`` column — byte order on the 8-byte
    big-endian ts prefix makes lexicographic max equal argmax-by-ts,
    so the stock hash aggregate does the reduction fully vectorized.
    Group cardinality is unbounded-safe: the only shuffle moves one
    partial row per (group, block) and the result never lands on the
    driver (round-2 VERDICT #2 replaced the tree-reduce-to-driver
    merge). Ties at the max ts break deterministically by value bytes.
    Value types: int64 / float64 / string (nulls in ``value_col`` are
    packed as empty payloads and decode to null)."""
    group_cols_w = key_cols + ["window_start"]
    sch = ds.schema()
    vtype = dict(zip(sch.names, sch.types))[value_col]
    if pa.types.is_floating(vtype) or pa.types.is_integer(vtype):
        kind = "f8" if pa.types.is_floating(vtype) else "i8"
    elif pa.types.is_string(vtype) or pa.types.is_large_string(vtype):
        kind = "str"
    else:
        raise ValueError(f"unsupported value type {vtype} for "
                         "last_value_per_window")

    def add_window(b: pa.Table) -> pa.Table:
        col = b[ts_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return b.append_column("window_start", pc.floor_temporal(col, unit=window))

    ds = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(group_cols_w + [ts_col, value_col])
        t = t.sort_by([(ts_col, "ascending")])
        g = t.group_by(group_cols_w, use_threads=False).aggregate(
            [(ts_col, "last"),
             (value_col, "last", pc.ScalarAggregateOptions(skip_nulls=False))])
        return g.rename_columns(group_cols_w + ["last_ts", "last_value"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    def pack(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.select(group_cols_w).append_column(
                "packed", pa.array([], pa.binary()))
        ts = b["last_ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tsb = _us_to_be8(us)
        v = b["last_value"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if kind == "str":
            vb = pc.fill_null(pc.cast(v, pa.binary()), b"")
        else:
            dt = np.float64 if kind == "f8" else np.int64
            vf = pc.fill_null(v, 0) if v.null_count else v
            vn = vf.to_numpy(zero_copy_only=False).astype(dt, copy=False)
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(8), n, [None, pa.py_buffer(vn.tobytes())])
            vb = pc.cast(fsb, pa.binary())
        # 1-byte presence flag distinguishes a null value from an empty
        # string / zero payload (both pack the payload bytes as-is)
        flag = pc.if_else(pc.is_null(v), pa.scalar(b"\x00", pa.binary()),
                          pa.scalar(b"\x01", pa.binary()))
        if v.null_count:
            vb = pc.if_else(pc.is_null(v), pa.scalar(b"", pa.binary()), vb)
        packed = pc.binary_join_element_wise(tsb, flag, vb, b"")
        return b.select(group_cols_w).append_column("packed", packed)

    packed_partials = partials.map_batches(pack, batch_format="pyarrow",
                                           zero_copy_batch=True, batch_size=None)
    agg = packed_partials.groupby(group_cols_w).max("packed")

    def unpack(b: pa.Table) -> pa.Table:
        p = b["max(packed)"]
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        n = b.num_rows
        if n == 0:
            return b.select(group_cols_w).append_column(
                "last_ts", pa.array([], pa.timestamp("ns"))).append_column(
                "last_value", pa.nulls(0, vtype))
        us = _be8_to_us(pc.binary_slice(p, 0, 8))
        ts = pc.cast(pa.array(us, pa.int64()).cast(pa.timestamp("us")),
                     pa.timestamp("ns"))
        present = pc.equal(pc.binary_slice(p, 8, 9),
                           pa.scalar(b"\x01", pa.binary()))
        vb = pc.binary_slice(p, 9, np.iinfo(np.int32).max)
        if kind == "str":
            vals = pc.if_else(present, pc.cast(vb, vtype), pa.nulls(n, vtype))
        else:
            vb = vb.combine_chunks() if isinstance(vb, pa.ChunkedArray) else vb
            valid = present.to_numpy(zero_copy_only=False)
            offs = np.frombuffer(vb.buffers()[1], np.int32, count=n + 1,
                                 offset=vb.offset * 4)
            data = np.frombuffer(vb.buffers()[2], np.uint8)
            dt = np.float64 if kind == "f8" else np.int64
            if valid.all():
                out = np.frombuffer(
                    vb.buffers()[2], dt, count=n, offset=int(offs[0]))
            else:
                out = np.zeros(n, dt)
                for i in np.nonzero(valid)[0]:
                    out[i] = data[offs[i]:offs[i] + 8].view(dt)[0]
            vals = pa.array(out, vtype, mask=~valid)
        return b.select(group_cols_w).append_column(
            "last_ts", ts).append_column("last_value", vals)

    return agg.map_batches(unpack, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)


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
