"""Exceptions connector — exception events → metrics and logs.

Reference semantics (connector/exceptionsconnector):

  * ``connector_metrics.go:69-118``: walk span events, keep those
    named "exception", build a key from the default dimensions
    (service.name, span.name, span.kind, status.code) plus configured
    extra dimensions (with optional defaults, missing-dim handling as
    in pdatautil.Dimension), and count per key; optionally attach
    span exemplars to each metric point.
  * ``connector_logs.go:63-112``: for every exception event emit one
    log record carrying exception.type / exception.message /
    exception.stacktrace plus the span attributes.

Ray mapping: the exception filter + dimension handling is exactly the
count-connector path (aggregate.MetricDef / _dims_prepare), so the
metrics side is a per-batch Arrow hash-groupby partial followed by a
tree merge — no all-to-all shuffle; only #keys × #blocks partial rows
move. The reference's exemplar slice is unbounded per key; a finite
engine needs a deterministic, mergeable choice, so we keep the MIN of
a packed "<span_key>#<idx>" exemplar id per key (mergeable by min,
stable across block orders). The logs side is a streaming filter +
projection (one row per exception event) that never materializes.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .aggregate import MetricDef, _dims_prepare, tree_reduce


def _pack_exemplar(batch: pa.Table, key_cols: tuple[str, str]) -> pa.Array:
    """Deterministic exemplar id: "<key0>#<zero-padded key1>"."""
    a = batch[key_cols[0]]
    b = batch[key_cols[1]]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    a = pc.cast(a, pa.string())
    b = pc.utf8_lpad(pc.cast(b, pa.string()), width=8, padding="0")
    return pc.binary_join_element_wise(a, b, "#")


def exception_metrics(
    ds: ray.data.Dataset,
    *,
    condition: Any,
    dims: list[tuple[str, Any]],
    count_name: str = "exceptions_total",
    exemplars: bool = False,
    exemplar_key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
) -> ray.data.Dataset:
    """Count exception events per dimension key (+ optional exemplar).

    ``condition`` is the exception predicate (the reference keys on
    span events named "exception"; our transcript analog is the
    caller's choice, e.g. severity_text == 'ERROR'). ``dims`` follows
    MetricDef: (column, default|None); a missing dim with no default
    skips the record (connector_metrics.go via pdatautil dimensions).
    """
    def_ = MetricDef(name=count_name, agg="count",
                     conditions=[condition], dims=dims)
    dim_names = [d for d, _ in dims]

    def partial(b: pa.Table) -> pa.Table:
        b = _dims_prepare(b, def_)
        cols = {d: b[d] for d in dim_names}
        if exemplars:
            cols["__ex"] = _pack_exemplar(b, exemplar_key_cols) if b.num_rows \
                else pa.array([], pa.string())
        t = pa.table(cols) if cols else b.select([])
        aggs = [([], "count_all")]
        names = dim_names + [count_name]
        if exemplars:
            aggs.append(("__ex", "min"))
            names.append("exemplar")
        g = t.group_by(dim_names).aggregate(aggs)
        return g.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    def combine(tables: list[pa.Table]) -> pa.Table:
        merged = pa.concat_tables(
            [t for t in tables if t.num_rows] or tables[:1],
            promote_options="none")
        aggs = [(count_name, "sum")]
        names = dim_names + [count_name]
        if exemplars:
            aggs.append(("exemplar", "min"))
            names.append("exemplar")
        g = merged.group_by(dim_names).aggregate(aggs)
        return g.rename_columns(names)

    return ray.data.from_arrow(tree_reduce(partials, combine))


def exception_logs(
    ds: ray.data.Dataset,
    *,
    condition: Any,
    attrs: list[str],
    type_col: str | None = None,
    type_from_status: str | None = None,
) -> ray.data.Dataset:
    """One log record per exception event (connector_logs.go:63-112).

    Keeps ``attrs`` (the span-attribute copy; the reference copies the
    whole span attr map and tells users to prune with the transform
    processor). ``type_from_status`` derives an exception.type label
    from an HTTP-ish status column ("HTTP_4xx"/"HTTP_5xx"...) when the
    input has no explicit exception.type — our transcript analog.
    """
    from ..expr import compile_predicate

    pred = compile_predicate(condition)

    def f(b: pa.Table) -> pa.Table:
        out = b.filter(pc.fill_null(pred(b), False)).select(attrs)
        if type_from_status is not None:
            st = out[type_from_status]
            if isinstance(st, pa.ChunkedArray):
                st = st.combine_chunks()
            klass = pc.cast(pc.divide(st, 100), pa.string())
            typ = pc.binary_join_element_wise("HTTP_", klass, "xx", "")
            out = out.append_column("exception_type", typ)
        elif type_col is not None:
            out = out.append_column("exception_type", out[type_col])
        return out

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
