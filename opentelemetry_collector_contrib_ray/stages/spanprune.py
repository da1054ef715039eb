"""Span pruning — collapse groups of similar spans into summary rows.

Reference semantics (processor/spanpruningprocessor):

  * spans within one trace are grouped by (span name, kind, status,
    configured attributes) — README "Spans are grouped by";
  * a group with enough members is REPLACED by a single aggregated
    summary span carrying ``aggregation.is_summary`` +
    ``span_count`` / ``duration_min_ns`` / ``duration_max_ns`` /
    ``duration_total_ns`` (aggregation.go:178-183) and a time window
    spanning the whole group; smaller groups pass through unchanged;
  * non-grouped attributes of collapsed spans are lost (README
    "Attribute loss") — the price of compaction.

Flat-table reduction: a transcript turn is a span of its
conversation; the leaf/parent tree recursion does not apply (our
rows have no parent ids — documented reduction, same as the
tailsampling timer reduction). Groups are (trace_key × group_cols);
a group with ≥ min_group_size rows collapses to one summary row
(count + duration stats + first position), the rest pass through
with per-row singleton stats so the output schema is uniform.

Scale shape: per-batch Arrow hash-groupby partials (count/sum/min/
max are all mergeable) merge through ONE distributed groupby on the
composite key — the only shuffle, and it moves partial rows, not
the stream. The pruned-key set (groups that actually collapse —
bounded by corpus_rows / min_group_size and in practice tiny, it is
the duplicate mass) broadcasts into a stream-side filter; rows of
surviving groups never leave their block.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _pack_keys(batch: pa.Table, cols: list[str]) -> pa.Array:
    parts = []
    for c in cols:
        a = batch[c]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        parts.append(pc.cast(a, pa.string()))
    return pc.binary_join_element_wise(*parts, "\x1f")


def prune_spans(
    ds: ray.data.Dataset,
    trace_key: str,
    group_cols: list[str],
    *,
    duration_col: str,
    order_col: str,
    min_group_size: int = 2,
    broadcast_key_limit: int = 2_000_000,
    driver_partial_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Collapse every (trace, group_cols) group with at least
    ``min_group_size`` rows into one summary row; pass smaller groups
    through. Output columns: trace + group cols + ``order_col``
    (summary: first position), ``duration_col`` (summary: total),
    is_summary, span_count, duration_min/max/total.

    The pruned-key set is bounded by rows/min_group_size — NOT small on
    duplicate-heavy traces (the processor's whole use case). Up to
    ``broadcast_key_limit`` keys it broadcasts into a stream-side
    ``is_in`` filter (one object-store copy, zero shuffle); past the
    limit the stream anti-joins the key set instead (hash shuffle on
    the packed key, nothing driver-resident)."""
    keys = [trace_key] + group_cols

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(keys + [duration_col, order_col])
        g = t.group_by(keys).aggregate([
            ([], "count_all"), (duration_col, "sum"), (duration_col, "min"),
            (duration_col, "max"), (order_col, "min")])
        return g.rename_columns(keys + ["n", "dsum", "dmin", "dmax", "omin"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None) \
                 .materialize()
    if partials.count() <= driver_partial_limit:
        # SIZE GATE (same shape as tailpolicy._trace_features): one
        # driver Arrow group_by beats a distributed shuffle's fixed
        # executor floor while the partial set is thousands of rows;
        # the distributed merge below is unchanged past the gate
        tabs = [t for t in (ray.get(r) for r in partials.to_arrow_refs())
                if t.num_rows]
        gt = pa.concat_tables(tabs, promote_options="permissive")             .group_by(keys, use_threads=True).aggregate([
                ("n", "sum"), ("dsum", "sum"), ("dmin", "min"),
                ("dmax", "max"), ("omin", "min")]) if tabs else None
        if gt is None:
            merged = partials
        else:
            gt = gt.rename_columns(keys + ["n", "dsum", "dmin", "dmax", "omin"])
            merged = ray.data.from_arrow(gt)
    else:
        from ray.data.aggregate import Max, Min, Sum

        merged = partials.groupby(keys).aggregate(
            Sum("n"), Sum("dsum"), Min("dmin"), Max("dmax"), Min("omin"))
        ren = {"sum(n)": "n", "sum(dsum)": "dsum", "min(dmin)": "dmin",
               "max(dmax)": "dmax", "min(omin)": "omin"}
        merged = merged.map_batches(
            lambda b: b.rename_columns([ren.get(c, c) for c in b.column_names]),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    k = int(min_group_size)
    pruned = merged.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"].combine_chunks()
                                            if isinstance(b["n"], pa.ChunkedArray)
                                            else b["n"], k)),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    ).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keys}
        cols[order_col] = b["omin"]
        cols[duration_col] = b["dsum"]
        cols["is_summary"] = pa.array([True] * b.num_rows)
        cols["span_count"] = b["n"]
        cols["duration_min"] = b["dmin"]
        cols["duration_max"] = b["dmax"]
        cols["duration_total"] = b["dsum"]
        return pa.table(cols)

    summaries = pruned.map_batches(summarize, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None)

    def shape_passthrough(b: pa.Table) -> pa.Table:
        dur = b[duration_col]
        if isinstance(dur, pa.ChunkedArray):
            dur = dur.combine_chunks()
        cols = {k: b[k] for k in keys}
        cols[order_col] = b[order_col]
        cols[duration_col] = dur
        cols["is_summary"] = pa.array([False] * b.num_rows)
        cols["span_count"] = pa.array([1] * b.num_rows, pa.int64())
        cols["duration_min"] = dur
        cols["duration_max"] = dur
        cols["duration_total"] = dur
        return pa.table(cols)

    n_pruned = pruned.count()
    if n_pruned <= broadcast_key_limit:
        # broadcast the pruned key set; stream keeps the rest.
        # Ray 2.49 can emit zero-column empty blocks after groupby/
        # filter and applies a Project inconsistently across
        # materialized blocks; fetch raw blocks and select locally
        # (same hardening as the joins)
        tabs = [t.select(keys) for t in
                (ray.get(r) for r in pruned.to_arrow_refs())
                if t.num_columns]
        pruned_tbl = pa.concat_tables(tabs, promote_options="none") if tabs else None
        packed = _pack_keys(pruned_tbl, keys) if pruned_tbl is not None and \
            pruned_tbl.num_rows else pa.array([], pa.string())
        pruned_ref = ray.put(packed)

        def pass_through(b: pa.Table) -> pa.Table:
            mine = _pack_keys(b, keys)
            keep = pc.invert(pc.is_in(mine, value_set=ray.get(pruned_ref)))
            return shape_passthrough(b.filter(keep))

        kept = ds.map_batches(pass_through, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    else:
        # anti-join fallback: the key set is too big to broadcast —
        # hash-shuffle the stream against it on the packed key; the
        # key set never lands on the driver
        def add_pk(b: pa.Table) -> pa.Table:
            return b.append_column("__pk", _pack_keys(b, keys))

        def pk_only(b: pa.Table) -> pa.Table:
            return pa.table({"__pk": _pack_keys(b, keys)})

        from .dedup import normalize_empty_blocks

        stream = ds.map_batches(add_pk, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
        pk_ds = normalize_empty_blocks(
            pruned.map_batches(pk_only, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None),
            {"__pk": pa.string()})
        num_partitions = max(2, min(64, n_pruned // 500_000 + 2))
        kept_rows = stream.join(pk_ds, join_type="left_anti",
                                num_partitions=int(num_partitions),
                                on=("__pk",))
        kept = kept_rows.map_batches(shape_passthrough, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
    return kept.union(summaries)
