"""Count/sum metric aggregation — the count/sum connectors on Ray Data.

Reference semantics (connector/countconnector/counter.go:39-149,
config.go:20-64; connector/sumconnector/sum.go:21-100):

  * per metric definition: OTTL ``conditions`` OR-ed (empty = match
    all), dimension attributes with optional ``default_value``;
  * a record missing a dimension with no default is SKIPPED
    (counter.go:64-67) — in our columnar model "missing" means null
    or empty string;
  * count increments per attr-set; sum parses a numeric
    source_attribute.

The reference counts per consumed batch and emits deltas; the merged
total over a finite run equals one global grouped aggregate
(SURVEY.md §3.3). Scale design: each batch is PRE-AGGREGATED inside
map_batches with Arrow's hash group-by (one partial row per key per
batch — the same partial-then-merge shape as counter.go:110-126),
then the tiny partial stream is merged with a parallel tree reduce
(``tree_merge_groupby``) — no all-to-all shuffle at all; only
#distinct-keys x #blocks partial rows ever move.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..expr import compile_predicate


@dataclass
class MetricDef:
    """One count/sum definition (countconnector config.go:20-64).

    ``resource_keys`` are the STRUCTURAL per-Resource grouping columns
    (counter.go:39-60 counts within each Resource): unlike ``dims``
    they have no missing-skip semantics — a null resource attribute
    forms its own group, exactly as an absent resource attribute forms
    its own Resource in the reference (golden logs/input.yaml has a
    resource with no attributes at all, and every golden output keeps
    it)."""

    name: str
    agg: str = "count"  # "count" | "sum"
    source: str | None = None  # summed column for agg="sum"
    conditions: list[Any] = field(default_factory=list)  # OR-ed predicates
    dims: list[tuple[str, Any]] = field(default_factory=list)  # (col, default|None)
    resource_keys: list[str] = field(default_factory=list)  # structural group-by
    value_name: str | None = None  # output column; default <name>
    # sum.go:40-57 parity mode: a record with an ABSENT source attr or
    # an unparseable string contributes 0.0 and is still counted into
    # its attr-set group (sumVal, _ = strconv.ParseFloat swallows the
    # error; a missing attr leaves sumVal at 0). Default False keeps
    # SQL-oracle SUM semantics (null source rows ignored), which the
    # SQL-checked agg_dur_sum query pins.
    missing_source_as_zero: bool = False

    def out_col(self) -> str:
        return self.value_name or self.name


def _dims_prepare(batch: pa.Table, def_: MetricDef) -> pa.Table:
    """Apply conditions, dimension defaults and missing-dim skip."""
    if def_.conditions:
        mask = None
        for c in def_.conditions:
            m = compile_predicate(c)(batch)
            mask = m if mask is None else pc.or_(mask, m)
        batch = batch.filter(mask)
    keep = None
    for dim, default in def_.dims:
        col = batch[dim]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        missing = pc.is_null(col)
        if pa.types.is_string(col.type):
            missing = pc.or_(missing, pc.equal(col, ""))
            missing = pc.fill_null(missing, True)
        if default is not None:
            col = pc.if_else(missing, pa.scalar(default, col.type), col)
            batch = batch.set_column(batch.column_names.index(dim), dim, col)
        else:
            ok = pc.invert(missing)
            keep = ok if keep is None else pc.and_(keep, ok)
    if keep is not None:
        batch = batch.filter(keep)
    if def_.agg == "sum":
        src = batch[def_.source]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if def_.missing_source_as_zero:
            # ParseFloat-with-ignored-error semantics: coerce, then 0
            # for absent/unparseable (sum.go:40-57)
            import pandas as pd

            vals = pd.to_numeric(pd.Series(src.to_pandas()), errors="coerce") \
                .fillna(0.0).to_numpy(dtype="float64")
            batch = batch.set_column(
                batch.column_names.index(def_.source), def_.source,
                pa.array(vals, pa.float64()))
        else:
            # SQL SUM semantics: null source rows are ignored
            batch = batch.filter(pc.is_valid(src))
    return batch


def _partial(batch: pa.Table, def_: MetricDef) -> pa.Table:
    """Per-batch combiner: one row per key (Arrow hash group-by).
    Null resource-key values form their own groups (Arrow's group_by
    hashes nulls together), matching per-Resource counting."""
    batch = _dims_prepare(batch, def_)
    dims = def_.resource_keys + [d for d, _ in def_.dims]
    out = def_.out_col()
    if batch.num_rows == 0:
        typ = pa.int64() if def_.agg == "count" else batch.schema.field(def_.source).type
        empty = {d: pa.array([], batch.schema.field(d).type) for d in dims}
        empty[out] = pa.array([], typ)
        return pa.table(empty)
    if def_.agg == "count":
        g = batch.select(dims).group_by(dims).aggregate([([], "count_all")])
        g = g.rename_columns(dims + [out])
    else:
        g = batch.select(dims + [def_.source]).group_by(dims).aggregate([(def_.source, "sum")])
        g = g.rename_columns(dims + [out])
    return g


def tree_merge_groupby(
    partials: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    fan_in: int = 64,
) -> pa.Table:
    """Merge a partial-aggregate stream WITHOUT a Ray sort shuffle.

    Valid when the grouped key cardinality is bounded (metric dims,
    sink names — NOT raw text keys): level 1 coalesces blocks
    (``repartition`` moves blocks, not rows) and combines each with an
    Arrow hash group-by, so at most ``fan_in x n_keys`` rows reach the
    driver for the final combine. The commutative merge (sums) makes
    the tree shape invisible in the result. For unbounded keys use a
    real ``ds.groupby`` instead (see exact_dedup).
    """
    def combine(tables: list[pa.Table]) -> pa.Table:
        merged = pa.concat_tables([t for t in tables if t.num_rows] or tables[:1],
                                  promote_options="none")
        g = merged.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
        return g.rename_columns(keys + sum_cols)

    return tree_reduce(partials, combine, fan_in=fan_in)


def tree_reduce(partials: ray.data.Dataset, combine, fan_in: int = 64) -> pa.Table:
    """Parallel tree reduce of a partial-table stream with an arbitrary
    associative+commutative ``combine(list[pa.Table]) -> pa.Table``.

    The Dataset API has no tree-reduce and a full ``ds.groupby``
    sort-shuffle is overkill for a commutative merge; raw Ray tasks
    combine ``fan_in`` tables per round until one driver-side combine
    finishes. materialize() pins the (small) partial blocks so the
    refs below cannot trigger lineage re-execution of upstream tasks
    (which may have side effects, e.g. sink writes in the fused
    flagship pass)."""
    import ray as _ray

    combine_task = _ray.remote(num_cpus=1)(lambda *ts: combine(list(ts)))
    refs = partials.materialize().to_arrow_refs()
    while len(refs) > fan_in:
        refs = [
            combine_task.remote(*refs[i : i + fan_in])
            for i in range(0, len(refs), fan_in)
        ]
    return combine(_ray.get(refs))


def run_metric_def(ds: ray.data.Dataset, def_: MetricDef) -> ray.data.Dataset:
    """filter -> per-batch partial -> tree-combine merge (metric dims
    are low-cardinality, so no all-to-all shuffle is needed)."""
    dims = def_.resource_keys + [d for d, _ in def_.dims]
    out = def_.out_col()
    partials = ds.map_batches(lambda b, d=def_: _partial(b, d), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    merged = tree_merge_groupby(partials, dims, [out])
    return ray.data.from_arrow(merged)


def grouped_count_sum(
    ds: ray.data.Dataset,
    dims: list[str],
    sum_cols: dict[str, str] | None = None,
    count_name: str = "n",
) -> ray.data.Dataset:
    """Generic partial-then-merge grouped count + sums (the
    signaltometrics generalization of count/sum connectors).

    ``sum_cols`` maps input column -> output name. Per-batch Arrow
    hash group-by emits one partial row per key; a tree reduce then
    merges the partials (bounded key cardinality assumed).
    """
    sum_cols = sum_cols or {}

    def partial(b: pa.Table) -> pa.Table:
        aggs = [([], "count_all")] + [(c, "sum") for c in sum_cols]
        g = b.select(dims + list(sum_cols)).group_by(dims).aggregate(aggs)
        return g.rename_columns(dims + [count_name] + [sum_cols[c] for c in sum_cols])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    merged = tree_merge_groupby(partials, dims, [count_name] + list(sum_cols.values()))
    return ray.data.from_arrow(merged)


def expo_histogram(
    ds: ray.data.Dataset,
    value_col: str,
    dims: list[str],
    scale: int = 2,
    out_count: str = "n",
) -> ray.data.Dataset:
    """Base-2 exponential histogram — the reference's expohisto sketch
    (pkg/expohisto; OTel exponential histogram: bucket index =
    floor(log2(value) * 2^scale) for value > 0). Mergeable by bucket
    count addition, so the per-batch partial + tree merge shape
    applies unchanged. Non-positive/null values are skipped (the
    reference tracks them in a zero bucket)."""
    factor = float(1 << scale)

    def bucketize(b: pa.Table) -> pa.Table:
        import numpy as np

        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(v) & (v > 0)
        idx = np.full(len(v), np.iinfo(np.int64).min, dtype=np.int64)
        idx[ok] = np.floor(np.log2(v[ok]) * factor).astype(np.int64)
        out = b.append_column("bucket", pa.array(idx, pa.int64()))
        return out.filter(pa.array(ok))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return grouped_count_sum(bucketed, dims + ["bucket"], count_name=out_count)


def add_hour_column(ds: ray.data.Dataset, ts_col: str = "ts", out: str = "hour") -> ray.data.Dataset:
    """hour = TruncateTime(ts, 'hour') (func_truncate_time.go /
    floor_temporal) — the window key for per-(role, tool, hour)
    aggregates; finite-input window semantics per SURVEY.md §2.5."""

    def f(b: pa.Table) -> pa.Table:
        col = b[ts_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return b.append_column(out, pc.floor_temporal(col, unit="hour"))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def aggregate_labels(
    ds: ray.data.Dataset,
    label_set: list[str],
    value_col: str,
    aggregation_type: str = "sum",
    out_col: str | None = None,
) -> ray.data.Dataset:
    """metricstransformprocessor ``aggregate_labels`` (README:96-110 —
    drop every label not in ``label_set`` and aggregate datapoints
    that collapse onto the same remaining label values).

    sum/min/max/count/mean are MERGEABLE: per-batch Arrow hash
    group-by partials + tree merge, no all-to-all shuffle (mean rides
    on merged sum+count). ``median`` is an exact order statistic —
    it delegates to stages/sketch.grouped_quantiles (one sort +
    O(groups+blocks) run summaries) over a packed label key, matching
    DuckDB ``quantile_disc(0.5)``."""
    out = out_col or value_col
    if aggregation_type == "median":
        import pyarrow.compute as _pc

        from .sketch import grouped_quantiles

        SEP = "\x1f"

        def pack(b: pa.Table) -> pa.Table:
            parts = [pc.cast(b[c], pa.string()) for c in label_set]
            key = parts[0] if len(parts) == 1 else \
                _pc.binary_join_element_wise(*parts, SEP)
            return pa.table({"__lk__": key, value_col: b[value_col]})

        t = grouped_quantiles(ds.map_batches(pack, batch_format="pyarrow",
                                             zero_copy_batch=True,
                                             batch_size=None),
                              "__lk__", value_col, [0.5])
        keys = _pc.split_pattern(t["__lk__"].combine_chunks()
                                 if isinstance(t["__lk__"], pa.ChunkedArray)
                                 else t["__lk__"], pattern=SEP)
        cols = {c: _pc.list_flatten(_pc.list_slice(
                    keys, start=i, stop=i + 1, return_fixed_size_list=True))
                for i, c in enumerate(label_set)}
        cols[out] = t["value"]
        return ray.data.from_arrow(pa.table(cols))
    if aggregation_type not in ("sum", "mean", "min", "max", "count"):
        raise ValueError(
            f"aggregate_labels: bad aggregation_type {aggregation_type!r}")

    aggs = {"sum": [(value_col, "sum")], "min": [(value_col, "min")],
            "max": [(value_col, "max")], "count": [([], "count_all")],
            "mean": [(value_col, "sum"), ([], "count_all")]}[aggregation_type]
    names = {"sum": [out], "min": [out], "max": [out], "count": [out],
             "mean": ["__sum__", "__n__"]}[aggregation_type]

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(label_set + [value_col]).group_by(label_set) \
             .aggregate(aggs)
        return g.rename_columns(label_set + names)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    if aggregation_type in ("sum", "count"):
        merged = tree_merge_groupby(partials, label_set, names)
    else:
        # min/max merge with their own op; mean merges sum+count
        def combine(tables: list[pa.Table]) -> pa.Table:
            t = pa.concat_tables(tables, promote_options="permissive")
            op = {"min": "min", "max": "max", "mean": "sum"}[aggregation_type]
            g = t.group_by(label_set).aggregate([(c, op) for c in names])
            return g.rename_columns(label_set + names)

        merged = tree_reduce(partials, combine)
    if aggregation_type == "mean":
        mean = pc.divide(pc.cast(merged["__sum__"], pa.float64()),
                         pc.cast(merged["__n__"], pa.float64()))
        merged = merged.drop_columns(["__sum__", "__n__"]) \
                       .append_column(out, mean)
    return ray.data.from_arrow(merged)


def aggregate_label_values(
    ds: ray.data.Dataset,
    label: str,
    aggregated_values: list[str],
    new_value: str,
    label_set: list[str],
    value_col: str,
    aggregation_type: str = "sum",
    out_col: str | None = None,
) -> ray.data.Dataset:
    """metricstransformprocessor ``aggregate_label_values``
    (README:101-110): remap the listed label values to ``new_value``,
    then aggregate datapoints that now collapse together."""
    mapping = {v: new_value for v in aggregated_values}

    def remap(b: pa.Table) -> pa.Table:
        from .transform import Statement

        return Statement("value_map", {"target": label, "mapping": mapping,
                                       "default_keep": True})(b)

    remapped = ds.map_batches(remap, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return aggregate_labels(remapped, label_set, value_col,
                            aggregation_type, out_col)


def combine_metrics(
    ds: ray.data.Dataset,
    include: str,
    new_name: str,
    label_set: list[str],
    value_col: str,
    aggregation_type: str = "sum",
    submatch_case: str | None = None,
    name_col: str = "metric_name",
) -> ray.data.Dataset:
    """metricstransformprocessor ``action: combine``
    (metrics_transform_processor_otlp.go:416-458): metrics whose NAME
    matches ``include`` merge into one metric named ``new_name``; the
    regex's named capture groups become datapoint labels (optionally
    lower/upper-cased), and datapoints that collapse onto the same
    label values aggregate with ``aggregation_type``. Metrics that do
    not match pass through unchanged (with null submatch labels)."""
    import re as _re

    group_names = [g for g in _re.compile(include).groupindex]

    def split(b: pa.Table) -> pa.Table:
        names = b[name_col]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        hit = pc.fill_null(pc.match_substring_regex(names, pattern=include),
                           False)
        ex = pc.extract_regex(names, pattern=include)
        out = b
        for g in group_names:
            v = pc.struct_field(ex, g)
            if submatch_case == "lower":
                v = pc.utf8_lower(v)
            elif submatch_case == "upper":
                v = pc.utf8_upper(v)
            out = out.append_column(
                g, pc.if_else(hit, v, pa.nulls(b.num_rows, pa.string())))
        renamed = pc.if_else(hit, pa.scalar(new_name), names)
        return out.set_column(out.column_names.index(name_col), name_col,
                              renamed)

    tagged = ds.map_batches(split, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)

    def matched_part(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b[name_col], new_name))

    def unmatched_part(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.fill_null(
            pc.equal(b[name_col], new_name), False))
        return b.select([name_col] + label_set + group_names
                        + [value_col]).filter(keep)

    combined = aggregate_labels(
        tagged.map_batches(matched_part, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
        [name_col] + label_set + group_names, value_col, aggregation_type)
    passthrough = tagged.map_batches(unmatched_part, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
    return combined.union(passthrough)
