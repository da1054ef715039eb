"""Cardinality guarding — cap a label column's distinct values.

Reference shape (processor/cardinalityguardianprocessor: strip/replace
labels when a metric's label-set cardinality explodes). Columnar
equivalent: ONE grouped count pass finds the top-``max_values``
values (deterministic tie-break: count desc, value asc), the small
keep-set broadcasts, and a vectorized second pass maps everything
else to ``overflow_value``. The stream never shuffles.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .aggregate import grouped_count_sum

OVERFLOW = "__other__"


def cardinality_guard(
    ds: ray.data.Dataset,
    col: str,
    max_values: int,
    overflow_value: str = OVERFLOW,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Replace all but the ``max_values`` most frequent values of
    ``col`` with ``overflow_value`` (written to ``out_col``, default
    in-place)."""
    out_col = out_col or col
    counts = grouped_count_sum(ds, [col], count_name="_n")
    tbl = pa.concat_tables(
        [ray.get(r) for r in counts.materialize().to_arrow_refs()], promote_options="none"
    )
    order = pc.sort_indices(
        tbl, sort_keys=[("_n", "descending"), (col, "ascending")]
    )
    keep = pc.take(tbl[col].combine_chunks(), order[:max_values])
    ref = ray.put(keep)

    def guard(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        kept = pc.is_in(c, value_set=ray.get(ref))
        guarded = pc.if_else(kept, c, pa.scalar(overflow_value, pa.string()))
        return _set(b, out_col, guarded)

    def _set(tbl_: pa.Table, name: str, arr: pa.Array) -> pa.Table:
        if name in tbl_.column_names:
            return tbl_.set_column(tbl_.column_names.index(name), name, arr)
        return tbl_.append_column(name, arr)

    return ds.map_batches(guard, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
