"""Stream reshaping: unroll (explode), group-by-attrs repartitioning,
round-robin splitting.

References: unrollprocessor explodes slice-valued bodies into one
record per element (processor/unrollprocessor/processor.go:37-56);
groupbyattrsprocessor regroups records under the resource matching
listed attrs — in a columnar engine that is purely a partitioning
concern (processor/groupbyattrsprocessor/processor.go:63-100);
roundrobinconnector splits load evenly across same-typed pipelines
(connector/roundrobinconnector).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def unroll(
    ds: ray.data.Dataset,
    list_col: str,
    out_col: str | None = None,
    split_pattern: str | None = None,
    keep_cols: list[str] | None = None,
    recursive: bool = False,
) -> ray.data.Dataset:
    """One output row per list element, parent fields repeated —
    vectorized with list_parent_indices/list_flatten (never a Python
    row loop). ``split_pattern`` first splits a string column.

    ``recursive`` (unrollprocessor config Recursive, testdata/
    recursive_true vs recursive_false): flatten nested lists all the
    way to scalars. Arrow's static schema makes this a fixed number of
    explode passes (the nesting depth is known from the column type),
    unlike the reference's per-value dynamic recursion. A non-list
    column with no ``split_pattern`` is a NO-OP (testdata/nop: records
    whose body is not a slice pass through unchanged)."""
    out_col = out_col or list_col

    def _depth(t: pa.DataType) -> int:
        d = 0
        while pa.types.is_list(t) or pa.types.is_large_list(t):
            d += 1
            t = t.value_type
        return d

    col_type = dict(zip(ds.schema().names, ds.schema().types))[list_col]
    if split_pattern is None:
        depth = _depth(col_type)
        if depth == 0:
            return ds  # nop golden: non-slice bodies pass through
        passes = depth if recursive else 1
    else:
        passes = 1
    for i in range(passes):
        ds = _unroll_once(ds, list_col, out_col, split_pattern if i == 0 else None,
                          keep_cols)
        list_col = out_col
    return ds


def _unroll_once(
    ds: ray.data.Dataset,
    list_col: str,
    out_col: str,
    split_pattern: str | None,
    keep_cols: list[str] | None,
) -> ray.data.Dataset:

    def explode(b: pa.Table) -> pa.Table:
        src = b[list_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        lists = pc.split_pattern(src, pattern=split_pattern) if split_pattern else src
        parents = pc.list_parent_indices(lists)
        cols = {}
        for name in keep_cols or [c for c in b.column_names if c != list_col]:
            col = b[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = pc.take(col, parents)
        cols[out_col] = pc.list_flatten(lists)
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def group_by_attrs(ds: ray.data.Dataset, keys: list[str], num_blocks: int | None = None) -> ray.data.Dataset:
    """groupbyattrsprocessor: co-locate rows sharing the key columns.

    Implemented as a range partition (``ds.sort(keys)``): equal keys
    land contiguously, straddling at most one block boundary — the
    locality premise downstream per-key stages need. (Ray's true hash
    repartition, ``repartition(keys=...)``, requires the session-wide
    ``DataContext.shuffle_strategy = HASH_SHUFFLE``; flipping a global
    knob inside an operator is not worth the stricter guarantee.)"""
    out = ds.sort(keys)
    return out.repartition(num_blocks) if num_blocks else out


def round_robin(ds: ray.data.Dataset, n: int) -> list[ray.data.Dataset]:
    """roundrobinconnector: split the stream into n even pipelines."""
    return ds.split(n, equal=True)
