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
) -> ray.data.Dataset:
    """One output row per list element, parent fields repeated —
    vectorized with list_parent_indices/list_flatten (never a Python
    row loop). ``split_pattern`` first splits a string column."""
    out_col = out_col or list_col

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
