"""Lookup enrichment — stateful actor-pool broadcast join.

Reimplements the lookupprocessor family (reference:
processor/lookupprocessor/processor.go:46-105 — evaluate a key per
record, Source.Lookup(key)->(value, found), write mapped fields with
per-field defaults, misses silent; file source
lookupsource/filelookup.go; same shape as geoip/k8sattributes).

Ray design: the small side is broadcast ONCE — ``ray.put`` of the
lookup arrays on the driver, ``ray.get`` in each actor's ``__init__``
— and each batch does a vectorized hash join via ``pc.index_in`` +
``pc.take``. No shuffle; the stream side never moves. This is the
canonical small-side broadcast join for 100 TB inputs.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import register


def _composite_key(batch: pa.Table, key_cols: list[str], sep: str = ":") -> pa.Array:
    arrs = []
    for c in key_cols:
        a = batch[c]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        arrs.append(pc.cast(a, pa.string()))
    if len(arrs) == 1:
        return arrs[0]
    return pc.binary_join_element_wise(*arrs, sep)


class _LookupActor:
    """Callable class for map_batches actor pools: the lookup table is
    fetched from the object store once per actor (``__init__``), then
    every batch is an O(batch) vectorized index_in/take join."""

    def __init__(self, table_ref, key_cols: list[str], fields: dict[str, Any], sep: str):
        tbl: pa.Table = ray.get(table_ref)
        self.keys = tbl["key"].combine_chunks()
        self.values = {f: tbl[f].combine_chunks() for f in fields}
        self.defaults = fields
        self.key_cols = key_cols
        self.sep = sep

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = _composite_key(batch, self.key_cols, self.sep)
        idx = pc.index_in(key, value_set=self.keys)
        for field, default in self.defaults.items():
            vals = pc.take(self.values[field], idx)
            if default is not None:
                vals = pc.fill_null(vals, default)
            batch = batch.append_column(field, vals)
        return batch


@register("lookup")
class LookupEnrich:
    """Config: lookup_table (pa.Table with 'key' + value columns),
    key_cols joined with ``sep`` form the lookup key, ``fields`` maps
    value-column -> default (None = leave null on miss, the
    reference's silent-miss behavior)."""

    def __init__(
        self,
        lookup_table: pa.Table,
        key_cols: list[str],
        fields: dict[str, Any],
        sep: str = ":",
        concurrency: int | tuple[int, int] = (1, 8),
        batch_size: int | None = 65_536,
    ):
        self.table_ref = ray.put(lookup_table)
        self.key_cols = key_cols
        self.fields = fields
        self.sep = sep
        self.concurrency = concurrency
        self.batch_size = batch_size

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(
            _LookupActor,
            fn_constructor_args=(self.table_ref, self.key_cols, self.fields, self.sep),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )
