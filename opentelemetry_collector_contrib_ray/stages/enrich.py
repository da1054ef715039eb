"""Lookup enrichment — broadcast hash join, fused into the task chain.

Reimplements the lookupprocessor family (reference:
processor/lookupprocessor/processor.go:46-105 — evaluate a key per
record, Source.Lookup(key)->(value, found), write mapped fields with
per-field defaults, misses silent; file source
lookupsource/filelookup.go; same shape as geoip/k8sattributes).

Ray design: the small side is broadcast ONCE — ``ray.put`` on the
driver, fetched zero-copy from the local object store the first time
each worker process touches it (cached per process) — and every
batch does a vectorized ``pc.index_in`` + ``pc.take`` join. No
shuffle; the stream side never moves, and because the default mode is
a plain task function, Ray fuses read -> parse -> enrich -> route ->
write into ONE operator (an actor-pool stage would split the chain
into three operators with object-store hops; set ``use_actors=True``
to get that shape when the state is per-actor mutable).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import register

# per-worker-process cache of fetched broadcast tables (keyed by ref)
_BROADCAST_CACHE: dict[str, pa.Table] = {}


def _fetch_broadcast(ref) -> pa.Table:
    key = ref.hex()
    tbl = _BROADCAST_CACHE.get(key)
    if tbl is None:
        tbl = ray.get(ref)  # zero-copy read from local plasma
        _BROADCAST_CACHE[key] = tbl
    return tbl


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


def _join_batch(
    batch: pa.Table,
    lookup: pa.Table,
    key_cols: list[str],
    fields: dict[str, Any],
    sep: str,
) -> pa.Table:
    key = _composite_key(batch, key_cols, sep)
    idx = pc.index_in(key, value_set=lookup["key"].combine_chunks())
    for field, default in fields.items():
        vals = pc.take(lookup[field].combine_chunks(), idx)
        if default is not None:
            vals = pc.fill_null(vals, default)
        batch = batch.append_column(field, vals)
    return batch


class _LookupActor:
    """Actor-pool variant: table fetched once in __init__."""

    def __init__(self, table_ref, key_cols: list[str], fields: dict[str, Any], sep: str):
        self.lookup: pa.Table = ray.get(table_ref)
        self.key_cols = key_cols
        self.fields = fields
        self.sep = sep

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _join_batch(batch, self.lookup, self.key_cols, self.fields, self.sep)


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
        use_actors: bool = False,
        concurrency: int | tuple[int, int] = (1, 8),
        batch_size: int | None = None,
    ):
        self.table_ref = ray.put(lookup_table)
        self.key_cols = key_cols
        self.fields = fields
        self.sep = sep
        self.use_actors = use_actors
        self.concurrency = concurrency
        self.batch_size = batch_size

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        if self.use_actors:
            return ds.map_batches(
                _LookupActor,
                fn_constructor_args=(self.table_ref, self.key_cols, self.fields, self.sep),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=self.batch_size,
                concurrency=self.concurrency,
            )
        ref, key_cols, fields, sep = self.table_ref, self.key_cols, self.fields, self.sep

        def fn(batch: pa.Table) -> pa.Table:
            return _join_batch(batch, _fetch_broadcast(ref), key_cols, fields, sep)

        return ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=self.batch_size
        )
