"""Probabilistic sampling — deterministic hash-mod row drop.

Reference semantics (processor/probabilisticsamplerprocessor/
config.go:34-76, logsprocessor.go:122-168): hash a sampling key
(trace id or an attribute) with a seeded FNV, keep the row when the
hash falls under ``sampling_percentage``'s threshold; the same key
always samples the same way across collectors.

We hash with the MD5-derived u64 (functions/hashing.py) so the
decision is reproducible in the DuckDB oracle via
``md5_number_lower(key || seed)``. Same seeded-hash trick as skew
salting (SURVEY.md §4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import md5_number_lower_arrow
from . import register


@register("probabilistic_sampler")
class ProbabilisticSampler:
    def __init__(self, sampling_percentage: float, key: str, hash_seed: int = 0):
        if not 0 <= sampling_percentage <= 100:
            raise ValueError("sampling_percentage in [0,100]")
        self.threshold = int(sampling_percentage * 100)  # out of 10_000
        self.key = key
        self.seed = hash_seed

    def fn(self, batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[self.key], pa.string())
        if self.seed:
            key = pc.binary_join_element_wise(key, pa.scalar(str(self.seed)), "")
        h = md5_number_lower_arrow(key).to_numpy(zero_copy_only=False)
        keep = pa.array((h % 10_000) < self.threshold)
        return batch.filter(keep)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
