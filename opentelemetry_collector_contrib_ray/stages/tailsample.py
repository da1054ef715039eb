"""Tail sampling — whole-conversation keep/drop decisions.

Reference semantics (processor/tailsamplingprocessor/config.go:312-330
policy tree over buffered traces; processor/groupbytraceprocessor):
buffer all spans of a trace for decision_wait, then apply policies —
e.g. always-sample on error, probabilistic otherwise. On a finite
table the wait disappears (SURVEY.md §2.5): group completeness is
exact, so the policy is a per-conversation predicate.

Scale shape: the decision needs only the (small) set of keys matching
the always-keep policy — derived with a grouped filter and BROADCAST
(ray.put) into a stream-side filter. The row stream itself never
shuffles; only conversation ids move.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..expr import compile_predicate
from ..functions.hashing import md5_number_lower_arrow


def tail_sample(
    ds: ray.data.Dataset,
    group_key: str,
    always_keep_condition: Any,
    sample_percentage: float,
    hash_seed: int = 0,
) -> ray.data.Dataset:
    """Keep every row of groups where ANY row matches
    ``always_keep_condition`` (always_sample policy), plus a
    deterministic ``sample_percentage`` hash-sample of the remaining
    groups (probabilistic policy). Returns the filtered stream."""
    pred = compile_predicate(always_keep_condition)

    def keys_of_matching(b: pa.Table) -> pa.Table:
        m = pred(b)
        keys = pc.unique(b.filter(m)[group_key].combine_chunks())
        return pa.table({group_key: keys})

    # pass 1: the always-keep key set (small: bounded by #groups)
    key_tables = ds.map_batches(
        keys_of_matching, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize().to_arrow_refs()
    keep_keys = pc.unique(
        pa.concat_tables([ray.get(r) for r in key_tables], promote_options="none")[group_key].combine_chunks()
    )
    keep_ref = ray.put(keep_keys)
    threshold = int(sample_percentage * 100)  # out of 10_000
    seed = str(hash_seed) if hash_seed else ""

    # pass 2: stream-side filter — broadcast key set + hash-mod sample
    def keep(b: pa.Table) -> pa.Table:
        keys = b[group_key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        always = pc.is_in(keys, value_set=ray.get(keep_ref))
        h = md5_number_lower_arrow(keys, suffix=seed).to_numpy(zero_copy_only=False)
        sampled = pa.array((h % 10_000) < threshold)
        return b.filter(pc.or_(always, sampled))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
