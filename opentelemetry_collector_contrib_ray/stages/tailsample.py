"""Tail sampling — whole-conversation keep/drop decisions.

Reference semantics (processor/tailsamplingprocessor/config.go:312-330
policy tree over buffered traces; processor/groupbytraceprocessor):
buffer all spans of a trace for decision_wait, then apply policies —
e.g. always-sample on error, probabilistic otherwise. On a finite
table the wait disappears (SURVEY.md §2.5): group completeness is
exact, so the policy is a per-conversation predicate.

Scale shape: the decision needs only the set of keys matching the
always-keep policy. That set is SIZE-GATED like tail_sample_policies
(stages/tailpolicy.py): below ``broadcast_key_limit`` it is collected
once and BROADCAST (ray.put) into a stream-side filter; above it the
non-hash-sampled part of the stream left-semi-joins the key dataset
instead — nothing key-shaped ever has to fit on the driver. The row
stream itself never shuffles on the broadcast path; only conversation
ids move.
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
    broadcast_key_limit: int = 2_000_000,
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

    # pass 1: the always-keep key set (one row per matching group per
    # batch; a common condition at 100 TB makes this LARGE — gate it)
    key_ds = ds.map_batches(
        keys_of_matching, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    n_keys = key_ds.count()
    threshold = int(sample_percentage * 100)  # out of 10_000
    seed = str(hash_seed) if hash_seed else ""

    def hash_mask(b: pa.Table) -> pa.Array:
        keys = b[group_key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = md5_number_lower_arrow(keys, suffix=seed) \
            .to_numpy(zero_copy_only=False)
        return pa.array((h % 10_000) < threshold)

    if n_keys <= broadcast_key_limit:
        # small key set: dedupe once on the driver, ray.put broadcast,
        # single stream-side filter pass (no shuffle at all)
        tabs = [t for t in (ray.get(r) for r in key_ds.to_arrow_refs())
                if t.num_rows]
        keep_keys = pc.unique(pa.concat_tables(
            tabs, promote_options="none")[group_key].combine_chunks()) \
            if tabs else pa.array([], ds.schema().field(group_key).type)
        keep_ref = ray.put(keep_keys)

        def keep(b: pa.Table) -> pa.Table:
            keys = b[group_key]
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            always = pc.is_in(keys, value_set=ray.get(keep_ref))
            return b.filter(pc.or_(always, hash_mask(b)))

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    # key set too large to hold anywhere whole: hash-sampled rows pass
    # directly; the rest left-semi-join the (duplicate-tolerant) key
    # dataset — the only all-to-all is over the unsampled remainder
    def sampled_part(b: pa.Table) -> pa.Table:
        return b.filter(hash_mask(b))

    def unsampled_part(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(hash_mask(b)))

    # the STREAM is the big side of this join — a floor of 16
    # partitions keeps it parallel even when the key set barely
    # exceeds the broadcast gate (sf1 stress: the old key-only
    # formula picked 2 partitions for a 47M-row left side and
    # serialized the join)
    num_partitions = max(16, min(256, n_keys // 500_000 + 2))
    joined = ds.map_batches(unsampled_part, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None) \
        .join(key_ds, join_type="left_semi",
              num_partitions=int(num_partitions), on=(group_key,))
    return ds.map_batches(sampled_part, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None) \
        .union(joined)
