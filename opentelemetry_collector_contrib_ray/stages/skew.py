"""Hot-key skew handling — salted two-phase aggregation.

The reference never faces key skew (single-process maps behind
mutexes; logdedup shards its aggregator only for lock contention,
processor/logdedupprocessor/processor.go:66-150). A 100 TB shuffle
does: a Zipf-hot conv_id concentrates one reducer. The standard fix
(SURVEY.md §4): salt the key — group by (key, hash(row) % S) in phase
one so the hot key fans out over S reducers, then merge the S partial
rows per key in a second, tiny groupby. Only valid for commutative
merges (count/sum/min/max — not ordered concat).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

_AGGS = {"sum": Sum, "count": Count, "min": Min, "max": Max}
_MERGE = {"sum": Sum, "count": Sum, "min": Min, "max": Max}  # phase-2 merge op


def salted_aggregate(
    ds: ray.data.Dataset,
    key_cols: list[str],
    aggs: list[tuple[str, str | None, str]],  # (op, on_col|None, out_name)
    salt: int = 16,
    seed: int = 7,
) -> ray.data.Dataset:
    """groupby(key_cols) with hot keys neutralized by PER-BATCH
    pre-aggregation: every block combines its rows into at most one
    partial row per key (Arrow hash group-by inside map_batches), so
    the shuffle moves O(blocks x keys) partial rows instead of the raw
    stream, and the hottest key contributes <= one row per block to
    its reducer. This subsumes the earlier explicit (key, salt) phase
    (the per-block partial IS a salt with one bucket per block) while
    shrinking the shuffled volume by the batch-size factor — at 50M
    rows the old phase-1 shuffled all 50M rows; this path shuffles a
    few thousand partials. ``salt``/``seed`` are kept for API
    compatibility; all supported ops (count/sum/min/max) are
    commutative merges, which this reduction requires.

    aggs: e.g. [("count", None, "n"), ("sum", "dur", "dur_sum")].
    """
    import pyarrow.compute as pc  # noqa: F401  (kept for parity helpers)

    arrow_ops = {"count": "count_all", "sum": "sum", "min": "min", "max": "max"}
    for op, _on, _out in aggs:
        if op not in arrow_ops:
            raise ValueError(f"unsupported salted_aggregate op {op!r}")

    def partial(b: pa.Table) -> pa.Table:
        spec = [(([] if on is None else on), arrow_ops[op])
                for op, on, out in aggs]
        cols = key_cols + [on for _op, on, _out in aggs if on is not None]
        g = b.select(sorted(set(cols), key=cols.index))              .group_by(key_cols).aggregate(spec)
        return g.rename_columns(key_cols + [out for _op, _on, out in aggs])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    merged = partials.groupby(key_cols).aggregate(
        *[_MERGE[op](out, alias_name=out) for op, on, out in aggs]
    )
    return merged
