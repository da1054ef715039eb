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
    """groupby(key_cols) with hot keys salted across ``salt`` reducers.

    aggs: e.g. [("count", None, "n"), ("sum", "dur", "dur_sum")].
    """

    def add_salt(b: pa.Table) -> pa.Table:
        rng = np.random.default_rng(seed + b.num_rows)
        s = rng.integers(0, salt, size=b.num_rows)
        return b.append_column("_salt", pa.array(s, pa.int32()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    phase1 = salted.groupby(key_cols + ["_salt"]).aggregate(
        *[
            (_AGGS[op](alias_name=out) if on is None else _AGGS[op](on, alias_name=out))
            for op, on, out in aggs
        ]
    )
    phase2 = phase1.groupby(key_cols).aggregate(
        *[_MERGE[op](out, alias_name=out) for op, on, out in aggs]
    )
    return phase2
