"""Failover fan-out — priority pipelines with fall-through.

Reference semantics (connector/failoverconnector): data routes to the
highest-priority healthy pipeline; when that pipeline's consumer
errors, the connector retries the next level down, so every record is
served by exactly one level and nothing is lost. On Ray the
per-record state machine becomes a per-BATCH try-chain inside one
map_batches (plus Ray's own task retry for transient worker loss);
sink writes stay idempotent (content-derived file ids, see
pipelines/flagship.py) so a retried batch cannot double-write.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import ray.data

from . import register


@register("failover")
class Failover:
    """``levels`` is a priority-ordered list of batch consumers
    (pa.Table -> pa.Table). Each batch is served by the FIRST level
    that does not raise; the surviving output gains a
    ``failover_level`` column naming the level that served it. If all
    levels fail the last error propagates (matching the reference's
    exhausted-retry behavior)."""

    def __init__(self, levels: list[Callable[[pa.Table], pa.Table]]):
        if not levels:
            raise ValueError("failover needs at least one level")
        self.levels = levels

    def fn(self, batch: pa.Table) -> pa.Table:
        last: Exception | None = None
        for i, level in enumerate(self.levels):
            try:
                out = level(batch)
                return out.append_column(
                    "failover_level", pa.array([i] * out.num_rows, pa.int64()))
            except Exception as e:  # noqa: BLE001 — any level failure falls through
                last = e
        raise last  # type: ignore[misc]

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
