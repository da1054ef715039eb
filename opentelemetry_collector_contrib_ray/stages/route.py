"""Routing fan-out — the routingconnector reimagined for Ray Data.

Reference semantics (connector/routingconnector/logs.go:64-173,
config.go:32-52): an ORDERED route table; each route has an OTTL
condition and an action:

  * ``move``  — matched rows leave the stream (later routes never see
    them): first-match-wins at row granularity;
  * ``copy``  — matched rows are duplicated to the route's sink and
    ALSO continue to later routes;
  * rows matching no move-route go to the ``default`` sink
    (default_pipelines).

Condition errors count as no-match (error_mode=ignore), which our
predicate compiler guarantees by null->False masking.

Ray design: ONE map_batches pass computes a precedence cascade —
a ``sink`` label per row for the move/default assignment plus
appended duplicate rows for copy matches — so the fan-out costs a
single stream traversal. Sinks are then written in one pass with
``write_parquet(partition_cols=["sink"])`` (no shuffle, no
re-computation per sink).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..expr import compile_predicate
from . import register

DEFAULT_SINK = "default"


class Route:
    def __init__(self, condition: Any, sink: str, action: str = "move",
                 attributes: dict[str, Any] | None = None):
        if action not in ("move", "copy"):
            raise ValueError("action must be move|copy")
        self.pred = compile_predicate(condition)
        self.sink = sink
        self.action = action
        # per-route attach attributes (stanza router optional
        # attributes, transformer/router/config.go:55-61)
        self.attributes = attributes or {}


@register("router")
class Router:
    """Ordered route list -> adds a ``sink`` string column; copy routes
    append duplicated rows. Row content is otherwise untouched, so
    routed-row equality vs the reference is exact."""

    def __init__(self, routes: list[Route | dict[str, Any]],
                 default_sink: str | None = DEFAULT_SINK):
        """``default_sink=None`` = no default_pipelines configured:
        rows matching no move-route are DROPPED, not defaulted
        (routingconnector logs_test.go "match_none_without_default")."""
        self.routes = [r if isinstance(r, Route) else Route(**r) for r in routes]
        self.default_sink = default_sink

    def fn(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        remaining = pa.array([True] * n)
        sink = pa.nulls(n, pa.string())
        attach_keys = sorted({k for r in self.routes for k in r.attributes})
        attach: dict[str, pa.Array] = {k: pa.nulls(n, pa.string()) for k in attach_keys}
        copies: list[pa.Table] = []

        def with_attrs(tbl: pa.Table, vals: dict[str, pa.Array | str | None]) -> pa.Table:
            for k in attach_keys:
                v = vals.get(k)
                if isinstance(v, pa.Array):
                    tbl = tbl.append_column(k, v)
                else:
                    tbl = tbl.append_column(
                        k, pa.array([v] * tbl.num_rows, pa.string())
                    )
            return tbl

        for r in self.routes:
            m = pc.and_(r.pred(batch), remaining)
            if r.action == "move":
                sink = pc.if_else(m, pa.scalar(r.sink, pa.string()), sink)
                for k, v in r.attributes.items():
                    attach[k] = pc.if_else(m, pa.scalar(str(v), pa.string()), attach[k])
                remaining = pc.and_(remaining, pc.invert(m))
            else:
                dup = batch.filter(m)
                if dup.num_rows:
                    dup = dup.append_column("sink", pa.array([r.sink] * dup.num_rows, pa.string()))
                    copies.append(with_attrs(dup, {k: str(v) for k, v in r.attributes.items()}))
        if self.default_sink is None:
            out = batch.append_column("sink", sink)
            out = with_attrs(out, attach)
            out = out.filter(pc.invert(remaining))
        else:
            sink = pc.if_else(remaining, pa.scalar(self.default_sink, pa.string()), sink)
            out = batch.append_column("sink", sink)
            out = with_attrs(out, attach)
        if copies:
            out = pa.concat_tables([out] + copies, promote_options="none")
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def write_sinks(self, ds: ray.data.Dataset, base_path: str, **write_kwargs) -> None:
        """Single-pass partitioned write: one directory per sink under
        base_path (hive layout sink=<name>/). Resumable layout — a
        rerun can skip sinks/partitions already committed (see
        state/manifest.py)."""
        self.apply(ds).write_parquet(base_path, partition_cols=["sink"], **write_kwargs)
