"""Recombine — stateful multiline/segment join per conversation.

Reference semantics (pkg/stanza/operator/transformer/recombine/
transformer.go:26-140): group consecutive entries of one source,
concatenate ``combine_field`` with ``combine_with`` until an
``is_first_entry``/``is_last_entry`` match flushes the batch;
``force_flush_timeout`` flushes stragglers.

Ray design: the source-identifier is ``conv_id`` and the arrival
order is ``turn_idx``; a finite input means group completeness is
exact after the shuffle, so flush timers/max_sources vanish
(SURVEY.md §2.5 windows note). Implemented as
``groupby(conv_id).map_groups`` — sort the group by ``turn_idx``,
optionally split into segments where ``is_first_entry`` matches, and
emit one combined row per segment.

Partitioning assumption: one conversation fits in one task's memory
(a 1M-turn hot conversation is ~100 MB of text — fine). Hot-key
skew moves whole groups, not rows, so a Zipf-hot conv_id makes one
straggler task; for order-insensitive per-conv aggregates use
stages/skew.py salting instead.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import ray.data

from ..expr import compile_predicate
from . import register


@register("recombine")
class Recombine:
    def __init__(
        self,
        group_key: str = "conv_id",
        order_key: str = "turn_idx",
        combine_field: str = "text",
        combine_with: str = "\n",
        is_first_entry: Any | None = None,
        keep_fields: list[str] | None = None,
    ):
        self.group_key = group_key
        self.order_key = order_key
        self.combine_field = combine_field
        self.combine_with = combine_with
        self.first_pred = compile_predicate(is_first_entry) if is_first_entry is not None else None
        self.keep_fields = keep_fields or []

    def _combine_group(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_key, kind="mergesort")
        if self.first_pred is not None:
            import pyarrow as pa

            mask = self.first_pred(pa.Table.from_pandas(g, preserve_index=False)).to_numpy(zero_copy_only=False)
            seg = mask.cumsum()
            seg[seg == 0] = 1  # leading rows before any first-marker join segment 1
        else:
            seg = 1
        g = g.assign(_seg=seg)
        rows = []
        for seg_id, sg in g.groupby("_seg", sort=True):
            row = {
                self.group_key: sg[self.group_key].iloc[0],
                "segment": int(seg_id),
                self.combine_field: self.combine_with.join(sg[self.combine_field].astype(str)),
                "n_turns": len(sg),
                "first_" + self.order_key: sg[self.order_key].iloc[0],
            }
            for f in self.keep_fields:
                row[f] = sg[f].iloc[0]
            rows.append(row)
        return pd.DataFrame(rows)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.groupby(self.group_key).map_groups(self._combine_group, batch_format="pandas")
