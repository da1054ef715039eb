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

    def apply(self, ds: ray.data.Dataset, strategy: str = "groupby") -> ray.data.Dataset:
        """strategy='groupby' (default): shuffle whole groups and scan
        each once — measured faster here (ray's sort costs more than
        its groupby shuffle at these sizes). strategy='sort': the
        sort + per-block-partial variant, which bounds per-task memory
        by block size instead of group size — use it when a single
        group (hot conv) cannot fit one task."""
        if strategy == "sort" and self.first_pred is None:
            return self._apply_sorted(ds)
        if strategy == "presorted" and self.first_pred is None:
            # input is already clustered+ordered by (group, order) —
            # e.g. ingest layouts that write conversations contiguously
            # (our transcript cache does). Skips the global sort: one
            # partial-concat pass + a tiny merge groupby over
            # #groups x #blocks partial rows.
            return self._merge_partials(self._block_partials(ds))
        return ds.groupby(self.group_key).map_groups(self._combine_group, batch_format="pandas")

    def _apply_sorted(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Whole-conversation join via sort + per-block partial concat.

        A global (group, order) sort range-partitions the stream into
        ordered blocks; each block pre-joins its conversations into ONE
        partial row per conversation per block, so the final
        groupby(conv) merge moves few rows and each group holds at most
        #blocks partials — the Zipf-hot conversation becomes a cheap
        merge of ~#blocks strings instead of a single-task sort+join
        over millions of raw rows."""
        return self._merge_partials(self._block_partials(ds.sort([self.group_key, self.order_key])))

    def _block_partials(self, sorted_ds: ray.data.Dataset) -> ray.data.Dataset:
        group_key, order_key = self.group_key, self.order_key
        combine_field, combine_with = self.combine_field, self.combine_with
        keep_fields = self.keep_fields

        def block_partial(b) -> pd.DataFrame:
            df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
            g = df.groupby(group_key, sort=False)
            out = pd.DataFrame({
                combine_field: g[combine_field].agg(lambda s: combine_with.join(s.astype(str))),
                "n_turns": g.size(),
                "first_" + order_key: g[order_key].first(),
            })
            for f in keep_fields:
                out[f] = g[f].first()
            return out.reset_index()

        return sorted_ds.map_batches(block_partial, batch_format="pandas", batch_size=None)

    def _merge_partials(self, partials: ray.data.Dataset) -> ray.data.Dataset:
        group_key, order_key = self.group_key, self.order_key
        combine_field, combine_with = self.combine_field, self.combine_with
        keep_fields = self.keep_fields

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("first_" + order_key, kind="mergesort")
            row = {
                group_key: g[group_key].iloc[0],
                "segment": 1,
                combine_field: combine_with.join(g[combine_field]),
                "n_turns": int(g["n_turns"].sum()),
                "first_" + order_key: g["first_" + order_key].iloc[0],
            }
            for f in keep_fields:
                row[f] = g[f].iloc[0]
            return pd.DataFrame([row])

        return partials.groupby(group_key).map_groups(merge, batch_format="pandas")
