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


def _null_safe_join(sep: str, vals) -> str | None:
    """Match pc.binary_join: a segment containing a null combines to
    null (the block-partial path already behaves this way)."""
    if vals.isna().any():
        return None
    return sep.join(vals)


@register("recombine")
class Recombine:
    def __init__(
        self,
        group_key: str = "conv_id",
        order_key: str = "turn_idx",
        combine_field: str = "text",
        combine_with: str = "\n",
        is_first_entry: Any | None = None,
        is_last_entry: Any | None = None,
        keep_fields: list[str] | None = None,
    ):
        if is_first_entry is not None and is_last_entry is not None:
            # same exclusivity as the reference config (config.go)
            raise ValueError("recombine: is_first_entry and is_last_entry "
                             "are mutually exclusive")
        self.group_key = group_key
        self.order_key = order_key
        self.combine_field = combine_field
        self.combine_with = combine_with
        self.first_pred = compile_predicate(is_first_entry) if is_first_entry is not None else None
        # is_last_entry (transformer.go:223-226): the matching row is
        # INCLUDED in the current segment and flushes it — the break
        # lands AFTER the marker row
        self.last_pred = compile_predicate(is_last_entry) if is_last_entry is not None else None
        self.keep_fields = keep_fields or []

    def _combine_group(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_key, kind="mergesort")
        if self.first_pred is not None:
            import pyarrow as pa

            mask = self.first_pred(pa.Table.from_pandas(g, preserve_index=False)).to_numpy(zero_copy_only=False)
            # +1, NOT a clamp: rows before the first marker are their
            # OWN batch, flushed when the marker arrives
            # (transformer.go:213-219 flushes the existing batch first)
            seg = mask.cumsum() + 1
        elif self.last_pred is not None:
            import numpy as np
            import pyarrow as pa

            mask = self.last_pred(pa.Table.from_pandas(g, preserve_index=False)).to_numpy(zero_copy_only=False)
            # break AFTER the marker: row i starts a new segment iff
            # row i-1 matched
            seg = 1 + np.concatenate([[False], mask[:-1]]).cumsum()
        else:
            seg = 1
        g = g.assign(_seg=seg)
        rows = []
        for seg_id, sg in g.groupby("_seg", sort=True):
            row = {
                self.group_key: sg[self.group_key].iloc[0],
                "segment": int(seg_id),
                self.combine_field: (None if sg[self.combine_field].isna().any()
                                     else self.combine_with.join(sg[self.combine_field].astype(str))),
                "n_turns": len(sg),
                "first_" + self.order_key: sg[self.order_key].iloc[0],
            }
            for f in self.keep_fields:
                row[f] = sg[f].iloc[0]
            rows.append(row)
        return pd.DataFrame(rows)

    def apply(self, ds: ray.data.Dataset, strategy: str | None = None,
              merge: str = "stream") -> ray.data.Dataset:
        """strategy=None (default) resolves to the VECTORIZED paths:
        'sort' when there is no is_first_entry predicate, else the
        segmented sort variant — both bound per-task memory by block
        size and never build a per-group pandas frame over raw rows.
        strategy='groupby': shuffle whole groups and scan each once
        (per-group pandas — kept for parity testing and for callers
        whose groups are tiny). strategy='sort': sort +
        per-block-partial; use when a single group (hot conv) cannot
        fit one task.

        merge='stream' (default): the partial stream feeds ONE merge
        groupby while partials are still being produced — fastest on
        one node (phases overlap), but the shuffle moves every
        conversation's text once. merge='bypass': detect the keys that
        actually span blocks via each block's first/last key (no
        shuffle), let singleton groups skip the merge entirely, and
        shuffle only the boundary conversations' text — the 100 TB
        shape (shuffled bytes are O(block boundaries), not O(corpus));
        costs a materialize + extra pass locally."""
        self._merge_mode = merge
        has_marker = self.first_pred is not None or self.last_pred is not None
        if strategy is None:
            strategy = "segmented" if has_marker else "sort"
        if strategy == "segmented-bypass" and has_marker:
            return self._apply_segmented_bypass(ds)
        if strategy in ("sort", "segmented") and has_marker:
            return self._apply_segmented(ds)
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

    def _apply_segmented(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """is_first_entry with no per-group pandas over raw rows: sort
        by (group, order), break block partials at group changes AND
        marker rows (each partial then lies inside one segment), and
        merge per group over PARTIAL rows only — bounded by
        #segments + #block-boundaries, not raw turns. Segment
        numbering carries across blocks because a partial's first row
        is a marker iff it starts a segment, so the partial-level
        marker cumsum equals the row-level one."""
        sorted_ds = ds.sort([self.group_key, self.order_key])
        return self._merge_partials_segmented(
            self._block_partials(sorted_ds, segmented=True))

    def _apply_segmented_bypass(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Marker recombine for MARKER-DENSE streams (container P/F
        logs: nearly every line ends a segment), usable when segment
        ORDINALS are not needed — output has no ``segment`` column.

        Within a sorted block, every segment piece that does not
        contain the block's first or last row is a COMPLETE segment:
        it starts at a group change or a marker break and ends at one,
        both genuine segment boundaries (groups are contiguous after
        the sort, so an interior group change is a real group end).
        Those finalize block-locally with zero shuffle. Only the <=2
        edge pieces per block can span blocks; they alone take the
        merge groupby. Shuffled bytes are O(block boundaries), not
        O(segments) — unlike ``segmented``, whose merge groupby moves
        every segment (fine for marker-sparse conversations, a
        scale-killer when segments ~= rows)."""
        import pyarrow as pa

        group_key, order_key = self.group_key, self.order_key
        combine_field, combine_with = self.combine_field, self.combine_with
        keep_fields = self.keep_fields
        first_key = "first_" + order_key
        first_mode = self.first_pred is not None
        out_cols = [group_key, combine_field, "n_turns", first_key, *keep_fields]

        # pin: interior + edge consumers must not re-run the sort
        partials = self._block_partials(
            ds.sort([group_key, order_key]), segmented=True).materialize()

        def interior(b: pa.Table) -> pa.Table:
            if b.num_rows <= 2:
                return b.slice(0, 0).select(out_cols)
            return b.slice(1, b.num_rows - 2).select(out_cols)

        def edges(b: pa.Table) -> pa.Table:
            if b.num_rows <= 1:
                return b
            return b.take(pa.array([0, b.num_rows - 1]))

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            # an edge piece that is not its block's last piece for the
            # group always carries a closed boundary (_endm=True /
            # next-piece _marker=True), so re-running the marker
            # segmentation over edge pieces alone cannot join across
            # the finalized interior
            g = g.sort_values(first_key, kind="mergesort")
            if first_mode:
                seg = g["_marker"].astype(int).cumsum() + 1
            else:
                seg = 1 + g["_endm"].shift(1, fill_value=False).astype(int).cumsum()
            rows = []
            for _, sg in g.groupby(seg.values, sort=True):
                row = {
                    group_key: sg[group_key].iloc[0],
                    combine_field: _null_safe_join(combine_with, sg[combine_field]),
                    "n_turns": int(sg["n_turns"].sum()),
                    first_key: sg[first_key].iloc[0],
                }
                for f in keep_fields:
                    row[f] = sg[f].iloc[0]
                rows.append(row)
            return pd.DataFrame(rows)[out_cols]

        finals = partials.map_batches(
            interior, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        merged = partials.map_batches(
            edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).groupby(group_key).map_groups(merge, batch_format="pandas")
        return finals.union(merged)

    def _block_partials(self, sorted_ds: ray.data.Dataset,
                        segmented: bool = False) -> ray.data.Dataset:
        group_key, order_key = self.group_key, self.order_key
        combine_field, combine_with = self.combine_field, self.combine_with
        keep_fields = self.keep_fields
        first_pred = self.first_pred if segmented else None
        last_pred = self.last_pred if segmented else None

        def block_partial(b: "pa.Table") -> "pa.Table":
            # groups are contiguous within a (pre)sorted block, so the
            # join is ONE Arrow binary_join over a boundary-built
            # ListArray — no Python join per group (was a pandas
            # lambda per group; recombine is the bench's slowest query)
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            n = b.num_rows
            if n == 0:
                cols = {
                    group_key: pa.array([], b.schema.field(group_key).type),
                    combine_field: pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "first_" + order_key: pa.array([], b.schema.field(order_key).type),
                }
                if first_pred is not None:
                    cols["_marker"] = pa.array([], pa.bool_())
                if last_pred is not None:
                    cols["_endm"] = pa.array([], pa.bool_())
                for f in keep_fields:
                    cols[f] = pa.array([], b.schema.field(f).type)
                return pa.table(cols)
            keys = b[group_key].to_numpy(zero_copy_only=False)
            brk = np.concatenate([[True], keys[1:] != keys[:-1]])
            if first_pred is not None:
                marker = first_pred(b).to_numpy(zero_copy_only=False)
                brk |= marker
            elif last_pred is not None:
                # break AFTER a last-entry marker (transformer.go:223)
                marker = last_pred(b).to_numpy(zero_copy_only=False)
                brk[1:] |= marker[:-1]
            starts = np.nonzero(brk)[0]
            offs = pa.array(np.append(starts, n).astype(np.int32), pa.int32())
            texts = b[combine_field]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            if not pa.types.is_string(texts.type):
                texts = pc.cast(texts, pa.string())
            joined = pc.binary_join(pa.ListArray.from_arrays(offs, texts), combine_with)
            idx = pa.array(starts)
            cols = {
                group_key: (b[group_key].combine_chunks()
                            if isinstance(b[group_key], pa.ChunkedArray)
                            else b[group_key]).take(idx),
                combine_field: joined,
                "n_turns": pa.array(np.diff(np.append(starts, n)).astype(np.int64)),
                "first_" + order_key: (b[order_key].combine_chunks()
                                       if isinstance(b[order_key], pa.ChunkedArray)
                                       else b[order_key]).take(idx),
            }
            if first_pred is not None:
                cols["_marker"] = pa.array(marker[starts])
            if last_pred is not None:
                ends = np.append(starts[1:], n)
                cols["_endm"] = pa.array(marker[ends - 1])
            for f in keep_fields:
                c = b[f].combine_chunks() if isinstance(b[f], pa.ChunkedArray) else b[f]
                cols[f] = c.take(idx)
            return pa.table(cols)

        return sorted_ds.map_batches(
            block_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def _merge_partials_segmented(self, partials: ray.data.Dataset) -> ray.data.Dataset:
        group_key, order_key = self.group_key, self.order_key
        combine_field, combine_with = self.combine_field, self.combine_with
        keep_fields = self.keep_fields
        first_key = "first_" + order_key

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(first_key, kind="mergesort")
            if "_marker" in g.columns:  # first-entry mode
                # +1, not a clamp: leading partials before any marker
                # are their own segment (transformer.go:213-219)
                seg = g["_marker"].astype(int).cumsum() + 1
            else:  # last-entry mode: new segment after an ending marker
                prev = g["_endm"].shift(1, fill_value=False)
                seg = 1 + prev.astype(int).cumsum()
            rows = []
            for seg_id, sg in g.groupby(seg.values, sort=True):
                row = {
                    group_key: sg[group_key].iloc[0],
                    "segment": int(seg_id),
                    combine_field: _null_safe_join(combine_with, sg[combine_field]),
                    "n_turns": int(sg["n_turns"].sum()),
                    first_key: sg[first_key].iloc[0],
                }
                for f in keep_fields:
                    row[f] = sg[f].iloc[0]
                rows.append(row)
            return pd.DataFrame(rows)

        return partials.groupby(group_key).map_groups(merge, batch_format="pandas")

    def _merge_partials(self, partials: ray.data.Dataset) -> ray.data.Dataset:
        if getattr(self, "_merge_mode", "stream") == "bypass":
            return self._merge_partials_bypass(partials)
        group_key, order_key = self.group_key, self.order_key
        combine_field, combine_with = self.combine_field, self.combine_with
        keep_fields = self.keep_fields
        first_key = "first_" + order_key

        import pandas as _pd

        def merge(g: _pd.DataFrame) -> _pd.DataFrame:
            g = g.sort_values(first_key, kind="mergesort")
            row = {
                group_key: g[group_key].iloc[0],
                "segment": 1,
                combine_field: _null_safe_join(combine_with, g[combine_field]),
                "n_turns": int(g["n_turns"].sum()),
                first_key: g[first_key].iloc[0],
            }
            for f in keep_fields:
                row[f] = g[f].iloc[0]
            return _pd.DataFrame([row])

        return partials.groupby(group_key).map_groups(merge, batch_format="pandas")

    def _merge_partials_bypass(self, partials: ray.data.Dataset) -> ray.data.Dataset:
        group_key, order_key = self.group_key, self.order_key
        combine_field, combine_with = self.combine_field, self.combine_with
        keep_fields = self.keep_fields
        first_key = "first_" + order_key

        # Only groups SPLIT across blocks need the merge shuffle — and
        # partial rows carry WHOLE-conversation strings, so shuffling
        # all of them moves the full corpus text again (measured 2x the
        # partial phase). Detection costs NO shuffle: a block's partial
        # already collapsed within-block duplicates, so a key with >1
        # partial must span blocks — i.e. be some block's FIRST or
        # LAST key. Collect just those (2 keys per block, any scale),
        # keep the ones seen twice, broadcast, and let singleton
        # groups bypass the merge shuffle entirely.
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray as _ray

        # pin the partials once — the consumers below (edge-key scan,
        # single bypass, multi merge) must not re-run the upstream
        partials = partials.materialize()

        def edge_keys(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({group_key: pa.array([], b.schema.field(group_key).type)})
            idx = pa.array([0, b.num_rows - 1]) if b.num_rows > 1 else pa.array([0])
            ks = b[group_key]
            if isinstance(ks, pa.ChunkedArray):
                ks = ks.combine_chunks()
            return pa.table({group_key: ks.take(idx)})

        edges = partials.map_batches(
            edge_keys, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).take_all()
        seen: dict = {}
        for r in edges:
            seen[r[group_key]] = seen.get(r[group_key], 0) + 1
        multi = [k for k, c in seen.items() if c > 1]
        key_type = partials.schema().base_schema.field(group_key).type
        multi_keys = pa.array(multi, key_type)
        ref = _ray.put(multi_keys)

        def finalize_single(b: pa.Table) -> pa.Table:
            ks = b[group_key]
            if isinstance(ks, pa.ChunkedArray):
                ks = ks.combine_chunks()
            keep = pc.invert(pc.is_in(ks, value_set=_ray.get(ref)))
            f = b.filter(keep)
            cols = {
                group_key: f[group_key],
                "segment": pa.array([1] * f.num_rows, pa.int64()),
                combine_field: f[combine_field],
                "n_turns": pc.cast(f["n_turns"], pa.int64()),
                first_key: f[first_key],
            }
            for fld in keep_fields:
                cols[fld] = f[fld]
            return pa.table(cols)

        def keep_multi(b: pa.Table) -> pa.Table:
            ks = b[group_key]
            if isinstance(ks, pa.ChunkedArray):
                ks = ks.combine_chunks()
            return b.filter(pc.is_in(ks, value_set=_ray.get(ref)))

        singles = partials.map_batches(
            finalize_single, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(first_key, kind="mergesort")
            row = {
                group_key: g[group_key].iloc[0],
                "segment": 1,
                combine_field: _null_safe_join(combine_with, g[combine_field]),
                "n_turns": int(g["n_turns"].sum()),
                first_key: g[first_key].iloc[0],
            }
            for f in keep_fields:
                row[f] = g[f].iloc[0]
            return pd.DataFrame([row])

        # the multi stream holds <= 2 rows per block boundary; a small
        # partition count avoids the default shuffle's fixed fan-out
        n_parts = max(2, min(16, (len(multi) // 8) or 2))
        multis = partials.map_batches(
            keep_multi, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).groupby(group_key, num_partitions=n_parts).map_groups(merge, batch_format="pandas")
        return singles.union(multis)
