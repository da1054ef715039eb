"""Mergeable stream sketches: frequent items and bottom-k distinct.

Two summaries the reference lacks but a 100 TB training-data pipeline
needs constantly (the reference's only sketch is the exponential
histogram, pkg/expohisto — same mergeable partial shape):

* ``frequent_items`` — Misra-Gries / Space-Saving heavy hitters
  (Metwally et al., "Efficient Computation of Frequent and Top-k
  Elements in Data Streams"; merge rule per Agarwal et al.,
  "Mergeable Summaries", PODS'12): each block contributes an exact
  Arrow hash-group-by count table truncated to ``capacity`` entries
  by subtracting the (capacity+1)-th largest count; merging sums
  counts and re-truncates. Estimates are lower bounds with global
  undercount <= n/(capacity+1) per reduction step; when the distinct
  key count never exceeds ``capacity`` no truncation fires and the
  result is EXACT (the SQL-checked regime of the heavy_hitters
  query). Only O(capacity) rows per block ever move — no all-to-all
  shuffle, same tree-merge as aggregate.tree_reduce.

* ``bottom_k_distinct`` — KMV / bottom-k sketch (Bar-Yossef et al.,
  "Counting distinct elements in a data stream"): the k distinct
  keys with the smallest md5 hash. min-k of a union == min-k of
  per-block min-ks, so the merge is trivially associative; the same
  summary yields a deterministic distinct-key SAMPLE (SQL-checkable:
  DuckDB ``ORDER BY md5_number_lower(key) LIMIT k``) and a distinct
  COUNT estimate (``kmv_distinct_estimate``).

Error accounting for frequent_items rides IN-BAND as one all-null
sentinel key row whose count column accumulates the total subtracted
mass — null never collides with a real key, survives the group-by
merge unchanged, and keeps every partial the same schema (required
by the concat in tree_reduce's combine).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import md5_number_lower_arrow
from .aggregate import tree_reduce

ERR_BOUND_COL = "err_bound"


def _mg_truncate(tbl: pa.Table, key_cols: list[str], count_col: str, capacity: int) -> pa.Table:
    """Misra-Gries reduction: subtract the (capacity+1)-th largest
    count from every entry, drop the non-positive ones, and add the
    subtracted mass to the sentinel row. Exact (d=0) when the table
    already fits."""
    sentinel_mask = pc.is_null(tbl[key_cols[0]])
    err = pc.sum(pc.filter(tbl[count_col], sentinel_mask)).as_py() or 0
    real = tbl.filter(pc.invert(sentinel_mask))
    counts = real[count_col].to_numpy(zero_copy_only=False)
    if len(counts) > capacity:
        d = int(np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1])
        kept = counts > d
        # any single key loses at most d per reduction (a dropped
        # key's count was <= d), so the per-key undercount bound is
        # the SUM OF d's across reductions — the classic MG bound,
        # totalling <= n/(capacity+1)
        err += int(d)
        real = real.filter(pa.array(kept))
        new_counts = pc.subtract(real[count_col], pa.scalar(d, pa.int64()))
        real = real.set_column(real.column_names.index(count_col), count_col, new_counts)
    sent = pa.table(
        {c: pa.array([None], tbl.schema.field(c).type) for c in key_cols}
        | {count_col: pa.array([err], pa.int64())}
    ).select(real.column_names)
    return pa.concat_tables([real, sent], promote_options="none")


def frequent_items(
    ds: ray.data.Dataset,
    key_cols: list[str],
    capacity: int = 4096,
    top_k: int | None = None,
    count_col: str = "n",
) -> ray.data.Dataset:
    """Approximate top-k keys by count. Output: key_cols + [count_col,
    err_bound] sorted by (count desc, keys asc); every true count
    satisfies est <= true <= est + err_bound, and any key with true
    count > err_bound is guaranteed present. err_bound == 0 <=> the
    counts are exact (distinct keys never exceeded ``capacity``)."""

    def partial(b: pa.Table) -> pa.Table:
        # null keys are skipped (the countconnector missing-dim rule,
        # counter.go:64-67) — and they would collide with the all-null
        # error-sentinel row
        g = b.select(key_cols).drop_null().group_by(key_cols).aggregate([([], "count_all")])
        g = g.rename_columns(key_cols + [count_col])
        return _mg_truncate(g, key_cols, count_col, capacity)

    def combine(tables: list[pa.Table]) -> pa.Table:
        merged = pa.concat_tables(tables, promote_options="none")
        g = merged.group_by(key_cols).aggregate([(count_col, "sum")])
        g = g.rename_columns(key_cols + [count_col])
        return _mg_truncate(g, key_cols, count_col, capacity)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    final = tree_reduce(partials, combine)
    sentinel = pc.is_null(final[key_cols[0]])
    err = pc.sum(pc.filter(final[count_col], sentinel)).as_py() or 0
    real = final.filter(pc.invert(sentinel))
    real = real.append_column(ERR_BOUND_COL, pa.array([err] * real.num_rows, pa.int64()))
    order = [(count_col, "descending")] + [(k, "ascending") for k in key_cols]
    real = real.sort_by(order)
    if top_k is not None:
        real = real.slice(0, top_k)
    return ray.data.from_arrow(real)


def _bottom_k_table(tbl: pa.Table, key_col: str, k: int) -> pa.Table:
    """Keep the k distinct keys with the smallest (hash, key)."""
    g = tbl.group_by([key_col]).aggregate([("h", "min")]).rename_columns([key_col, "h"])
    g = g.sort_by([("h", "ascending"), (key_col, "ascending")])
    return g.slice(0, k)


def bottom_k_distinct(
    ds: ray.data.Dataset, key_col: str, k: int = 256, seed: str = ""
) -> ray.data.Dataset:
    """Deterministic bottom-k distinct sample: the k distinct keys
    with the smallest md5_number_lower(key || seed). Output (key, h,
    rank) in hash order — merge-invariant by construction, so any
    block partitioning yields the identical sample."""

    def partial(b: pa.Table) -> pa.Table:
        # null keys are skipped (md5_number_lower(NULL) is NULL in the
        # SQL replay, so a null could never land in the bottom-k)
        key = pc.drop_null(pc.cast(b[key_col], pa.string()))
        t = pa.table({key_col: key, "h": md5_number_lower_arrow(key, suffix=seed)})
        return _bottom_k_table(t, key_col, k)

    def combine(tables: list[pa.Table]) -> pa.Table:
        return _bottom_k_table(pa.concat_tables(tables, promote_options="none"), key_col, k)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    final = tree_reduce(partials, combine)
    final = final.append_column("rank", pa.array(np.arange(final.num_rows), pa.int64()))
    return ray.data.from_arrow(final)


def _grouped_rank(t: pa.Table, group_cols: list[str]) -> np.ndarray:
    """0-based position of each row within its group-col run; ``t``
    must already be sorted with group_cols leading the sort key."""
    n = t.num_rows
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in group_cols:
        a = t[c].to_numpy(zero_copy_only=False)
        change[1:] |= a[1:] != a[:-1]
    idx = np.arange(n)
    return idx - np.maximum.accumulate(np.where(change, idx, 0))


def _bottom_k_grouped(tbl: pa.Table, group_cols: list[str], key_col: str, k: int) -> pa.Table:
    """Keep the k distinct keys with the smallest (hash, key) WITHIN
    each group. Dedup by (group, key) first (hash is deterministic per
    key), then one sort + vectorized run-length rank."""
    g = tbl.group_by(group_cols + [key_col]).aggregate([("h", "min")])
    g = g.rename_columns(group_cols + [key_col, "h"])
    order = [(c, "ascending") for c in group_cols] + [("h", "ascending"), (key_col, "ascending")]
    t = g.sort_by(order)
    return t.filter(pa.array(_grouped_rank(t, group_cols) < k))


def stratified_bottom_k(
    ds: ray.data.Dataset,
    group_cols: list[str],
    key_col: str,
    k: int = 64,
    seed: str = "",
) -> ray.data.Dataset:
    """Deterministic stratified sample: for every group, the k
    distinct keys with the smallest md5 hash — the per-group
    generalization of ``bottom_k_distinct``, for balanced dataset
    curation (equal-size per-source/per-language samples). The merge
    is per-group min-k, so partials stay O(groups x k) per block and
    tree-merge without a shuffle; valid while groups x k stays
    tree-reducible (stratification keys are low-cardinality by
    definition — language, source, bucket). Output: group_cols + key
    + rank, rank dense in hash order within each group."""

    def partial(b: pa.Table) -> pa.Table:
        key = pc.cast(b[key_col], pa.string())
        t = pa.table(
            {c: b[c] for c in group_cols}
            | {key_col: key, "h": md5_number_lower_arrow(key, suffix=seed)}
        ).drop_null()
        return _bottom_k_grouped(t, group_cols, key_col, k)

    def combine(tables: list[pa.Table]) -> pa.Table:
        return _bottom_k_grouped(
            pa.concat_tables(tables, promote_options="none"), group_cols, key_col, k
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    final = tree_reduce(partials, combine)
    final = final.append_column("rank", pa.array(_grouped_rank(final, group_cols), pa.int64()))
    return ray.data.from_arrow(final.drop_columns(["h"]))


def top_k_per_group(
    ds: ray.data.Dataset,
    group_cols: list[str],
    order_col: str,
    k: int = 16,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """Per-group top-k ROWS by a value column — "keep the k
    highest-quality documents per source" curation primitive (the
    value-ordered sibling of ``stratified_bottom_k``'s hash-ordered
    sample). Per-block partial = sort + per-group head(k), so only
    O(groups x k) rows per block enter the tree merge — no shuffle.
    All input columns travel as payload. Rows with a null group,
    order, or tiebreak value are dropped; pass ``tiebreak_col`` (a
    unique id) to make ties deterministic. Output: input columns +
    ``rank`` (0-based, dense within each group)."""
    need = group_cols + [order_col] + ([tiebreak_col] if tiebreak_col else [])
    order = [(c, "ascending") for c in group_cols] + [
        (order_col, "descending" if descending else "ascending")
    ]
    if tiebreak_col:
        order.append((tiebreak_col, "ascending"))

    def head(t: pa.Table) -> pa.Table:
        t = t.sort_by(order)
        return t.filter(pa.array(_grouped_rank(t, group_cols) < k))

    def partial(b: pa.Table) -> pa.Table:
        valid = np.ones(b.num_rows, dtype=bool)
        for c in need:
            valid &= pc.is_valid(b[c]).to_numpy(zero_copy_only=False)
        return head(b.filter(pa.array(valid)))

    def combine(tables: list[pa.Table]) -> pa.Table:
        return head(pa.concat_tables(tables, promote_options="none"))

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    final = tree_reduce(partials, combine)
    final = final.append_column("rank", pa.array(_grouped_rank(final, group_cols), pa.int64()))
    return ray.data.from_arrow(final)


def kmv_distinct_estimate(sample: pa.Table, k: int) -> float:
    """Distinct-count estimate from a bottom_k_distinct result: exact
    when fewer than k distinct keys were seen, else (k-1) / r where r
    is the k-th smallest hash normalized to [0,1)."""
    if sample.num_rows < k:
        return float(sample.num_rows)
    h_k = int(sample["h"][k - 1].as_py())
    return (k - 1) / (h_k / 2.0**64)


def exact_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    qs: list[float],
) -> pa.Table:
    """EXACT order statistics at any scale: one range-partitioned sort
    of the single value column, per-block row COUNTS to the driver
    (O(blocks) ints, fetched by tiny remote probes — the data itself
    stays put), then at most len(qs) block fetches to read the ranked
    rows. Rank formula = DuckDB's quantile_disc (1-indexed
    max(1, ceil(q*n))), so the oracle replays bit-exact. Null values
    sort to the END under Ray's sort and are excluded from n, matching
    SQL aggregate semantics."""
    def drop_null(b: pa.Table) -> pa.Table:
        return b.drop_null()

    sorted_ds = ds.select_columns([value_col]) \
        .map_batches(drop_null, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None) \
        .sort(value_col).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(block: pa.Table) -> int:
        return block.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    cache: dict[int, pa.Table] = {}
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
        if n == 0:
            out_q.append(q)
            out_v.append(None)
            continue
        rank = max(1, int(math.ceil(q * n)))  # DuckDB quantile_disc
        bi = int(np.searchsorted(cum, rank, side="left"))
        if bi not in cache:
            cache[bi] = ray.get(refs[bi])
        before = int(cum[bi - 1]) if bi else 0
        out_q.append(q)
        out_v.append(cache[bi][value_col][rank - before - 1].as_py())
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v)})


def grouped_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs: list[float],
    max_segments: int = 4_000_000,
) -> pa.Table:
    """EXACT per-group order statistics (the spanmetrics
    p50/p95/p99-per-dimension shape): one sort by (group, value), then
    per-block (group, run-length) summaries to the driver — sorted
    runs make that O(groups + blocks) rows, capped by
    ``max_segments`` (fail loud, the cue to pre-bucket groups) — and
    one fetch per block that holds a ranked row. Rank formula =
    DuckDB quantile_disc, null values dropped like SQL aggregates;
    null groups kept (SQL GROUP BY keeps them)."""
    def drop_null_vals(b: pa.Table) -> pa.Table:
        col = b[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return b.filter(pc.is_valid(col))

    sorted_ds = ds.select_columns([group_col, value_col]) \
        .map_batches(drop_null_vals, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None) \
        .sort([group_col, value_col]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def seg_meta(block: pa.Table):
        if block.num_rows == 0:
            return [], []
        g = block[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        gn = g.to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.concatenate([[True], gn[1:] != gn[:-1]]))[0]
        lens = np.diff(np.append(starts, block.num_rows))
        return list(g.take(pa.array(starts)).to_pylist()), lens.tolist()

    metas = ray.get([seg_meta.remote(r) for r in refs])
    # runs per group in global order: [(block_i, start_off, length)]
    runs: dict = {}
    totals: dict = {}
    n_segments = 0
    for bi, (gvals, lens) in enumerate(metas):
        off = 0
        for gv, ln in zip(gvals, lens):
            runs.setdefault(gv, []).append((bi, off, ln))
            totals[gv] = totals.get(gv, 0) + ln
            off += ln
            n_segments += 1
        if n_segments > max_segments:
            raise ValueError(
                "grouped_quantiles: segment count exceeds "
                f"{max_segments} — pre-bucket the group column")
    cache: dict[int, pa.Table] = {}
    out_g, out_q, out_v = [], [], []
    for gv, rs in runs.items():
        n = totals[gv]
        lens = np.array([r[2] for r in rs], np.int64)
        cum = np.cumsum(lens)
        for q in qs:
            rank = max(1, int(math.ceil(q * n)))
            ri = int(np.searchsorted(cum, rank, side="left"))
            bi, off, _ = rs[ri]
            before = int(cum[ri - 1]) if ri else 0
            if bi not in cache:
                cache[bi] = ray.get(refs[bi])
            out_g.append(gv)
            out_q.append(q)
            out_v.append(cache[bi][value_col][off + rank - before - 1].as_py())
    return pa.table({group_col: pa.array(out_g),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v)})
