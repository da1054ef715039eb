"""Tail-sampling POLICY TREE — composable whole-trace keep/drop rules.

Reference semantics (processor/tailsamplingprocessor/config.go:312-330
policy list; evaluators under internal/sampling/): a trace is buffered
until complete, then every policy evaluates it; ``drop`` policies are
checked first and veto everything (processor.go:301-307), otherwise the
trace is sampled iff ANY policy decides Sampled (processor.go:803).
Policies implemented here, with their reference file:

  always_sample        always_sample.go — unconditional
  probabilistic        probabilistic.go — salted hash of the trace id
  latency              latency.go — whole-trace duration in
                       (threshold_ms, upper_threshold_ms]; upper 0 = no cap
  span_count           span_count_sampler.go — min_spans <= n (<= max)
  string_attribute     string_tag_filter.go — any span's attr in values
                       (or regex list); invert_match inverts at trace level
  numeric_attribute    numeric_tag_filter.go — any span's attr in
                       [min_value, max_value]; invert likewise
  boolean_attribute    boolean_tag_filter.go — any span's attr == value
  status_code          status_code.go — any span's status in codes
  condition            ottl.go analog — any span matches an expr-language
                       predicate (this engine's OTTL-condition front-end)
  and                  and.go — all sub-policies sample
  drop                 drop.go — veto: matching traces are never sampled
  rate_limiting        rate_limiting.go — spans-per-second token budget
  composite            composite.go — ordered sub-policies with per-sub
                       spans-per-second allocations + a total cap

Timer reduction (same as SURVEY.md §2.5): the reference counts
spans-per-second against the WALL clock at decision time; on a finite
table the event-time analog is the second the trace completes
(``floor(max_ts, 's')``). Within a second, traces are processed in
deterministic ``(min_ts, trace_id)`` order — the arrival-order analog —
so rate decisions are reproducible and SQL-replayable with a windowed
running sum.

Invert semantics: ``invert_match`` maps to NOT(any span matches) at the
trace level — a trace with the key absent everywhere is sampled, same
as the reference's invertHasResourceOrSpanWithCondition.

Scale shape: pass 1 reduces the stream to ONE feature row per trace
(count, min/max ts, one boolean per attribute leaf) via per-batch Arrow
hash-groupby partials merged by a distributed groupby — trace
cardinality is unbounded-safe. Stateless policies evaluate vectorized
over the feature table; each stateful policy (rate_limiting /
composite) adds one sort of the FEATURE table (not the stream) through
the segmented-scan cumsum. The sampled trace-id set broadcasts into a
stream-side filter below ``broadcast_key_limit`` keys and falls back to
a left_semi hash join above it.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..expr import compile_predicate
from ..functions.hashing import md5_number_lower_arrow
from .scan import keyed_cumsum

# ---------------------------------------------------------------- leaves

_LEAF_TYPES = ("string_attribute", "numeric_attribute", "boolean_attribute",
               "status_code", "condition", "trace_state")
_STATELESS = _LEAF_TYPES + ("always_sample", "probabilistic", "latency",
                            "span_count", "and", "drop")


def _leaf_mask_fn(p: dict):
    """Row-level mask for an attribute leaf (vectorized, nulls->False)."""
    typ = p["type"]
    if typ == "condition":
        return compile_predicate(p["expr"])
    key = p["key"]
    if typ == "string_attribute":
        values = p.get("values", [])
        if p.get("enabled_regex_matching") or p.get("regex"):
            pats = "|".join(f"(?:{v})" for v in values)

            def f(b: pa.Table) -> pa.Array:
                col = pc.cast(_col(b, key), pa.string())
                return pc.fill_null(pc.match_substring_regex(col, pats), False)
            return f

        vset = pa.array([str(v) for v in values], pa.string())

        def f(b: pa.Table) -> pa.Array:
            col = pc.cast(_col(b, key), pa.string())
            return pc.fill_null(pc.is_in(col, value_set=vset), False)
        return f
    if typ == "numeric_attribute":
        lo = p.get("min_value")
        hi = p.get("max_value")
        if lo is None and hi is None:
            raise ValueError("numeric_attribute needs min_value or max_value")

        def f(b: pa.Table) -> pa.Array:
            col = _col(b, key)
            m = pa.array(np.ones(b.num_rows, bool))
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(col, lo))
            if hi is not None:
                m = pc.and_(m, pc.less_equal(col, hi))
            return pc.fill_null(m, False)
        return f
    if typ == "boolean_attribute":
        want = bool(p["value"])

        def f(b: pa.Table) -> pa.Array:
            return pc.fill_null(pc.equal(_col(b, key), want), False)
        return f
    if typ == "status_code":
        codes = pa.array(p["status_codes"])

        def f(b: pa.Table) -> pa.Array:
            return pc.fill_null(pc.is_in(_col(b, key), value_set=codes), False)
        return f
    if typ == "trace_state":
        # trace_state_filter.go:28-45: sample when the W3C tracestate
        # entry for ``key`` equals one of ``values`` exactly; empty
        # values and oversized key=value pairs are ignored
        import re as _re

        src = p.get("state_col", "trace_state")
        values = [v for v in p.get("values", [])
                  if v and len(key) + len(v) < 256]
        vset = pa.array(values, pa.string())
        pat = rf"(?:^|,)\s*{_re.escape(key)}=(?P<v>[^,]*)"

        def f(b: pa.Table) -> pa.Array:
            if not values:
                return pa.array([False] * b.num_rows)
            ex = pc.extract_regex(pc.cast(_col(b, src), pa.string()),
                                  pattern=pat)
            return pc.fill_null(
                pc.is_in(pc.struct_field(ex, "v"), value_set=vset), False)
        return f
    raise ValueError(f"unknown leaf policy type {typ!r}")


def _col(b: pa.Table, name: str) -> pa.Array:
    c = b[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _collect_leaves(policies: list[dict]) -> list[dict]:
    out = []

    def walk(p: dict):
        if p["type"] in _LEAF_TYPES:
            if not any(l is p for l in out):
                out.append(p)
        for sub in p.get("sub_policies", []) or []:
            walk(sub)
        if p.get("sub_policy"):
            walk(p["sub_policy"])
    for p in policies:
        walk(p)
    return out


# ------------------------------------------------------- feature pass

def _trace_features(ds: ray.data.Dataset, group_key: str, ts_col: str,
                    leaves: list[dict],
                    driver_limit: int = 2_000_000) -> ray.data.Dataset:
    """One row per trace: n, min_ts, max_ts, any_<i> per leaf. The
    per-block partials (traces x blocks rows) merge on the DRIVER when
    they fit ``driver_limit`` — one Arrow group_by beats a distributed
    shuffle's multi-second executor floor on a thousand-row table —
    and through the distributed groupby otherwise."""
    mask_fns = [_leaf_mask_fn(p) for p in leaves]
    leaf_cols = [f"any_{i}" for i in range(len(leaves))]

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_key: b[group_key], ts_col: b[ts_col]})
        for i, fn in enumerate(mask_fns):
            t = t.append_column(leaf_cols[i],
                                pc.cast(fn(b), pa.int8()))
        aggs = [([], "count_all"), (ts_col, "min"), (ts_col, "max")]
        aggs += [(c, "max") for c in leaf_cols]
        g = t.group_by(group_key, use_threads=False).aggregate(aggs)
        return g.rename_columns([group_key, "n", "min_ts", "max_ts"] + leaf_cols)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None) \
                 .materialize()
    if partials.count() <= driver_limit:
        tabs = [t for t in (ray.get(r) for r in partials.to_arrow_refs())
                if t.num_rows]
        if not tabs:
            return partials
        tbl = pa.concat_tables(tabs, promote_options="permissive")
        aggs2 = [("n", "sum"), ("min_ts", "min"), ("max_ts", "max")]
        aggs2 += [(c, "max") for c in leaf_cols]
        g = tbl.group_by(group_key, use_threads=True).aggregate(aggs2)
        g = g.rename_columns([group_key, "n", "min_ts", "max_ts"] + leaf_cols)
        for c in ("min_ts", "max_ts"):
            g = g.set_column(g.column_names.index(c), c,
                             pc.cast(g[c], pa.timestamp("us")))
        return ray.data.from_arrow(g)
    from ray.data.aggregate import Max, Min, Sum

    aggs = [Sum("n"), Min("min_ts"), Max("max_ts")]
    aggs += [Max(c) for c in leaf_cols]
    merged = partials.groupby(group_key).aggregate(*aggs)
    ren = {"sum(n)": "n", "min(min_ts)": "min_ts", "max(max_ts)": "max_ts"}
    ren.update({f"max({c})": c for c in leaf_cols})

    def rename_norm(b: pa.Table) -> pa.Table:
        b = b.rename_columns([ren.get(c, c) for c in b.column_names])
        # Ray's Min/Max can emit differing timestamp UNITS per block
        # (s vs ms); normalize so downstream concat/sort see one schema
        for c in ("min_ts", "max_ts"):
            b = b.set_column(b.column_names.index(c), c,
                             pc.cast(b[c], pa.timestamp("us")))
        return b

    return merged.map_batches(rename_norm, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


# ------------------------------------------------------ decision pass

def _stateless_decision(p: dict, b: pa.Table,
                        group_key: str, hash_seed: int) -> pa.Array:
    typ = p["type"]
    n = b.num_rows
    if typ == "always_sample":
        return pa.array(np.ones(n, bool))
    if typ == "probabilistic":
        pct = float(p["sampling_percentage"])
        seed = str(p.get("hash_salt", hash_seed) or "")
        keys = _col(b, group_key)
        h = md5_number_lower_arrow(keys, suffix=seed) \
            .to_numpy(zero_copy_only=False)
        return pa.array((h % 10_000) < int(pct * 100))
    if typ == "latency":
        lo_ms = int(p["threshold_ms"])
        hi_ms = int(p.get("upper_threshold_ms", 0))
        dur = pc.subtract(pc.cast(_col(b, "max_ts"), pa.timestamp("us")),
                          pc.cast(_col(b, "min_ts"), pa.timestamp("us")))
        ms = pc.divide(pc.cast(dur, pa.int64()), 1000)
        m = pc.greater(ms, lo_ms)
        if hi_ms:
            m = pc.and_(m, pc.less_equal(ms, hi_ms))
        return pc.fill_null(m, False)
    if typ == "span_count":
        lo = int(p.get("min_spans", 0))
        hi = int(p.get("max_spans", 0))
        cnt = _col(b, "n")
        m = pc.greater_equal(cnt, lo)
        if hi:
            m = pc.and_(m, pc.less_equal(cnt, hi))
        return pc.fill_null(m, False)
    if typ in _LEAF_TYPES:
        i = p["_leaf_i"]
        m = pc.greater(_col(b, f"any_{i}"), 0)
        if p.get("invert_match"):
            m = pc.invert(m)
        return m
    if typ == "and":
        subs = [_stateless_decision(s, b, group_key, hash_seed)
                for s in p["sub_policies"]]
        out = subs[0]
        for s in subs[1:]:
            out = pc.and_(out, s)
        return out
    if typ == "drop":
        return _stateless_decision(p["sub_policy"], b,
                                   group_key, hash_seed)
    raise ValueError(f"policy type {typ!r} is not stateless")


def _second_col(b: pa.Table, ts_col: str) -> pa.Array:
    return pc.cast(pc.floor_temporal(
        pc.cast(_col(b, ts_col), pa.timestamp("us")), unit="second"),
        pa.int64())


def _driver_cumsum(tbl: "pa.Table", key_col: str, ts_col: str,
                   val_col: str, out_col: str,
                   tiebreak_col: str) -> "pa.Table":
    """keyed_cumsum's driver twin for the size-gated small-trace-set
    fast path: one table sort + segmented inclusive cumsum — byte-equal
    semantics to scan.keyed_cumsum (per-key running sum in
    (ts, tiebreak) order), parity-tested in test_tailpolicy."""
    st = tbl.sort_by([(key_col, "ascending"), (ts_col, "ascending"),
                      (tiebreak_col, "ascending")])
    k = st[key_col].to_numpy(zero_copy_only=False)
    v = st[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.nonzero(np.concatenate([[True], k[1:] != k[:-1]]))[0]
    cs = np.cumsum(v)
    seg_base = cs[starts] - v[starts]
    lens = np.diff(np.append(starts, len(v)))
    out = cs - np.repeat(seg_base, lens)
    return st.append_column(out_col, pa.array(out))


def tail_sample_policies(
    ds: ray.data.Dataset,
    group_key: str,
    ts_col: str,
    policies: list[dict],
    *,
    hash_seed: int = 0,
    broadcast_key_limit: int = 2_000_000,
    driver_trace_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Apply a tailsampling policy list to the stream; returns every
    row of the traces the tree samples. Policy dicts mirror the
    reference's YAML config (see module docstring)."""
    import copy

    policies = copy.deepcopy(policies)  # we annotate leaf indices below
    for p in policies:
        if p["type"] == "composite":
            for s in p["sub_policies"]:
                if s["type"] not in _STATELESS:
                    raise ValueError("composite sub-policies must be stateless")
    leaves = _collect_leaves(policies)
    for i, p in enumerate(leaves):
        # index annotation survives pickling into workers (object ids
        # don't, so an id()-keyed map would break inside map_batches)
        p["_leaf_i"] = i
    feats = _trace_features(ds, group_key, ts_col, leaves,
                            driver_limit=driver_trace_limit).materialize()

    # ---- stateless decisions + stateful-policy inputs, one pass ----
    stateful = [p for p in policies if p["type"] in ("rate_limiting", "composite")]
    stateless = [p for p in policies if p["type"] not in
                 ("rate_limiting", "composite")]

    def decide(b: pa.Table) -> pa.Table:
        t = b
        dropped = pa.array(np.zeros(b.num_rows, bool))
        sampled = pa.array(np.zeros(b.num_rows, bool))
        for p in stateless:
            d = _stateless_decision(p, b, group_key, hash_seed)
            if p["type"] == "drop":
                dropped = pc.or_(dropped, d)
            else:
                sampled = pc.or_(sampled, d)
        t = t.append_column("__dropped", dropped)
        t = t.append_column("__sampled0", sampled)
        t = t.append_column("__sec", _second_col(b, "max_ts"))
        # composite: index of the first sub-policy that samples (-1 none)
        for k, p in enumerate(stateful):
            if p["type"] != "composite":
                continue
            claim = np.full(b.num_rows, -1, np.int64)
            for j in range(len(p["sub_policies"]) - 1, -1, -1):
                d = _stateless_decision(p["sub_policies"][j], b,
                                        group_key, hash_seed)
                claim = np.where(d.to_numpy(zero_copy_only=False), j, claim)
            t = t.append_column(f"__claim_{k}", pa.array(claim))
        return t

    def add_key(b: pa.Table, kk: int) -> pa.Table:
        sec = _col(b, "__sec").to_numpy(zero_copy_only=False)
        claim = _col(b, f"__claim_{kk}").to_numpy(zero_copy_only=False)
        # claim+1 so UNCLAIMED traces (-1) get their own segment
        # and never consume sub-policy 0's budget
        return b.append_column(
            f"__ckey_{kk}", pa.array(sec * 65 + claim + 1))

    for p in stateful:
        if p["type"] == "composite" and len(p["sub_policies"]) > 64:
            raise ValueError("composite supports at most 64 sub-policies")

    def finalize(b: pa.Table) -> pa.Table:
        sampled = _col(b, "__sampled0")
        for k, p in enumerate(stateful):
            cum = _col(b, f"__cum_{k}").to_numpy(zero_copy_only=False)
            if p["type"] == "rate_limiting":
                ok = cum <= int(p["spans_per_second"])
            else:
                claim = _col(b, f"__claim_{k}").to_numpy(zero_copy_only=False)
                allocs = np.array(
                    [min(int(s.get("max_spans_per_second", 2**62)),
                         int(p.get("max_total_spans_per_second", 2**62)))
                     for s in p["sub_policies"]], np.int64)
                ok = (claim >= 0) & (cum <= allocs[np.maximum(claim, 0)])
            sampled = pc.or_(sampled, pa.array(ok))
        keep = pc.and_(sampled, pc.invert(_col(b, "__dropped")))
        return pa.table({group_key: _col(b, group_key)}).filter(keep)

    # ---- decision + per-second ordered token budgets --------------
    # SIZE GATE: the per-trace feature table is usually tiny relative
    # to the stream (one row per trace). Below the gate the whole
    # decide -> cumsum -> finalize chain runs on the driver with the
    # SAME batch kernels — each Dataset sort/execution costs seconds of
    # fixed executor floor that dwarfs a thousand-row table. Above the
    # gate the distributed path runs unchanged.
    n_traces = feats.count()
    if n_traces <= driver_trace_limit:
        tabs = [t for t in (ray.get(r) for r in feats.to_arrow_refs())
                if t.num_rows]
        tbl = pa.concat_tables(tabs, promote_options="none") if tabs             else None
        if tbl is None:
            return ds.limit(0)
        t = decide(tbl)
        for k, p in enumerate(stateful):
            out_col = f"__cum_{k}"
            if p["type"] == "rate_limiting":
                t = _driver_cumsum(t, "__sec", "min_ts", "n",
                                   out_col, group_key)
            else:
                t = add_key(t, k)
                t = _driver_cumsum(t, f"__ckey_{k}", "min_ts", "n",
                                   out_col, group_key)
        kept_tbl = finalize(t)
        keys_arr = pc.unique(kept_tbl[group_key].combine_chunks()
                             if isinstance(kept_tbl[group_key], pa.ChunkedArray)
                             else kept_tbl[group_key])
        ref = ray.put(keys_arr)

        def keep_small(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(_col(b, group_key),
                                     value_set=ray.get(ref)))

        return ds.map_batches(keep_small, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    else:
        decided = feats.map_batches(decide, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None)
        for k, p in enumerate(stateful):
            out_col = f"__cum_{k}"
            if p["type"] == "rate_limiting":
                decided = keyed_cumsum(decided, "__sec", "min_ts", "n",
                                       out_col=out_col, tiebreak_col=group_key)
            else:  # composite: budget per (second, claiming sub-policy)
                decided = decided.map_batches(
                    lambda b, kk=k: add_key(b, kk), batch_format="pyarrow",
                    zero_copy_batch=True, batch_size=None)
                decided = keyed_cumsum(decided, f"__ckey_{k}", "min_ts", "n",
                                       out_col=out_col, tiebreak_col=group_key)

    kept_keys = decided.map_batches(finalize, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None) \
                       .materialize()

    n_keys = kept_keys.count()
    if n_keys <= broadcast_key_limit:
        tabs = [t for t in (ray.get(r) for r in kept_keys.to_arrow_refs())
                if t.num_columns and t.num_rows]
        keys_arr = pc.unique(pa.concat_tables(
            tabs, promote_options="none")[group_key].combine_chunks()) \
            if tabs else pa.array([], pa.string())
        ref = ray.put(keys_arr)

        def keep(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(_col(b, group_key),
                                     value_set=ray.get(ref)))

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    # sampled-id set too large to broadcast: semi-join the stream
    # floor of 16: the STREAM side dwarfs the key side whenever this
    # fallback fires (keys > broadcast gate), and a low key-derived
    # count would serialize the join (round-4 sf1 stress finding)
    num_partitions = max(16, min(256, n_keys // 500_000 + 2))
    return ds.join(kept_keys, join_type="left_semi",
                   num_partitions=int(num_partitions),
                   on=(group_key,))
