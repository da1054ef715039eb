"""Dynamic sampling — ordered rules pick a sampler, samplers pick a
rate, a consistent hash decides keep/drop per trace.

Reference semantics (processor/dynamicsamplingprocessor/README.md
"How it works"):

  1. spans buffer per trace until the trace is decidable — on a
     finite table group completeness is exact, so the timers
     (trace_timeout / decision_delay) disappear (same reduction the
     tailsampling stage documents);
  2. rules are evaluated IN ORDER against the accumulated trace; a
     condition matches the trace if any span satisfies it; the first
     rule whose conditions all match selects the sampler; a rule
     with no conditions is a catch-all;
  3. samplers only produce 1-in-N rates, never decisions:
     ``deterministic`` is a fixed N; ``throughput`` is
     dynsampler-go's TotalThroughput — cap kept traces per rule at
     ``target_keep`` by setting N = max(1, ceil(n_traces / target));
  4. the rate converts to a threshold and the keep/drop decision
     compares it against randomness derived from the trace id (OTel
     consistent probability sampling) — here the same md5-u64 the
     probabilistic sampler uses (DuckDB-parity, so the whole
     pipeline is SQL-checkable), keep iff hash(trace) % N == 0;
  5. kept spans are annotated with the matched rule name and the
     effective rate (the reference's rule attribute + ``ot=th``
     tracestate).

Scale shape: pass 1 reduces the row stream to one row per
(trace × block) with one any-match bit per distinct condition (a
per-batch Arrow hash groupby partial), then merges bits per trace.
Decisions are O(#traces): under ``broadcast_limit`` they merge on
the driver and ship as one ray.put object read by a stream-side
filter (the tailsampling shape); above it, everything stays a
Dataset — bits merge via a distributed groupby and decisions reach
the rows through a hash join on the trace key, so no driver-side
table grows with the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..expr import compile_predicate
from ..functions.hashing import md5_number_lower_arrow


@dataclass
class SamplingRule:
    """One ordered rule (README "rules are evaluated in order")."""

    name: str
    conditions: list[Any] = field(default_factory=list)  # ALL must match; [] = catch-all
    sampler: str = "deterministic"  # "deterministic" | "throughput"
    rate: int = 1            # deterministic: keep 1-in-N
    target_keep: int = 0     # throughput: cap kept traces per rule


def _decide(bits: pa.Table, trace_key: str, rules: list[SamplingRule],
            cond_index: dict[int, list[int]], seed: str) -> pa.Table:
    """bits: one row per trace, columns c0..cK any-match bits.
    Returns (trace_key, sampling_rule, sample_rate, keep)."""
    n = bits.num_rows
    matched = np.full(n, -1, dtype=np.int64)
    # first-match-wins over ordered rules
    for ri, rule in enumerate(rules):
        want = cond_index[ri]
        if want:
            m = np.ones(n, dtype=bool)
            for ci in want:
                m &= bits[f"c{ci}"].to_numpy(zero_copy_only=False).astype(bool)
        else:
            m = np.ones(n, dtype=bool)
        matched = np.where((matched < 0) & m, ri, matched)

    rates = np.ones(n, dtype=np.int64)
    for ri, rule in enumerate(rules):
        sel = matched == ri
        if rule.sampler == "deterministic":
            rates[sel] = max(1, int(rule.rate))
        elif rule.sampler == "throughput":
            cnt = int(sel.sum())
            rates[sel] = max(1, -(-cnt // max(1, rule.target_keep)))
        else:
            raise ValueError(f"unknown sampler {rule.sampler!r}")

    keys = bits[trace_key]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    h = md5_number_lower_arrow(keys, suffix=seed).to_numpy(zero_copy_only=False)
    keep = (matched >= 0) & (h % rates.astype(np.uint64) == 0)
    names = np.array([r.name for r in rules] + [""])
    return pa.table({
        trace_key: keys,
        "sampling_rule": pa.array(names[matched]),
        "sample_rate": pa.array(rates),
        "keep": pa.array(keep),
    })


def dynamic_sample(
    ds: ray.data.Dataset,
    trace_key: str,
    rules: list[SamplingRule],
    *,
    seed: int = 0,
    strategy: str = "broadcast",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Apply the rule → sampler → threshold decision per trace and
    return the kept rows annotated with (sampling_rule, sample_rate).

    ``strategy="broadcast"`` merges per-trace bits on the driver and
    broadcasts the kept-trace map (right shape while #traces × #conds
    fits one object); ``"join"`` keeps decisions distributed and hash
    joins them onto the stream (the 10^9-trace path).
    """
    # distinct conditions across rules, evaluated once each
    conds: list[Any] = []
    cond_index: dict[int, list[int]] = {}
    for ri, rule in enumerate(rules):
        idxs = []
        for c in rule.conditions:
            if c not in conds:
                conds.append(c)
            idxs.append(conds.index(c))
        cond_index[ri] = idxs
    preds = [compile_predicate(c) for c in conds]
    seed_s = str(seed) if seed else ""
    bit_cols = [f"c{i}" for i in range(len(conds))]

    def partial(b: pa.Table) -> pa.Table:
        cols = {trace_key: b[trace_key]}
        for i, p in enumerate(preds):
            m = pc.fill_null(p(b), False)
            cols[f"c{i}"] = pc.cast(m, pa.int8())
        t = pa.table(cols)
        g = t.group_by([trace_key]).aggregate([(c, "max") for c in bit_cols])
        return g.rename_columns([trace_key] + bit_cols)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    if strategy == "broadcast":
        from .aggregate import tree_reduce

        def combine(tables: list[pa.Table]) -> pa.Table:
            merged = pa.concat_tables(
                [t for t in tables if t.num_rows] or tables[:1],
                promote_options="none")
            g = merged.group_by([trace_key]).aggregate(
                [(c, "max") for c in bit_cols])
            return g.rename_columns([trace_key] + bit_cols)

        bits = tree_reduce(partials, combine)
        dec = _decide(bits, trace_key, rules, cond_index, seed_s)
        kept = dec.filter(dec["keep"])
        dec_ref = ray.put(kept.drop_columns(["keep"]))

        def annotate(b: pa.Table) -> pa.Table:
            d = ray.get(dec_ref)
            keys = b[trace_key]
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            pos = pc.index_in(keys, value_set=d[trace_key])
            ok = pc.is_valid(pos)
            b = b.filter(ok)
            pos = pos.filter(ok)
            b = b.append_column("sampling_rule", pc.take(d["sampling_rule"], pos))
            return b.append_column("sample_rate", pc.take(d["sample_rate"], pos))

        return ds.map_batches(annotate, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    if strategy == "join":
        merged = partials.groupby(trace_key).max(bit_cols)
        ren = {f"max({c})": c for c in bit_cols}

        def decide_block(b: pa.Table) -> pa.Table:
            b = b.rename_columns([ren.get(c, c) for c in b.column_names])
            # per-block deterministic + condition matching is exact;
            # throughput rates need the global per-rule count, so the
            # join path computes them in a second tiny aggregate
            return _decide(b, trace_key, rules, cond_index, seed_s)

        # throughput rates depend on GLOBAL per-rule trace counts —
        # compute matches first, then counts, then decisions
        matched = merged.map_batches(decide_block, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
        counts = {r["sampling_rule"]: r["count()"] for r in
                  matched.groupby("sampling_rule").count().take_all()}
        need_fix = any(r.sampler == "throughput" for r in rules)
        if need_fix:
            by_name = {r.name: r for r in rules}

            def fix_rates(b: pa.Table) -> pa.Table:
                rates = b["sample_rate"].to_numpy(zero_copy_only=False).copy()
                names = b["sampling_rule"].to_numpy(zero_copy_only=False)
                keys = b[trace_key]
                if isinstance(keys, pa.ChunkedArray):
                    keys = keys.combine_chunks()
                h = md5_number_lower_arrow(
                    keys, suffix=seed_s).to_numpy(zero_copy_only=False)
                for name, rule in by_name.items():
                    if rule.sampler != "throughput":
                        continue
                    sel = names == name
                    n = counts.get(name, 0)
                    rates[sel] = max(1, -(-n // max(1, rule.target_keep)))
                keep = (names != "") & (h % rates.astype(np.uint64) == 0)
                b = b.set_column(b.column_names.index("sample_rate"),
                                 "sample_rate", pa.array(rates))
                return b.set_column(b.column_names.index("keep"),
                                    "keep", pa.array(keep))

            matched = matched.map_batches(fix_rates, batch_format="pyarrow",
                                          zero_copy_batch=True, batch_size=None)
        def _kept(b: pa.Table) -> pa.Table:
            return b.filter(b["keep"]).drop_columns(["keep"])

        decisions = matched.map_batches(_kept, batch_format="pyarrow",
                                        zero_copy_batch=True, batch_size=None)
        return ds.join(decisions, join_type="inner", on=(trace_key,),
                       num_partitions=num_partitions)

    raise ValueError(f"unknown strategy {strategy!r}")
