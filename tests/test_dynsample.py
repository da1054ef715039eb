"""Dynamic sampling conformance: first-match-wins rule order,
throughput rate computation, hash-consistent decisions, and
broadcast↔join strategy parity."""

import numpy as np
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.functions.hashing import (
    md5_number_lower_arrow,
)
from opentelemetry_collector_contrib_ray.stages.dynsample import (
    SamplingRule,
    dynamic_sample,
)

RULES = [
    SamplingRule("errors", conditions=[("==", col("level"), "ERROR")],
                 sampler="deterministic", rate=1),
    SamplingRule("slow", conditions=[(">", col("dur"), 100.0)],
                 sampler="deterministic", rate=2),
    SamplingRule("baseline", sampler="throughput", target_keep=10),
]


def _traces(n_traces=200, rows_per=5, err_every=17, slow_every=5):
    rows = []
    for t in range(n_traces):
        for i in range(rows_per):
            is_err = err_every < 10**8 and t % err_every == 0
            is_slow = slow_every < 10**8 and t % slow_every == 0
            level = "ERROR" if (is_err and i == 0) else "INFO"
            dur = 150.0 if (is_slow and i == rows_per - 1) else 10.0
            rows.append((f"t{t:04d}", i, level, dur))
    k, i, l, d = zip(*rows)
    return pa.table({"conv_id": pa.array(list(k)),
                     "turn_idx": pa.array(list(i), pa.int64()),
                     "level": pa.array(list(l)),
                     "dur": pa.array(list(d), pa.float64())})


def _hash_keep(key: str, rate: int) -> bool:
    h = md5_number_lower_arrow(pa.array([key]))[0].as_py()
    return h % rate == 0


def oracle(tbl: pa.Table):
    import collections
    by_trace = collections.defaultdict(list)
    for r in tbl.to_pylist():
        by_trace[r["conv_id"]].append(r)
    matched = {}
    for t, rows in by_trace.items():
        if any(r["level"] == "ERROR" for r in rows):
            matched[t] = "errors"
        elif any(r["dur"] > 100.0 for r in rows):
            matched[t] = "slow"
        else:
            matched[t] = "baseline"
    n_base = sum(1 for v in matched.values() if v == "baseline")
    rates = {"errors": 1, "slow": 2,
             "baseline": max(1, -(-n_base // 10))}
    kept = {t: (rule, rates[rule]) for t, rule in matched.items()
            if _hash_keep(t, rates[rule])}
    return kept


def _run(strategy, tbl):
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = dynamic_sample(ds, "conv_id", RULES, strategy=strategy).to_pandas()
    return out


def test_dynamic_sample_matches_oracle(ray_session):
    tbl = _traces()
    kept = oracle(tbl)
    out = _run("broadcast", tbl)
    got = {t: (g.sampling_rule.iloc[0], g.sample_rate.iloc[0])
           for t, g in out.groupby("conv_id")}
    assert set(got) == set(kept)
    for t in kept:
        assert got[t] == kept[t]
        # every row of a kept trace survives
        assert (out.conv_id == t).sum() == 5
    # first-match-wins: trace 0 is both error and slow -> errors rule
    assert kept.get("t0000", ("errors", 1))[0] == "errors"


def test_dynamic_sample_join_parity(ray_session):
    tbl = _traces()
    a = _run("broadcast", tbl).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = _run("join", tbl).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a[["conv_id", "turn_idx", "sampling_rule"]].equals(
        b[["conv_id", "turn_idx", "sampling_rule"]])
    assert np.array_equal(a.sample_rate.to_numpy(), b.sample_rate.to_numpy())


def test_throughput_cap_shrinks_keep_set(ray_session):
    # all traces baseline; target_keep=10 of 100 -> rate 10
    tbl = _traces(n_traces=100, err_every=10**9, slow_every=10**9)
    out = _run("broadcast", tbl)
    assert set(out.sampling_rule) <= {"baseline"}
    assert (out.sample_rate == 10).all()
    n_kept_traces = out.conv_id.nunique()
    assert n_kept_traces < 30  # ~1-in-10 expected


def test_no_catch_all_drops_unmatched(ray_session):
    tbl = _traces(n_traces=50, err_every=7, slow_every=10**9)
    rules = [RULES[0]]  # only the errors rule, no catch-all
    for strat in ("broadcast", "join"):
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = dynamic_sample(ds, "conv_id", rules, strategy=strat).to_pandas()
        assert set(out.sampling_rule) <= {"errors"}
        exp = {f"t{t:04d}" for t in range(0, 50, 7) if _hash_keep(f"t{t:04d}", 1)}
        assert set(out.conv_id) == exp
