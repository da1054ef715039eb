"""Tail-sampling policy tree vs hand-computed decisions (ports the
decision semantics of reference internal/sampling/*_test.go onto the
flat-table reduction)."""

from datetime import datetime, timedelta

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.tailpolicy import (
    tail_sample_policies,
)

T0 = datetime(2024, 1, 1)


def _trace(rows, conv, start_s, dur_ms, n, status=200, tool=""):
    for i in range(n):
        rows.append((conv, T0 + timedelta(seconds=start_s,
                                          milliseconds=i * dur_ms / max(n - 1, 1)),
                     status, tool))


def _tbl(rows):
    c, t, s, tl = zip(*rows)
    return pa.table({"conv_id": list(c),
                     "ts": pa.array(list(t), pa.timestamp("us")),
                     "status": pa.array(list(s), pa.int64()),
                     "tool": list(tl)})


def _kept(tbl, policies, **kw):
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = tail_sample_policies(ds, "conv_id", "ts", policies, **kw).to_pandas()
    return set(out.conv_id)


def test_latency_policy(ray_session):
    rows = []
    _trace(rows, "slow", 0, 500, 4)
    _trace(rows, "fast", 10, 50, 4)
    kept = _kept(_tbl(rows), [{"type": "latency", "threshold_ms": 100}])
    assert kept == {"slow"}
    # upper bound excludes the very slow trace
    rows2 = list(rows)
    _trace(rows2, "veryslow", 20, 5000, 4)
    kept = _kept(_tbl(rows2), [{"type": "latency", "threshold_ms": 100,
                                "upper_threshold_ms": 1000}])
    assert kept == {"slow"}


def test_span_count_and_status(ray_session):
    rows = []
    _trace(rows, "big", 0, 100, 8)
    _trace(rows, "small", 5, 100, 2)
    _trace(rows, "err", 10, 100, 3, status=500)
    kept = _kept(_tbl(rows), [{"type": "span_count", "min_spans": 5}])
    assert kept == {"big"}
    kept = _kept(_tbl(rows), [{"type": "status_code", "key": "status",
                               "status_codes": [500]}])
    assert kept == {"err"}


def test_string_attribute_invert_and_drop(ray_session):
    rows = []
    _trace(rows, "a", 0, 100, 3, tool="search")
    _trace(rows, "b", 5, 100, 3, tool="calc")
    pol = [{"type": "string_attribute", "key": "tool", "values": ["search"]}]
    assert _kept(_tbl(rows), pol) == {"a"}
    pol_inv = [{"type": "string_attribute", "key": "tool",
                "values": ["search"], "invert_match": True}]
    assert _kept(_tbl(rows), pol_inv) == {"b"}
    # drop vetoes even an always_sample
    pol_drop = [{"type": "always_sample"},
                {"type": "drop", "sub_policy": {
                    "type": "string_attribute", "key": "tool",
                    "values": ["calc"]}}]
    assert _kept(_tbl(rows), pol_drop) == {"a"}


def test_and_policy(ray_session):
    rows = []
    _trace(rows, "both", 0, 500, 6, tool="search")
    _trace(rows, "slow_only", 5, 500, 6, tool="calc")
    _trace(rows, "tool_only", 10, 50, 6, tool="search")
    pol = [{"type": "and", "sub_policies": [
        {"type": "latency", "threshold_ms": 100},
        {"type": "string_attribute", "key": "tool", "values": ["search"]},
    ]}]
    assert _kept(_tbl(rows), pol) == {"both"}


def test_rate_limiting_budget_order(ray_session):
    # three traces complete in the same second; budget admits the first
    # two in (min_ts, conv_id) order. 4 spans each, budget 8/s.
    rows = []
    _trace(rows, "t1", 0, 100, 4)   # min_ts earliest
    for conv, off in (("t2", 0.2), ("t3", 0.4)):
        for i in range(4):
            rows.append((conv, T0 + timedelta(seconds=off, milliseconds=i * 30),
                         200, ""))
    kept = _kept(_tbl(rows), [{"type": "rate_limiting", "spans_per_second": 8}])
    assert kept == {"t1", "t2"}
    # a different second gets a fresh budget
    rows2 = list(rows)
    _trace(rows2, "t4", 10, 100, 4)
    kept = _kept(_tbl(rows2), [{"type": "rate_limiting", "spans_per_second": 8}])
    assert kept == {"t1", "t2", "t4"}


def test_composite_allocations(ray_session):
    # sub 0 (errors) gets 4 spans/s, sub 1 (latency) gets 4 spans/s.
    # err1+err2 claim sub 0 -> only err1 fits; slow1 claims sub 1.
    rows = []
    _trace(rows, "err1", 0, 50, 4, status=500)
    for i in range(4):
        rows.append(("err2", T0 + timedelta(seconds=0.2, milliseconds=i * 10),
                     500, ""))
    _trace(rows, "slow1", 0.5, 600, 4)
    _trace(rows, "plain", 0.7, 50, 4)
    pol = [{"type": "composite", "max_total_spans_per_second": 100,
            "sub_policies": [
                {"type": "status_code", "key": "status", "status_codes": [500],
                 "max_spans_per_second": 4},
                {"type": "latency", "threshold_ms": 100,
                 "max_spans_per_second": 4},
            ]}]
    assert _kept(_tbl(rows), pol) == {"err1", "slow1"}


def test_semi_join_fallback_parity(ray_session):
    rows = []
    _trace(rows, "slow", 0, 500, 4)
    _trace(rows, "fast", 10, 50, 4)
    _trace(rows, "err", 20, 50, 3, status=500)
    pol = [{"type": "latency", "threshold_ms": 100},
           {"type": "status_code", "key": "status", "status_codes": [500]}]
    a = _kept(_tbl(rows), pol)
    b = _kept(_tbl(rows), pol, broadcast_key_limit=0)
    assert a == b == {"slow", "err"}


def test_driver_fast_path_matches_distributed(ray_session):
    # the size-gated driver decision pipeline (decide -> cumsum ->
    # finalize on the collected per-trace features) must match the
    # distributed keyed_cumsum path row for row
    from datetime import datetime, timedelta

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    base = datetime(2024, 1, 1)
    rows = {"conv_id": [], "ts": [], "tool": []}
    for c in range(200):
        n = int(rng.integers(1, 15))
        sec = int(rng.integers(0, 20))
        for i in range(n):
            rows["conv_id"].append(f"c{c}")
            rows["ts"].append(base + timedelta(seconds=sec, milliseconds=i))
            rows["tool"].append(str(rng.choice(["search", "editor", "none"])))
    ds = ray.data.from_arrow(pa.table(rows)).repartition(6)
    pols = [
        {"type": "and", "sub_policies": [
            {"type": "string_attribute", "key": "tool", "values": ["search"]},
            {"type": "span_count", "min_spans": 8}]},
        {"type": "rate_limiting", "spans_per_second": 20},
        {"type": "composite", "max_total_spans_per_second": 25,
         "sub_policies": [
             {"type": "string_attribute", "key": "tool", "values": ["none"],
              "max_spans_per_second": 12},
             {"type": "span_count", "min_spans": 4,
              "max_spans_per_second": 12}]},
        {"type": "drop", "sub_policy": {
            "type": "string_attribute", "key": "tool", "values": ["editor"]}},
    ]
    fast = tail_sample_policies(ds, "conv_id", "ts", pols).to_pandas() \
        .sort_values(["conv_id", "ts"]).reset_index(drop=True)
    dist = tail_sample_policies(ds, "conv_id", "ts", pols,
                                driver_trace_limit=0).to_pandas() \
        .sort_values(["conv_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, dist)
    assert len(fast) > 0


def test_tail_sample_join_fallback_parity(ray_session):
    # round-4 gate: the simple tail_sample path must not collect the
    # always-keep key set on the driver when it is large. Force the
    # left-semi-join fallback with broadcast_key_limit=0 on a stream
    # where >=50% of groups match the always-keep condition, and
    # assert bit-identical kept rows vs the broadcast path.
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.expr import col
    from opentelemetry_collector_contrib_ray.stages.tailsample import (
        tail_sample,
    )

    rng = np.random.default_rng(7)
    n = 20_000
    groups = rng.integers(0, 2_000, n)
    tbl = pa.table({
        "conv_id": [f"c{g}" for g in groups],
        # ~60% of GROUPS get at least one ERROR row
        "level": ["ERROR" if (g % 5 < 3 and i % 7 == 0) else "INFO"
                  for i, g in enumerate(groups)],
        "row_id": np.arange(n),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)
    cond = ("==", col("level"), "ERROR")

    def kept_ids(limit):
        out = tail_sample(ds, "conv_id", cond, sample_percentage=10.0,
                          broadcast_key_limit=limit)
        return sorted(r["row_id"] for r in out.take_all())

    broadcast = kept_ids(2_000_000)
    joined = kept_ids(0)
    assert broadcast == joined
    # sanity: every row of every ERROR group survived
    err_groups = {f"c{g}" for i, g in enumerate(groups)
                  if (g % 5 < 3 and i % 7 == 0)}
    kept = set(broadcast)
    for i, g in enumerate(groups):
        if f"c{g}" in err_groups:
            assert i in kept


def test_trace_state_leaf_reference_vectors(ray_session):
    # verbatim port of trace_state_filter_test.go:23-80 — each case is
    # one single-span trace; the policy tree decides per trace
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.tailpolicy import (
        _leaf_mask_fn,
        tail_sample_policies,
    )

    cases = [
        ("non_matching=value", "example", ["value"], False),
        ("example=non_matching", "example", ["value"], False),
        ("example=value", "example", ["value"], True),
        ("example=value", "example", [], False),
        ("example=non_matching,non_matching=value", "example", ["value"], False),
        ("example=value,non_matching=value", "example", ["value"], True),
        ("example=non_matching", "example", ["value1", "value2"], False),
        ("example=value1", "example", ["value1", "value2"], True),
    ]
    for state, key, values, want in cases:
        f = _leaf_mask_fn({"type": "trace_state", "key": key,
                           "values": values})
        got = f(pa.table({"trace_state": [state]}))[0].as_py()
        assert got is want, (state, key, values)

    # and through the full policy tree over a multi-trace stream
    from datetime import datetime

    base = datetime(2024, 1, 1)
    tbl = pa.table({
        "trace_id": ["t1", "t1", "t2", "t3"],
        "ts": pa.array([base] * 4, pa.timestamp("us")),
        "trace_state": ["non_matching=x", "example=value1",
                        "example=nope", "other=value1"],
    })
    ds = ray.data.from_arrow(tbl)
    out = tail_sample_policies(
        ds, group_key="trace_id", ts_col="ts",
        policies=[{"type": "trace_state", "name": "ts-pol",
                   "key": "example", "values": ["value1", "value2"]}])
    kept = sorted({r["trace_id"] for r in out.take_all()})
    assert kept == ["t1"]  # any span in the trace matching keeps all
