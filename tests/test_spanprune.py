"""Span pruning conformance: groups >= min_group_size collapse to one
summary row with count/duration stats; smaller groups pass through."""

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.spanprune import prune_spans


def _tbl():
    rows = []
    # trace A: 4x (db, 200) -> collapses at min 3; 2x (http, 200) -> passes
    for i in range(4):
        rows.append(("A", "db", 200, i, 1.0 + i))
    rows.append(("A", "http", 200, 10, 5.0))
    rows.append(("A", "http", 200, 11, 6.0))
    # trace B: same (db, 200) key but only 2 rows -> passes (per-trace!)
    rows.append(("B", "db", 200, 0, 9.0))
    rows.append(("B", "db", 200, 1, 10.0))
    t, g, s, o, d = zip(*rows)
    return pa.table({"trace": pa.array(list(t)), "op": pa.array(list(g)),
                     "status": pa.array(list(s), pa.int64()),
                     "idx": pa.array(list(o), pa.int64()),
                     "dur": pa.array(list(d), pa.float64())})


def test_prune_collapses_and_passes(ray_session):
    ds = ray.data.from_arrow(_tbl()).repartition(3)  # groups span blocks
    out = prune_spans(ds, "trace", ["op", "status"], duration_col="dur",
                      order_col="idx", min_group_size=3).to_pandas()
    summ = out[out.is_summary]
    assert len(summ) == 1
    r = summ.iloc[0]
    assert (r.trace, r.op, r.status) == ("A", "db", 200)
    assert r.span_count == 4 and r.idx == 0
    assert r.duration_min == 1.0 and r.duration_max == 4.0
    assert r.duration_total == 10.0 and r.dur == 10.0
    rest = out[~out.is_summary]
    assert len(rest) == 4  # 2x http A + 2x db B
    assert (rest.span_count == 1).all()
    assert set(map(tuple, rest[["trace", "op"]].values)) == {
        ("A", "http"), ("B", "db")}


def test_prune_nothing_to_collapse(ray_session):
    t = pa.table({"trace": ["A", "B"], "op": ["x", "x"],
                  "status": pa.array([1, 1], pa.int64()),
                  "idx": pa.array([0, 0], pa.int64()),
                  "dur": pa.array([1.0, 2.0])})
    out = prune_spans(ray.data.from_arrow(t), "trace", ["op", "status"],
                      duration_col="dur", order_col="idx",
                      min_group_size=2).to_pandas()
    assert len(out) == 2 and not out.is_summary.any()


def test_prune_antijoin_parity(ray_session):
    # broadcast_key_limit=0 forces the anti-join fallback; the result
    # must match the broadcast path exactly, on a duplicate-heavy input
    # where >=50% of groups collapse.
    import numpy as np

    rng = np.random.default_rng(3)
    n_traces, per = 80, 6
    rows = []
    for t in range(n_traces):
        if t % 2 == 0:  # half the traces are duplicate-heavy
            for i in range(per):
                rows.append((f"T{t}", "db", 200, i, float(i)))
        else:
            rows.append((f"T{t}", "db", 200, 0, 1.0))
            rows.append((f"T{t}", "http", 500, 1, 2.0))
    tr, op, st, ix, du = zip(*rows)
    tbl = pa.table({"trace": list(tr), "op": list(op),
                    "status": pa.array(st, pa.int64()),
                    "idx": pa.array(ix, pa.int64()),
                    "dur": pa.array(du, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(5)
    kw = dict(duration_col="dur", order_col="idx", min_group_size=3)
    sort_cols = ["trace", "op", "status", "idx", "is_summary"]
    a = prune_spans(ds, "trace", ["op", "status"], **kw) \
        .to_pandas().sort_values(sort_cols).reset_index(drop=True)
    b = prune_spans(ds, "trace", ["op", "status"], broadcast_key_limit=0,
                    **kw).to_pandas().sort_values(sort_cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a[sort_cols + ["span_count", "duration_total"]]
            .equals(b[sort_cols + ["span_count", "duration_total"]]))
    # half the (trace, group) groups collapsed
    assert a.is_summary.sum() == n_traces // 2
