"""Mergeable sketches (frequent items, bottom-k) and distributed
connected components."""

import collections
import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.dedup import connected_components
from opentelemetry_collector_contrib_ray.stages.graph import label_propagation_components
from opentelemetry_collector_contrib_ray.stages.sketch import (
    bottom_k_distinct,
    frequent_items,
    kmv_distinct_estimate,
)


def _zipf_ds(n=20000, blocks=6, seed=7):
    rng = np.random.default_rng(seed)
    keys = (rng.zipf(1.3, n) % 500).astype(str)
    return keys, ray.data.from_arrow(pa.table({"k": keys})).repartition(blocks)


def test_frequent_items_exact_regime_matches_counter():
    keys, ds = _zipf_ds()
    out = frequent_items(ds, ["k"], capacity=4096).to_pandas()
    true = collections.Counter(keys)
    assert int(out["err_bound"].iloc[0]) == 0
    assert len(out) == len(true)
    got = dict(zip(out["k"], out["n"]))
    assert all(got[k] == v for k, v in true.items())
    # sorted by count desc then key asc
    assert list(out["n"]) == sorted(out["n"], reverse=True)


def test_frequent_items_mg_guarantee_under_truncation():
    keys, ds = _zipf_ds()
    out = frequent_items(ds, ["k"], capacity=32, top_k=20).to_pandas()
    true = collections.Counter(keys)
    err = int(out["err_bound"].iloc[0])
    assert 0 < err  # truncation definitely fired at capacity 32
    for _, r in out.iterrows():
        t = true[r["k"]]
        assert r["n"] <= t <= r["n"] + err, (r["k"], r["n"], t, err)
    # every heavy key (true count > err bound) must be present in the
    # full (untruncated-output) sketch
    full = frequent_items(ds, ["k"], capacity=32).to_pandas()
    present = set(full["k"])
    for k, t in true.items():
        if t > err:
            assert k in present, (k, t, err)


def test_frequent_items_partitioning_invariance():
    keys, ds1 = _zipf_ds(blocks=1)
    _, ds9 = _zipf_ds(blocks=9)
    a = frequent_items(ds1, ["k"], capacity=4096).to_pandas()
    b = frequent_items(ds9, ["k"], capacity=4096).to_pandas()
    # exact regime: identical regardless of block layout
    assert a.equals(b)


def test_bottom_k_matches_hashlib_and_is_merge_invariant():
    texts = [f"doc-{i}" for i in range(1000)] * 3  # duplicates collapse
    ref = sorted(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little"), t)
        for t in set(texts)
    )[:50]
    for blocks in (1, 7):
        ds = ray.data.from_arrow(pa.table({"t": texts})).repartition(blocks)
        out = bottom_k_distinct(ds, "t", k=50).to_pandas()
        assert list(out["t"]) == [t for _, t in ref]
        assert list(out["rank"]) == list(range(50))


def test_stratified_bottom_k_per_group_and_merge_invariant():
    from opentelemetry_collector_contrib_ray.stages.sketch import stratified_bottom_k

    groups = ["g%d" % (i % 3) for i in range(600)]
    keys = [f"k{i}" for i in range(600)]
    ref: dict[str, list] = {}
    for g, t in zip(groups, keys):
        ref.setdefault(g, []).append(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little"), t)
        )
    expect = {g: [t for _, t in sorted(v)[:5]] for g, v in ref.items()}
    for blocks in (1, 6):
        ds = ray.data.from_arrow(pa.table({"g": groups, "t": keys})).repartition(blocks)
        out = stratified_bottom_k(ds, ["g"], "t", k=5).to_pandas()
        got = {g: list(sub.sort_values("rank")["t"]) for g, sub in out.groupby("g")}
        assert got == expect
        assert (out.groupby("g")["rank"].apply(lambda s: sorted(s) == [0, 1, 2, 3, 4])).all()


def test_top_k_per_group_matches_pandas_and_is_merge_invariant():
    import pandas as pd

    from opentelemetry_collector_contrib_ray.stages.sketch import top_k_per_group

    rng = [(f"g{i % 4}", i, float((i * 37) % 100)) for i in range(400)]
    rng[10] = ("g0", 10, None)  # null order value dropped
    rng[11] = (None, 11, 5.0)  # null group dropped
    df = pd.DataFrame(rng, columns=["g", "id", "v"])
    clean = df.dropna(subset=["g", "v"])
    expect = {
        g: list(sub.sort_values(["v", "id"], ascending=[False, True]).head(5)["id"])
        for g, sub in clean.groupby("g")
    }
    for blocks in (1, 7):
        ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
        out = top_k_per_group(ds, ["g"], "v", k=5, tiebreak_col="id").to_pandas()
        got = {g: list(sub.sort_values("rank")["id"]) for g, sub in out.groupby("g")}
        assert got == expect
        assert set(out.columns) == {"g", "id", "v", "rank"}


def test_kmv_estimate_accuracy():
    n = 20000
    ds = ray.data.from_arrow(pa.table({"t": [f"u{i}" for i in range(n)]})).repartition(8)
    sample = bottom_k_distinct(ds, "t", k=512)
    est = kmv_distinct_estimate(pa.Table.from_pandas(sample.to_pandas()), 512)
    assert abs(est - n) / n < 0.15, est
    # under k distinct -> exact
    small = bottom_k_distinct(
        ray.data.from_arrow(pa.table({"t": [f"v{i}" for i in range(100)]})), "t", k=512
    )
    assert kmv_distinct_estimate(pa.Table.from_pandas(small.to_pandas()), 512) == 100.0


def test_sketches_skip_null_keys():
    t = pa.table({"k": ["a", None, "a", "b", None]})
    ds = ray.data.from_arrow(t)
    out = frequent_items(ds, ["k"], capacity=8).to_pandas()
    assert dict(zip(out["k"], out["n"])) == {"a": 2, "b": 1}
    bk = bottom_k_distinct(ds, "k", k=10).to_pandas()
    assert set(bk["k"]) == {"a", "b"}


def test_label_propagation_chain_multi_hop():
    # chains of 10 consecutive ids: genuine multi-hop, needs jumping
    src = np.array([i for i in range(499) if i % 10 != 9], dtype=np.int64)
    e = pa.table({"src": src, "dst": src + 1})
    cc = label_propagation_components(ray.data.from_arrow(e).repartition(4)).to_pandas()
    assert len(cc) == 500
    assert (cc["component"] == (cc["node"] // 10) * 10).all()


def test_label_propagation_matches_union_find_on_random_graph():
    rng = np.random.default_rng(11)
    pairs = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 200, 150), rng.integers(0, 200, 150))
        if a != b
    ]
    uf = connected_components(pairs)
    e = pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.int64()),
            "dst": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    cc = label_propagation_components(ray.data.from_arrow(e).repartition(3)).to_pandas()
    got = dict(zip(cc["node"], cc["component"]))
    assert got == dict(uf)


def test_label_propagation_driver_gate_parity():
    # the size-gated driver scatter-min path must equal the distributed
    # hash-join loop (forced via driver_edge_limit=0) on random graphs,
    # including string node ids
    import numpy as np

    rng = np.random.default_rng(11)
    n_edges = 400
    a = rng.integers(0, 150, n_edges)
    b = rng.integers(0, 150, n_edges)
    for typed in (lambda x: x.astype(np.int64),
                  lambda x: np.array([f"n{v}" for v in x])):
        e = pa.table({"src": typed(a), "dst": typed(b)})
        ds = ray.data.from_arrow(e).repartition(4)
        fast = label_propagation_components(ds).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        dist = label_propagation_components(ds, driver_edge_limit=0) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        assert fast.equals(dist), typed


def test_exact_quantiles_duckdb_parity():
    import duckdb
    import numpy as np

    from opentelemetry_collector_contrib_ray.stages.sketch import exact_quantiles

    rng = np.random.default_rng(2)
    vals = list(rng.normal(0, 5, 20_000))
    for i in range(0, len(vals), 61):
        vals[i] = None  # nulls excluded from n, like SQL aggregates
    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(5)
    qs = [0.0, 0.05, 0.5, 0.95, 1.0]
    got = exact_quantiles(ds, "v", qs)
    con = duckdb.connect()
    for q, v in zip(got["q"].to_pylist(), got["value"].to_pylist()):
        ref = con.sql(f"SELECT quantile_disc(v, {q}) FROM tbl").fetchone()[0]
        assert v == ref, (q, v, ref)
    # empty input -> null values
    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert exact_quantiles(empty, "v", [0.5])["value"].to_pylist() == [None]


def test_grouped_quantiles_duckdb_parity():
    import duckdb
    import numpy as np
    import pandas as pd

    from opentelemetry_collector_contrib_ray.stages.sketch import grouped_quantiles

    rng = np.random.default_rng(4)
    n = 20_000
    g = rng.choice(["a", "b", "c"], n)
    v = list(rng.normal(0, 3, n))
    for i in range(0, n, 53):
        v[i] = None
    tbl = pa.table({"g": g, "v": pa.array(v, pa.float64())})
    got = grouped_quantiles(ray.data.from_arrow(tbl).repartition(6),
                            "g", "v", [0.1, 0.5, 0.9]).to_pandas() \
        .sort_values(["g", "q"]).reset_index(drop=True)
    con = duckdb.connect()
    ref = con.sql("""
WITH vs AS (SELECT g, quantile_disc(v, [0.1, 0.5, 0.9]) AS arr
            FROM tbl GROUP BY g),
qs AS (SELECT unnest([0.1, 0.5, 0.9]) AS q,
              generate_subscripts([0.1, 0.5, 0.9], 1) AS i)
SELECT vs.g, qs.q, vs.arr[qs.i] AS value FROM vs, qs ORDER BY g, q""").df()
    pd.testing.assert_frame_equal(got, ref)
