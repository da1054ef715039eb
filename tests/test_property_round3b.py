"""Hypothesis property tests for the round-3 session-2 kernels:
list_reduce vs a python fold, merge_maps strategy laws, the textual
Reduce folds, and exact_quantiles rank selection vs numpy."""

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.stages.transform import Statement

int_lists = st.lists(
    st.one_of(st.none(), st.integers(min_value=-10**6, max_value=10**6)),
    max_size=12)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(st.none(), int_lists), min_size=1, max_size=20),
       st.sampled_from(["sum", "product", "min", "max"]),
       st.one_of(st.none(), st.integers(min_value=-100, max_value=100)))
def test_list_reduce_matches_python_fold(rows, op, seed):
    t = pa.table({"l": pa.array(rows, pa.list_(pa.int64()))})
    out = Statement("list_reduce",
                    {"target": "o", "src": "l", "op": op, "seed": seed})(t)
    got = out["o"].to_pylist()
    fns = {"sum": lambda a, b: a + b, "product": lambda a, b: a * b,
           "min": min, "max": max}
    for row, g in zip(rows, got):
        if row is None:
            assert g is None
            continue
        vals = [v for v in row if v is not None]  # engine skips nulls
        if not vals and seed is None:
            assert g is None  # no fold result
            continue
        # int64 fold like the engine (and Go): overflow wraps
        acc = None if seed is None else np.int64(seed)
        with np.errstate(over="ignore"):
            for v in vals:
                acc = np.int64(v) if acc is None else fns[op](acc, np.int64(v))
        if acc is None:
            acc = {"sum": 0, "product": 1}.get(op)
        assert g == acc, (row, op, seed, g, acc)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=5)), min_size=1,
                max_size=15),
       st.lists(st.one_of(st.none(), st.text(max_size=5)), min_size=1,
                max_size=15))
def test_merge_maps_strategy_laws(a_vals, b_vals):
    n = min(len(a_vals), len(b_vals))
    a_vals, b_vals = a_vals[:n], b_vals[:n]
    t = pa.table({
        "x": pa.array([{"k": v, "only_x": "x"} for v in a_vals]),
        "y": pa.array([{"k": v, "only_y": "y"} for v in b_vals]),
    })
    ins = Statement("merge_maps", {"target": "x", "src": "y",
                                   "strategy": "insert"})(t)["x"].to_pylist()
    upd = Statement("merge_maps", {"target": "x", "src": "y",
                                   "strategy": "update"})(t)["x"].to_pylist()
    ups = Statement("merge_maps", {"target": "x", "src": "y",
                                   "strategy": "upsert"})(t)["x"].to_pylist()
    for av, bv, i, u, p in zip(a_vals, b_vals, ins, upd, ups):
        # insert: target wins where present, absent keys fill in
        assert i["k"] == (av if av is not None else bv)
        assert i["only_x"] == "x" and i["only_y"] == "y"
        # update: only keys present in target get overwritten;
        # source-only keys are dropped
        assert u["k"] == (bv if (av is not None and bv is not None) else av)
        assert "only_y" not in u
        # upsert: source wins where present
        assert p["k"] == (bv if bv is not None else av)
        assert p["only_y"] == "y"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=32), min_size=1, max_size=400),
       st.floats(min_value=0.0, max_value=1.0))
def test_quantile_rank_formula_vs_numpy(vals, q):
    # the DuckDB quantile_disc rank max(1, ceil(q*n)) picks the same
    # element as sorting and indexing directly
    n = len(vals)
    rank = max(1, int(math.ceil(q * n)))
    expect = sorted(vals)[rank - 1]
    # replicate through the driver selection path shape
    arr = np.sort(np.asarray(vals, np.float64))
    assert arr[rank - 1] == expect


# ------------------------------------------------------------- round 4


@given(st.floats(min_value=1.0 / (1 << 56), max_value=1.0),
       st.integers(min_value=1, max_value=14))
@settings(max_examples=200, deadline=None)
def test_otep235_threshold_properties(p, precision):
    # pkg/sampling invariants: threshold in [0, 2^56]; rendering
    # round-trips; Probability(T(p)) approximates p within the
    # precision's relative error; monotone in p
    from opentelemetry_collector_contrib_ray.stages.sample import (
        _MAX_ADJ,
        parse_tvalue,
        probability_to_threshold,
        threshold_probability,
        tvalue_of,
    )

    t = probability_to_threshold(p, precision)
    assert t is not None and 0 <= t <= _MAX_ADJ
    # t-value round-trip is exact
    assert parse_tvalue(tvalue_of(t)) == t
    # probability recovered within the encoded precision: the
    # adaptive-precision rule guarantees relative error <= 16^-precision
    # on whichever of p / 1-p is smaller-scaled
    back = threshold_probability(t)
    tol = 16.0 ** -precision
    assert abs(back - p) <= tol * max(p, 1.0 - p) + 1e-15
    # monotone: a higher probability never yields a higher threshold
    p2 = min(1.0, p * 1.5)
    t2 = probability_to_threshold(p2, precision)
    assert t2 is not None and t2 <= t


@given(st.integers(min_value=0, max_value=(1 << 56) - 1),
       st.floats(min_value=0.001, max_value=1.0))
@settings(max_examples=100, deadline=None)
def test_otep235_decision_consistency(r, p):
    # consistency: if a row passes at probability p it also passes at
    # every HIGHER probability (the basis of equalizing/proportional
    # composability)
    from opentelemetry_collector_contrib_ray.stages.sample import (
        probability_to_threshold,
    )

    t = probability_to_threshold(p, 4)
    t_hi = probability_to_threshold(min(1.0, p * 2), 4)
    if t <= r:  # sampled at p
        assert t_hi <= r  # must stay sampled at 2p


# --- flatten(attributes) vs a python port of flattenData ------------


def _go_flatten_reference(attrs: dict, prefix: str, max_depth: int,
                          resolve: bool) -> dict:
    """Direct python port of func_flatten.go's flattenData (the
    oracle for the columnar flatten_all)."""
    result: dict = {}
    counters: dict = {}

    def put(key, v):
        if resolve:
            if key in result:
                nk = f"{key}.{counters[key]}"
                counters[key] += 1
                result[nk] = v
            else:
                counters[key] = 0
                result[key] = v
        else:
            result[key] = v

    def flatten_map(m, pfx, depth):
        pfx = pfx + "." if pfx else ""
        for k, v in m.items():
            flatten_value(pfx + k, v, depth)

    def flatten_value(key, v, depth):
        if isinstance(v, dict) and depth < max_depth:
            flatten_map(v, key, depth + 1)
        elif isinstance(v, list) and depth < max_depth:
            for i, e in enumerate(v):
                if isinstance(e, dict) and depth + 1 < max_depth:
                    flatten_map(e, f"{key}.{i}", depth + 2)
                elif resolve:
                    put(key, e)
                else:
                    put(f"{key}.{i}", e)
        else:
            put(key, v)

    flatten_map(attrs, prefix, 0)
    return result


@st.composite
def _nested_attrs(draw):
    str_scalar = st.text(alphabet="abcXYZ", min_size=1, max_size=4)
    int_scalar = st.integers(min_value=-5, max_value=5)
    scalar = st.one_of(str_scalar, int_scalar)
    key = st.text(alphabet="abcde", min_size=1, max_size=3)
    # lists are HOMOGENEOUS (Arrow constraint): one scalar type or maps
    leaf_list = st.one_of(st.lists(str_scalar, min_size=1, max_size=3),
                          st.lists(int_scalar, min_size=1, max_size=3))
    inner_map = st.dictionaries(key, scalar, min_size=1, max_size=2)
    # lists of maps: STRING values only, so same-named fields across
    # elements unify to one Arrow type (the generator must only
    # produce representable inputs)
    str_map = st.dictionaries(key, str_scalar, min_size=1, max_size=2)
    map_list = st.lists(str_map, min_size=1, max_size=2)
    value = st.one_of(scalar, leaf_list, inner_map, map_list,
                      st.dictionaries(key, inner_map, min_size=1, max_size=2))
    return draw(st.dictionaries(key, value, min_size=1, max_size=4))


@given(_nested_attrs(), st.integers(min_value=1, max_value=4),
       st.booleans(), st.booleans())
@settings(max_examples=80, deadline=None)
def test_flatten_all_matches_go_reference(attrs, depth, unlimited, resolve):
    import sys

    from opentelemetry_collector_contrib_ray.stages.transform import (
        Statement,
    )

    max_depth = sys.maxsize if unlimited else depth
    want = _go_flatten_reference(attrs, "", max_depth, resolve)
    tbl = pa.table({k: pa.array([v]) for k, v in attrs.items()})
    args = {"resolve_conflicts": resolve}
    if not unlimited:
        args["depth"] = depth
    out = Statement("flatten_all", args)(tbl)

    def strip(v):
        # the documented columnar adaptation: ragged maps unify to one
        # struct type with null-absent fields — strip them to compare
        # against Go's bare maps (the generator never produces None)
        if isinstance(v, dict):
            return {k: strip(x) for k, x in v.items() if x is not None}
        if isinstance(v, list):
            return [strip(x) for x in v]
        return v

    got = {c: strip(out[c][0].as_py()) for c in out.column_names}
    # column-level face of the same adaptation: keys absent in a
    # ragged element appear as NULL columns — absent in Go's map.
    # Only drop a null that Go doesn't have; a wrongly-nulled real
    # key stays and fails the compare.
    got = {k: v for k, v in got.items() if not (v is None and k not in want)}
    assert got == want, (attrs, max_depth, resolve)
