"""As-of join vs a row-at-a-time oracle, across block boundaries."""

from datetime import datetime, timedelta

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.asof import asof_join

T0 = datetime(2024, 1, 1)


def _mk(n_keys=5, n_left=40, n_right=7):
    left, right = [], []
    for k in range(n_keys):
        for i in range(n_left):
            left.append((k, T0 + timedelta(minutes=3 * i + k)))
        for j in range(n_right):
            # right rows at staggered times; key 0 gets none
            if k > 0:
                right.append((k, T0 + timedelta(minutes=17 * j), float(k * 100 + j)))
    lt = pa.table({"k": pa.array([r[0] for r in left], pa.int64()),
                   "ts": pa.array([r[1] for r in left], pa.timestamp("us")),
                   "lid": pa.array(range(len(left)), pa.int64())})
    rt = pa.table({"k": pa.array([r[0] for r in right], pa.int64()),
                   "ts": pa.array([r[1] for r in right], pa.timestamp("us")),
                   "rv": pa.array([r[2] for r in right], pa.float64())})
    return lt, rt


def oracle(lt, rt, tolerance_us=None):
    rights = sorted(rt.to_pylist(), key=lambda r: (r["k"], r["ts"]))
    out = {}
    for l in lt.to_pylist():
        best = None
        for r in rights:
            if r["k"] == l["k"] and r["ts"] <= l["ts"]:
                if best is None or r["ts"] >= best["ts"]:
                    best = r
        if best is not None and tolerance_us is not None:
            if (l["ts"] - best["ts"]).total_seconds() * 1e6 > tolerance_us:
                best = None
        out[l["lid"]] = best["rv"] if best else None
    return out


def _run(lt, rt, blocks=6, **kw):
    lds = ray.data.from_arrow(lt).repartition(blocks)
    rds = ray.data.from_arrow(rt).repartition(3)
    out = asof_join(lds, rds, key_col="k", ts_col="ts",
                    right_cols=["rv"], **kw).to_pandas()
    return dict(zip(out.lid, out.rv))


def test_asof_backward_inclusive(ray_session):
    lt, rt = _mk()
    got = _run(lt, rt)
    exp = oracle(lt, rt)
    assert len(got) == lt.num_rows
    for lid, want in exp.items():
        g = got[lid]
        assert (g is None or g != g) if want is None else g == want, lid


def test_asof_tolerance(ray_session):
    lt, rt = _mk()
    tol = 20 * 60 * 1_000_000  # 20 minutes
    got = _run(lt, rt, tolerance_us=tol)
    exp = oracle(lt, rt, tolerance_us=tol)
    for lid, want in exp.items():
        g = got[lid]
        assert (g is None or g != g) if want is None else g == want, lid


def test_asof_timestamp_payload_roundtrip(ray_session):
    lt, rt = _mk(n_keys=3)
    rt = rt.append_column("rts", rt["ts"])
    lds = ray.data.from_arrow(lt).repartition(4)
    rds = ray.data.from_arrow(rt)
    out = asof_join(lds, rds, key_col="k", ts_col="ts",
                    right_cols=["rv", "rts"]).to_pandas()
    hit = out[out.rv.notna()]
    assert len(hit) > 0
    # the carried timestamp must equal the matched right row's ts
    rmap = {(r["k"], r["rv"]): r["ts"] for r in rt.to_pylist()}
    for r in hit.itertuples():
        assert rmap[(r.k, r.rv)] == r.rts.to_pydatetime()


def test_assemble_carry_raises_on_duplicate_block_token():
    # two distinct blocks whose first rows share the (key, ts, side)
    # token (a run of identical rows spanning a block boundary) must
    # fail loud — the carry chain between them is ambiguous.
    from opentelemetry_collector_contrib_ray.stages.asof import _assemble_carry
    import pytest

    def summary(pos, key, has_right=True, right_ts=5, vals='{"rv": 1.0}'):
        return {"nat_key": key, "tok_key": key, "tok_ts": 5, "tok_side": 0,
                "key": key, "pos": pos, "has_right": has_right,
                "right_ts": right_ts, "right_vals": vals}

    rows = [summary(0, "a"), summary(0, "a")]  # two pos=0 rows, same token
    with pytest.raises(ValueError, match="ambiguous"):
        _assemble_carry(rows)


def test_assemble_carry_chains_state_across_blocks():
    from opentelemetry_collector_contrib_ray.stages.asof import _assemble_carry

    # block 1 starts at key a, sees a right row; block 2 continues key a
    b1 = {"nat_key": "a", "tok_key": "a", "tok_ts": 1, "tok_side": 0,
          "key": "a", "pos": 0, "has_right": True, "right_ts": 1,
          "right_vals": '{"rv": 7.0}'}
    b2 = {"nat_key": "a", "tok_key": "a", "tok_ts": 2, "tok_side": 1,
          "key": "a", "pos": 0, "has_right": False, "right_ts": 0,
          "right_vals": ""}
    carry = _assemble_carry([b1, b2])
    assert carry[(("a", 2, 1), "a")] == (1, {"rv": 7.0})
