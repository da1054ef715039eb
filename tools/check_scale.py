"""Correctness at bench scale: run small-output headline queries at a
LARGE sf (default sf1 = 50M turns) and compare against DuckDB running
the same oracle SQL over the same parquet — the sf0.01 driver gate's
protocol, at 1000x the driver's row count.

Only queries with bounded outputs are eligible (the compare
materializes results); the default set covers the north rule's core:
routed per-sink counts, the (role, tool, hour) aggregate, and the
skew-salted per-conversation stats.

Usage: python tools/check_scale.py [sf] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

# transcript-table queries only: the big sf cache has no TPC-H side
# tables (events/orders/...), and outputs must be bounded
DEFAULT_QUERIES = ["route_sink_counts", "agg_turn_count", "conv_stats",
                   "dur_histogram"]
# big-output queries: compare ROW COUNTS only (materializing 10M+ rows
# into the driver for a value compare is exactly what the engine is
# designed to avoid)
COUNT_ONLY = ["tail_sample", "sample_10pct", "recombine_conv",
              "parse_drop", "span_prune", "service_graph",
              "collector_yaml2"]
# join/shuffle-heavy stages whose driver queries read the EVENTS table
# (absent at big sf): re-expressed over the transcript table here,
# same stage code paths, tiny aggregated outputs fully compared
CUSTOM = {}


def _custom(name):
    def deco(fn):
        CUSTOM[name] = fn
        return fn
    return deco


@_custom("asof_scale")
def _asof_scale(big_dir: str, big_glob: str):
    """stages/asof.asof_join (single global sort + segmented fill) at
    50M rows: every turn joined to its conv's latest tool turn at or
    before it; oracle = DuckDB ASOF JOIN. Compared on the matched-row
    count + matched-turn checksum (tiny aggregate)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.asof import asof_join

    base = ray.data.read_parquet(big_dir, columns=["conv_id", "turn_idx", "role"])

    def tool_turns(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["role"], "tool"))
        return pa.table({"conv_id": f["conv_id"], "turn_idx": f["turn_idx"],
                         "last_tool_turn": f["turn_idx"]})

    right = base.map_batches(tool_turns, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    left = base.select_columns(["conv_id", "turn_idx"])
    out = asof_join(left, right, key_col="conv_id", ts_col="turn_idx",
                    right_cols=["last_tool_turn"])

    def partial(b: pa.Table) -> pa.Table:
        m = b["last_tool_turn"]
        return pa.table({
            "n_matched": pa.array([b.num_rows - m.null_count], pa.int64()),
            "turn_sum": pa.array([pc.sum(m).as_py() or 0], pa.int64()),
        })

    parts = out.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None).take_all()
    import pandas as pd

    ray_df = pd.DataFrame([{
        "n_matched": sum(r["n_matched"] for r in parts),
        "turn_sum": sum(r["turn_sum"] for r in parts)}])
    sql = f"""
SELECT CAST(count(r.turn_idx) AS BIGINT) AS n_matched,
       CAST(COALESCE(sum(r.last_tool_turn), 0) AS BIGINT) AS turn_sum
FROM read_parquet('{big_glob}') l
ASOF LEFT JOIN (
  SELECT conv_id, turn_idx, turn_idx AS last_tool_turn
  FROM read_parquet('{big_glob}') WHERE role = 'tool') r
ON l.conv_id = r.conv_id AND l.turn_idx >= r.turn_idx"""
    return ray_df, sql


@_custom("agg_labels_scale")
def _agg_labels_scale(big_dir: str, big_glob: str):
    """metricstransform aggregate_label_values + aggregate_labels
    (partial groupby + tree merge) at 50M rows over the transcript
    table; full value compare (output is a handful of rows)."""
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.aggregate import (
        aggregate_label_values,
    )
    from tools.check_correctness import to_pandas

    ds = ray.data.read_parquet(big_dir, columns=["tool", "turn_idx"])
    out = aggregate_label_values(
        ds, "tool", ["bash", "python"], "code", ["tool"], "turn_idx",
        aggregation_type="sum", out_col="turn_sum")
    ray_df = to_pandas(out)
    sql = f"""
SELECT CASE WHEN tool IN ('bash', 'python') THEN 'code' ELSE tool END AS tool,
       CAST(sum(turn_idx) AS BIGINT) AS turn_sum
FROM read_parquet('{big_glob}') GROUP BY 1"""
    return ray_df, sql


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts,
    )
    from tools.check_correctness import compare, to_pandas

    big_dir = ensure_transcripts(sf)
    small_glob = ensure_transcripts("/root/testdata/sf0.01") + "/*.parquet"
    big_glob = big_dir + "/*.parquet"

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    results = {}
    ok_all = True
    for name in names:
        if name in CUSTOM:
            t0 = time.perf_counter()
            ray_df, sql = CUSTOM[name](big_dir, big_glob)
            ray_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            sql_df = con.execute(sql).df()
            sql_s = time.perf_counter() - t0
            verdict = compare(name, ray_df, sql_df)
            ok_all &= verdict.startswith("OK")
            results[name] = {"verdict": verdict, "rows": len(ray_df),
                             "ray_sec": round(ray_s, 2),
                             "duckdb_sec": round(sql_s, 2)}
            print(f"{name:24s} {verdict}  ({len(ray_df)} rows, "
                  f"ray {ray_s:.2f}s vs duckdb {sql_s:.2f}s)", flush=True)
            continue
        sql = oracles[name].replace(small_glob, big_glob)
        assert big_glob in sql, f"oracle for {name} does not read the transcripts"
        count_only = name in COUNT_ONLY
        t0 = time.perf_counter()
        res = qs[name](big_dir)
        if count_only:
            ray_n = res.count() if hasattr(res, "count") else len(res)
        else:
            ray_df = to_pandas(res)
            ray_n = len(ray_df)
        ray_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        if count_only:
            sql_n = con.execute(
                f"SELECT count(*) FROM ({sql})").fetchone()[0]
            verdict = "OK(count)" if ray_n == sql_n                 else f"ROWCOUNT mismatch: ray={ray_n} sql={sql_n}"
        else:
            sql_df = con.execute(sql).df()
            verdict = compare(name, ray_df, sql_df)
        sql_s = time.perf_counter() - t0
        ok_all &= verdict.startswith("OK")
        results[name] = {"verdict": verdict, "rows": int(ray_n),
                         "ray_sec": round(ray_s, 2),
                         "duckdb_sec": round(sql_s, 2)}
        print(f"{name:24s} {verdict}  ({ray_n} rows, "
              f"ray {ray_s:.2f}s vs duckdb {sql_s:.2f}s)", flush=True)
    print(json.dumps({"sf": sf, "results": results}))
    ray.shutdown()
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
