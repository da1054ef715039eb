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
        t0 = time.perf_counter()
        ray_df = to_pandas(qs[name](big_dir))
        ray_s = time.perf_counter() - t0
        sql = oracles[name].replace(small_glob, big_glob)
        assert big_glob in sql, f"oracle for {name} does not read the transcripts"
        t0 = time.perf_counter()
        sql_df = con.execute(sql).df()
        sql_s = time.perf_counter() - t0
        verdict = compare(name, ray_df, sql_df)
        ok_all &= verdict == "OK"
        results[name] = {"verdict": verdict, "rows": len(ray_df),
                         "ray_sec": round(ray_s, 2),
                         "duckdb_sec": round(sql_s, 2)}
        print(f"{name:24s} {verdict}  ({len(ray_df)} rows, "
              f"ray {ray_s:.2f}s vs duckdb {sql_s:.2f}s)", flush=True)
    print(json.dumps({"sf": sf, "results": results}))
    ray.shutdown()
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
