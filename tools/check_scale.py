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
              "parse_drop"]


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
