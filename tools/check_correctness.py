"""Dev harness mimicking the driver's correctness gate: run each
queries() entry and its oracle_sql() side-by-side at a given sf and
compare row-count, schema and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import ray


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # Width-normalize only; NEVER unify int<->float — the driver's
        # value hash distinguishes 5 from 5.0 (round-1 lesson: DuckDB
        # SUM(BIGINT) -> HUGEINT -> float64 vs engine int64 slipped past
        # the old np.allclose compare here and failed the driver gate).
        if pd.api.types.is_unsigned_integer_dtype(df[c]):
            df[c] = df[c].astype("UInt64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    return "obj"


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT mismatch: ray={len(a)} sql={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        ka, kb = _kind(av), _kind(bv)
        if ka != kb:
            return (f"DTYPE mismatch col={c}: ray={av.dtype} sql={bv.dtype} "
                    f"(driver exact-value hash WILL diverge)")
        if ka == "float":
            # exact, like the driver's value hash; NaN == NaN
            ok = np.array_equal(av.to_numpy(), bv.to_numpy(), equal_nan=True)
        else:
            ok = av.equals(bv) or (av.astype(str).equals(bv.astype(str)))
        if not ok:
            mism = (av.astype(str) != bv.astype(str))
            i = int(np.argmax(mism.to_numpy())) if mism.any() else 0
            return f"VALUE mismatch col={c} row={i}: ray={av.iloc[i]!r} sql={bv.iloc[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:22s} RAY ERROR: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(ray_df)} rows, cols={list(ray_df.columns)}")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"{name:22s} SQL ERROR: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:22s} {verdict}  ({len(ray_df)} rows)")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
