"""Anomaly scoring — the isolationforestprocessor family, columnar.

Reference shape (processor/isolationforestprocessor: score each
telemetry record against a trained model, attach score + flag). The
columnar equivalent for a finite table: fit per-group statistics in
one cheap pass (grouped count/sum/sum-of-squares -> mean/std,
broadcast), then score the stream in a second vectorized pass
(z = (x - mean)/std, flag |z| >= threshold). The model is a
broadcast-sized dict, the stream never shuffles — the same two-pass
broadcast pattern as tail sampling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .aggregate import grouped_count_sum


def zscore_anomalies(
    ds: ray.data.Dataset,
    value_col: str,
    group_cols: list[str],
    threshold: float = 3.0,
) -> ray.data.Dataset:
    """Adds ``zscore`` and ``is_anomaly`` columns per row, with mean/std
    fit per group (group cardinality must be broadcast-sized)."""

    def with_squares(b: pa.Table) -> pa.Table:
        v = b[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return b.append_column("_v2", pc.multiply(v, v))

    stats = grouped_count_sum(
        ds.map_batches(with_squares, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        group_cols,
        {value_col: "_sum", "_v2": "_sumsq"},
        count_name="_n",
    )
    stats_tbl = pa.concat_tables(
        [ray.get(r) for r in stats.materialize().to_arrow_refs()], promote_options="none"
    )
    key_to_stats: dict[tuple, tuple[float, float]] = {}
    for row in stats_tbl.to_pylist():
        n, s, s2 = row["_n"], row["_sum"], row["_sumsq"]
        mean = s / n
        var = max(s2 / n - mean * mean, 0.0)
        key_to_stats[tuple(row[c] for c in group_cols)] = (mean, float(np.sqrt(var)))
    ref = ray.put(key_to_stats)

    def score(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = list(zip(*[b[c].to_pylist() for c in group_cols]))
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        means = np.array([m.get(k, (0.0, 0.0))[0] for k in keys])
        stds = np.array([m.get(k, (0.0, 0.0))[1] for k in keys])
        z = np.where(stds > 0, (v - means) / np.where(stds > 0, stds, 1.0), 0.0)
        out = b.append_column("zscore", pa.array(z, pa.float64()))
        out = out.append_column("is_anomaly", pa.array(np.abs(z) >= threshold))
        return out

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
