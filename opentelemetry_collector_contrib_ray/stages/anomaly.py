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
from .enrich import _composite_key


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
    n = stats_tbl["_n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = stats_tbl["_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    s2 = stats_tbl["_sumsq"].to_numpy(zero_copy_only=False).astype(np.float64)
    means = s / n
    stds = np.sqrt(np.maximum(s2 / n - means * means, 0.0))
    # broadcast (composite key array, mean, std) — the score pass joins
    # with index_in/take, no Python per row (round-1 VERDICT #7)
    ref = ray.put((_composite_key(stats_tbl, group_cols), means, stds))

    def score(b: pa.Table) -> pa.Table:
        key_arr, mean_v, std_v = ray.get(ref)
        idx = pc.index_in(_composite_key(b, group_cols), value_set=key_arr)
        idx_np = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        found = idx_np >= 0
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m_row = np.where(found, mean_v[np.clip(idx_np, 0, None)], 0.0)
        s_row = np.where(found, std_v[np.clip(idx_np, 0, None)], 0.0)
        z = np.where(s_row > 0, (v - m_row) / np.where(s_row > 0, s_row, 1.0), 0.0)
        out = b.append_column("zscore", pa.array(z, pa.float64()))
        out = out.append_column("is_anomaly", pa.array(np.abs(z) >= threshold))
        return out

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
