"""metricsgeneration 'calculate' with datapoint-attribute matching.

Reference semantics (processor/metricsgenerationprocessor/utils.go):

  * ``dataPointAttributesMatch`` (utils.go:144-154): dp1 pairs with
    dp2 unless some attribute key present on BOTH sides differs —
    keys missing from either side never block the pair.
  * the generated datapoint copies dp1 then overlays ALL of dp2's
    attributes (utils.go:118-125), so output labels =
    dp1 ∪ dp2 with dp2 winning on overlap (only equal values overlap
    after the match filter).
  * ``calculateValue`` errors (divide/percent by zero) emit NOTHING —
    the datapoint is skipped, not nulled (metric2_zero_* goldens:
    divide/percent outputs are absent while multiply emits 0).
  * without the match gate the processor pairs every metric1
    datapoint with metric2's FIRST datapoint
    (``getMetricValue`` → dp[0]; match_attributes_disabled golden).

Columnar model: a "metric" is a label-columns + value table; absent
attribute = null. Scale shape: metric2 is a grouped metric table —
bounded by label cardinality, never raw rows — so it is collected once
and broadcast (ray.put); each metric1 batch evaluates one vectorized
compatibility mask per metric2 row (the loop is over metric2's FEW
datapoints, never over metric1 rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_OPS = ("add", "subtract", "multiply", "divide", "percent")


def _calc(v1: np.ndarray, v2: float, operation: str) -> tuple[np.ndarray, bool]:
    """(values, valid): valid=False means the op errors for this pair
    (divide/percent by zero) and emits nothing."""
    if operation == "add":
        return v1 + v2, True
    if operation == "subtract":
        return v1 - v2, True
    if operation == "multiply":
        return v1 * v2, True
    if operation == "divide":
        return (v1 / v2 if v2 != 0 else v1), v2 != 0
    if operation == "percent":
        return (v1 / v2 * 100.0 if v2 != 0 else v1), v2 != 0
    raise ValueError(f"unknown operation {operation!r}; supported: {_OPS}")


def generate_matched_metric(
    metric1: ray.data.Dataset,
    metric2_table: pa.Table,
    label_cols: list[str],
    operation: str,
    *,
    value_col: str = "value",
    match_attributes: bool = True,
) -> ray.data.Dataset:
    """One output row per compatible (dp1, dp2) pair with the
    calculated value and merged labels. ``metric2_table`` is the
    already-grouped small side (broadcast once)."""
    if operation not in _OPS:
        raise ValueError(f"unknown operation {operation!r}; supported: {_OPS}")
    m2_ref = ray.put(metric2_table)

    def fn(b: pa.Table) -> pa.Table:
        m2 = ray.get(m2_ref)
        n = b.num_rows
        v1 = pc.cast(b[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        outs = []
        m2_rows = range(m2.num_rows) if match_attributes else range(min(1, m2.num_rows))
        for j in m2_rows:
            v2 = m2[value_col][j].as_py()
            if match_attributes:
                mask = np.ones(n, dtype=bool)
                for lc in label_cols:
                    a = b[lc].combine_chunks() if isinstance(b[lc], pa.ChunkedArray) else b[lc]
                    bv = m2[lc][j].as_py()
                    if bv is None:
                        continue  # key absent on dp2 never blocks
                    # block only when dp1 HAS the key and differs
                    ok = pc.or_(pc.is_null(a), pc.equal(a, bv))
                    mask &= pc.fill_null(ok, True).to_numpy(zero_copy_only=False)
            else:
                mask = np.ones(n, dtype=bool)
            if not mask.any():
                continue
            vals, valid = _calc(v1[mask], float(v2 or 0.0), operation)
            if not valid:
                continue  # calculateValue error path: emit nothing
            sel = pa.array(mask)
            cols = {}
            for lc in label_cols:
                a = b[lc].combine_chunks() if isinstance(b[lc], pa.ChunkedArray) else b[lc]
                a = a.filter(sel)
                bv = m2[lc][j].as_py()
                if match_attributes and bv is not None:
                    # overlay dp2's attributes (utils.go:118-125)
                    a = pa.array([bv] * len(a), type=a.type)
                cols[lc] = a
            cols[value_col] = pa.array(vals, pa.float64())
            outs.append(pa.table(cols))
        if not outs:
            schema = {lc: b.schema.field(lc).type for lc in label_cols}
            return pa.table({**{k: pa.array([], t) for k, t in schema.items()},
                             value_col: pa.array([], pa.float64())})
        return pa.concat_tables(outs, promote_options="none")

    return metric1.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
