"""slowsql + metricsaslogs connectors — signal-to-log conversions.

Reference:
  * connector/slowsqlconnector/connector_logs.go:34-116 — CLIENT
    spans carrying a ``db.system`` in the configured list whose
    duration meets the threshold become SLOW/Error log records with
    the span attributes plus span name/kind/status/service.name,
    ``db.statement`` and ``statement.exec.duration`` (nanoseconds);
    spans from resources without a service.name are skipped.
  * connector/metricsaslogsconnector/connector.go:106-288 — every
    metric datapoint becomes one log record with body
    "metric converted to log" and attributes metric.name /
    metric.type / metric.value (+unit/description when set).

Both are pure per-batch column projections — no state, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..expr import resolve_col
from . import register


@register("slow_sql_logs")
def slow_sql_logs(
    ds: ray.data.Dataset,
    duration_col: str,
    threshold: float,
    db_system_col: str,
    db_statement_col: str,
    db_systems: list[str],
    service_col: str | None = None,
    span_name_col: str | None = None,
    dims: list[str] | None = None,
) -> ray.data.Dataset:
    """Traces -> slow-SQL logs. ``threshold`` is in the duration
    column's own unit (the reference compares nanoseconds)."""
    systems = pa.array(db_systems, pa.string())

    def fn(b: pa.Table) -> pa.Table:
        dur = pc.cast(resolve_col(b, duration_col), pa.float64(), safe=False)
        m = pc.and_(pc.fill_null(pc.greater_equal(dur, threshold), False),
                    pc.fill_null(pc.is_in(resolve_col(b, db_system_col),
                                          value_set=systems), False))
        if service_col is not None:  # resource without service.name: skip
            m = pc.and_(m, pc.is_valid(resolve_col(b, service_col)))
        f = b.filter(m)
        n = f.num_rows
        cols: dict = {}
        for d in (dims or []):
            cols[d] = resolve_col(f, d)
        if span_name_col is not None:
            cols["span.name"] = resolve_col(f, span_name_col)
        if service_col is not None:
            cols["service.name"] = resolve_col(f, service_col)
        cols["db.system"] = resolve_col(f, db_system_col)
        cols["db.statement"] = resolve_col(f, db_statement_col)
        cols["statement.exec.duration"] = pc.cast(
            pc.cast(resolve_col(f, duration_col), pa.float64(), safe=False),
            pa.int64(), safe=False)
        cols["severity_text"] = pa.array(["SLOW"] * n, pa.string())
        cols["severity_number"] = pa.array([17] * n, pa.int64())  # Error
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


@register("metrics_as_logs")
def metrics_as_logs(
    ds: ray.data.Dataset,
    name_col: str,
    value_col: str,
    metric_type: str = "gauge",
    unit: str = "",
    description: str = "",
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Metric datapoints -> one log record each."""

    def fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: resolve_col(b, c) for c in (keep_cols or [])}
        cols["body"] = pa.array(["metric converted to log"] * n, pa.string())
        cols["metric.name"] = pc.cast(resolve_col(b, name_col), pa.string())
        cols["metric.type"] = pa.array([metric_type] * n, pa.string())
        cols["metric.value"] = pc.cast(resolve_col(b, value_col),
                                       pa.float64(), safe=False)
        if unit:
            cols["metric.unit"] = pa.array([unit] * n, pa.string())
        if description:
            cols["metric.description"] = pa.array([description] * n,
                                                  pa.string())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)
