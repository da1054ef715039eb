"""Exceptions connector conformance vs a row-at-a-time oracle.

Models connector/exceptionsconnector/connector_test.go: exception
events counted per (default dims + extra dims) key, missing-dim
handling, exemplar attachment; logs side one record per exception.
"""

import collections

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages.exceptions import (
    exception_logs,
    exception_metrics,
)

ROWS = [
    # (conv_id, turn_idx, level, actor, tool_tag, status)
    ("c1", 1, "ERROR", "agent", "search", 500),
    ("c1", 2, "INFO", "agent", "search", 200),   # not an exception
    ("c1", 3, "ERROR", None, "search", 500),     # actor -> default
    ("c1", 4, "ERROR", "", "search", 500),       # empty actor -> default
    ("c2", 1, "ERROR", "agent", None, 503),      # tool_tag missing -> skip
    ("c2", 2, "ERROR", "agent", "", 503),        # empty tool_tag -> skip
    ("c2", 3, "ERROR", "agent", "db", None),     # status missing -> skip
    ("c2", 4, "ERROR", "agent", "search", 500),
    ("c0", 9, "ERROR", "agent", "search", 500),  # exemplar min conv
]


def _table():
    names = ["conv_id", "turn_idx", "level", "actor", "tool_tag", "status"]
    cols = list(zip(*ROWS))
    return pa.table(
        {n: pa.array(list(c),
                     type=pa.int64() if n in ("turn_idx", "status") else pa.string())
         for n, c in zip(names, cols)})


def oracle_metrics():
    counts = collections.Counter()
    exemplar = {}
    for conv, idx, level, actor, tool, status in ROWS:
        if level != "ERROR":
            continue
        if not tool or status is None:
            continue  # missing dim, no default -> skip
        a = actor if actor else "unknown"
        key = (a, tool, status)
        counts[key] += 1
        ex = f"{conv}#{idx:08d}"
        exemplar[key] = min(exemplar.get(key, ex), ex)
    return counts, exemplar


def test_exception_metrics_counts_and_exemplars(ray_session):
    # 3 blocks to force cross-block exemplar/count merging
    ds = ray.data.from_arrow(_table()).repartition(3)
    out = exception_metrics(
        ds,
        condition=("==", col("level"), "ERROR"),
        dims=[("actor", "unknown"), ("tool_tag", None), ("status", None)],
        exemplars=True,
    ).to_pandas()
    counts, exemplar = oracle_metrics()
    got = {(r.actor, r.tool_tag, r.status): (r.exceptions_total, r.exemplar)
           for r in out.itertuples()}
    assert set(got) == set(counts)
    for k, n in counts.items():
        assert got[k] == (n, exemplar[k])


def test_exception_logs_one_per_event(ray_session):
    ds = ray.data.from_arrow(_table()).repartition(2)
    out = exception_logs(
        ds,
        condition=("==", col("level"), "ERROR"),
        attrs=["conv_id", "turn_idx", "status"],
        type_from_status="status",
    ).to_pandas()
    # every ERROR row survives (no dim skip on the logs side)
    assert len(out) == sum(1 for r in ROWS if r[2] == "ERROR")
    typed = out[out.status.notna()]
    assert (typed.exception_type == "HTTP_5xx").all()
    assert out[out.status.isna()].exception_type.isna().all()
