"""Flagship pipeline: parse -> enrich -> route -> aggregate.

The end-to-end slice of SURVEY.md §3.2/§3.3: composite transcript
parse (stanza parser semantics), broadcast lookup enrichment
(lookupprocessor), first-match-wins routing fan-out
(routingconnector) written as ONE partitioned-parquet pass, then
count/sum connector aggregates over the routed output. Each stage
commits a manifest entry (lineage + metrics) so a rerun resumes —
``run_flagship`` twice on the same out_root does no work the second
time.

Route table and metric definitions are the conformance fixtures
(FIXTURES.md F3/F4) shared by __ray_entry__ queries, the pytest
oracle and bench.py.
"""

from __future__ import annotations

import os

import ray.data

from ..expr import col
from ..sources.lookup import DEFAULTS, build_lookup_table
from ..sources.readers import read_transcripts
from ..stages.aggregate import MetricDef, add_hour_column, run_metric_def
from ..stages.enrich import LookupEnrich
from ..stages.parse import TranscriptParser
from ..stages.route import Router
from ..state.manifest import Manifest, StageTimer

# F3 routing table (condition on parsed columns; null -> no-match)
ROUTE_CONFIGS = [
    {"condition": ("or", ("==", col("severity_text"), "ERROR"), (">=", col("status"), 500)),
     "sink": "errors", "action": "move"},
    {"condition": ("and", ("==", col("role"), "tool"), ("!=", col("tool"), "")),
     "sink": "tools", "action": "copy"},
    {"condition": (">", col("dur"), 100.0), "sink": "slow", "action": "move"},
]

# F4 metric definitions
METRIC_DEFS = [
    MetricDef(name="turn_count", agg="count",
              dims=[("role", None), ("tool", "-"), ("hour", None)]),
    MetricDef(name="error_count", agg="count",
              conditions=[("==", col("severity_text"), "ERROR")],
              dims=[("role", None), ("hour", None)]),
    MetricDef(name="dur_sum", agg="sum", source="dur",
              dims=[("role", None), ("tool", "-"), ("hour", None)]),
]


def build_parsed(sf_dir_or_sf, on_error: str = "send") -> ray.data.Dataset:
    ds = read_transcripts(sf_dir_or_sf)
    return TranscriptParser(on_error=on_error).apply(ds)


def build_enriched(sf_dir_or_sf, on_error: str = "send") -> ray.data.Dataset:
    ds = build_parsed(sf_dir_or_sf, on_error=on_error)
    enrich = LookupEnrich(
        build_lookup_table(),
        key_cols=["role", "tool"],
        fields=dict(DEFAULTS),
    )
    return enrich.apply(ds)


def build_routed(sf_dir_or_sf, on_error: str = "send") -> ray.data.Dataset:
    """Full stream with `sink` column (+ duplicated copy-route rows)."""
    ds = build_enriched(sf_dir_or_sf, on_error=on_error)
    return Router(ROUTE_CONFIGS).apply(ds)


def run_flagship(sf_dir_or_sf, out_root: str) -> dict:
    """Resumable end-to-end run; returns manifest entries."""
    man = Manifest(out_root)
    routed_path = os.path.join(out_root, "routed")

    if not man.is_done("routed"):
        t = StageTimer()
        routed = build_routed(sf_dir_or_sf)
        routed.write_parquet(routed_path, partition_cols=["sink"])
        man.commit("routed", inputs=[str(sf_dir_or_sf)], output=routed_path,
                   metrics=t.done())

    # Copy-route rows are duplicates; the metric stream is the set of
    # original rows = every row whose sink is a move/default sink.
    # Reading only those sink=<name>/ directories prunes the copy rows
    # at the scan (partition-level pruning, no filter stage).
    copy_sinks = {r["sink"] for r in ROUTE_CONFIGS if r["action"] == "copy"}
    import glob as _glob

    original_dirs = [
        f
        for d in os.listdir(routed_path)
        if d.startswith("sink=") and d.split("=", 1)[1] not in copy_sinks
        for f in sorted(_glob.glob(os.path.join(routed_path, d, "*.parquet")))
    ]

    for d in METRIC_DEFS:
        key = f"metrics:{d.name}"
        if man.is_done(key):
            continue
        t = StageTimer()
        cols = ["role", "tool", "ts"] + ([d.source] if d.source else []) + (
            ["severity_text"] if d.conditions else [])
        ds = ray.data.read_parquet(original_dirs, columns=sorted(set(cols)))
        ds = add_hour_column(ds, "ts", "hour")
        out = run_metric_def(ds, d)
        out_path = os.path.join(out_root, "metrics", d.name)
        out.write_parquet(out_path)
        man.commit(key, inputs=[routed_path], output=out_path, metrics=t.done())

    return man.entries()
