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
from ..stages.aggregate import MetricDef
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

# Columns carried into the routed sinks: the original record
# (input_hint schema), the parsed fields downstream consumers and the
# metric defs need, and the enrichment attrs. Parse-internal
# intermediates (time string, actor/tool_tag echoes, payload,
# http_severity_*) are re-derivable from text and are dropped to
# halve sink bytes.
SINK_COLUMNS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "event_ts", "severity_text", "status", "dur",
    "team", "cost_weight", "tool_kind", "sink",
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
        routed = build_routed(sf_dir_or_sf).select_columns(SINK_COLUMNS)
        routed.write_parquet(
            routed_path,
            partition_cols=["sink"],
            arrow_parquet_args_fn=lambda: {"compression": "zstd"},
        )
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

    todo = [d for d in METRIC_DEFS if not man.is_done(f"metrics:{d.name}")]
    if todo:
        t = StageTimer()
        outputs = _metrics_single_pass(original_dirs, os.path.join(out_root, "metrics"))
        metrics = t.done()
        for d in todo:
            man.commit(f"metrics:{d.name}", inputs=[routed_path],
                       output=outputs[d.name], metrics=metrics)

    return man.entries()


def _metrics_single_pass(input_files: list[str], out_dir: str) -> dict[str, str]:
    """All three F4 metric defs from ONE read of the routed output.

    The defs share the (role, tool, hour) key, so a single per-batch
    partial (count, conditional error count, dur sum — Arrow hash
    group-by) plus one small merge groupby yields every output;
    error_count's coarser (role, hour) key is a driver-side re-group
    of the ~10^3-row merged table. One stream pass instead of three.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet  # noqa: F401  (pa.parquet below)
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        tool = b["tool"].combine_chunks()
        tool = pc.if_else(pc.equal(tool, ""), pa.scalar("-", pa.string()), tool)
        hour = pc.floor_temporal(b["ts"].combine_chunks(), unit="hour")
        is_err = pc.cast(pc.equal(b["severity_text"].combine_chunks(), "ERROR"), pa.int64())
        t = pa.table({
            "role": b["role"].combine_chunks(),
            "tool": tool,
            "hour": hour,
            "is_err": is_err,
            "dur": b["dur"].combine_chunks(),
        })
        g = t.group_by(["role", "tool", "hour"]).aggregate(
            [([], "count_all"), ("is_err", "sum"), ("dur", "sum")]
        )
        return g.rename_columns(["role", "tool", "hour", "turn_count", "err_cnt", "dur_sum"])

    ds = ray.data.read_parquet(
        input_files, columns=["role", "tool", "ts", "dur", "severity_text"]
    )
    from ..stages.aggregate import tree_merge_groupby

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    merged = tree_merge_groupby(
        partials, ["role", "tool", "hour"], ["turn_count", "err_cnt", "dur_sum"]
    )
    pdf = merged.to_pandas()  # ~#roles x #tools x #hours rows — tiny

    outputs: dict[str, str] = {}

    def write(name: str, df: pd.DataFrame) -> None:
        path = os.path.join(out_dir, name)
        os.makedirs(path, exist_ok=True)
        pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False),
                               os.path.join(path, "part-00000.parquet"))
        outputs[name] = path

    write("turn_count", pdf[["role", "tool", "hour", "turn_count"]])
    err = (
        pdf.groupby(["role", "hour"], as_index=False)["err_cnt"].sum()
        .query("err_cnt > 0")
        .rename(columns={"err_cnt": "error_count"})
    )
    err["error_count"] = err["error_count"].astype("int64")
    write("error_count", err)
    dur = pdf[pdf["dur_sum"].notna()][["role", "tool", "hour", "dur_sum"]]
    write("dur_sum", dur)
    return outputs
