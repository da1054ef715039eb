"""Flagship pipeline: parse -> enrich -> route -> aggregate.

The end-to-end slice of SURVEY.md §3.2/§3.3: composite transcript
parse (stanza parser semantics), broadcast lookup enrichment
(lookupprocessor), first-match-wins routing fan-out
(routingconnector) and count/sum connector aggregates — executed as
ONE fused streaming pass: each task parses, enriches and routes its
block, writes the per-sink parquet files itself (write-audit-publish:
data files first, then a part-manifest JSON naming exactly the files
it committed, so retried/orphaned task files are identifiable), and
returns the metric PARTIALS for its rows; a parallel tree reduce
merges the partials. No second read of the routed output.

Resumability (the north rule's per-partition lineage): the input file
list is split into ``partitions``; each partition runs the fused pass
independently and commits a manifest entry (input files, routed
output, partial-metrics parquet, rows/wall metrics). A rerun skips
committed partitions and only re-merges the final metrics.

Route table and metric definitions are the conformance fixtures
(FIXTURES.md F3/F4) shared by __ray_entry__ queries, the pytest
oracle and bench.py.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..expr import col
from ..sources.lookup import DEFAULTS, build_lookup_table
from ..sources.readers import read_transcripts
from ..sources.transcripts import ensure_transcripts
from ..stages.aggregate import MetricDef, tree_merge_groupby
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

COPY_SINKS = {r["sink"] for r in ROUTE_CONFIGS if r["action"] == "copy"}

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

_METRIC_KEYS = ["role", "tool", "hour"]
_METRIC_VALS = ["turn_count", "err_cnt", "dur_sum"]


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


def _metric_partial(b: pa.Table) -> pa.Table:
    """Per-batch combined partial for all three F4 defs — they share
    the (role, tool, hour) key (error_count's coarser (role, hour)
    key is re-grouped from the merged table at finalize)."""
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
    g = t.group_by(_METRIC_KEYS).aggregate(
        [([], "count_all"), ("is_err", "sum"), ("dur", "sum")]
    )
    return g.rename_columns(_METRIC_KEYS + _METRIC_VALS)


class _WriteAndAggregate:
    """The fused terminal stage: write this block's rows to their
    sink=<name>/ hive dirs (zstd parquet + a part-manifest JSON), then
    return the metric partial over the ORIGINAL rows (copy-route
    duplicates excluded — they are fan-out copies, not stream rows)."""

    def __init__(self, routed_path: str):
        self.routed_path = routed_path

    def __call__(self, b: pa.Table) -> pa.Table:
        b = b.select(SINK_COLUMNS)
        sinks = b["sink"]
        if isinstance(sinks, pa.ChunkedArray):
            sinks = sinks.combine_chunks()
        # Deterministic per-block id: md5 of the block's FULL
        # (conv_id, turn_idx) key-column content. Task retries and
        # lineage re-executions reproduce identical content -> the same
        # id -> they overwrite the SAME files (idempotent), while two
        # distinct blocks that happen to share first row + row count
        # (e.g. external shards all starting at turn 0 of a shared
        # conv) get different ids. The joined array is freshly computed
        # so its buffers are canonical (offset 0, exactly sized).
        import hashlib

        joined = pc.binary_join_element_wise(
            b["conv_id"].combine_chunks() if isinstance(b["conv_id"], pa.ChunkedArray) else b["conv_id"],
            pc.cast(b["turn_idx"].combine_chunks() if isinstance(b["turn_idx"], pa.ChunkedArray) else b["turn_idx"], pa.string()),
            "|",
        )
        h = hashlib.md5()
        for buf in joined.buffers():
            if buf is not None:
                h.update(buf)
        tid = h.hexdigest()[:16]
        written = []
        for s in pc.unique(sinks).to_pylist():
            sub = b.filter(pc.equal(sinks, s))
            d = os.path.join(self.routed_path, f"sink={s}")
            os.makedirs(d, exist_ok=True)
            fp = os.path.join(d, f"part-{tid}.parquet")
            tmp_fp = fp + "." + uuid.uuid4().hex[:8] + ".tmp"
            pq.write_table(sub.drop_columns(["sink"]), tmp_fp, compression="zstd")
            os.replace(tmp_fp, fp)  # atomic publish; last writer wins
            written.append({"file": fp, "rows": sub.num_rows, "sink": s})
        pdir = os.path.join(self.routed_path, "_parts")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".{tid}.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump({"task": tid, "files": written}, f)
        os.replace(tmp, os.path.join(pdir, f"{tid}.json"))

        orig = b.filter(pc.invert(pc.is_in(sinks, value_set=pa.array(sorted(COPY_SINKS)))))
        return _metric_partial(orig)


def committed_files(routed_path: str) -> set[str]:
    """The authoritative routed-output file set: the union of all
    part-manifest entries (write-audit-publish). Files on disk but
    absent here are orphans from interrupted/retried tasks and must be
    ignored by readers (and may be garbage-collected)."""
    out: set[str] = set()
    pdir = os.path.join(routed_path, "_parts")
    if not os.path.isdir(pdir):
        return out
    for mf in _glob.glob(os.path.join(pdir, "*.json")):
        with open(mf) as f:
            for e in json.load(f)["files"]:
                out.add(e["file"])
    return out


def sweep_orphans(routed_path: str) -> list[str]:
    """Delete data files not named by any part-manifest; returns the
    removed paths."""
    good = committed_files(routed_path)
    removed = []
    for f in _glob.glob(os.path.join(routed_path, "sink=*", "*.parquet")):
        if f not in good:
            os.remove(f)
            removed.append(f)
    return removed


def _row_group_blocks(input_files: list[str]) -> int:
    """Read-task parallelism = total parquet row groups across the
    (sorted) input list — deterministic, and footer-metadata-only on
    the driver (no data reads)."""
    return sum(max(1, pq.read_metadata(f).num_row_groups)
               for f in input_files)


def _fused_pass(input_files: list[str], routed_path: str) -> pa.Table:
    """read -> parse -> enrich -> route -> write+partial -> tree merge.
    One streaming consumption; returns the merged metric partial.

    override_num_blocks = total ROW GROUPS (not files): the read still
    fuses INTO the map chain (no SplitBlocks operator => no extra
    object-store round trip of the full decoded stream — the only
    plasma traffic is the tiny partials), but a giant input file
    splits into one task per row group instead of serializing the
    whole stage behind a single task (one-block-per-FILE was the r4
    VERDICT's skew hazard #2). On the uniform fixture (one row group
    per shard) this is byte-identical to one block per file."""
    ds = ray.data.read_parquet(
        input_files, override_num_blocks=_row_group_blocks(input_files))
    ds = TranscriptParser(on_error="send").apply(ds)
    # project away parse intermediates the sinks don't carry BEFORE the
    # enrich/route/write stages — less memory traffic per fused task
    ds = ds.select_columns([c for c in SINK_COLUMNS
                            if c not in ("sink", "team", "cost_weight", "tool_kind")])
    ds = LookupEnrich(build_lookup_table(), key_cols=["role", "tool"],
                      fields=dict(DEFAULTS)).apply(ds)
    ds = Router(ROUTE_CONFIGS).apply(ds)
    partials = ds.map_batches(
        _WriteAndAggregate(routed_path),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    return tree_merge_groupby(partials, _METRIC_KEYS, _METRIC_VALS)


def run_flagship(sf_dir_or_sf, out_root: str, partitions: int = 1) -> dict:
    """Resumable end-to-end run; returns manifest entries."""
    man = Manifest(out_root)
    routed_path = os.path.join(out_root, "routed")
    partials_dir = os.path.join(out_root, "metric_partials")
    os.makedirs(partials_dir, exist_ok=True)

    tdir = ensure_transcripts(sf_dir_or_sf)
    files = sorted(_glob.glob(os.path.join(tdir, "*.parquet")))
    chunks = [list(c) for c in np.array_split(files, min(partitions, len(files)))]

    partial_tables: list[pa.Table] = []
    for i, chunk in enumerate(chunks):
        key = f"part-{i:05d}"
        ppath = os.path.join(partials_dir, key + ".parquet")
        if man.is_done(key):
            partial_tables.append(pq.read_table(ppath))
            continue
        t = StageTimer()
        merged = _fused_pass(chunk, routed_path)
        pq.write_table(merged, ppath)
        man.commit(key, inputs=chunk, output=routed_path,
                   metrics=t.done(rows=int(pc.sum(merged["turn_count"]).as_py() or 0)))
        partial_tables.append(merged)

    todo = [d for d in METRIC_DEFS if not man.is_done(f"metrics:{d.name}")]
    if todo:
        t = StageTimer()
        all_parts = pa.concat_tables(partial_tables, promote_options="none")
        g = all_parts.group_by(_METRIC_KEYS).aggregate([(c, "sum") for c in _METRIC_VALS])
        merged = g.rename_columns(_METRIC_KEYS + _METRIC_VALS)
        outputs = _finalize_metrics(merged, os.path.join(out_root, "metrics"))
        metrics = t.done()
        for d in todo:
            man.commit(f"metrics:{d.name}", inputs=[partials_dir],
                       output=outputs[d.name], metrics=metrics)

    return man.entries()


def _finalize_metrics(merged: pa.Table, out_dir: str) -> dict[str, str]:
    """Split the merged (role, tool, hour) partial into the three F4
    metric outputs (tiny, driver-side)."""
    pdf = merged.to_pandas()
    outputs: dict[str, str] = {}

    def write(name: str, df: pd.DataFrame) -> None:
        path = os.path.join(out_dir, name)
        os.makedirs(path, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
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
