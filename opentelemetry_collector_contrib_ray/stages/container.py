"""Container log parser — docker / containerd / cri-o autodetect,
k8s metadata from the log file path, CRI partial-line joining.

Reference semantics: pkg/stanza/operator/parser/container/parser.go:

  * per-row format autodetect (parser.go:296-316): docker = line
    starts with ``{``; cri-o = ``time stream logtag log`` with a
    non-Z-terminated time; containerd = same but time ends with Z;
  * docker lines are JSON ``{"log":..,"stream":..,"time":..}``
    (parser.go:333-346), time layout ``...%.3fZ``;
  * CRI lines parse with the fixed regex (parser.go:31-33), crio time
    keeps a zone offset;
  * attribute mappings (parser.go:367-383): ``log`` -> body,
    ``stream`` -> ``log.iostream``;
  * add_metadata_from_filepath (parser.go:385-416): the k8s path
    pattern ``.../<namespace>_<pod>_<uid>/<container>/<restart>.log``
    fills ``k8s.*`` resource attributes;
  * CRI partial lines: logtag ``P`` = partial, joined with the
    following lines of the same source until an ``F`` (the internal
    recombine with is_last_entry = logtag == 'F', combine_with '').

Execution shape: ONE map_batches; the three format subsets are parsed
with vectorized Arrow regex kernels. Docker JSON rows use a
vectorized regex fast path when the line has no escape sequences and
fall back to json.loads only for rows containing backslashes.
``join_partials`` runs per-source (a source = one container log file
— the natural partition) with a vectorized segment collapse.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import register
from .parse import ON_ERROR_VALUES

CRIO_RE = r"^(?P<time>[^ Z]+) (?P<stream>stdout|stderr) (?P<logtag>[^ ]*) ?(?P<log>(?s:.*))$"
CONTAINERD_RE = r"^(?P<time>[^ Z]+Z) (?P<stream>stdout|stderr) (?P<logtag>[^ ]*) ?(?P<log>(?s:.*))$"
K8S_PATH_RE = (
    r"^.*[\/\\](?P<namespace>[^_]+)_(?P<pod_name>[^_]+)_"
    r"(?P<uid>[a-f0-9\-]+)[\/\\](?P<container_name>[^\._]+)[\/\\]"
    r"(?P<restart_count>\d+)\.log(?:\.\d{8}-\d{6})?$"
)
# docker JSON fast path: no backslash anywhere in the line
DOCKER_FAST_RE = (
    r'^\{"log":"(?P<log>[^"\\]*)","stream":"(?P<stream>[^"\\]*)",'
    r'"time":"(?P<time>[^"\\]*)"\}\s*$'
)

K8S_META = {
    "namespace": "k8s.namespace.name",
    "pod_name": "k8s.pod.name",
    "uid": "k8s.pod.uid",
    "container_name": "k8s.container.name",
    "restart_count": "k8s.container.restart_count",
}


@register("container_parser")
class ContainerParser:
    """Output columns: ``body``, ``log.iostream``, ``logtag`` (CRI
    only, null for docker), ``event_ts`` (UTC), ``format``, plus the
    five ``k8s.*`` columns when ``add_metadata_from_filepath`` and a
    path column are given."""

    def __init__(
        self,
        parse_from: str = "text",
        format: str | None = None,  # None = autodetect per row
        on_error: str = "send",
        add_metadata_from_filepath: bool = False,
        path_col: str = "log.file.path",
    ):
        if format not in (None, "docker", "crio", "containerd"):
            raise ValueError("format must be docker|crio|containerd or None")
        if on_error not in ON_ERROR_VALUES:
            raise ValueError(f"on_error must be one of {ON_ERROR_VALUES}")
        self.parse_from = parse_from
        self.format = format
        self.on_error = on_error
        self.add_meta = add_metadata_from_filepath
        self.path_col = path_col

    # ------------------------------------------------------------ parse

    def fn(self, batch: pa.Table) -> pa.Table:
        src = batch[self.parse_from]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src = pc.fill_null(src, "")
        n = len(src)

        is_docker = pc.starts_with(src, "{").to_numpy(zero_copy_only=False)
        crio_res = pc.extract_regex(src, pattern=CRIO_RE)
        ctd_res = pc.extract_regex(src, pattern=CONTAINERD_RE)
        is_ctd = ctd_res.is_valid().to_numpy(zero_copy_only=False) & ~is_docker
        # the crio regex also matches containerd times minus the Z rule;
        # reference checks crio FIRST (parser.go:308-313) but its crio
        # pattern excludes Z-terminated times, so containerd wins there
        is_crio = crio_res.is_valid().to_numpy(zero_copy_only=False) & ~is_docker & ~is_ctd
        if self.format == "docker":
            is_crio = is_ctd = np.zeros(n, dtype=bool)
        elif self.format == "crio":
            is_docker = is_ctd = np.zeros(n, dtype=bool)
            is_crio = crio_res.is_valid().to_numpy(zero_copy_only=False)
        elif self.format == "containerd":
            is_docker = is_crio = np.zeros(n, dtype=bool)
            is_ctd = ctd_res.is_valid().to_numpy(zero_copy_only=False)

        fmt = np.where(is_docker, "docker",
                       np.where(is_crio, "crio", np.where(is_ctd, "containerd", None)))

        log_v = np.full(n, None, dtype=object)
        stream_v = np.full(n, None, dtype=object)
        logtag_v = np.full(n, None, dtype=object)
        time_v = np.full(n, None, dtype=object)
        ok = is_docker | is_crio | is_ctd

        for mask, res in ((is_crio, crio_res), (is_ctd, ctd_res)):
            if mask.any():
                for name, dst in (("log", log_v), ("stream", stream_v),
                                  ("logtag", logtag_v), ("time", time_v)):
                    vals = pc.struct_field(res, name).to_numpy(zero_copy_only=False)
                    dst[mask] = vals[mask]

        if is_docker.any():
            dsub = pc.filter(src, pa.array(is_docker))
            fast = pc.extract_regex(dsub, pattern=DOCKER_FAST_RE)
            fast_ok = fast.is_valid().to_numpy(zero_copy_only=False)
            logs = pc.struct_field(fast, "log").to_numpy(zero_copy_only=False)
            streams = pc.struct_field(fast, "stream").to_numpy(zero_copy_only=False)
            times = pc.struct_field(fast, "time").to_numpy(zero_copy_only=False)
            idxs = np.nonzero(is_docker)[0]
            slow_rows = ~fast_ok
            if slow_rows.any():
                raw = dsub.to_pylist()
                for j in np.nonzero(slow_rows)[0]:
                    try:
                        d = json.loads(raw[j])
                        logs[j] = d.get("log")
                        streams[j] = d.get("stream")
                        times[j] = d.get("time")
                        fast_ok[j] = True
                    except (ValueError, TypeError, AttributeError):
                        pass
            log_v[idxs] = logs
            stream_v[idxs] = streams
            time_v[idxs] = times
            ok[idxs] = fast_ok

        from .syslog import _iso_ts_us

        ts = _iso_ts_us(pa.array(time_v, pa.string()))

        out = batch.append_column("body", pa.array(log_v, pa.string()))
        out = out.append_column("log.iostream", pa.array(stream_v, pa.string()))
        out = out.append_column("logtag", pa.array(logtag_v, pa.string()))
        out = out.append_column("event_ts", ts)
        out = out.append_column("format", pa.array(fmt, pa.string()))
        if self.add_meta and self.path_col in batch.column_names:
            paths = batch[self.path_col]
            if isinstance(paths, pa.ChunkedArray):
                paths = paths.combine_chunks()
            meta = pc.extract_regex(pc.fill_null(paths, ""), pattern=K8S_PATH_RE)
            for src_key, out_key in K8S_META.items():
                out = out.append_column(out_key, pc.struct_field(meta, src_key))
        okarr = pa.array(ok)
        if self.on_error.startswith("drop"):
            return out.filter(okarr)
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def join_partials(
    ds: ray.data.Dataset,
    source_col: str,
    order_col: str,
    body_col: str = "body",
    logtag_col: str = "logtag",
) -> ray.data.Dataset:
    """CRI partial-line recombine: within one source (log file), join
    consecutive rows while logtag == 'P', ending each joined line at
    the first non-P row (transformer config in parser.go:
    is_last_entry = logtag == 'F', combine_with ''). Docker rows
    (null logtag) pass through as singleton segments.

    Runs on the recombine segmented-bypass engine: complete segments
    (the overwhelming majority — most container lines are 'F')
    finalize inside their sorted block with zero shuffle; only the
    <=2 block-edge pieces per block take the merge groupby, so a
    multi-GB hot container file never materializes in one task."""
    from ..expr import col as _col
    from .recombine import Recombine

    rc = Recombine(
        group_key=source_col,
        order_key=order_col,
        combine_field=body_col,
        combine_with="",
        # non-P ends the segment; docker rows have null logtag and
        # pass through as singletons
        is_last_entry=("or", ("!=", _col(logtag_col), "P"),
                       ("is_null", _col(logtag_col))),
        keep_fields=["event_ts", "log.iostream"],
    )
    out = rc.apply(ds, strategy="segmented-bypass")

    rename = {"n_turns": "n_lines", "first_" + order_col: order_col}

    def to_contract(b: pa.Table) -> pa.Table:
        return b.rename_columns([rename.get(c, c) for c in b.column_names])

    return out.map_batches(
        to_contract, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
