"""Raw-text line ingest — the filelog receiver's actual job.

Reference semantics (pkg/stanza/fileconsumer/design.md:55-130): a
file is read by one reader which splits it into lines IN ORDER,
multiline continuation lines are joined to their entry (recombine
with is_first_entry), and each entry then flows through the parser
chain. The finite-table equivalent:

  * one Ray task per file (``read_binary_files`` — a file is the
    ordering unit; multiline never crosses files, matching the
    per-file reader model);
  * vectorized line split per file emitting (path, line_no, line);
  * ``Recombine(group_key=path, order_key=line_no,
    is_first_entry=<entry-start regex>)`` joins continuations;
  * the existing regex parser parses the joined entries.

File size is bounded by log rotation in real deployments, so the
per-file task memory is bounded; for pathological single huge files
split on byte ranges ending at line boundaries (not implemented).
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
import pyarrow as pa
import ray.data

from .transcripts import ensure_transcripts, sf_name

RAW_ROOT = "/tmp/graft_rawlog"

# a continuation line: indented "    ... <payload>"
_CONT_PREFIX = "    ... "


def read_log_lines(path_or_glob: str | list[str]) -> ray.data.Dataset:
    """(path, line_no, line) rows; order within a file is the file's
    line order. Trailing newline does not produce an empty last line."""
    paths = (sorted(_glob.glob(path_or_glob))
             if isinstance(path_or_glob, str) else list(path_or_glob))
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(batch: pa.Table) -> pa.Table:
        out_path, out_no, out_line = [], [], []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            text = data.decode("utf-8", errors="replace").replace("\r\n", "\n")
            lines = text.split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            out_path.append(np.full(len(lines), path, dtype=object))
            out_no.append(np.arange(len(lines), dtype=np.int64))
            out_line.append(np.array(lines, dtype=object))
        if not out_path:
            return pa.table({"path": pa.array([], pa.string()),
                             "line_no": pa.array([], pa.int64()),
                             "line": pa.array([], pa.string())})
        return pa.table({
            "path": pa.array(np.concatenate(out_path), pa.string()),
            "line_no": pa.array(np.concatenate(out_no), pa.int64()),
            "line": pa.array(np.concatenate(out_line), pa.string()),
        })

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def ensure_raw_log(sf_dir_or_sf) -> str:
    """Render the transcript cache to ``.log`` text files (one per
    cache parquet, same row order). Rows with ``turn_idx % 7 == 3``
    get an indented continuation line repeating their payload — the
    multiline fixture. Idempotent per sf."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tdir = ensure_transcripts(sf_dir_or_sf)
    out_dir = os.path.join(RAW_ROOT, os.path.basename(tdir.rstrip("/")))
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(_glob.glob(os.path.join(tdir, "*.parquet"))):
        t = pq.read_table(f, columns=["turn_idx", "text"])
        text = t["text"].combine_chunks()
        payload = pc.struct_field(
            pc.extract_regex(text, pattern=r":: (?P<payload>.*)$"), "payload")
        cont = pc.binary_join_element_wise(
            pa.array([_CONT_PREFIX] * len(text)), pc.fill_null(payload, ""), "")
        ti = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
        has_cont = pa.array(ti % 7 == 3)
        joined = pc.if_else(
            has_cont,
            pc.binary_join_element_wise(text, cont, "\n"),
            text,
        )
        name = os.path.splitext(os.path.basename(f))[0] + ".log"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(joined.to_pylist()))
            fh.write("\n")
        os.replace(tmp, os.path.join(out_dir, name))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
