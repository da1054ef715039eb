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

from .transcripts import ensure_transcripts

RAW_ROOT = "/tmp/graft_rawlog"

# a continuation line: indented "    ... <payload>"
_CONT_PREFIX = "    ... "



# filelog `encoding:` support (internal/coreinternal/textutils/
# encoding.go LookupEncoding): the override table normalizes the
# stanza names, everything else resolves through Python's codec
# registry (the IANA set). `nop` keeps raw bytes (latin-1 round-trips
# bytes 1:1, matching encoding.Nop's byte passthrough into a string).
_ENCODING_OVERRIDES = {
    "utf-16": "utf-16-le", "utf16": "utf-16-le",  # LE, BOM not stripped
    "utf-8": "utf-8", "utf8": "utf-8",
    "utf-8-raw": "utf-8", "utf8-raw": "utf-8",
    "ascii": "utf-8", "us-ascii": "utf-8",
    "nop": "latin-1", "": "utf-8",
}


def lookup_encoding(enc: str) -> str:
    """Stanza encoding name -> Python codec name; unknown names fail
    loud like the reference's LookupEncoding."""
    import codecs

    name = _ENCODING_OVERRIDES.get(enc.lower(), enc)
    try:
        codecs.lookup(name)
    except LookupError:
        raise ValueError(f"unsupported encoding {enc!r}")
    return name


def _split_lines_arrow(path: str, data: bytes,
                       encoding: str = "utf-8") -> pa.Table | None:
    """File blob -> (path, line_no, line) with Arrow kernels only —
    no per-line Python objects (a 13 MB / 180k-line file costs three
    C-kernel passes, not 180k PyUnicode allocations; this was the
    raw-path straggler in the round-3 bench). Non-UTF-8 encodings
    decode ONCE per file through the C codec, then reuse the same
    kernel path."""
    import pyarrow.compute as pc

    if encoding not in ("utf-8", "utf8"):
        s = pa.array([data.decode(encoding, errors="replace")])
    else:
        try:
            s = pa.array([data]).cast(pa.string())
        except pa.ArrowInvalid:
            s = pa.array([data.decode("utf-8", errors="replace")])
    s = pc.replace_substring(s, pattern="\r\n", replacement="\n")
    lines = pc.list_flatten(pc.split_pattern(s, pattern="\n"))
    n = len(lines)
    if n and lines[n - 1].as_py() == "":
        lines = lines.slice(0, n - 1)
        n -= 1
    if n == 0:
        return None
    return pa.table({
        "path": pa.array(np.full(n, path, dtype=object), pa.string()),
        "line_no": pa.array(np.arange(n, dtype=np.int64)),
        "line": lines,
    })


def read_log_lines(path_or_glob: str | list[str],
                   encoding: str = "utf-8") -> ray.data.Dataset:
    """(path, line_no, line) rows; order within a file is the file's
    line order. Trailing newline does not produce an empty last line.
    ``encoding`` accepts the filelog receiver's names (utf-16,
    latin-1, nop, ...)."""
    pyenc = lookup_encoding(encoding)
    paths = (sorted(_glob.glob(path_or_glob))
             if isinstance(path_or_glob, str) else list(path_or_glob))
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(batch: pa.Table) -> pa.Table:
        out = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            t = _split_lines_arrow(path, data, encoding=pyenc)
            if t is not None:
                out.append(t)
        if not out:
            return pa.table({"path": pa.array([], pa.string()),
                             "line_no": pa.array([], pa.int64()),
                             "line": pa.array([], pa.string())})
        return pa.concat_tables(out, promote_options="none")

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def join_multiline(ds: ray.data.Dataset, is_first_regex: str,
                   line_col: str = "line", path_col: str = "path",
                   order_col: str = "line_no",
                   combine_with: str = "\n") -> ray.data.Dataset:
    """Join continuation lines to their entry, fully vectorized.

    Works per batch because ``read_log_lines`` emits each file's lines
    contiguously and in order (one read task per file), so a multiline
    entry never spans batches — the same invariant the reference's
    per-file reader provides (fileconsumer/design.md:55-130). The join
    itself is Arrow ``binary_join`` over a ListArray built from the
    entry-start boundaries: no per-segment Python (the round-2 bench
    caught the per-segment loop at 70s/5M rows; this path is ~1s)."""
    def per_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                path_col: pa.array([], pa.string()),
                "line": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "first_line_no": pa.array([], pa.int64()),
            })
        return _join_lines_table(b, is_first_regex, combine_with)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def read_multiline_entries(path_or_glob: str | list[str], is_first_regex: str,
                           combine_with: str = "\n",
                           encoding: str = "utf-8") -> ray.data.Dataset:
    """Fused file -> lines -> multiline-joined entries in ONE stage
    over whole files. Safe even when a single file's line table would
    exceed the dynamic block-split threshold (a split between a
    continuation and its entry would mis-join in the two-stage
    composition); here the join happens before the executor can split
    the output."""
    pyenc = lookup_encoding(encoding)
    paths = (sorted(_glob.glob(path_or_glob))
             if isinstance(path_or_glob, str) else list(path_or_glob))
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split_join(batch: pa.Table) -> pa.Table:
        out = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            t = _split_lines_arrow(path, data, encoding=pyenc)
            if t is None:
                continue
            out.append(_join_lines_table(t, is_first_regex, combine_with))
        if not out:
            return pa.table({
                "path": pa.array([], pa.string()), "line": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "first_line_no": pa.array([], pa.int64()),
            })
        return pa.concat_tables(out, promote_options="none")

    return ds.map_batches(split_join, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _join_lines_table(b: pa.Table, is_first_regex: str, combine_with: str) -> pa.Table:
    import pyarrow.compute as pc

    n = b.num_rows
    lines = b["line"]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    starts_mask = pc.match_substring_regex(lines, pattern=is_first_regex) \
        .to_numpy(zero_copy_only=False).astype(bool)
    paths = b["path"].to_numpy(zero_copy_only=False)
    starts_mask[0] = True
    starts_mask |= np.concatenate([[True], paths[1:] != paths[:-1]])
    starts = np.nonzero(starts_mask)[0]
    offs = np.append(starts, n).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), lines)
    joined = pc.binary_join(lists, combine_with)
    lens = np.diff(offs).astype(np.int64)
    return pa.table({
        "path": pa.array(paths[starts], pa.string()),
        "line": joined,
        "n_turns": pa.array(lens, pa.int64()),
        "first_line_no": pa.array(
            b["line_no"].to_numpy(zero_copy_only=False)[starts], pa.int64()),
    })


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


# ------------------------------------------------------------- header

def _strip_header(t: pa.Table, pattern: str,
                  metadata_regexes: list) -> tuple[pa.Table, dict]:
    """filelog ``header:`` support (fileconsumer/internal/header/
    reader.go:47-72): consecutive LEADING lines matching ``pattern``
    are header lines — consumed, not emitted. Each runs through the
    metadata regexes (the reference's metadata_operators are regex
    parsers); named-group matches upsert into the file's attribute
    set, later lines overwriting earlier keys (maps.Copy). Returns
    (remaining lines, attrs).

    Header lines are O(header) per file — a handful at file open, so
    row-at-a-time here is the same cost shape as the reference."""
    import re as _re

    import pyarrow.compute as pc

    m = pc.match_substring_regex(t["line"], pattern=pattern) \
        .to_numpy(zero_copy_only=False).astype(bool)
    k = len(m) if m.all() else int(np.argmin(m))
    attrs: dict = {}
    compiled = [_re.compile(r) if isinstance(r, str) else r
                for r in metadata_regexes]
    for i in range(k):
        line = t["line"][i].as_py()
        for rx in compiled:
            mm = rx.search(line)
            if mm:
                attrs.update({g: v for g, v in mm.groupdict().items()
                              if v is not None})
    return t.slice(k), attrs


def read_log_lines_with_header(path_or_glob: str | list[str],
                               header_pattern: str,
                               header_metadata_regexes: list,
                               encoding: str = "utf-8",
                               attr_keys: list[str] | None = None
                               ) -> ray.data.Dataset:
    """(path, line_no, line, <header attrs...>) rows: like
    ``read_log_lines`` but consuming a filelog-style header per file
    and attaching its parsed attributes to every row of that file as
    constant (dictionary-friendly) columns.

    ``attr_keys`` pins the emitted header-column set (null where a
    file's header lacked a key) so every block has one schema even
    when files disagree; without it the column set is the union seen
    within each read task."""
    pyenc = lookup_encoding(encoding)
    paths = (sorted(_glob.glob(path_or_glob))
             if isinstance(path_or_glob, str) else list(path_or_glob))
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(batch: pa.Table) -> pa.Table:
        pieces = []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            t = _split_lines_arrow(path, data, encoding=pyenc)
            if t is None:
                continue
            t, attrs = _strip_header(t, header_pattern,
                                     header_metadata_regexes)
            if t.num_rows == 0:
                continue
            pieces.append((t, attrs))
        if not pieces:
            empty = {"path": pa.array([], pa.string()),
                     "line_no": pa.array([], pa.int64()),
                     "line": pa.array([], pa.string())}
            for k in (attr_keys or []):
                empty[k] = pa.array([], pa.string())
            return pa.table(empty)
        # one schema across the batch: the union of header keys, null
        # where a file's header lacked a key
        keys = (list(attr_keys) if attr_keys is not None
                else sorted({k for _, a in pieces for k in a}))
        out = []
        for t, attrs in pieces:
            for k in keys:
                v = attrs.get(k)
                col = (pa.nulls(t.num_rows, pa.string()) if v is None
                       else pa.array([v] * t.num_rows, pa.string()))
                t = t.append_column(k, col)
            out.append(t)
        return pa.concat_tables(out, promote_options="none")

    return ds.map_batches(split, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
