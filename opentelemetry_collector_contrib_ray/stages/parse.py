"""Parse stages — vectorized stanza parser equivalents.

The composite parse step is the semantic core (SURVEY.md §2.2): a
parser reads ``parse_from``, writes extracted fields, and runs
embedded time/severity sub-parsers in one pass (reference:
pkg/stanza/operator/helper/parser.go:178-247). Per-row parse errors
follow ``on_error`` (helper/transformer.go:214-224):

  * ``send`` / ``send_quiet``: keep the row unmodified (extracted
    columns null for that row);
  * ``drop`` / ``drop_quiet``: remove the row from the stream.

Instead of raising per row, every kernel computes a validity mask per
batch — `pyarrow.compute.extract_regex` returns a null struct for
non-matching rows, which IS the error mask, so on_error semantics are
one `filter`/`if_else` away and the whole stage stays zero-copy Arrow.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.severity import SeverityMapper, http_status_severity
from ..schema import TEXT_REGEX, TEXT_TIME_FORMAT
from . import register

ON_ERROR_VALUES = ("send", "send_quiet", "drop", "drop_quiet")


def _extract_columns(
    batch: pa.Table,
    pattern: str,
    parse_from: str,
    types: dict[str, pa.DataType],
    prefix: str = "",
) -> tuple[pa.Table, pa.Array]:
    """Run the named-group regex; return (batch+new columns, ok_mask).

    Non-matching / null rows get null extracted values. RE2 named
    groups via pc.extract_regex == the reference regex parser's
    capture semantics (parser/regex/parser.go:50-67) vectorized.
    """
    src = batch[parse_from]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    result = pc.extract_regex(src, pattern=pattern)
    ok = result.is_valid()
    out = batch
    for field in result.type:
        col = pc.struct_field(result, field.name)
        want = types.get(field.name)
        if want is not None and want != pa.string():
            col, ok = _cast_or_null(col, want, ok)
        out = out.append_column(prefix + field.name, col)
    return out, ok


def _cast_or_null(col: pa.Array, want: pa.DataType, ok: pa.Array) -> tuple[pa.Array, pa.Array]:
    """Cast failures count as PER-ROW parse errors (folded into ``ok``),
    never batch aborts — the whole-batch ArrowInvalid would break the
    on_error contract (helper/transformer.go:214-224). Fast path is the
    plain vectorized cast; the row-wise salvage only runs for batches
    that actually contain an uncastable capture (e.g. a >int64 digit
    run through grok %{INT})."""
    try:
        return pc.cast(col, want, safe=False), ok
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        vals = col.to_pylist()
        casted: list = []
        valid = []
        for v in vals:
            if v is None:
                casted.append(None)
                valid.append(True)  # already-null rows are not NEW errors
                continue
            try:
                casted.append(pa.scalar(v).cast(want).as_py())
                valid.append(True)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError, OverflowError):
                casted.append(None)
                valid.append(False)
        return pa.array(casted, type=want), pc.and_(ok, pa.array(valid))


@register("regex_parser")
class RegexParser:
    """stanza regex_parser (reference: pkg/stanza/operator/parser/regex/
    parser.go:29-67, config.go:38-92) as one vectorized map_batches.

    ``types`` optionally casts named groups (e.g. status->int64); the
    reference leaves strings, we expose typed columns because Arrow is
    typed. The value-LRU cache (parser/regex/cache.go) is unnecessary:
    columnar RE2 amortizes compilation across the batch.
    """

    def __init__(
        self,
        regex: str = TEXT_REGEX,
        parse_from: str = "text",
        on_error: str = "send",
        types: dict[str, Any] | None = None,
        prefix: str = "",
    ):
        if on_error not in ON_ERROR_VALUES:
            raise ValueError(f"on_error must be one of {ON_ERROR_VALUES}")
        self.regex = regex
        self.parse_from = parse_from
        self.on_error = on_error
        self.types = {k: pa.type_for_alias(v) if isinstance(v, str) else v for k, v in (types or {}).items()}
        self.prefix = prefix

    def fn(self, batch: pa.Table) -> pa.Table:
        out, ok = _extract_columns(batch, self.regex, self.parse_from, self.types, self.prefix)
        if self.on_error.startswith("drop"):
            return out.filter(ok)
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("transcript_parser")
class TranscriptParser:
    """The fused composite parse for transcript text — regex + embedded
    time + severity sub-parsers in ONE map_batches pass, mirroring the
    one-pass ParseWith flow (helper/parser.go:178-247):

    input columns + -> level, time (string), actor, tool_tag,
    status:int64, dur:float64, payload, event_ts:timestamp[us]
    (strptime of the embedded time, helper/time.go 'strptime'),
    severity_number:int8 / severity_text (level token via the default
    severity table, severity_builder.go:64-88), and
    http_severity_number/_text from the status code ranges
    (severity_builder.go:199-206 '4xx'-style expansion).
    """

    def __init__(self, on_error: str = "send", parse_from: str = "text"):
        if on_error not in ON_ERROR_VALUES:
            raise ValueError(f"on_error must be one of {ON_ERROR_VALUES}")
        self.on_error = on_error
        self.parse_from = parse_from
        self.sev = SeverityMapper()
        self.http = http_status_severity()

    def fn(self, batch: pa.Table) -> pa.Table:
        out, ok = _extract_columns(
            batch,
            TEXT_REGEX,
            self.parse_from,
            {"status": pa.int64(), "dur": pa.float64()},
        )
        time_col = out["time"]
        if isinstance(time_col, pa.ChunkedArray):
            time_col = time_col.combine_chunks()
        event_ts = pc.strptime(time_col, format=TEXT_TIME_FORMAT, unit="us", error_is_null=True)
        out = out.append_column("event_ts", event_ts)

        sev_num = self.sev.map_tokens(out["level"])
        # null level (unparsed row) -> null severity, not Default
        sev_num = pc.if_else(ok, sev_num, pa.nulls(len(ok), pa.int8()))
        sev_text = SeverityMapper.number_to_text(sev_num)
        out = out.append_column("severity_number", sev_num)
        out = out.append_column("severity_text", sev_text)

        http_num = self.http.map_ints(out["status"])
        http_num = pc.if_else(ok, http_num, pa.nulls(len(ok), pa.int8()))
        http_text = SeverityMapper.number_to_text(http_num)
        out = out.append_column("http_severity_number", http_num)
        out = out.append_column("http_severity_text", http_text)

        if self.on_error.startswith("drop"):
            return out.filter(ok)
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("json_parser")
class JsonParser:
    """stanza json_parser (parser/jsonparser/parser.go:34-60): parse a
    JSON-string column into typed columns for the requested fields.

    Vectorized via pandas' C json path would still be per-row; we use
    a tight Python loop over the batch with the stdlib parser ONLY on
    the requested keys (fields are projected out of the dict
    immediately). For hot paths at scale, prefer fixed-schema regex
    extraction; this exists for parity with props-style JSON blobs.
    """

    def __init__(
        self,
        parse_from: str,
        fields: dict[str, Any],
        on_error: str = "send",
        prefix: str = "",
    ):
        import json

        self._loads = json.loads
        self.parse_from = parse_from
        self.fields = {k: pa.type_for_alias(v) if isinstance(v, str) else v for k, v in fields.items()}
        self.on_error = on_error
        self.prefix = prefix

    def fn(self, batch: pa.Table) -> pa.Table:
        src = batch[self.parse_from].to_pylist()
        cols: dict[str, list] = {k: [] for k in self.fields}
        ok = []
        loads = self._loads
        for s in src:
            try:
                d = loads(s)
                for k in cols:
                    cols[k].append(d.get(k))
                ok.append(True)
            except (TypeError, ValueError):
                for k in cols:
                    cols[k].append(None)
                ok.append(False)
        out = batch
        for k, typ in self.fields.items():
            out = out.append_column(self.prefix + k, pa.array(cols[k], type=typ))
        if self.on_error.startswith("drop"):
            return out.filter(pa.array(ok))
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("grok_parser")
class GrokParser:
    """ExtractGrokPatterns as a stage (func_extract_grok_patterns.go:
    39-99): a grok expression compiles once to an RE2 regex with named
    groups + a type map, then runs the vectorized regex path."""

    def __init__(
        self,
        pattern: str,
        parse_from: str = "text",
        on_error: str = "send",
        definitions: dict[str, Any] | None = None,
        prefix: str = "",
    ):
        from ..functions.grok import compile_grok

        regex, types = compile_grok(pattern, definitions)
        self.regex = regex
        self._inner = RegexParser(
            regex=regex, parse_from=parse_from, on_error=on_error,
            types=types, prefix=prefix,
        )

    def fn(self, batch: pa.Table) -> pa.Table:
        return self._demangle(self._inner.fn(batch))

    @staticmethod
    def _demangle(tbl: pa.Table) -> pa.Table:
        # ECS dotted field names are mangled inside regex group names
        from ..functions.grok import demangle_grok_field

        if any("_DOT_" in c for c in tbl.column_names):
            tbl = tbl.rename_columns(
                [demangle_grok_field(c) for c in tbl.column_names])
        return tbl

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return self._inner.apply(ds).map_batches(
            self._demangle, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None)


@register("key_value_parser")
class KeyValueParser:
    """stanza key_value_parser (parser/keyvalue/parser.go:32-51): split
    ``pair_delimiter``-separated pairs on ``delimiter``. We extract the
    REQUESTED keys into typed columns with one vectorized regex per
    key (columnar engines want fixed schemas, not per-row maps; an
    unrequested-keys map column would box every row into Python)."""

    def __init__(
        self,
        parse_from: str,
        keys: dict[str, Any],
        delimiter: str = "=",
        on_error: str = "send",
        prefix: str = "",
    ):
        import re as _re

        self.parse_from = parse_from
        self.keys = {k: pa.type_for_alias(v) if isinstance(v, str) else v for k, v in keys.items()}
        self.delimiter = delimiter
        self.on_error = on_error
        self.prefix = prefix
        # parseutils quoting: a double-quoted value keeps embedded
        # spaces/delimiters and drops the quotes (the unquoted branch
        # extracts "" for the quoted group and vice versa — RE2 empty,
        # not null — so the reader picks the non-empty one)
        self._pats = {
            k: rf'(?:^|\s){_re.escape(k)}{_re.escape(delimiter)}'
               rf'(?:"(?P<q>[^"]*)"|(?P<v>\S+))' for k in keys
        }

    def fn(self, batch: pa.Table) -> pa.Table:
        src = batch[self.parse_from]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        any_ok = None
        for k, typ in self.keys.items():
            res = pc.extract_regex(src, pattern=self._pats[k])
            q = pc.struct_field(res, "q")
            v = pc.struct_field(res, "v")
            val = pc.if_else(pc.equal(pc.fill_null(v, ""), ""), q, v)
            ok = res.is_valid()
            any_ok = ok if any_ok is None else pc.or_(any_ok, ok)
            if typ != pa.string():
                val = pc.cast(val, typ, safe=False)
            batch = batch.append_column(self.prefix + k, val)
        if self.on_error.startswith("drop") and any_ok is not None:
            batch = batch.filter(any_ok)
        return batch

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _lazy_csv_split(row: str, d: str) -> list[str]:
    """Go encoding/csv LazyQuotes semantics (used by parser/csv when
    lazy_quotes: a quote in an unquoted field is literal; a non-doubled
    quote in a quoted field is literal; a quoted field ends at a quote
    followed by the delimiter or end of line)."""
    fields: list[str] = []
    cur: list[str] = []
    i, n = 0, len(row)
    in_q = False
    field_start = True
    while i < n:
        c = row[i]
        if in_q:
            if c == '"':
                if i + 1 < n and row[i + 1] == '"':
                    cur.append('"')
                    i += 2
                    continue
                if i + 1 == n or row[i + 1] == d:
                    in_q = False
                    i += 1
                    continue
                cur.append('"')  # lazy: literal quote
                i += 1
                continue
            cur.append(c)
            i += 1
            continue
        if field_start and c == '"':
            in_q = True
            field_start = False
            i += 1
            continue
        if c == d:
            fields.append("".join(cur))
            cur = []
            field_start = True
            i += 1
            continue
        cur.append(c)
        field_start = False
        i += 1
    fields.append("".join(cur))
    return fields


@register("csv_parser")
class CsvParser:
    """stanza csv_parser (parser/csv/parser.go:94-130 over Go
    encoding/csv) with the full config surface: static ``header``
    (list or delimiter-joined string), dynamic ``header_attribute``
    (per-row header column, config.go:41), ``lazy_quotes`` /
    ``ignore_quotes`` modes (mutually exclusive, config.go:76-78), and
    strict field-count errors (count != header length).

    Execution shape: rows WITHOUT a quote character take the
    vectorized split path (``pc.split_pattern`` + position-indexed
    columns — the overwhelmingly common case in machine logs); only
    rows containing ``"`` fall back to per-row RFC-4180 (strict,
    doubled-quote escapes via Python csv) or the Go LazyQuotes state
    machine. With ``ignore_quotes`` every row takes the split path
    (parser.go: quotes are ordinary characters)."""

    def __init__(
        self,
        parse_from: str,
        header: list[str] | str | None = None,
        delimiter: str = ",",
        on_error: str = "send",
        prefix: str = "",
        lazy_quotes: bool = False,
        ignore_quotes: bool = False,
        header_attribute: str | None = None,
        header_delimiter: str | None = None,
    ):
        if lazy_quotes and ignore_quotes:
            raise ValueError(
                "only one of 'ignore_quotes' or 'lazy_quotes' can be true")
        if len(delimiter) != 1:
            raise ValueError("invalid 'delimiter': must be a single character")
        if header is None and header_attribute is None:
            raise ValueError("missing required field 'header'")
        self.header_delimiter = header_delimiter or delimiter
        if isinstance(header, str):
            if self.header_delimiter not in header:
                raise ValueError(
                    "missing field delimiter in header")
            header = header.split(self.header_delimiter)
        self.parse_from = parse_from
        self.header = header
        self.delimiter = delimiter
        self.on_error = on_error
        self.prefix = prefix
        self.lazy_quotes = lazy_quotes
        self.ignore_quotes = ignore_quotes
        self.header_attribute = header_attribute

    # ------------------------------------------------------ one header

    def _parse_group(self, src: pa.Array, header: list[str]
                     ) -> tuple[list[pa.Array], np.ndarray]:
        """-> (one string array per header field, ok mask)."""
        import csv as _csv
        import io as _io

        h = len(header)
        counts = pc.list_value_length(pc.split_pattern(src, pattern=self.delimiter))
        ok = pc.fill_null(pc.equal(counts, h), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        padded = pc.binary_join_element_wise(
            pc.fill_null(src, ""), pa.scalar(self.delimiter * (h - 1)), "")
        parts = pc.split_pattern(padded, pattern=self.delimiter)
        cols = [pc.list_flatten(pc.list_slice(parts, start=i, stop=i + 1))
                for i in range(h)]
        if self.ignore_quotes:
            return cols, ok
        quoted = pc.fill_null(pc.match_substring(src, '"'), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        if not quoted.any():
            return cols, ok
        # slow path only for the rows that contain a quote character
        np_cols = [c.to_numpy(zero_copy_only=False).astype(object)
                   for c in cols]
        for i in np.nonzero(quoted)[0]:
            row = src[int(i)].as_py()
            try:
                if self.lazy_quotes:
                    fields = _lazy_csv_split(row, self.delimiter)
                else:
                    fields = next(_csv.reader(
                        _io.StringIO(row), delimiter=self.delimiter,
                        doublequote=True, strict=True))
            except (StopIteration, _csv.Error):
                ok[i] = False
                continue
            if len(fields) != h:
                ok[i] = False
                for j in range(h):
                    np_cols[j][i] = None
                continue
            ok[i] = True
            for j in range(h):
                np_cols[j][i] = fields[j]
        cols = [pa.array(c, pa.string()) for c in np_cols]
        return cols, ok

    # ----------------------------------------------------------- entry

    def fn(self, batch: pa.Table) -> pa.Table:
        src = batch[self.parse_from]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if self.header_attribute is None:
            cols, ok = self._parse_group(src, self.header)
            for name, col in zip(self.header, cols):
                batch = batch.append_column(self.prefix + name, col)
        else:
            # dynamic per-row header (config.go:41): group rows by the
            # DISTINCT header value — log streams carry one or two —
            # and parse each group with its own header; the output
            # column set is the union, null outside a row's own header
            hdr_col = batch[self.header_attribute]
            if isinstance(hdr_col, pa.ChunkedArray):
                hdr_col = hdr_col.combine_chunks()
            hdrs = hdr_col.to_numpy(zero_copy_only=False)
            n = batch.num_rows
            ok = np.zeros(n, dtype=bool)
            out_cols: dict[str, np.ndarray] = {}
            for hdr in pd.unique(hdrs):
                rows = np.nonzero(hdrs == hdr)[0]
                header = str(hdr).split(self.header_delimiter)
                sub = src.take(pa.array(rows))
                cols, sub_ok = self._parse_group(sub, header)
                ok[rows] = sub_ok
                for name, col in zip(header, cols):
                    if name not in out_cols:
                        out_cols[name] = np.full(n, None, dtype=object)
                    out_cols[name][rows] = col.to_numpy(zero_copy_only=False)
            for name, vals in out_cols.items():
                batch = batch.append_column(self.prefix + name,
                                            pa.array(vals, pa.string()))
        if self.on_error.startswith("drop"):
            batch = batch.filter(pa.array(ok))
        return batch

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("uri_parser")
class UriParser:
    """stanza uri_parser (parser/uri, wraps internal/parseutils
    ParseURI, uri.go:22-127): scheme/user/host/port/path/query columns
    via one RE2 named-group pass. Accepts the same request-URI shapes
    as url.ParseRequestURI — absolute (`https://u:p@h:443/p?q`),
    relative (`/p?q`), and bare query (`?q`) — and rejects bare words.
    Flat-model adaptation: ``query`` is the raw query string (the
    reference explodes it into a map of value lists; a fixed Arrow
    schema keeps the string — split downstream with ParseKeyValue),
    and absent components are null rather than omitted keys."""

    URI_REGEX = (
        r"^(?:(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
        r"(?:(?P<user>[^:@/?#]*)(?::[^@/?#]*)?@)?"
        r"(?P<host>[^/:?#]+)(?::(?P<port>\d+))?)?"
        r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#.*)?$"
    )

    def __init__(self, parse_from: str, on_error: str = "send", prefix: str = ""):
        self.parse_from = parse_from
        self.on_error = on_error
        self.prefix = prefix

    def fn(self, batch: pa.Table) -> pa.Table:
        out, ok = _extract_columns(batch, self.URI_REGEX, self.parse_from, {}, self.prefix)
        # RE2 reports non-participating optional groups as "": null
        # them, mirroring the reference's omitted keys (urlToMap
        # excludes unset components)
        p = self.prefix
        for g in ("scheme", "user", "host", "port", "path", "query"):
            col = out[p + g]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = pc.if_else(pc.equal(col, ""),
                             pa.nulls(len(col), pa.string()), col)
            out = out.set_column(out.schema.get_field_index(p + g), p + g, col)
        # the all-optional regex matches the empty string; ParseURI
        # requires SOME recognized component (scheme, path or query)
        some = pc.or_(pc.or_(pc.is_valid(out[p + "scheme"]),
                             pc.is_valid(out[p + "path"])),
                      pc.is_valid(out[p + "query"]))
        if isinstance(ok, pa.ChunkedArray):
            ok = ok.combine_chunks()
        ok = pc.and_(ok, some.combine_chunks()
                     if isinstance(some, pa.ChunkedArray) else some)
        if self.on_error.startswith("drop"):
            return out.filter(ok)
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("trace_parser")
class TraceParser:
    """stanza trace_parser (helper/trace.go): hex-decode trace/span id
    strings into binary columns + validity flags."""

    def __init__(self, trace_col: str | None = None, span_col: str | None = None):
        self.trace_col = trace_col
        self.span_col = span_col

    _NIBBLE = None  # lazy 256-entry hex-char -> nibble lookup

    @classmethod
    def _hex_decode(cls, arr: pa.Array, width: int) -> pa.Array:
        """Vectorized fixed-width hex decode: regex validity mask, then
        a nibble lookup over the raw utf8 buffer — no Python per row."""
        import numpy as np

        if cls._NIBBLE is None:
            t = np.zeros(256, dtype=np.uint8)
            for i, c in enumerate(b"0123456789abcdef"):
                t[c] = i
            for i, c in enumerate(b"ABCDEF"):
                t[c] = 10 + i
            cls._NIBBLE = t
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = pc.match_substring_regex(
            pc.fill_null(pc.cast(arr, pa.string()), ""), rf"^[0-9a-fA-F]{{{2 * width}}}$"
        )
        hexes = pc.fill_null(arr, "").combine_chunks() if isinstance(arr, pa.ChunkedArray) else pc.fill_null(arr, "")
        good = pc.filter(hexes, valid)
        n_good = len(good)
        if n_good:
            bufs = good.buffers()
            offs = np.frombuffer(bufs[1], "<i4", count=n_good + 1, offset=good.offset * 4)
            data = np.frombuffer(bufs[2], np.uint8)
            idx = offs[:-1, None] + np.arange(2 * width)[None, :]
            nib = cls._NIBBLE[data[idx]]
            raw = (nib[:, 0::2] << 4 | nib[:, 1::2]).tobytes()
        else:
            raw = b""
        valid_np = valid.to_numpy(zero_copy_only=False).astype(bool)
        n = len(valid_np)
        # scatter decoded bytes into a fixed_size_binary buffer
        out_buf = np.zeros((n, width), dtype=np.uint8)
        if n_good:
            out_buf[valid_np] = np.frombuffer(raw, np.uint8).reshape(n_good, width)
        bitmap = np.packbits(valid_np, bitorder="little")
        fsb = pa.Array.from_buffers(
            pa.binary(width), n,
            [pa.py_buffer(bitmap.tobytes()), pa.py_buffer(out_buf.tobytes())],
            null_count=int((~valid_np).sum()),
        )
        return fsb.cast(pa.binary())

    def fn(self, batch: pa.Table) -> pa.Table:
        for col_name, width, out in [
            (self.trace_col, 16, "trace_id"),
            (self.span_col, 8, "span_id"),
        ]:
            if col_name is None:
                continue
            batch = batch.append_column(out, self._hex_decode(batch[col_name], width))
        return batch

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("jsonarray_parser")
class JsonArrayParser:
    """stanza jsonarray parser (parser/jsonarray): parse a JSON-array
    string into positionally indexed typed columns."""

    def __init__(self, parse_from: str, fields: list[tuple[str, Any]], on_error: str = "send"):
        import json

        self._loads = json.loads
        self.parse_from = parse_from
        self.fields = [(n, pa.type_for_alias(t) if isinstance(t, str) else t) for n, t in fields]
        self.on_error = on_error

    def fn(self, batch: pa.Table) -> pa.Table:
        src = batch[self.parse_from].to_pylist()
        cols: list[list] = [[] for _ in self.fields]
        ok = []
        for s in src:
            try:
                arr = self._loads(s)
                assert isinstance(arr, list)
                for i in range(len(self.fields)):
                    cols[i].append(arr[i] if i < len(arr) else None)
                ok.append(True)
            except (TypeError, ValueError, AssertionError):
                for c in cols:
                    c.append(None)
                ok.append(False)
        for (name, typ), vals in zip(self.fields, cols):
            batch = batch.append_column(name, pa.array(vals, type=typ))
        if self.on_error.startswith("drop"):
            batch = batch.filter(pa.array(ok))
        return batch

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("severity_parser")
class SeverityParserStage:
    """Standalone severity_parser (parser/severity/parser.go:1-26)
    with the full config surface (helper/severity_builder.go:107-161):
    ``preset`` ("none"/"otel"/"aliases"/default), custom ``mapping``
    (alias keys; str / int / list / {"min","max"} / "2xx".."5xx"
    values) and ``overwrite_text``. Maps a token or integer column to
    severity_number/_text. The legacy ``range_map`` arg (pre-round-4
    interval shorthand) is still accepted."""

    def __init__(
        self,
        parse_from: str,
        range_map: dict[str, str] | None = None,
        out_prefix: str = "severity",
        preset: str | None = None,
        mapping: dict | None = None,
        overwrite_text: bool = False,
    ):
        from ..functions.severity import SeverityFinder

        self.parse_from = parse_from
        self.out_prefix = out_prefix
        if range_map is not None:
            self.mapper = SeverityMapper(range_map=range_map)
            self.finder = None
        else:
            self.mapper = None
            self.finder = SeverityFinder(preset=preset, mapping=mapping,
                                         overwrite_text=overwrite_text)

    def fn(self, batch: pa.Table) -> pa.Table:
        col = batch[self.parse_from]
        if self.mapper is not None:  # legacy interval path
            num = self.mapper.map_ints(col)
            text = SeverityMapper.number_to_text(num)
        else:
            num, text = self.finder.find_array(col)
        return batch.append_column(
            f"{self.out_prefix}_number", num
        ).append_column(f"{self.out_prefix}_text", text)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("scope_name_parser")
class ScopeNameParser:
    """stanza scope_name_parser (parser/scope/parser.go over
    helper/scope_name.go:26-46): copy a string field into the
    ``scope_name`` column (InstrumentationScope.Name); non-string
    input is a per-row error (null under send)."""

    def __init__(self, parse_from: str, out_col: str = "scope_name"):
        self.parse_from = parse_from
        self.out_col = out_col

    def fn(self, batch: pa.Table) -> pa.Table:
        col = batch[self.parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return batch.append_column(self.out_col, pc.cast(col, pa.string()))

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


@register("noop")
class Noop:
    """stanza noop (transformer/noop): identity pass-through — kept so
    reference operator chains paste unchanged."""

    def __init__(self, **_ignored):
        pass

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds
