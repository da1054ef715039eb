"""OTTL-lite transform stage — a statement list fused into ONE map_batches.

Reimplements the transformprocessor execution model (reference:
processor/transformprocessor/internal/logs/processor.go:53-67 — run
statements in order over every record; pkg/ottl/parser.go:411-425
StatementSequence) as a compiled sequence of vectorized column ops.
``where`` conditions become Arrow boolean masks; a statement mutates
only masked rows via ``pc.if_else`` (the vectorized equivalent of the
per-record condition gate). ``error_mode='ignore'`` masks rows whose
conversion failed out of the mutation instead of failing the stream
(pkg/ottl/config.go ErrorMode semantics).

Implemented editors/functions (the subset the north-star slice needs,
names mirror pkg/ottl/ottlfuncs/func_*.go):
  set, delete_keys, keep_keys, rename, copy, concat,
  replace_pattern, extract_patterns, truncate_time, format_time,
  upper, lower, substring, truncate_all, coalesce, hash, cast
plus stanza equivalents add/remove/retain/move/copy
(pkg/stanza/operator/transformer/{add,remove,retain,move,copy}).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..expr import Col, compile_predicate, resolve_col
from ..functions.hashing import md5_number_lower_arrow
from . import register


def _val(tbl: pa.Table, v: Any):
    if isinstance(v, Col):
        return resolve_col(tbl, v.name)
    return v


def _set_col(tbl: pa.Table, name: str, values) -> pa.Table:
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array([values] * tbl.num_rows)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if name in tbl.column_names:
        i = tbl.column_names.index(name)
        return tbl.set_column(i, name, values)
    return tbl.append_column(name, values)


def _masked(tbl: pa.Table, name: str, new_vals, mask) -> pa.Table:
    """Apply new values only where mask is true (OTTL `where`). A set
    that matches nothing still creates the column (all null): in the
    columnar model "attribute absent" IS a null cell — a data-
    dependent column set would give batches ragged schemas."""
    if mask is None:
        return _set_col(tbl, name, new_vals)
    if not isinstance(new_vals, (pa.Array, pa.ChunkedArray)):
        new_vals = pa.array([new_vals] * tbl.num_rows)
    if name in tbl.column_names:
        old = tbl[name]
        if isinstance(old, pa.ChunkedArray):
            old = old.combine_chunks()
        old = pc.cast(old, new_vals.type) if old.type != new_vals.type else old
    else:
        old = pa.nulls(tbl.num_rows, new_vals.type)
    return _set_col(tbl, name, pc.if_else(mask, new_vals, old))


class Statement:
    """One compiled OTTL-like statement: editor(args) where condition."""

    # editors that rewrite the COLUMN SET — a row-level `where` would
    # need per-row schemas; rejected at compile time (config error)
    _SCHEMA_LEVEL = {"flatten_all", "set_all", "limit_table"}

    def __init__(self, editor: str, args: dict[str, Any], where: Any = None):
        self.editor = editor
        self.args = args
        if where is not None and (
                editor in self._SCHEMA_LEVEL
                or (editor == "replace_all_patterns"
                    and args.get("mode") == "key")):
            raise ValueError(
                f"{editor} rewrites the whole attribute set and cannot "
                "be row-masked with `where` in the columnar model")
        self.mask_fn = compile_predicate(where) if where is not None else None
        self._fn = getattr(self, "_op_" + editor, None)
        if self._fn is None:
            raise ValueError(f"unknown editor {editor!r}")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        mask = self.mask_fn(tbl) if self.mask_fn is not None else None
        return self._fn(tbl, mask, **self.args)

    # --- editors (mutating, func_set.go / func_delete_key.go / ...) ---

    def _op_set(self, tbl, mask, target: str, value: Any):
        # pkg/ottl setters IGNORE nil values (e2e corpus:
        # `set(attributes["test"], nil)` leaves the record unchanged)
        if value is None:
            return tbl
        return _masked(tbl, target, _val(tbl, value), mask)

    def _op_delete_keys(self, tbl, mask, keys: list[str]):
        return tbl.drop_columns([k for k in keys if k in tbl.column_names])

    def _op_null_value(self, tbl, mask, target: str):
        # per-RECORD attribute delete (attributesprocessor delete under
        # an include/exclude MatchConfig gate): null the value on
        # masked rows only — the column must survive for the rest,
        # unlike delete_keys' whole-column drop
        if target not in tbl.column_names:
            return tbl
        c = tbl[target]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if mask is None:
            vals = pa.nulls(tbl.num_rows, c.type)
        else:
            vals = pc.if_else(mask, pa.nulls(tbl.num_rows, c.type), c)
        return tbl.set_column(tbl.column_names.index(target), target, vals)

    def _op_keep_keys(self, tbl, mask, keys: list[str]):
        return tbl.select([k for k in keys if k in tbl.column_names])

    def _op_delete_matching_keys(self, tbl, mask, pattern: str):
        # func_delete_matching_keys.go: drop columns whose NAME matches
        import re as _re

        rx = _re.compile(pattern)
        drop = [c for c in tbl.column_names if rx.search(c)]
        return tbl.drop_columns(drop) if drop else tbl

    def _op_keep_matching_keys(self, tbl, mask, pattern: str):
        # func_keep_matching_keys.go: keep only matching columns
        import re as _re

        rx = _re.compile(pattern)
        keep = [c for c in tbl.column_names if rx.search(c)]
        return tbl.select(keep)

    def _op_rename(self, tbl, mask, src: str, dst: str):
        # stanza move (transformer/move/transformer.go:31-37)
        names = [dst if n == src else n for n in tbl.column_names]
        return tbl.rename_columns(names)

    def _op_copy(self, tbl, mask, src: str, dst: str):
        # a missing source reads as nil, and nil sets are ignored
        # (corpus: `set(attributes["test"], attributes["unknown"])`)
        try:
            v = _val(tbl, Col(src))
        except KeyError:
            return tbl
        return _masked(tbl, dst, v, mask)

    def _op_concat(self, tbl, mask, target: str, parts: list[Any], sep: Any = ""):
        from ..expr import _value as _expr_value

        arrs = []
        for p in parts:
            # _expr_value also evaluates nested converter dicts
            # (Concat(["x", SHA256(col)], "-") through the front-end)
            v = _expr_value(tbl, p, tbl.num_rows)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([str(v)] * tbl.num_rows)
            arrs.append(pc.cast(v, pa.string()))
        # Concat(parts, attributes["delim"]): the separator may be a
        # path — binary_join_element_wise takes an array separator
        if isinstance(sep, Col):
            sep = pc.cast(_val(tbl, sep), pa.string())
        out = pc.binary_join_element_wise(*arrs, sep)
        return _masked(tbl, target, out, mask)

    def _op_replace_pattern(self, tbl, mask, target: str, pattern: str, replacement: str, src: str | None = None):
        src_col = _val(tbl, Col(src or target))
        out = pc.replace_substring_regex(src_col, pattern=pattern, replacement=replacement)
        return _masked(tbl, target, out, mask)

    def _op_extract_patterns(self, tbl, mask, src: str, pattern: str, prefix: str = ""):
        res = pc.extract_regex(_val(tbl, Col(src)), pattern=pattern)
        for f in res.type:
            tbl = _masked(tbl, prefix + f.name, pc.struct_field(res, f.name), mask)
        return tbl

    def _op_truncate_time(self, tbl, mask, target: str, unit: str | None = None,
                          src: str | None = None, nanos: int | None = None):
        col_ = _val(tbl, Col(src or target))
        if nanos is not None:
            # arbitrary granularity (time.Time.Truncate semantics:
            # floor since the zero time, i.e. epoch math in UTC)
            as_ns = pc.cast(pc.cast(col_, pa.timestamp("ns", "UTC")
                                    if getattr(col_.type, "tz", None)
                                    else pa.timestamp("ns")), pa.int64())
            floored = pc.multiply(pc.divide(as_ns, nanos), nanos)
            out = pc.cast(floored, pa.timestamp("ns")).cast(col_.type)
        else:
            out = pc.floor_temporal(col_, unit=unit)
        return _masked(tbl, target, out, mask)

    def _op_format_time(self, tbl, mask, target: str, src: str, format: str):
        out = pc.strftime(_val(tbl, Col(src)), format=format)
        return _masked(tbl, target, out, mask)

    def _op_upper(self, tbl, mask, target: str, src: str | None = None):
        return _masked(tbl, target, pc.utf8_upper(_val(tbl, Col(src or target))), mask)

    def _op_lower(self, tbl, mask, target: str, src: str | None = None):
        return _masked(tbl, target, pc.utf8_lower(_val(tbl, Col(src or target))), mask)

    def _op_substring(self, tbl, mask, target: str, src: str, start: int, length: int,
                      utf8_safe: bool = False):
        if utf8_safe:
            # func_substring.go utf8Safe mode: BYTE offsets, snapped to
            # rune boundaries (start forward, end backward); a range
            # past the byte length errors like the reference.
            # Vectorized over the raw utf8 buffer: boundary snapping is
            # at most 3 steps (UTF-8 continuation bytes), unrolled.
            col_ = _val(tbl, Col(src))
            if isinstance(col_, pa.ChunkedArray):
                col_ = col_.combine_chunks()
            n = tbl.num_rows
            offs = np.frombuffer(col_.buffers()[1], np.int32)[
                col_.offset:col_.offset + n + 1].astype(np.int64)
            buf = np.frombuffer(col_.buffers()[2], np.uint8) \
                if col_.buffers()[2] is not None else np.empty(0, np.uint8)
            lens = np.diff(offs)
            valid = pc.is_valid(col_).to_numpy(zero_copy_only=False)
            if ((start > lens[valid]) | (length > lens[valid] - start)).any():
                raise pa.ArrowInvalid("invalid range for substring function")
            is_cont = np.zeros(len(buf) + 1, bool)
            if len(buf):
                is_cont[:-1] = (buf & 0xC0) == 0x80
            b = offs[:-1] + start
            for _ in range(3):  # snap start forward to a rune start
                b = np.where((b < offs[1:]) & is_cont[np.minimum(b, len(buf))],
                             b + 1, b)
            e = offs[:-1] + start + length
            for _ in range(3):  # snap end back while it splits a rune
                e = np.where((b < e) & (e < offs[1:])
                             & is_cont[np.minimum(e, len(buf))], e - 1, e)
            e = np.maximum(b, e)
            out_lens = np.where(valid, e - b, 0)
            new_offs = np.zeros(n + 1, np.int64)
            np.cumsum(out_lens, out=new_offs[1:])
            # gather the [b, e) byte ranges
            take = np.repeat(b, out_lens) + (
                np.arange(int(new_offs[-1])) - np.repeat(new_offs[:-1], out_lens))
            data = buf[take] if len(take) else np.empty(0, np.uint8)
            out = pa.Array.from_buffers(
                pa.utf8(), n,
                [None, pa.py_buffer(new_offs.astype(np.int32).tobytes()),
                 pa.py_buffer(data.tobytes())])
            out = pc.if_else(pa.array(valid), out, pa.nulls(n, pa.string()))
            return _masked(tbl, target, out, mask)
        col_ = _val(tbl, Col(src))
        # func_substring.go:47-67 errors on out-of-range; the per-ROW
        # error shape here is NULL (Go skips the record under
        # error_mode=ignore — a batch-level raise would skip the whole
        # statement for every row). utf8_safe keeps the hard error.
        if start < 0 or length <= 0:
            raise pa.ArrowInvalid("invalid start/length for substring")
        ok = pc.fill_null(
            pc.greater_equal(pc.utf8_length(col_), start + length), False)
        out = pc.utf8_slice_codeunits(col_, start=start, stop=start + length)
        out = pc.if_else(ok, out, pa.nulls(tbl.num_rows, pa.string()))
        return _masked(tbl, target, out, mask)

    def _op_truncate_all(self, tbl, mask, keys: list[str] | None, limit: int):
        # func_truncate_all.go: cap string lengths; keys=None = every
        # string column (context-wide truncate_all(attributes, N))
        if keys is None:
            keys = [c for c in tbl.column_names
                    if pa.types.is_string(tbl.schema.field(c).type)]
        for k in keys:
            if k in tbl.column_names and pa.types.is_string(tbl.schema.field(k).type):
                tbl = _masked(tbl, k, pc.utf8_slice_codeunits(_val(tbl, Col(k)), start=0, stop=limit), mask)
        return tbl

    def _op_coalesce(self, tbl, mask, target: str, sources: list[Any], default: Any = None):
        acc = None
        for s in sources:
            # a missing source column reads as all-null (so attributes
            # `insert` CREATES absent keys — its whole purpose,
            # attraction.go INSERT — instead of KeyError-cancelling the
            # statement under error_mode='ignore')
            if isinstance(s, Col) and s.name not in tbl.column_names:
                continue
            v = _val(tbl, s)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * tbl.num_rows)
            acc = v if acc is None else pc.coalesce(acc, v)
        if acc is None:
            acc = pa.nulls(tbl.num_rows)
            if default is not None:
                acc = pa.array([default] * tbl.num_rows)
            return _masked(tbl, target, acc, mask)
        if default is not None:
            acc = pc.fill_null(acc, default)
        return _masked(tbl, target, acc, mask)

    def _op_hash(self, tbl, mask, target: str, src: str):
        # MD5-derived u64 (functions/hashing.py) — DuckDB-reproducible
        return _masked(tbl, target, md5_number_lower_arrow(_val(tbl, Col(src))), mask)

    def _op_cast(self, tbl, mask, target: str, to: str, src: str | None = None):
        col_ = _val(tbl, Col(src or target))
        typ = pa.type_for_alias(to)
        try:
            out = pc.cast(col_, typ, safe=False)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            in_place = src is None or src == target
            if in_place or not (
                    pa.types.is_string(col_.type)
                    and (pa.types.is_integer(typ) or pa.types.is_floating(typ))):
                # in-place casts keep the raise: Go's ignore mode keeps
                # the ORIGINAL record value, and a single Arrow column
                # cannot mix cast/uncast types — statement-skip is the
                # faithful columnar shape (round-1 pinned behavior)
                raise
            # NEW-column casts over dirty strings: Go leaves the attr
            # absent on the errored record — null per row here
            num_re = (r"^[+-]?\d+$" if pa.types.is_integer(typ)
                      else r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
            ok = pc.fill_null(pc.match_substring_regex(col_, num_re), False)
            safe_src = pc.if_else(ok, col_, pa.scalar("0"))
            out = pc.if_else(ok, pc.cast(safe_src, typ, safe=False),
                             pa.nulls(tbl.num_rows, typ))
        return _masked(tbl, target, out, mask)

    def _op_flatten(self, tbl, mask, src: str, prefix: str = "", drop: bool = True):
        # OTTL flatten / stanza flatten: promote a struct column's
        # fields to top-level columns (one nesting level)
        col_ = _val(tbl, Col(src))
        for f in col_.type:
            tbl = _set_col(tbl, (prefix or "") + f.name, pc.struct_field(col_, f.name))
        if drop:
            tbl = tbl.drop_columns([src])
        return tbl

    def _op_unquote(self, tbl, mask, target: str, src: str | None = None,
                    on_error: str = "send"):
        # stanza unquote (transformer/unquote) = Go strconv.Unquote:
        # double-quoted and back-quoted strings unquote; a SINGLE
        # quote pair unquotes only a single character ('v' -> v,
        # 'val' -> invalid syntax); anything else (incl. bare
        # unquoted values) is a per-row error — kept unchanged under
        # on_error=send (the stanza default), raised under propagate.
        col_ = _val(tbl, Col(src or target))
        s = pc.cast(col_, pa.string())
        dq = pc.struct_field(
            pc.extract_regex(s, pattern=r'^"(?P<q>[^"\\]*)"$'), "q")
        bq = pc.struct_field(
            pc.extract_regex(s, pattern=r"^`(?P<b>[^`]*)`$"), "b")
        sq = pc.struct_field(
            pc.extract_regex(s, pattern=r"^'(?P<s>[^'\\])'$"), "s")
        out = pc.coalesce(dq, bq, sq)
        # double-quoted values containing escapes take the per-row Go
        # escape path (rows with a backslash only)
        esc = pc.and_(pc.match_substring(s, "\\"),
                      pc.match_substring_regex(s, r'^".*"$'))
        if pc.any(pc.fill_null(esc, False)).as_py():
            import codecs

            vals = out.to_numpy(zero_copy_only=False).astype(object)
            for i in np.nonzero(esc.to_numpy(zero_copy_only=False))[0]:
                inner = s[int(i)].as_py()[1:-1]
                try:
                    vals[int(i)] = codecs.decode(inner, "unicode_escape")
                except Exception:
                    pass  # stays invalid
            out = pa.array(vals, pa.string())
        bad = pc.and_(pc.is_valid(s), pc.is_null(out))
        if on_error == "propagate" and pc.any(bad).as_py():
            i = int(np.argmax(bad.to_numpy(zero_copy_only=False)))
            raise ValueError(f"invalid syntax: cannot unquote {s[i].as_py()!r}")
        out = pc.coalesce(out, col_)  # send: error rows unchanged
        return _masked(tbl, target, out, mask)

    @staticmethod
    def _to_valid_utf8(b: bytes) -> str:
        # Go strings.ToValidUTF8 (used by transformer/sanitizeutf8):
        # each RUN of invalid bytes becomes ONE U+FFFD
        # (transformer_test.go: "\xfe\xfe" -> one replacement,
        # "\xfe and another \xfe" -> two) — Python's errors="replace"
        # would emit one per byte, so scan sequences explicitly
        out: list[str] = []
        i, n = 0, len(b)
        in_bad = False
        while i < n:
            c = b[i]
            ln = (1 if c < 0x80 else 2 if 0xC2 <= c <= 0xDF
                  else 3 if 0xE0 <= c <= 0xEF else 4 if 0xF0 <= c <= 0xF4
                  else 0)
            if ln:
                seq = b[i:i + ln]
                try:
                    out.append(seq.decode("utf-8"))
                    in_bad = False
                    i += ln
                    continue
                except UnicodeDecodeError:
                    pass
            if not in_bad:
                out.append("�")
                in_bad = True
            i += 1
        return "".join(out)

    def _op_sanitize_utf8(self, tbl, mask, target: str, src: str | None = None):
        # stanza sanitizeutf8: repair invalid byte sequences (U+FFFD)
        col_ = _val(tbl, Col(src or target))
        if pa.types.is_string(col_.type):
            return _masked(tbl, target, col_, mask)  # already valid UTF-8
        fixed = [self._to_valid_utf8(b) if isinstance(b, (bytes, bytearray))
                 else b for b in col_.to_pylist()]
        return _masked(tbl, target, pa.array(fixed, pa.string()), mask)

    def _op_trim(self, tbl, mask, target: str, src: str | None = None, chars: str | None = None):
        col = _val(tbl, Col(src or target))
        out = pc.utf8_trim(col, characters=chars) if chars else pc.utf8_trim_whitespace(col)
        return _masked(tbl, target, out, mask)

    def _op_len(self, tbl, mask, target: str, src: str):
        # func_len.go is polymorphic: string length, slice/map length,
        # struct field count (fixed per schema)
        col_ = _val(tbl, Col(src))
        if pa.types.is_list(col_.type) or pa.types.is_map(col_.type):
            out = pc.list_value_length(col_)
        elif pa.types.is_struct(col_.type):
            out = pa.array([col_.type.num_fields] * tbl.num_rows)
        else:
            out = pc.utf8_length(col_)
        return _masked(tbl, target, pc.cast(out, pa.int64()), mask)

    # --- hash / encode converters (pkg/ottl/ottlfuncs func_sha*/md5/
    #     base64/hex/uuid) — vectorized kernels in functions/encode ---

    def _op_sha1(self, tbl, mask, target: str, src: str):
        from ..functions.encode import sha1_hex

        return _masked(tbl, target, sha1_hex(_val(tbl, Col(src))), mask)

    def _op_sha256(self, tbl, mask, target: str, src: str):
        from ..functions.encode import sha256_hex

        return _masked(tbl, target, sha256_hex(_val(tbl, Col(src))), mask)

    def _op_sha512(self, tbl, mask, target: str, src: str):
        from ..functions.encode import sha512_hex

        return _masked(tbl, target, sha512_hex(_val(tbl, Col(src))), mask)

    def _op_md5_hex(self, tbl, mask, target: str, src: str):
        from ..functions.encode import md5_hex

        return _masked(tbl, target, md5_hex(_val(tbl, Col(src))), mask)

    def _op_base64_encode(self, tbl, mask, target: str, src: str):
        from ..functions.encode import base64_encode

        return _masked(tbl, target, base64_encode(_val(tbl, Col(src))), mask)

    def _op_base64_decode(self, tbl, mask, target: str, src: str):
        from ..functions.encode import base64_decode

        return _masked(tbl, target, base64_decode(_val(tbl, Col(src))), mask)

    def _op_hex_encode(self, tbl, mask, target: str, src: str):
        from ..functions.encode import hex_encode

        return _masked(tbl, target, hex_encode(_val(tbl, Col(src))), mask)

    def _op_murmur3(self, tbl, mask, target: str, src: str):
        from ..functions.encode import murmur3_32_hex

        return _masked(tbl, target, murmur3_32_hex(_val(tbl, Col(src))), mask)

    def _op_murmur3_128(self, tbl, mask, target: str, src: str):
        from ..functions.encode import murmur3_128_hex

        return _masked(tbl, target, murmur3_128_hex(_val(tbl, Col(src))), mask)

    def _op_xxh3(self, tbl, mask, target: str, src: str):
        from ..functions.xxh import xxh3_64_hex

        return _masked(tbl, target, xxh3_64_hex(_val(tbl, Col(src))), mask)

    def _op_xxh128(self, tbl, mask, target: str, src: str):
        from ..functions.xxh import xxh128_hex

        return _masked(tbl, target, xxh128_hex(_val(tbl, Col(src))), mask)

    def _op_uuid(self, tbl, mask, target: str):
        from ..functions.encode import uuid4_strings

        return _masked(tbl, target, uuid4_strings(tbl.num_rows), mask)

    def _op_uuid7(self, tbl, mask, target: str, src: str,
                  entropy_cols: list[str] | None = None):
        # func_uuid_v7.go generates wall-clock v7 ids; a deterministic
        # engine derives the 48-bit millisecond prefix from a
        # TIMESTAMP COLUMN and the 74 random bits from a per-row md5
        # of entropy columns (default: the timestamp itself + row
        # position) — v7's time-sortable layout with reproducible runs
        from ..functions.hashing import md5_number_lower_arrow

        n = tbl.num_rows
        ts = _val(tbl, Col(src))
        ms = pc.cast(pc.cast(ts, pa.timestamp("ms")), pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        ent_parts = [pc.cast(_val(tbl, Col(c)), pa.string())
                     for c in (entropy_cols or [src])]
        ent_parts.append(pa.array(np.arange(n).astype(str)))
        ent = pc.binary_join_element_wise(*ent_parts, "|")
        h = md5_number_lower_arrow(ent).to_numpy(zero_copy_only=False)
        b = np.zeros((n, 16), dtype=np.uint8)
        for i in range(6):  # 48-bit big-endian unix ms
            b[:, i] = (ms >> (8 * (5 - i))) & 0xFF
        b[:, 6] = 0x70 | ((h >> 60) & 0x0F).astype(np.uint8)  # version 7
        b[:, 7] = (h >> 52) & 0xFF
        b[:, 8] = 0x80 | ((h >> 46) & 0x3F).astype(np.uint8)  # variant 10
        for i in range(9, 16):
            b[:, i] = (h >> (8 * (15 - i))) & 0xFF
        hx = np.empty((n, 32), dtype=np.uint8)
        hex_lut = np.frombuffer(b"0123456789abcdef", np.uint8)
        hx[:, 0::2] = hex_lut[b >> 4]
        hx[:, 1::2] = hex_lut[b & 0x0F]
        canon = np.full((n, 36), ord("-"), dtype=np.uint8)
        canon[:, 0:8] = hx[:, 0:8]
        canon[:, 9:13] = hx[:, 8:12]
        canon[:, 14:18] = hx[:, 12:16]
        canon[:, 19:23] = hx[:, 16:20]
        canon[:, 24:36] = hx[:, 20:32]
        out = pa.Array.from_buffers(
            pa.binary(36), n, [None, pa.py_buffer(canon.tobytes())]
        ).cast(pa.string())
        return _masked(tbl, target, out, mask)

    # --- collection converters (func_sort/keys/values/index/
    #     slice_to_map/delete_index/flatten on LIST columns) ---

    @staticmethod
    def _list_parts(col_) -> tuple[np.ndarray, pa.Array]:
        """(int64 offsets, flat values) of a list column."""
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        offs = col_.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        return offs, col_.flatten()

    def _op_list_sort(self, tbl, mask, target: str, src: str, order: str = "asc"):
        # func_sort.go: Sort(target, "asc"|"desc") element sort per row
        col_ = _val(tbl, Col(src))
        offs, flat = self._list_parts(col_)
        vals = flat.to_numpy(zero_copy_only=False)
        n_rows = len(offs) - 1
        row_of = np.repeat(np.arange(n_rows), np.diff(offs))
        order_idx = np.lexsort((vals, row_of))
        if order == "desc":
            # reverse each row's run of the ascending order
            starts = offs[:-1]
            lens = np.diff(offs)
            pos = np.arange(len(vals)) - np.repeat(starts, lens)
            order_idx = order_idx[np.repeat(starts, lens) + np.repeat(lens - 1, lens) - pos]
        sorted_flat = flat.take(pa.array(order_idx))
        out = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), sorted_flat)
        return _masked(tbl, target, out, mask)

    def _op_list_index(self, tbl, mask, target: str, src: str, index: int):
        # func_index.go: out-of-range yields null
        col_ = _val(tbl, Col(src))
        n = pc.list_value_length(col_)
        sliced = pc.list_flatten(pc.list_slice(col_, start=index, stop=index + 1,
                                               return_fixed_size_list=True))
        ok = pc.fill_null(pc.greater(n, index), False)
        out = pc.if_else(ok, sliced, pa.nulls(tbl.num_rows, sliced.type))
        return _masked(tbl, target, out, mask)

    def _op_list_position(self, tbl, mask, target: str, src: str, value: Any):
        # func_index.go over a slice: position of the first element
        # equal to ``value``, -1 when absent (Go strings.Index shape)
        offs, flat, keep = self._list_elem_mask(tbl, src, "==", value)
        lens = np.diff(offs)
        pos = np.arange(len(keep)) - np.repeat(offs[:-1], lens)
        big = np.where(keep, pos, np.iinfo(np.int64).max)
        first = np.minimum.reduceat(np.append(big, np.iinfo(np.int64).max),
                                    offs[:-1]) if len(offs) > 1 \
            else np.empty(0, np.int64)
        first = np.where(lens == 0, np.iinfo(np.int64).max, first)
        out = np.where(first == np.iinfo(np.int64).max, -1, first)
        return _masked(tbl, target, pa.array(out.astype(np.int64)), mask)

    def _op_list_len(self, tbl, mask, target: str, src: str):
        out = pc.cast(pc.list_value_length(_val(tbl, Col(src))), pa.int64())
        return _masked(tbl, target, out, mask)

    def _op_list_filter(self, tbl, mask, target: str, src: str, op: str, value: Any):
        # OTTL Filter-like element predicate: keep elements where
        # <element> <op> <value>
        cmp = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
               ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal,
               "match": lambda a, v: pc.match_substring_regex(a, pattern=v)}[op]
        col_ = _val(tbl, Col(src))
        offs, flat = self._list_parts(col_)
        keep = pc.fill_null(cmp(flat, value), False).to_numpy(zero_copy_only=False)
        new_flat = flat.filter(pa.array(keep))
        kept_per_row = np.add.reduceat(keep.astype(np.int64), offs[:-1]) \
            if len(keep) else np.zeros(len(offs) - 1, np.int64)
        kept_per_row[np.diff(offs) == 0] = 0  # reduceat artifacts on empty rows
        new_offs = np.zeros(len(offs), dtype=np.int64)
        np.cumsum(kept_per_row, out=new_offs[1:])
        out = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), new_flat)
        return _masked(tbl, target, out, mask)

    def _list_elem_mask(self, tbl, src: str, op: str, value: Any):
        cmp = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
               ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal,
               "match": lambda a, v: pc.match_substring_regex(a, pattern=v)}[op]
        col_ = _val(tbl, Col(src))
        offs, flat = self._list_parts(col_)
        if isinstance(value, Col):
            # per-row comparison value: repeat each row's value across
            # its elements (Index(slices, attributes["k"]) shape)
            v = _val(tbl, value)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            value = v.take(pa.array(np.repeat(np.arange(len(offs) - 1),
                                              np.diff(offs))))
        keep = pc.fill_null(cmp(flat, value), False).to_numpy(zero_copy_only=False)
        return offs, flat, keep

    def _op_list_any(self, tbl, mask, target: str, src: str, op: str, value: Any):
        # OTTL Any(): true when ANY element matches the predicate
        offs, _, keep = self._list_elem_mask(tbl, src, op, value)
        hits = np.add.reduceat(keep.astype(np.int64), offs[:-1]) if len(keep) \
            else np.zeros(len(offs) - 1, np.int64)
        hits[np.diff(offs) == 0] = 0
        return _masked(tbl, target, pa.array(hits > 0), mask)

    def _op_list_all(self, tbl, mask, target: str, src: str, op: str, value: Any):
        # OTTL All(): true when EVERY element matches (true for empty)
        offs, _, keep = self._list_elem_mask(tbl, src, op, value)
        lens = np.diff(offs)
        hits = np.add.reduceat(keep.astype(np.int64), offs[:-1]) if len(keep) \
            else np.zeros(len(offs) - 1, np.int64)
        hits[lens == 0] = 0
        return _masked(tbl, target, pa.array(hits == lens), mask)

    def _op_list_find(self, tbl, mask, target: str, src: str, op: str, value: Any):
        # OTTL Find(): the FIRST matching element, null when none
        offs, flat, keep = self._list_elem_mask(tbl, src, op, value)
        lens = np.diff(offs)
        pos = np.arange(len(keep)) - np.repeat(offs[:-1], lens)
        # first matching position per row: min over matching positions
        big = np.where(keep, pos, np.iinfo(np.int64).max)
        first = np.minimum.reduceat(big, offs[:-1]) if len(keep) \
            else np.full(len(offs) - 1, np.iinfo(np.int64).max)
        first[lens == 0] = np.iinfo(np.int64).max
        found = first != np.iinfo(np.int64).max
        idx = np.where(found, offs[:-1] + np.where(found, first, 0), 0)
        vals = flat.take(pa.array(idx)) if len(flat) else pa.nulls(len(lens), flat.type)
        out = pc.if_else(pa.array(found), vals, pa.nulls(len(lens), vals.type))
        return _masked(tbl, target, out, mask)

    def _op_delete_index(self, tbl, mask, target: str, src: str,
                         index: int | None = None, end_index: int | None = None,
                         from_len: int | None = None,
                         position_of: Any = None):
        # func_delete_index.go: drop element(s) per row.
        #   index               — one literal position
        #   index + end_index   — the [index, end_index) range
        #   from_len=-1         — Len(list) + from_len (delete last)
        #   position_of=value   — Index(list, value) per row
        col_ = _val(tbl, Col(src))
        offs, flat = self._list_parts(col_)
        lens = np.diff(offs)
        pos = np.arange(len(flat)) - np.repeat(offs[:-1], lens)
        if position_of is not None:
            _, _, hit = self._list_elem_mask(tbl, src, "==", position_of)
            big = np.where(hit, pos, np.iinfo(np.int64).max)
            first = np.minimum.reduceat(np.append(big, np.iinfo(np.int64).max),
                                        offs[:-1]) if len(offs) > 1 \
                else np.empty(0, np.int64)
            first = np.where(lens == 0, np.iinfo(np.int64).max, first)
            drop = pos == np.repeat(first, lens)
        elif from_len is not None:
            target_idx = lens + from_len
            drop = pos == np.repeat(target_idx, lens)
        elif end_index is not None:
            drop = (pos >= index) & (pos < end_index)
        else:
            drop = pos == index
        keep = ~drop
        new_flat = flat.filter(pa.array(keep))
        kept_per_row = np.add.reduceat(keep.astype(np.int64), offs[:-1]) \
            if len(keep) else np.zeros(len(offs) - 1, np.int64)
        kept_per_row[lens == 0] = 0
        new_offs = np.zeros(len(offs), dtype=np.int64)
        np.cumsum(kept_per_row, out=new_offs[1:])
        out = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), new_flat)
        return _masked(tbl, target, out, mask)

    def _op_list_flatten_one(self, tbl, mask, target: str, src: str):
        # func_flatten.go depth=1 for list<list<T>> -> list<T>
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        inner = col_.flatten()  # list<T> array
        inner_offs = inner.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        outer_offs = col_.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        new_offs = inner_offs[outer_offs]
        out = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), inner.flatten())
        return _masked(tbl, target, out, mask)

    def _op_keys(self, tbl, mask, target: str, src: str):
        # func_keys.go: map/struct keys as list<string>
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        if pa.types.is_map(col_.type):
            out = pa.ListArray.from_arrays(col_.offsets, col_.keys)
        else:  # struct: fixed schema keys, same list per row
            names = [f.name for f in col_.type]
            out = pa.array([names] * tbl.num_rows, pa.list_(pa.string()))
        return _masked(tbl, target, out, mask)

    def _op_values(self, tbl, mask, target: str, src: str):
        # func_values.go: map/struct values as a list column
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        if pa.types.is_map(col_.type):
            out = pa.ListArray.from_arrays(col_.offsets, col_.items)
        else:
            fields = [pc.cast(pc.struct_field(col_, f.name), pa.string()) for f in col_.type]
            n = tbl.num_rows
            k = len(fields)
            flat = pa.concat_arrays([f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f for f in fields])
            # interleave column-major -> row-major via take
            idx = (np.arange(n * k).reshape(n, k) % k) * n + np.arange(n * k).reshape(n, k) // k
            flat = flat.take(pa.array(idx.reshape(-1)))
            offs = pa.array(np.arange(n + 1, dtype=np.int64) * k, pa.int32())
            out = pa.ListArray.from_arrays(offs, flat)
        return _masked(tbl, target, out, mask)

    def _op_slice_to_map(self, tbl, mask, target: str, src: str,
                         key_field: str | None = None,
                         value_field: str | None = None):
        # func_slice_to_map.go: list -> map.
        #   key_field given  — list<struct> keyed by that field (a
        #                      missing field errors like the reference)
        #   key_field None   — keyed by the element INDEX as a string
        #   value_field      — map values are that field, not the
        #                      whole element
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        flat = col_.flatten()
        if key_field is not None:
            if not pa.types.is_struct(flat.type) or \
                    key_field not in [f.name for f in flat.type]:
                raise pa.ArrowInvalid(
                    f"SliceToMap: could not extract key from element "
                    f"({key_field!r})")
            keys = pc.cast(pc.struct_field(flat, key_field), pa.string())
        else:
            offs = col_.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            pos = np.arange(len(flat)) - np.repeat(offs[:-1], np.diff(offs))
            keys = pc.cast(pa.array(pos), pa.string())
        items = flat
        if value_field is not None:
            if not pa.types.is_struct(flat.type) or \
                    value_field not in [f.name for f in flat.type]:
                raise pa.ArrowInvalid(
                    f"SliceToMap: provided object does not contain the "
                    f"path ({value_field!r})")
            items = pc.struct_field(flat, value_field)
        out = pa.MapArray.from_arrays(col_.offsets, keys, items)
        return _masked(tbl, target, out, mask)

    def _op_value_map(self, tbl, mask, target: str, mapping: dict, src: str | None = None,
                      default_keep: bool = True):
        # value-fold table (genainormalizer value_mappings): values in
        # ``mapping`` rewrite; others keep (default_keep) or null out
        col_ = _val(tbl, Col(src or target))
        keys = pa.array(list(mapping.keys()), type=col_.type)
        vals = pa.array(list(mapping.values()))
        idx = pc.index_in(col_, value_set=keys)
        mapped = vals.take(pc.fill_null(idx, 0))
        hit = pc.is_valid(idx)
        fallback = col_ if default_keep else pa.nulls(tbl.num_rows, vals.type)
        out = pc.if_else(hit, mapped, fallback)
        return _masked(tbl, target, out, mask)

    def _op_assign_keys(self, tbl, mask, target: str, src: str, keys: list[str]):
        # stanza assignkeys (transformer/assignkeys/transformer.go:30-52):
        # a list whose length == len(keys) becomes a struct with those
        # keys; mismatched rows yield a null struct (per-row error)
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        n = tbl.num_rows
        lens = pc.list_value_length(col_)
        ok = pc.fill_null(pc.equal(lens, len(keys)), False)
        fields = []
        for i in range(len(keys)):
            v = pc.list_flatten(pc.list_slice(col_, start=i, stop=i + 1,
                                              return_fixed_size_list=True))
            fields.append(pc.if_else(ok, v, pa.nulls(n, v.type)))
        struct = pa.StructArray.from_arrays(fields, names=list(keys))
        # null-out whole struct for mismatched rows
        struct = pc.if_else(ok, struct, pa.nulls(n, struct.type))
        return _masked(tbl, target, struct, mask)

    def _op_scale(self, tbl, mask, target: str, factor: float, src: str | None = None):
        # metricstransformprocessor experimental_scale_value
        # (processor/metricstransformprocessor: operation action
        # 'experimental_scale_value' multiplies datapoint values)
        out = pc.multiply(pc.cast(_val(tbl, Col(src or target)), pa.float64()),
                          pa.scalar(float(factor)))
        return _masked(tbl, target, out, mask)

    def _op_arith(self, tbl, mask, target: str, op: str, a: Any, b: Any):
        # metricsgenerationprocessor 'calculate' (new metric = metric1
        # <op> metric2/scale) and OTTL arithmetic expressions
        fn = {"add": pc.add, "sub": pc.subtract, "mul": pc.multiply,
              "div": pc.divide}[op]
        va = pc.cast(_val(tbl, a), pa.float64()) if isinstance(a, Col) else a
        vb = pc.cast(_val(tbl, b), pa.float64()) if isinstance(b, Col) else b
        if op == "div":
            # null on divide-by-zero, matching SQL NULLIF semantics
            zb = pc.equal(vb, 0.0) if isinstance(vb, (pa.Array, pa.ChunkedArray)) else (vb == 0)
            if isinstance(vb, (pa.Array, pa.ChunkedArray)):
                vb = pc.if_else(zb, pa.nulls(tbl.num_rows, pa.float64()), vb)
            elif zb:
                return _masked(tbl, target, pa.nulls(tbl.num_rows, pa.float64()), mask)
        return _masked(tbl, target, fn(va, vb), mask)

    def _op_parse_xml(self, tbl, mask, target: str, src: str):
        # func_parse_xml.go: XML document -> {tag, content?,
        # attributes{..}, children[..]} recursively; emitted as a
        # deterministic JSON string column (arbitrary-depth nesting is
        # not a fixed Arrow schema). Per-row ElementTree parse — this
        # editor is for attr-sized XML payloads, not the hot row path.
        # Divergence: namespaced tags render as ElementTree's
        # "{uri}local" where the Go decoder keeps only xml.Name.Local.
        import json as _json
        from xml.etree import ElementTree

        def conv(el) -> dict:
            m: dict = {"tag": el.tag}
            text = (el.text or "").strip()
            if text:
                m["content"] = text
            if el.attrib:
                m["attributes"] = dict(el.attrib)
            kids = [conv(c) for c in el]
            if kids:
                m["children"] = kids
            return m

        col_ = _val(tbl, Col(src))
        outs = []
        for s in col_.to_pylist():
            try:
                outs.append(_json.dumps(conv(ElementTree.fromstring(s)),
                                        sort_keys=True, separators=(",", ":")))
            except (ElementTree.ParseError, TypeError):
                outs.append(None)
        return _masked(tbl, target, pa.array(outs, pa.string()), mask)

    def _op_split_index(self, tbl, mask, target: str, src: str, sep: str, index: int):
        # Split(...)[i] — OTTL Split + Index composition; short rows
        # yield null (pad source so list_slice stays row-aligned)
        n = pc.list_value_length(pc.split_pattern(_val(tbl, Col(src)), pattern=sep))
        padded = pc.binary_join_element_wise(
            pc.fill_null(_val(tbl, Col(src)), ""), pa.scalar(sep * (index + 1)), ""
        )
        pparts = pc.split_pattern(padded, pattern=sep)
        vals = pc.list_flatten(pc.list_slice(pparts, start=index, stop=index + 1))
        vals = pc.if_else(pc.fill_null(pc.greater(n, index), False), vals, pa.nulls(tbl.num_rows, pa.string()))
        return _masked(tbl, target, vals, mask)

    # ---- OTTL breadth round 3: string/time/net/validation families ----

    def _op_convert_case(self, tbl, mask, target: str, case: str, src: str | None = None):
        # func_convert_case.go: upper | lower | snake | camel
        col_ = _val(tbl, Col(src or target))
        if case == "upper":
            out = pc.utf8_upper(col_)
        elif case == "lower":
            out = pc.utf8_lower(col_)
        elif case == "snake":
            # the strcase.ToSnake boundaries: aA -> a_A, ABc -> A_Bc,
            # spaces/dashes collapse to _
            s = pc.replace_substring_regex(
                col_, pattern=r"([a-z0-9])([A-Z])", replacement=r"\1_\2")
            s = pc.replace_substring_regex(
                s, pattern=r"([A-Z]+)([A-Z][a-z])", replacement=r"\1_\2")
            s = pc.replace_substring_regex(s, pattern=r"[\s\-]+", replacement="_")
            out = pc.utf8_lower(s)
        elif case == "camel":
            # strcase.ToCamel: separators (_ - space) drop and the
            # following char uppercases; EXISTING capitals are kept
            # ("SimpleString" stays, "simple-string" -> "SimpleString"
            # — func_convert_case_test.go:79-113). Split on separator
            # runs, uppercase each part's first char, keep the rest.
            filled = pc.fill_null(col_, "")
            parts = pc.split_pattern_regex(filled, pattern=r"[_\-\s]+")
            parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
            flat = parts.flatten()
            head = pc.utf8_upper(pc.utf8_slice_codeunits(flat, 0, 1))
            tail = pc.utf8_slice_codeunits(flat, 1, 2**31 - 1)
            cap = pc.binary_join_element_wise(head, tail, "")
            rebuilt = pa.ListArray.from_arrays(parts.offsets, cap)
            joined = pc.binary_join(rebuilt, "")
            out = pc.if_else(pc.is_valid(col_), joined,
                             pa.nulls(tbl.num_rows, pa.string()))
        else:
            raise ValueError(f"convert_case: unknown case {case!r}")
        return _masked(tbl, target, out, mask)

    def _op_trim_prefix(self, tbl, mask, target: str, prefix: str, src: str | None = None):
        # func_trim_prefix.go (strings.TrimPrefix)
        import re as _re

        out = pc.replace_substring_regex(
            _val(tbl, Col(src or target)),
            pattern="^" + _re.escape(prefix), replacement="", max_replacements=1)
        return _masked(tbl, target, out, mask)

    def _op_trim_suffix(self, tbl, mask, target: str, suffix: str, src: str | None = None):
        # func_trim_suffix.go (strings.TrimSuffix)
        import re as _re

        out = pc.replace_substring_regex(
            _val(tbl, Col(src or target)),
            pattern=_re.escape(suffix) + "$", replacement="", max_replacements=1)
        return _masked(tbl, target, out, mask)

    def _affix_dynamic(self, tbl, src: str, other: Col, end: bool):
        """Per-row HasPrefix/HasSuffix: vectorized by grouping on the
        DISTINCT affix length — slice(src, …, len) == affix, one kernel
        pass per distinct length (typically a handful)."""
        a = _val(tbl, Col(src))
        b = _val(tbl, other)
        lens = pc.utf8_length(b)
        out = pa.nulls(tbl.num_rows, pa.bool_())
        for ln in pc.unique(pc.drop_null(lens)).to_pylist():
            grp = pc.fill_null(pc.equal(lens, ln), False)
            piece = (pc.utf8_slice_codeunits(a, start=-ln, stop=2**31 - 1)
                     if (end and ln) else
                     pc.utf8_slice_codeunits(a, start=0, stop=ln))
            if end and ln == 0:
                piece = pa.array([""] * tbl.num_rows)
            # rows shorter than the affix can't match
            long_enough = pc.greater_equal(pc.utf8_length(a), ln)
            eq = pc.and_(pc.fill_null(pc.equal(piece, b), False),
                         pc.fill_null(long_enough, False))
            out = pc.if_else(grp, eq, out)
        return out

    def _op_has_prefix(self, tbl, mask, target: str, src: str, prefix: Any):
        # func_has_prefix.go -> bool column; Col prefixes (dynamic
        # per-row) dispatch to the length-grouped vectorized path
        if isinstance(prefix, Col):
            return _masked(tbl, target,
                           self._affix_dynamic(tbl, src, prefix, end=False),
                           mask)
        return _masked(tbl, target,
                       pc.starts_with(_val(tbl, Col(src)), pattern=prefix), mask)

    def _op_has_suffix(self, tbl, mask, target: str, src: str, suffix: Any):
        if isinstance(suffix, Col):
            return _masked(tbl, target,
                           self._affix_dynamic(tbl, src, suffix, end=True),
                           mask)
        return _masked(tbl, target,
                       pc.ends_with(_val(tbl, Col(src)), pattern=suffix), mask)

    def _op_split(self, tbl, mask, target: str, src: str, sep: Any):
        # func_split.go: string -> list<string>. A Col separator
        # (per-row) partitions by DISTINCT separator value — one
        # vectorized kernel per distinct sep, no row loop.
        if isinstance(sep, Col):
            sep_col = _val(tbl, sep)
            for s in pc.unique(sep_col).to_pylist():
                if s is None:
                    continue
                sub = pc.equal(sep_col, s)
                sub = pc.and_(mask, sub) if mask is not None else sub
                tbl = self._op_split(tbl, sub, target, src, s)
            return tbl
        return _masked(tbl, target,
                       pc.split_pattern(_val(tbl, Col(src)), pattern=sep), mask)

    _TIME_PARTS = {
        "year": pc.year, "month": pc.month, "day": pc.day,
        "hour": pc.hour, "minute": pc.minute, "second": pc.second,
        "millisecond": pc.millisecond, "microsecond": pc.microsecond,
        "nanosecond": pc.nanosecond,
    }

    def _op_time_extract(self, tbl, mask, target: str, src: str, part: str):
        # func_year.go / func_month.go / ... / func_weekday.go; weekday
        # follows Go time.Weekday (Sunday == 0)
        col_ = _val(tbl, Col(src))
        if part == "weekday":
            out = pc.day_of_week(col_, count_from_zero=True, week_start=7)
        else:
            out = self._TIME_PARTS[part](col_)
        return _masked(tbl, target, pc.cast(out, pa.int64()), mask)

    _UNIX_DIV = {"nanoseconds": 1, "microseconds": 1_000,
                 "milliseconds": 1_000_000, "seconds": 1_000_000_000}

    def _op_unix(self, tbl, mask, target: str, src: str, unit: str = "seconds"):
        # func_unix_seconds.go / _milli / _micro / _nano: truncating
        # integer division of the epoch-nanos, like Go Time.Unix*()
        ns = pc.cast(pc.cast(_val(tbl, Col(src)), pa.timestamp("ns")), pa.int64())
        div = self._UNIX_DIV[unit]
        out = ns if div == 1 else pc.divide(ns, div)
        return _masked(tbl, target, out, mask)

    _DURATION_RE = (r"^(?:(?P<h>\d+(?:\.\d+)?)h)?(?:(?P<m>\d+(?:\.\d+)?)m)?"
                    r"(?:(?P<s>\d+(?:\.\d+)?)s)?(?:(?P<ms>\d+(?:\.\d+)?)ms)?"
                    r"(?:(?P<us>\d+(?:\.\d+)?)us)?(?:(?P<ns>\d+(?:\.\d+)?)ns)?$")

    _DUR_UNIT = {"seconds": 1.0, "minutes": 1 / 60.0, "hours": 1 / 3600.0,
                 "milliseconds": 1e3, "microseconds": 1e6, "nanoseconds": 1e9}

    def _op_duration(self, tbl, mask, target: str, src: str,
                     unit: str = "seconds"):
        # func_duration.go (time.ParseDuration) -> float64 in ``unit``
        # (the Hours/Minutes/Seconds/... converter family over a parsed
        # duration); non-matching rows yield null. One RE2 pass.
        col_ = _val(tbl, Col(src))
        ex = pc.extract_regex(col_, pattern=self._DURATION_RE)
        total = None
        for i, scale in enumerate([3600.0, 60.0, 1.0, 1e-3, 1e-6, 1e-9]):
            # an unmatched optional group extracts as "" (RE2), a null
            # input row as null — both count as 0 here
            g = pc.fill_null(pc.struct_field(ex, i), "")
            f = pc.cast(pc.if_else(pc.equal(g, ""), pa.scalar("0"), g),
                        pa.float64())
            term = pc.multiply(f, scale)
            total = term if total is None else pc.add(total, term)
        total = pc.multiply(total, self._DUR_UNIT[unit])
        # the all-optional regex vacuously matches "" — but Go
        # time.ParseDuration("") errors, so require at least one digit
        nonempty = pc.fill_null(pc.match_substring_regex(col_, pattern=r"\d"), False)
        out = pc.if_else(pc.and_(pc.is_valid(ex), nonempty), total,
                         pa.nulls(tbl.num_rows, pa.float64()))
        return _masked(tbl, target, out, mask)

    @staticmethod
    def _glob_to_re(pattern: str) -> str:
        # OTTL glob (gobwas/glob subset): * multi-char, ? single-char;
        # everything else literal; whole-value anchored
        import re as _re

        out = []
        for ch in pattern:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            else:
                out.append(_re.escape(ch))
        return "^" + "".join(out) + "$"

    def _op_replace_match(self, tbl, mask, target: str, pattern: str,
                          replacement: str, src: str | None = None):
        # func_replace_match.go: whole-value glob match -> replacement
        col_ = _val(tbl, Col(src or target))
        hit = pc.fill_null(
            pc.match_substring_regex(col_, pattern=self._glob_to_re(pattern)),
            False)
        out = pc.if_else(hit, pa.scalar(replacement), col_)
        return _masked(tbl, target, out, mask)

    def _op_replace_all_matches(self, tbl, mask, pattern: str,
                                replacement: str,
                                keys: list[str] | None = None):
        # func_replace_all_matches.go: glob-replace across every
        # string attribute (keys=None = every string column)
        if keys is None:
            keys = [c for c in tbl.column_names
                    if pa.types.is_string(tbl.schema.field(c).type)]
        regex = self._glob_to_re(pattern)
        for k in keys:
            if k not in tbl.column_names:
                continue
            col_ = _val(tbl, Col(k))
            hit = pc.fill_null(pc.match_substring_regex(col_, pattern=regex), False)
            tbl = _masked(tbl, k, pc.if_else(hit, pa.scalar(replacement), col_), mask)
        return tbl

    def _op_parse_simplified_xml(self, tbl, mask, target: str, src: str):
        # func_parse_simplified_xml.go: XML -> flat {tag: text} map of
        # the top-level children (attr-sized payloads, like parse_xml)
        import json as _json
        from xml.etree import ElementTree

        col_ = _val(tbl, Col(src))
        outs = []
        for s in col_.to_pylist():
            try:
                root = ElementTree.fromstring(s)
                m = {c.tag: (c.text or "").strip() for c in root}
                outs.append(_json.dumps({root.tag: m}, sort_keys=True,
                                        separators=(",", ":")))
            except (ElementTree.ParseError, TypeError):
                outs.append(None)
        return _masked(tbl, target, pa.array(outs, pa.string()), mask)

    def _op_log(self, tbl, mask, target: str, src: str | None = None):
        # func_log.go: natural log; non-positive -> null (the Go
        # converter errors; per-row null is our on_error='ignore' shape)
        v = pc.cast(_val(tbl, Col(src or target)), pa.float64())
        ok = pc.fill_null(pc.greater(v, 0.0), False)
        out = pc.if_else(ok, pc.ln(pc.if_else(ok, v, pa.scalar(1.0))),
                         pa.nulls(tbl.num_rows, pa.float64()))
        return _masked(tbl, target, out, mask)

    def _op_is_valid_luhn(self, tbl, mask, target: str, src: str):
        # func_is_valid_luhn.go: checksum over the digit string.
        # Vectorized: zero-lpad every candidate to 19 (pad zeros add 0
        # to the sum), reshape the flat utf8 buffer to a digit matrix,
        # double alternate columns from the right.
        col_ = _val(tbl, Col(src))
        digits = pc.fill_null(
            pc.match_substring_regex(col_, pattern=r"^[0-9]{1,19}$"), False)
        safe = pc.if_else(digits, pc.fill_null(col_, "0"), pa.scalar("0"))
        padded = pc.utf8_lpad(safe, width=19, padding="0")
        if isinstance(padded, pa.ChunkedArray):
            padded = padded.combine_chunks()
        offs = np.frombuffer(padded.buffers()[1], np.int32)[
            padded.offset:padded.offset + len(padded) + 1]
        buf = np.frombuffer(padded.buffers()[2], np.uint8)
        m = buf[offs[0]:offs[-1]].reshape(-1, 19).astype(np.int64) - ord("0")
        r = 18 - np.arange(19)  # position from the right
        doubled = m * 2
        doubled -= 9 * (doubled > 9)
        contrib = np.where(r % 2 == 1, doubled, m)
        ok = (contrib.sum(axis=1) % 10) == 0
        out = pc.and_(digits, pa.array(ok))
        out = pc.if_else(pc.is_valid(col_), out, pa.nulls(tbl.num_rows, pa.bool_()))
        return _masked(tbl, target, out, mask)

    def _op_is_type(self, tbl, mask, target: str, src: str, want: str):
        # Is* type predicates as VALUES: the Arrow column type decides,
        # null rows are false (nil pdata values have no type)
        col_ = _val(tbl, Col(src))
        t = col_.type
        match = {
            "string": pa.types.is_string(t) or pa.types.is_large_string(t),
            "double": pa.types.is_floating(t),
            "bool": pa.types.is_boolean(t),
            "int": pa.types.is_integer(t),
            "map": pa.types.is_struct(t) or pa.types.is_map(t),
            "list": pa.types.is_list(t) or pa.types.is_large_list(t),
        }[want]
        out = pc.and_(pc.is_valid(col_),
                      pa.array([match] * len(col_), pa.bool_()))
        return _masked(tbl, target, out, mask)

    def _op_is_match(self, tbl, mask, target: str, src: str, pattern: str):
        # IsMatch (func_is_match.go): unanchored RE2 search over the
        # value's string rendering; nil input -> nil
        col_ = _val(tbl, Col(src))
        s = pc.cast(col_, pa.string())
        out = pc.match_substring_regex(s, pattern=pattern)
        return _masked(tbl, target, out, mask)

    def _op_is_root_span(self, tbl, mask, target: str,
                         src: str = "parent_span_id"):
        # IsRootSpan (func_is_root_span.go:32-36):
        # span.ParentSpanID().IsEmpty() — pdata's 8-byte id is "empty"
        # when all zero. Flat-table adaptation: the parent id is a
        # hex-string column, so null / "" / all-zero hex means root.
        col_ = _val(tbl, Col(src))
        s = pc.cast(col_, pa.string())
        empty = pc.or_(pc.equal(s, ""), pc.equal(s, "0" * 16))
        out = pc.fill_null(empty, True)
        return _masked(tbl, target, out, mask)

    def _op_is_in_cidr(self, tbl, mask, target: str, src: str, cidr: Any):
        # IsInCIDR-style IPv4 membership (func_is_in_cidr.go takes a
        # LIST of ranges — membership in any); malformed addrs -> null
        import ipaddress

        nets = [ipaddress.ip_network(c, strict=False)
                for c in (cidr if isinstance(cidr, list) else [cidr])]
        col_ = _val(tbl, Col(src))
        ex = pc.extract_regex(
            col_,
            pattern=r"^(?P<o1>\d{1,3})\.(?P<o2>\d{1,3})\.(?P<o3>\d{1,3})\.(?P<o4>\d{1,3})$")
        octs = [pc.cast(pc.fill_null(pc.struct_field(ex, i), "0"), pa.int64())
                .to_numpy(zero_copy_only=False) for i in range(4)]
        in_range = (octs[0] < 256) & (octs[1] < 256) & (octs[2] < 256) & (octs[3] < 256)
        ip = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
        member = np.zeros(len(ip), dtype=bool)
        for net in nets:
            member |= (ip & int(net.netmask)) == int(net.network_address)
        valid = pc.and_(pc.is_valid(ex), pa.array(in_range))
        # unparseable addresses are FALSE, not errors
        # (func_is_in_cidr_test.go: "hello world" -> false); a null
        # input stays null (nil value)
        out = pc.and_(pc.fill_null(valid, False), pa.array(member))
        out = pc.if_else(pc.is_valid(col_), out,
                         pa.nulls(tbl.num_rows, pa.bool_()))
        return _masked(tbl, target, out, mask)

    def _op_decode(self, tbl, mask, target: str, src: str, encoding: Any):
        # func_decode.go: base64 / hex / text charsets -> string.
        # A Col encoding (per-row encoding name) partitions the batch
        # by DISTINCT encoding and applies each group's kernel under a
        # sub-mask — stays vectorized per encoding, no row loop.
        from ..functions.encode import base64_decode, hex_decode

        if isinstance(encoding, Col):
            enc_col = _val(tbl, encoding)
            for enc in pc.unique(enc_col).to_pylist():
                if enc is None:
                    continue
                sub = pc.equal(enc_col, enc)
                sub = pc.and_(mask, sub) if mask is not None else sub
                tbl = self._op_decode(tbl, sub, target, src, enc)
            return tbl
        col_ = _val(tbl, Col(src))
        enc = str(encoding).lower()
        if enc in ("base64", "base64-std", "base64-url", "base64-raw",
                   "base64-raw-url"):
            b64 = pc.cast(col_, pa.string())
            if "url" in enc:  # urlsafe alphabet -> standard, vectorized
                b64 = pc.replace_substring(b64, "-", "+")
                b64 = pc.replace_substring(b64, "_", "/")
            if "raw" in enc:  # unpadded: repad by len % 4 group
                rem = pc.bit_wise_and(pc.utf8_length(b64), 3)
                for r, pad in ((2, "=="), (3, "=")):
                    padded = pc.binary_join_element_wise(b64, pa.scalar(pad), "")
                    b64 = pc.if_else(pc.equal(rem, r), padded, b64)
            raw = base64_decode(b64)
            try:
                out = raw.cast(pa.string())
            except pa.ArrowInvalid:
                vals = []
                for v in raw.to_pylist():
                    try:
                        vals.append(v.decode("utf-8") if v is not None else None)
                    except UnicodeDecodeError:
                        vals.append(None)
                out = pa.array(vals, pa.string())
        elif enc == "hex":
            out = hex_decode(col_)
        elif enc in ("us-ascii", "utf-8", "utf8"):
            out = pc.cast(col_, pa.string())
        else:
            # text charsets (ISO-8859-1, WINDOWS-125x, UTF-16, GB2312,
            # ... — func_decode.go resolves IANA names): per-row codec
            # decode of attr-sized payloads; binary columns decode
            # directly, string columns via their latin-1 byte image
            import codecs

            py = {"utf-16": "utf-16-le", "utf16": "utf-16-le"}.get(enc, enc)
            try:
                codecs.lookup(py)
            except LookupError:
                raise ValueError(f"decode: unsupported encoding {encoding!r}")
            is_bin = pa.types.is_binary(col_.type) \
                or pa.types.is_large_binary(col_.type)
            vals = []
            for v in col_.to_pylist():
                if v is None:
                    vals.append(None)
                    continue
                bb = v if is_bin else v.encode("latin-1", errors="replace")
                vals.append(bb.decode(py, errors="replace"))
            out = pa.array(vals, pa.string())
        return _masked(tbl, target, out, mask)

    _CID_PROTOS = {"ICMP": 1, "TCP": 6, "UDP": 17, "RSVP": 46,
                   "ICMP6": 58, "SCTP": 132}
    _IP4_RE = r"^(?P<o1>\d{1,3})\.(?P<o2>\d{1,3})\.(?P<o3>\d{1,3})\.(?P<o4>\d{1,3})$"

    def _ip4_bytes(self, tbl, src: str) -> tuple[np.ndarray, np.ndarray]:
        """(n,4) uint8 octets + valid mask for an IPv4 string column."""
        col_ = _val(tbl, Col(src))
        ex = pc.extract_regex(col_, pattern=self._IP4_RE)
        octs = np.stack([
            pc.cast(pc.fill_null(pc.struct_field(ex, i), "0"), pa.int64())
            .to_numpy(zero_copy_only=False) for i in range(4)], axis=1)
        valid = pc.is_valid(ex).to_numpy(zero_copy_only=False) & \
            (octs < 256).all(axis=1)
        return octs.astype(np.uint8), valid

    def _op_community_id(self, tbl, mask, target: str, src_ip: str,
                         src_port: str, dst_ip: str, dst_port: str,
                         proto: str | int = "TCP", seed: int = 0):
        # func_community_id.go: "1:" + base64(sha1(seed.be16 | ip1 |
        # ip2 | proto | 0 | port1.be16 | port2.be16)) with (ip, port)
        # pairs swapped into canonical order (normalize()). IPv4 only
        # here (IPv6 rows yield null); fully vectorized — octet regex,
        # numpy packing, the numpy SHA-1, vectorized base64.
        from ..functions.encode import base64_encode, sha1_digest_rows

        n = tbl.num_rows
        sip, sv = self._ip4_bytes(tbl, src_ip)
        dip, dv = self._ip4_bytes(tbl, dst_ip)
        spt = pc.cast(_val(tbl, Col(src_port)), pa.int64()).to_numpy(zero_copy_only=False)
        dpt = pc.cast(_val(tbl, Col(dst_port)), pa.int64()).to_numpy(zero_copy_only=False)
        valid = sv & dv & (spt >= 0) & (spt <= 65535) & (dpt >= 0) & (dpt <= 65535)
        p = self._CID_PROTOS[proto] if isinstance(proto, str) else int(proto)
        # big-endian uint32 view == lexicographic byte order
        s32 = sip.copy().view(">u4").reshape(-1)
        d32 = dip.copy().view(">u4").reshape(-1)
        swap = (s32 > d32) | ((s32 == d32) & (spt > dpt))
        ip1 = np.where(swap[:, None], dip, sip)
        ip2 = np.where(swap[:, None], sip, dip)
        p1 = np.where(swap, dpt, spt).astype(">u2")
        p2 = np.where(swap, spt, dpt).astype(">u2")
        buf = np.zeros((n, 16), dtype=np.uint8)  # 2+4+4+1+1+2+2
        buf[:, 0:2] = np.full(n, seed, ">u2").view(np.uint8).reshape(n, 2)
        buf[:, 2:6] = ip1
        buf[:, 6:10] = ip2
        buf[:, 10] = p
        buf[:, 11] = 0
        buf[:, 12:14] = p1.view(np.uint8).reshape(n, 2)
        buf[:, 14:16] = p2.view(np.uint8).reshape(n, 2)
        flat = pa.py_buffer(buf.tobytes())
        packed = pa.Array.from_buffers(
            pa.binary(), n, [None, pa.array(np.arange(n + 1, dtype=np.int32) * 16).buffers()[1], flat])
        digests = sha1_digest_rows(packed)
        dig_flat = pa.py_buffer(digests.tobytes())
        dig_arr = pa.Array.from_buffers(
            pa.binary(), n, [None, pa.array(np.arange(n + 1, dtype=np.int32) * 20).buffers()[1], dig_flat])
        b64 = base64_encode(dig_arr)
        out = pc.binary_join_element_wise(pa.scalar("1:"), b64, "")
        out = pc.if_else(pa.array(valid), out, pa.nulls(n, pa.string()))
        return _masked(tbl, target, out, mask)

    _UA_BROWSERS = [  # ordered: most specific token first; Mobile
        # variants precede their base family (uap-core rules)
        ("Edge", r"Edg(?:e|A|iOS)?/(?P<v>[0-9][0-9.]*)"),
        ("Opera", r"OPR/(?P<v>[0-9][0-9.]*)"),
        ("Chrome Mobile",
         r"(?:Chrome|CriOS)/(?P<v>[0-9][0-9.]*) Mobile"),
        ("Chrome", r"(?:Chrome|CriOS)/(?P<v>[0-9][0-9.]*)"),
        ("Firefox", r"(?:Firefox|FxiOS)/(?P<v>[0-9][0-9.]*)"),
        ("Mobile Safari",
         r"Version/(?P<v>[0-9][0-9.]*) Mobile(?:/\w+)? Safari/"),
        ("Safari", r"Version/(?P<v>[0-9][0-9.]*).*Safari/"),
        ("curl", r"curl/(?P<v>[0-9][0-9.]*)"),
        # uap-core generic fallback: a leading product/version token
        # (not Mozilla/Opera compatibility shells)
        ("__generic__",
         r"^(?P<g>[A-Za-z][A-Za-z0-9._!&'+-]*)/(?P<v>[0-9][0-9.]*)"),
    ]
    _UA_OS = [
        ("Windows", r"Windows NT (?P<v>[0-9.]+)"),
        ("iOS", r"iPhone OS (?P<v>[0-9_]+)"),
        ("macOS", r"Mac OS X (?P<v>[0-9_.]+)"),
        ("Android", r"Android (?P<v>[0-9.]+)"),
        ("Linux", r"(?P<v>Linux)"),
    ]

    def _op_useragent(self, tbl, mask, src: str, prefix: str = "user_agent."):
        # func_useragent.go emits user_agent.name/.version/os.name via
        # the ua-parser library; this is the vectorized top-family
        # subset (ordered RE2 cascade), emitting <prefix>name/
        # <prefix>version/<prefix>os — unknowns stay "Other" like
        # ua-parser's fallback.
        col_ = _val(tbl, Col(src))
        name = pa.nulls(tbl.num_rows, pa.string())
        version = pa.nulls(tbl.num_rows, pa.string())
        for label, pat in self._UA_BROWSERS:
            ex = pc.extract_regex(col_, pattern=pat)
            hit = pc.and_(pc.is_null(name), pc.is_valid(ex))
            if label == "__generic__":
                # product/version token IS the name — except the
                # Mozilla/Opera compatibility shells
                g = pc.struct_field(ex, "g")
                hit = pc.and_(hit, pc.fill_null(pc.invert(pc.is_in(
                    g, value_set=pa.array(["Mozilla", "Opera"]))), False))
                name = pc.if_else(hit, g, name)
            else:
                name = pc.if_else(hit, pa.scalar(label), name)
            version = pc.if_else(hit, pc.struct_field(ex, "v"), version)
        # ua-parser reports at most major.minor.patch
        vex = pc.extract_regex(pc.fill_null(version, ""),
                               pattern=r"^(?P<t>\d+(?:\.\d+){0,2})")
        version = pc.if_else(pc.is_valid(version),
                             pc.struct_field(vex, "t"), version)
        os_name = pa.nulls(tbl.num_rows, pa.string())
        for label, pat in self._UA_OS:
            ex = pc.extract_regex(col_, pattern=pat)
            hit = pc.and_(pc.is_null(os_name), pc.is_valid(ex))
            os_name = pc.if_else(hit, pa.scalar(label), os_name)
        fallback = pc.if_else(pc.is_valid(col_), pa.scalar("Other"),
                              pa.nulls(tbl.num_rows, pa.string()))
        tbl = _masked(tbl, prefix + "name", pc.coalesce(name, fallback), mask)
        tbl = _masked(tbl, prefix + "version", version, mask)
        return _masked(tbl, prefix + "os", pc.coalesce(os_name, fallback), mask)

    @staticmethod
    def _kv_token(s: str, delimiter: str, pair_delimiter: str) -> str:
        """func_to_key_value_string.go token rendering: embedded
        quotes always escape to \\"; a token containing either
        delimiter gets wrapped in quotes (test vectors
        func_to_key_value_string_test.go:25-170)."""
        esc = s.replace('"', '\\"')
        if delimiter in esc or pair_delimiter in esc:
            return f'"{esc}"'
        return esc

    def _op_to_key_value_string(self, tbl, mask, target: str, src: str,
                                delimiter: str = "=", pair_delimiter: str = " "):
        # func_to_key_value_string.go over a struct column; null field
        # values render as empty (the Go Value.AsString of empty);
        # keys AND values quote/escape per the reference rule
        col_ = _val(tbl, Col(src))
        parts = []
        for field in col_.type:
            v = self._go_str_array(pc.struct_field(col_, field.name))
            # vectorized token quoting: escape quotes, then wrap rows
            # containing a delimiter
            v = pc.replace_substring(pc.fill_null(v, ""), '"', '\\"')
            needs = pc.or_(pc.match_substring(v, delimiter),
                           pc.match_substring(v, pair_delimiter))
            quoted = pc.binary_join_element_wise(pa.scalar('"'), v,
                                                 pa.scalar('"'), "")
            v = pc.if_else(needs, quoted, v)
            key = self._kv_token(field.name, delimiter, pair_delimiter)
            parts.append(pc.binary_join_element_wise(
                pa.scalar(key), v, delimiter))
        out = pc.binary_join_element_wise(*parts, pair_delimiter)
        return _masked(tbl, target, out, mask)

    def _op_limit(self, tbl, mask, src: str, max_keys: int,
                  priority_keys: list[str] | None = None):
        # func_limit.go: cap the attribute map at max_keys, keeping
        # priority_keys first, then config order
        col_ = _val(tbl, Col(src))
        names = [f.name for f in col_.type]
        prio = [k for k in (priority_keys or []) if k in names]
        keep = (prio + [n for n in names if n not in prio])[:max_keys]
        keep = [n for n in names if n in keep]  # stable original order
        arrays = [pc.struct_field(col_, n) for n in keep]
        out = pa.StructArray.from_arrays(arrays, names=keep)
        return _masked(tbl, src, out, mask)

    def _op_map_keys(self, tbl, mask, src: str, case: str = "lower"):
        # map_keys-style key transformation over a struct column
        col_ = _val(tbl, Col(src))
        fn = str.lower if case == "lower" else str.upper
        names = [fn(f.name) for f in col_.type]
        arrays = [pc.struct_field(col_, i) for i in range(len(names))]
        return _masked(tbl, src, pa.StructArray.from_arrays(arrays, names=names), mask)

    def _op_append(self, tbl, mask, target: str, value: Any = None,
                   src: str | None = None, values: list | None = None):
        # func_append.go: append value(s) to each row's list. A scalar
        # (non-list) column is promoted to a one-element list first; a
        # missing column starts empty — both reference behaviors.
        # Vectorized interleave: old flat values keep their slots, the
        # k appended values land at each row's new tail slots.
        n = tbl.num_rows
        to_add = values if values is not None else [value]
        try:
            col_ = _val(tbl, Col(src or target))
        except (KeyError, pa.ArrowInvalid):  # absent column OR field
            return _masked(tbl, target, pa.array([to_add] * n), mask)
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        if not pa.types.is_list(col_.type):
            col_ = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32)), col_)
        offs = col_.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = col_.flatten()
        lens = np.diff(offs)
        k = len(to_add)
        new_offs = np.concatenate([[0], np.cumsum(lens + k)])
        out_len = int(new_offs[-1])
        is_tail = np.zeros(out_len, dtype=bool)
        for j in range(k):
            is_tail[new_offs[1:] - 1 - j] = True
        src_idx = np.zeros(out_len, dtype=np.int64)
        src_idx[~is_tail] = np.arange(len(flat))
        tails = []
        for v in to_add:
            vv = _val(tbl, v)
            if isinstance(vv, (pa.Array, pa.ChunkedArray)):
                if isinstance(vv, pa.ChunkedArray):
                    vv = vv.combine_chunks()
                tails.append(vv.cast(flat.type))
            else:
                tails.append(pa.array([vv] * n).cast(flat.type))
        # row-major tail order: row i gets to_add[0..k-1] at slots
        # new_offs[i+1]-k .. new_offs[i+1]-1; concat(tails) is
        # column-major (tails[j][i] at j*n+i), permute to row-major
        if k > 1:
            r = np.arange(n * k)
            tail_flat = pa.concat_arrays(tails).take(
                pa.array((r % k) * n + r // k))
        else:
            tail_flat = tails[0]
        src_idx[is_tail] = len(flat) + np.arange(n * k)
        all_vals = pa.concat_arrays([flat, tail_flat])
        new_flat = all_vals.take(pa.array(src_idx))
        out = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), new_flat)
        return _masked(tbl, target, out, mask)

    def _op_contains_value(self, tbl, mask, target: str, src: str, value: Any):
        # func_contains_value.go == list_any(element == value)
        return self._op_list_any(tbl, mask, target, src, "==", value)

    def _op_list_map(self, tbl, mask, target: str, src: str, op: str,
                     operand: Any = None):
        # func_map_each.go (documented subset): apply one elementwise
        # kernel to every list element — flatten, one vectorized
        # kernel, rebuild with the same offsets
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        flat = col_.flatten()
        if op == "add":
            new_flat = pc.add(flat, operand)
        elif op == "mul":
            new_flat = pc.multiply(flat, operand)
        elif op == "upper":
            new_flat = pc.utf8_upper(flat)
        elif op == "lower":
            new_flat = pc.utf8_lower(flat)
        elif op == "trim":
            new_flat = pc.utf8_trim_whitespace(flat)
        else:
            raise ValueError(f"list_map: unsupported op {op!r}")
        out = pa.ListArray.from_arrays(col_.offsets, new_flat)
        return _masked(tbl, target, out, mask)

    def _op_stringify_all(self, tbl, mask, keys: list[str] | None = None):
        # func_stringify_all.go on the flat model: every non-string
        # column becomes its string rendering — nested values as the
        # pdata compact-JSON form, scalars Go-style
        names = keys if keys is not None else list(tbl.column_names)
        for k in names:
            if k not in tbl.column_names:
                continue
            typ = tbl.schema.field(k).type
            if pa.types.is_string(typ):
                continue
            tbl = _masked(tbl, k, self._go_str_array(_val(tbl, Col(k))), mask)
        return tbl

    def _op_merge_maps(self, tbl, mask, target: str, src: str,
                       strategy: str = "upsert"):
        # func_merge_maps.go:46-69: merge the source map into the
        # target map. Columnar model: struct columns carry a fixed key
        # set, so "key absent in this row" = null field value.
        #   insert: keep target where present, fill absent from source
        #   update: overwrite only keys target already has (source-only
        #           fields are dropped, row-absent target keys stay null)
        #   upsert: source wins where present, union of fields
        if strategy not in ("insert", "update", "upsert"):
            raise ValueError(f"merge_maps: invalid strategy {strategy!r}")
        tcol = _val(tbl, Col(target))
        scol = _val(tbl, Col(src))
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        if isinstance(scol, pa.ChunkedArray):
            scol = scol.combine_chunks()
        tnames = [f.name for f in tcol.type]
        snames = [f.name for f in scol.type]
        out_names = list(tnames)
        if strategy != "update":
            out_names += [n for n in snames if n not in tnames]
        arrays, names = [], []
        for nm in out_names:
            tv = pc.struct_field(tcol, nm) if nm in tnames else None
            sv = pc.struct_field(scol, nm) if nm in snames else None
            if tv is not None and sv is not None and tv.type != sv.type:
                if pa.types.is_null(tv.type):  # all-absent target field
                    tv = pc.cast(tv, sv.type)
                else:
                    sv = pc.cast(sv, tv.type, safe=False)
            if sv is None:
                v = tv
            elif tv is None:
                v = sv
            elif strategy == "insert":
                v = pc.coalesce(tv, sv)
            elif strategy == "update":
                v = pc.if_else(
                    pc.and_kleene(pc.is_valid(tv), pc.is_valid(sv)), sv, tv)
            else:
                v = pc.coalesce(sv, tv)
            arrays.append(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
            names.append(nm)
        out = pa.StructArray.from_arrays(arrays, names=names)
        return _masked(tbl, target, out, mask)

    def _op_list_reduce(self, tbl, mask, target: str, src: str, op: str,
                        seed: Any = None, sep: str = "", suffix: str = ""):
        # func_reduce.go over a list column, for the recognized
        # accumulator shapes the textual front-end folds to:
        #   sum/product/min/max — segmented numpy reduceat, null items
        #   skipped (identity element), empty list -> seed
        #   concat — seed + join(item + suffix for items, sep)
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        n = tbl.num_rows
        row_null = pc.is_null(col_)
        if op == "concat":
            items = pc.cast(col_.flatten(), pa.string())
            if suffix:
                items = pc.binary_join_element_wise(
                    items, pa.scalar(suffix), "")
            rebuilt = pa.ListArray.from_arrays(col_.offsets, items)
            joined = pc.binary_join(rebuilt, sep)
            if seed:
                joined = pc.binary_join_element_wise(
                    pa.scalar(str(seed)), joined, "")
            out = pc.if_else(row_null, pa.nulls(n, pa.string()), joined)
            return _masked(tbl, target, out, mask)
        flat = col_.flatten()
        # integer lists fold in int64 (float64 loses exactness past
        # 2^53 — a hypothesis fold-parity test caught a big product
        # rounding off by one); float lists fold in float64
        int_mode = (pa.types.is_integer(flat.type)
                    and (seed is None or isinstance(seed, int)))
        if int_mode:
            ident = {"sum": 0, "product": 1,
                     "min": np.iinfo(np.int64).max,
                     "max": np.iinfo(np.int64).min}[op]
            item_ok = pc.is_valid(flat).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            vals = pc.fill_null(pc.cast(flat, pa.int64()), int(ident)) \
                .to_numpy(zero_copy_only=False)
        else:
            ident = {"sum": 0.0, "product": 1.0,
                     "min": np.inf, "max": -np.inf}[op]
            vals = pc.cast(flat, pa.float64()).to_numpy(zero_copy_only=False)
            item_ok = (~np.isnan(vals)).astype(np.float64)
            vals = np.where(np.isnan(vals), ident, vals)
        offs = col_.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # flatten() starts at the slice origin
        lens = np.diff(offs)
        ufunc = {"sum": np.add, "product": np.multiply,
                 "min": np.minimum, "max": np.maximum}[op]
        # pad one identity element so start offsets equal to len(vals)
        # (trailing empty lists) stay valid without shifting segments
        vals_p = np.append(vals, ident)
        agg = ufunc.reduceat(vals_p, offs[:-1]) if n \
            else np.empty(0, vals.dtype)
        agg = np.where(lens == 0, ident, agg)
        # rows with no usable value AND no seed have no fold result
        # (min/max identity is an extreme — never a valid output)
        n_ok = np.add.reduceat(np.append(item_ok, 0.0), offs[:-1]) if n \
            else np.empty(0)
        n_ok = np.where(lens == 0, 0.0, n_ok)
        no_result = (n_ok == 0) & (seed is None)
        if seed is not None:
            agg = ufunc(agg, int(seed) if int_mode else float(seed))
            # min/max over no values with a seed IS the seed — never
            # let the identity extreme leak through the combine
            if op in ("min", "max"):
                agg = np.where(n_ok == 0,
                               int(seed) if int_mode else float(seed), agg)
        agg = np.where(no_result, ident if int_mode else 0.0, agg)
        arr = pa.array(agg.astype(np.int64) if int_mode else agg)
        bad = pa.array(no_result) if no_result.any() else None
        out = pc.if_else(row_null, pa.nulls(n, arr.type), arr)
        if bad is not None:
            out = pc.if_else(bad, pa.nulls(n, arr.type), out)
        return _masked(tbl, target, out, mask)

    def _op_map_reduce_concat(self, tbl, mask, target: str, src: str,
                              kv_sep: str = "=", entry_sep: str = ";",
                              seed: str = ""):
        # The Reduce(map, seed, (acc, k, v) => Concat([acc, k, kv_sep,
        # String(v), entry_sep], "")) shape from the reference e2e
        # corpus (pkg/ottl/e2e/e2e_test.go): seed + per-entry
        # k<kv_sep>v<entry_sep>, null field values (absent keys) skipped.
        col_ = _val(tbl, Col(src))
        pieces: list[Any] = []
        for field in col_.type:
            v = pc.cast(pc.struct_field(col_, field.name), pa.string())
            entry = pc.binary_join_element_wise(
                pa.scalar(field.name + kv_sep), v, pa.scalar(entry_sep), "")
            pieces.append(pc.fill_null(entry, ""))
        if pieces:
            out = pc.binary_join_element_wise(pa.scalar(seed), *pieces, "")
        else:
            out = pa.array([seed] * tbl.num_rows, pa.string())
        return _masked(tbl, target, out, mask)

    # --- XML edit family (attr-sized payloads, like parse_xml) ---

    def _xml_apply(self, tbl, mask, target, src, fn):
        from xml.etree import ElementTree

        col_ = _val(tbl, Col(src))
        outs = []
        for s in col_.to_pylist():
            try:
                outs.append(fn(ElementTree.fromstring(s)))
            except (ElementTree.ParseError, TypeError):
                outs.append(None)
        return _masked(tbl, target, pa.array(outs, pa.string()), mask)

    def _op_get_xml(self, tbl, mask, target: str, src: str, xpath: str):
        # func_get_xml.go: serialize the elements matching the xpath
        # (ElementTree's limited XPath subset)
        from xml.etree import ElementTree

        def fn(root):
            hits = _et_findall_abs(root, xpath)
            return "".join(
                ElementTree.tostring(h, encoding="unicode", short_empty_elements=False) for h in hits)

        return self._xml_apply(tbl, mask, target, src, fn)

    def _op_remove_xml(self, tbl, mask, target: str, src: str, xpath: str):
        # func_remove_xml.go: drop matching elements, re-serialize
        from xml.etree import ElementTree

        def fn(root):
            # ElementTree removal needs the parent; collect victims by
            # identity, then walk every parent and detach
            victims = set(id(e) for e in _et_findall_abs(root, xpath))
            for parent in list(root.iter()):
                for child in list(parent):
                    if id(child) in victims:
                        parent.remove(child)
            return ElementTree.tostring(root, encoding="unicode", short_empty_elements=False)

        return self._xml_apply(tbl, mask, target, src, fn)

    def _op_insert_xml(self, tbl, mask, target: str, src: str, xpath: str,
                       sub_document: str):
        # func_insert_xml.go: append the sub-document under every
        # element matching the xpath
        from xml.etree import ElementTree

        sub = ElementTree.fromstring(sub_document)

        def fn(root):
            for hit in _et_findall_abs(root, xpath) or ([root] if xpath in (".", "") else []):
                import copy

                hit.append(copy.deepcopy(sub))
            return ElementTree.tostring(root, encoding="unicode", short_empty_elements=False)

        return self._xml_apply(tbl, mask, target, src, fn)

    def _op_convert_attrs_xml(self, tbl, mask, target: str, src: str,
                              xpath: str | None = None):
        # func_convert_attributes_to_elements_xml.go
        from xml.etree import ElementTree

        col_ = _val(tbl, Col(src))
        outs = []
        for s in col_.to_pylist():
            try:
                outs.append(None if s is None else attrs_to_elements_xml(s, xpath))
            except ElementTree.ParseError:
                outs.append(None)  # invalid XML: null, like _xml_apply
        return _masked(tbl, target, pa.array(outs, pa.string()), mask)

    def _op_convert_text_xml(self, tbl, mask, target: str, src: str,
                             xpath: str | None = None,
                             element_name: str = "value"):
        # func_convert_text_to_elements_xml.go
        from xml.etree import ElementTree

        col_ = _val(tbl, Col(src))
        outs = []
        for s in col_.to_pylist():
            try:
                outs.append(None if s is None
                            else text_to_elements_xml(s, xpath, element_name))
            except ElementTree.ParseError:
                outs.append(None)
        return _masked(tbl, target, pa.array(outs, pa.string()), mask)

    def _op_format(self, tbl, mask, target: str, fmt: str, args: list[Any]):
        # func_format.go (fmt.Sprintf subset): %s and %d verbs,
        # literals interleaved; column args vectorize via cast+join
        import re as _re

        pieces = _re.split(r"(%0?\d*[sd])", fmt)
        cols: list[Any] = []
        ai = 0
        for p in pieces:
            if _re.fullmatch(r"%0?\d*[sd]", p):
                if ai >= len(args):
                    raise ValueError("format: not enough args")
                v = _val(tbl, args[ai])
                ai += 1
                width = int(p[1:-1].lstrip("0") or 0) if len(p) > 2 else 0
                pad = "0" if p[1] == "0" else " "
                if isinstance(v, (pa.Array, pa.ChunkedArray)):
                    if p.endswith("d"):
                        v = pc.cast(v, pa.int64())
                    v = pc.cast(v, pa.string())
                    if width:
                        v = pc.utf8_lpad(v, width=width, padding=pad)
                    cols.append(v)
                else:
                    if p.endswith("d"):
                        v = int(v)
                    cols.append(str(v).rjust(width, pad) if width else str(v))
            elif p:
                cols.append(p)
        out = pc.binary_join_element_wise(*cols, "") if len(cols) > 1 else cols[0]
        return _masked(tbl, target, out, mask)

    # --- whole-attribute-set editors + remaining converter family
    #     (flatten/limit/merge/stringify/replace_all_patterns over the
    #     flat columnar attribute model; pkg/ottl/ottlfuncs) ---

    @staticmethod
    def _go_str_array(arr) -> pa.Array:
        """pcommon.Value.AsString rendering for a column: strings as-is,
        bools 'true'/'false', numbers decimal, nested values as compact
        JSON (the pdata jsoniter rendering)."""
        import json as _json

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        if pa.types.is_string(t):
            return arr
        if pa.types.is_boolean(t):
            return pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
        if pa.types.is_integer(t) or pa.types.is_floating(t) \
                or pa.types.is_temporal(t):
            return pc.cast(arr, pa.string())
        def strip(v):
            if isinstance(v, dict):
                return {k: strip(x) for k, x in v.items() if x is not None}
            if isinstance(v, list):
                return [strip(x) for x in v]
            return v
        return pa.array(
            [None if v is None else _json.dumps(strip(v), separators=(",", ":"))
             for v in arr.to_pylist()], pa.string())

    def _op_stringify(self, tbl, mask, target: str, src: str):
        # String(x) over nested values — JSON rendering like pdata
        return _masked(tbl, target,
                       self._go_str_array(_val(tbl, Col(src))), mask)

    def _op_fnv64a(self, tbl, mask, target: str, src: str):
        # func_fnv.go: FNV-1a 64 of the string, as int64 (two's
        # complement of the unsigned digest, Go int64(h.Sum64()))
        col_ = _val(tbl, Col(src))
        outs = []
        for s in col_.to_pylist():
            if s is None:
                outs.append(None)
                continue
            h = 0xCBF29CE484222325
            for b in s.encode():
                h ^= b
                h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            outs.append(h - (1 << 64) if h >= (1 << 63) else h)
        return _masked(tbl, target, pa.array(outs, pa.int64()), mask)

    def _op_to_bool(self, tbl, mask, target: str, src: str):
        # func_bool.go: strconv.ParseBool for strings, != 0 for
        # numbers; unparseable strings -> null (per-row error shape)
        col_ = _val(tbl, Col(src))
        t = col_.type
        if pa.types.is_boolean(t):
            out = col_
        elif pa.types.is_integer(t) or pa.types.is_floating(t):
            out = pc.not_equal(col_, 0)
        else:
            truthy = pa.array(["1", "t", "T", "TRUE", "true", "True"],
                              pa.string())
            falsy = pa.array(["0", "f", "F", "FALSE", "false", "False"],
                             pa.string())
            is_t = pc.is_in(col_, value_set=truthy)
            is_f = pc.is_in(col_, value_set=falsy)
            out = pc.if_else(pc.or_(is_t, is_f), is_t,
                             pa.nulls(tbl.num_rows, pa.bool_()))
        return _masked(tbl, target, out, mask)

    def _op_is_empty(self, tbl, mask, target: str, src: str):
        # func_is_empty.go as a VALUE converter (bool column)
        col_ = _val(tbl, Col(src))
        t = col_.type
        if pa.types.is_string(t):
            out = pc.equal(pc.utf8_length(col_), 0)
        elif pa.types.is_list(t) or pa.types.is_map(t):
            out = pc.equal(pc.list_value_length(col_), 0)
        elif pa.types.is_struct(t):
            out = pa.array([t.num_fields == 0] * tbl.num_rows)
        else:
            out = pa.array([False] * tbl.num_rows)
        return _masked(tbl, target, pc.fill_null(out, False), mask)

    def _op_list_enumerate_concat(self, tbl, mask, target: str, src: str,
                                  sep: str = ":"):
        # MapEach(slice, (i, v) => Concat([String(i), sep, String(v)],
        # "")) — vectorized: element position within its row, joined
        # with the element rendering
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        offs, flat = self._list_parts(col_)
        offs = offs - offs[0]
        pos = np.arange(len(flat)) - np.repeat(offs[:-1], np.diff(offs))
        joined = pc.binary_join_element_wise(
            pc.cast(pa.array(pos), pa.string()),
            self._go_str_array(flat), sep)
        out = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), joined)
        return _masked(tbl, target, out, mask)

    def _op_map_each_kv(self, tbl, mask, target: str, src: str,
                        sep: str = ":"):
        # MapEach(map, (k, v) => Concat([k, sep, String(v)], "")) —
        # same keys, values rendered as "<k><sep><String(v)>"
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        arrays, names = [], []
        for f in col_.type:
            v = self._go_str_array(pc.struct_field(col_, f.name))
            arrays.append(pc.binary_join_element_wise(
                pa.scalar(f.name), v, sep).combine_chunks()
                if isinstance(v, pa.ChunkedArray)
                else pc.binary_join_element_wise(pa.scalar(f.name), v, sep))
            names.append(f.name)
        out = pa.StructArray.from_arrays(arrays, names=names)
        return _masked(tbl, target, out, mask)

    def _op_struct_rename(self, tbl, mask, target: str, src: str,
                          prefix: str = "", mapping: dict | None = None):
        # MapKeys(map, (k, _) => Concat([prefix, k], "")) — struct
        # field names are schema constants, so renaming is free
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        arrays, names = [], []
        for f in col_.type:
            arrays.append(pc.struct_field(col_, f.name))
            names.append((mapping or {}).get(f.name, prefix + f.name))
        out = pa.StructArray.from_arrays(arrays, names=names)
        return _masked(tbl, target, out, mask)

    def _struct_select(self, tbl, mask, target, src, keep_names):
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        arrays, names = [], []
        for f in col_.type:
            if f.name in keep_names:
                arrays.append(pc.struct_field(col_, f.name))
                names.append(f.name)
        if not arrays:
            out = pa.nulls(tbl.num_rows, pa.struct([]))
        else:
            out = pa.StructArray.from_arrays(arrays, names=names)
        return _masked(tbl, target, out, mask)

    def _op_struct_keep_keys(self, tbl, mask, target: str, src: str,
                             keys: list[str]):
        # keep_keys(attributes["foo"], [...]) — nested-map variant
        return self._struct_select(tbl, mask, target, src, set(keys))

    def _op_struct_delete_keys(self, tbl, mask, target: str, src: str,
                               keys: list[str]):
        col_ = _val(tbl, Col(src))
        keep = {f.name for f in col_.type} - set(keys)
        return self._struct_select(tbl, mask, target, src, keep)

    def _op_struct_keep_matching(self, tbl, mask, target: str, src: str,
                                 pattern: str):
        import re as _re

        rx = _re.compile(pattern)
        col_ = _val(tbl, Col(src))
        keep = {f.name for f in col_.type if rx.search(f.name)}
        return self._struct_select(tbl, mask, target, src, keep)

    def _op_struct_delete_matching(self, tbl, mask, target: str, src: str,
                                   pattern: str):
        import re as _re

        rx = _re.compile(pattern)
        col_ = _val(tbl, Col(src))
        keep = {f.name for f in col_.type if not rx.search(f.name)}
        return self._struct_select(tbl, mask, target, src, keep)

    def _flatten_entries(self, n_rows: int, top: list, prefix: str,
                         max_depth: int, resolve_conflicts: bool) -> list:
        """func_flatten.go's flattenMap ported to columns: nested
        columns expand to dotted names (list elements to `.i`, or to
        the conflict-counter scheme with resolveConflicts), depth-
        gated exactly like flattenData. Per-SCHEMA recursion — every
        produced column stays a vectorized Arrow array."""
        result: dict[str, Any] = {}
        counters: dict[str, int] = {}

        def put(key, arr):
            if resolve_conflicts:
                if key in result:
                    nk = f"{key}.{counters[key]}"
                    counters[key] += 1
                    result[nk] = arr
                else:
                    counters[key] = 0
                    result[key] = arr
            else:
                result[key] = arr  # later wins, position kept

        def elems(arr):
            # element-i extraction that PRESERVES null/short rows as
            # null slots (list_flatten drops them — probe-caught)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            lens = pc.fill_null(pc.list_value_length(arr), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            values = arr.values
            maxlen = int(lens.max()) if len(lens) else 0
            for i in range(maxlen):
                ok = lens > i
                idx = np.where(ok, offs[:-1] + i, 0)
                elem = values.take(pa.array(idx))
                elem = pc.if_else(pa.array(ok), elem,
                                  pa.nulls(len(ok), elem.type))
                yield i, elem

        def flatten_map(arr, pfx, depth):
            pfx = pfx + "." if pfx else ""
            for f in arr.type:
                flatten_value(pfx + f.name, pc.struct_field(arr, f.name), depth)

        def flatten_value(key, arr, depth):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            t = arr.type
            if pa.types.is_struct(t) and depth < max_depth:
                flatten_map(arr, key, depth + 1)
            elif pa.types.is_list(t) and depth < max_depth:
                for i, elem in elems(arr):
                    et = elem.type
                    if pa.types.is_struct(et) and depth + 1 < max_depth:
                        flatten_map(elem, f"{key}.{i}", depth + 2)
                    elif pa.types.is_list(et) and depth + 1 < max_depth:
                        for j, e2 in elems(elem):
                            flatten_value(f"{key}.{i}.{j}", e2, depth + 2)
                    elif resolve_conflicts:
                        put(key, elem)
                    else:
                        put(f"{key}.{i}", elem)
            else:
                put(key, arr)

        pfx = prefix + "." if prefix else ""
        for name, arr in top:
            flatten_value(pfx + name, arr, 0)
        return list(result.items())

    @staticmethod
    def _no_mask(mask, editor: str):
        # schema-level editors rewrite the COLUMN SET — a row mask
        # would need per-row schemas, which Arrow batches cannot hold;
        # fail loud rather than silently ignore the `where`
        if mask is not None:
            raise ValueError(
                f"{editor} rewrites the whole attribute set and cannot "
                "be row-masked with `where` in the columnar model")

    def _op_flatten_all(self, tbl, mask, prefix: str = "",
                        depth: int | None = None,
                        resolve_conflicts: bool = False):
        # flatten(attributes[, prefix][, depth=N][, resolveConflicts])
        # over the whole flat attribute set
        self._no_mask(mask, "flatten(attributes)")
        import sys

        top = [(name, tbl[name]) for name in tbl.column_names]
        entries = self._flatten_entries(
            tbl.num_rows, top, prefix,
            depth if depth is not None else sys.maxsize, resolve_conflicts)
        cols = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for _, a in entries]
        return pa.table(cols, names=[n for n, _ in entries])

    def _op_struct_flatten(self, tbl, mask, target: str, src: str,
                           depth: int | None = None,
                           resolve_conflicts: bool = False):
        # flatten(attributes["test"]) — flatten INSIDE a struct column
        import sys

        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        top = [(f.name, pc.struct_field(col_, f.name)) for f in col_.type]
        entries = self._flatten_entries(
            tbl.num_rows, top, "",
            depth if depth is not None else sys.maxsize, resolve_conflicts)
        arrays = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                  for _, a in entries]
        out = pa.StructArray.from_arrays(arrays, names=[n for n, _ in entries])
        return _masked(tbl, target, out, mask)

    def _op_limit_table(self, tbl, mask, max_keys: int,
                        priority_keys: list[str] | None = None):
        # func_limit.go over the whole attribute set: priority keys
        # first, then column order, up to max_keys
        self._no_mask(mask, "limit(attributes, ...)")
        if tbl.num_columns <= max_keys:
            return tbl
        keep = [k for k in (priority_keys or []) if k in tbl.column_names]
        for c in tbl.column_names:
            if len(keep) >= max_keys:
                break
            if c not in keep:
                keep.append(c)
        return tbl.select(keep[:max_keys])

    def _op_merge_into(self, tbl, mask, strategy: str = "upsert",
                       src: str | None = None, literal: dict | None = None):
        # merge_maps(attributes, <src map>, strategy) with the whole
        # attribute set as target: source fields become top-level
        # columns. insert fills only nulls/absent; update only
        # overwrites existing; upsert does both (func_merge_maps.go).
        if strategy not in ("insert", "update", "upsert"):
            raise ValueError(f"merge_maps: invalid strategy {strategy!r}")
        n = tbl.num_rows
        if src is not None:
            scol = _val(tbl, Col(src))
            if isinstance(scol, pa.ChunkedArray):
                scol = scol.combine_chunks()
            items = [(f.name, pc.struct_field(scol, f.name))
                     for f in scol.type]
        else:
            items = [(k, pa.array([v] * n)) for k, v in (literal or {}).items()]
        for name, sv in items:
            if name in tbl.column_names:
                tv = _val(tbl, Col(name))
                if tv.type != sv.type:
                    if pa.types.is_null(tv.type):
                        tv = pc.cast(tv, sv.type)
                    else:
                        sv = pc.cast(sv, tv.type, safe=False)
                if strategy == "insert":
                    v = pc.coalesce(tv, sv)
                elif strategy == "update":
                    v = pc.if_else(pc.and_kleene(pc.is_valid(tv),
                                                 pc.is_valid(sv)), sv, tv)
                else:
                    v = pc.coalesce(sv, tv)
                tbl = _masked(tbl, name, v, mask)
            elif strategy != "update":
                tbl = _masked(tbl, name, sv, mask)
        return tbl

    def _op_set_all(self, tbl, mask, literal: dict):
        # set(attributes, {literal map}): replace the entire attribute
        # set with the literal's keys
        self._no_mask(mask, "set(attributes, ...)")
        n = tbl.num_rows
        return pa.table({k: pa.array([v] * n) for k, v in literal.items()})

    def _op_make_map(self, tbl, mask, target: str, spec: dict):
        # set(path, {"k": <literal|path|converter>, ...}) — build a
        # struct column from the spec; leaves are ["lit", v] /
        # ["col", name] / ["map", {subspec}]
        n = tbl.num_rows

        def build(node):
            kind, payload = node
            if kind == "lit":
                return (pa.nulls(n) if payload is None
                        else pa.array([payload] * n))
            if kind == "col":
                v = resolve_col(tbl, payload)
                return v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            arrays = [build(sub) for sub in payload.values()]
            return pa.StructArray.from_arrays(arrays, names=list(payload.keys()))

        return _masked(tbl, target, build(["map", spec]), mask)

    def _op_when(self, tbl, mask, target: str, condition: Any,
                 then: Any, otherwise: Any):
        # func_when.go: When(() => cond, a, b) — vectorized if_else
        # over the compiled condition mask
        m = compile_predicate(condition)(tbl)
        n = tbl.num_rows
        tv, ov = _val(tbl, then), _val(tbl, otherwise)
        if not isinstance(tv, (pa.Array, pa.ChunkedArray)):
            tv = pa.array([tv] * n)
        if not isinstance(ov, (pa.Array, pa.ChunkedArray)):
            ov = pa.array([ov] * n)
        if tv.type != ov.type:
            ov = pc.cast(ov, tv.type, safe=False)
        return _masked(tbl, target, pc.if_else(m, tv, ov), mask)

    def _op_replace_all_patterns(self, tbl, mask, mode: str, pattern: str,
                                 replacement: str):
        # func_replace_all_patterns.go: mode "key" renames every
        # matching column; mode "value" regex-replaces every string
        # column's values
        import re as _re

        if mode == "key":
            self._no_mask(mask, 'replace_all_patterns(attributes, "key", ...)')
            rx = _re.compile(pattern)
            names = [rx.sub(replacement.replace("$", "\\"), c)
                     for c in tbl.column_names]
            return tbl.rename_columns(names)
        if mode != "value":
            raise ValueError(f"replace_all_patterns: bad mode {mode!r}")
        for c in tbl.column_names:
            if pa.types.is_string(tbl.schema.field(c).type):
                tbl = _masked(tbl, c, pc.replace_substring_regex(
                    _val(tbl, Col(c)), pattern=pattern,
                    replacement=replacement), mask)
        return tbl

    # ParseSeverity "2xx".."5xx" range placeholders
    # (func_parse_severity.go:16-26,202-214)
    _SEV_HTTP_RANGES = {"2xx": (200, 299), "3xx": (300, 399),
                        "4xx": (400, 499), "5xx": (500, 599)}

    def _op_parse_severity_custom(self, tbl, mask, target: str, src: str,
                                  mapping: dict):
        # func_parse_severity.go with an explicit criteria map:
        # {"level": [{"equals": [...]}, {"range": {"min","max"}|"2xx"}]}
        # — first matching level wins; no match -> null. Type-strict
        # like the reference (criteria.evaluate :145-162): STRING
        # values match only `equals`, NUMERIC values only `range`.
        col_ = _val(tbl, Col(src))
        n = tbl.num_rows
        is_str = pa.types.is_string(col_.type)
        out = pa.nulls(n, pa.string())
        assigned = pa.array([False] * n)
        for level, crits in mapping.items():
            m = pa.array([False] * n)
            for crit in crits:
                if "equals" in crit and is_str:
                    vs = pa.array([str(v) for v in crit["equals"]],
                                  pa.string())
                    m = pc.or_(m, pc.fill_null(
                        pc.is_in(col_, value_set=vs), False))
                if "range" in crit and not is_str:
                    r = crit["range"]
                    if isinstance(r, str):
                        if r not in self._SEV_HTTP_RANGES:
                            raise ValueError(
                                f"unknown range placeholder: {r}")
                        lo, hi = self._SEV_HTTP_RANGES[r]
                    else:
                        lo, hi = r["min"], r["max"]
                    m = pc.or_(m, pc.fill_null(pc.and_(
                        pc.greater_equal(col_, lo),
                        pc.less_equal(col_, hi)), False))
            hit = pc.and_(m, pc.invert(assigned))
            out = pc.if_else(hit, pa.scalar(level, pa.string()), out)
            assigned = pc.or_(assigned, hit)
        return _masked(tbl, target, out, mask)

    _URL_RE = (
        r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.\-]*)://"
        r"(?:(?P<userinfo>[^@/?#]*)@)?"
        r"(?P<host>[^/:?#]*)(?::(?P<port>\d+))?"
        r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
    )

    def _op_url_semconv(self, tbl, mask, target: str, src: str):
        # func_url.go -> parseutils.ParseURI(semconv=true)
        # (internal/coreinternal/parseutils/uri.go:56-97): one
        # extract_regex pass building the url.* semconv struct.
        # Divergence noted: url.original is the INPUT string (Go
        # re-renders through net/url's normalization).
        col_ = pc.cast(_val(tbl, Col(src)), pa.string())
        ex = pc.extract_regex(col_, pattern=self._URL_RE)
        n = tbl.num_rows

        def g(name):
            v = pc.struct_field(ex, name)
            return v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v

        empty_to_null = lambda a: pc.if_else(  # noqa: E731
            pc.equal(pc.fill_null(a, ""), ""), pa.nulls(n, pa.string()), a)
        userinfo = g("userinfo")
        # username = userinfo up to the first ':', password = the rest
        uex = pc.extract_regex(pc.fill_null(userinfo, ""),
                               pattern=r"^(?P<u>[^:]*)(?::(?P<pw>.*))?$")
        username = empty_to_null(pc.struct_field(uex, "u"))
        password = empty_to_null(pc.struct_field(uex, "pw"))
        path = pc.fill_null(g("path"), "")
        pex = pc.extract_regex(path, pattern=r"\.(?P<ext>[^/.]+)$")
        arrays = [
            col_,                                  # url.original
            pc.fill_null(g("host"), ""),           # url.domain
            pc.fill_null(g("scheme"), ""),         # url.scheme
            path,                                  # url.path
            pc.cast(empty_to_null(g("port")), pa.int64()),  # url.port
            empty_to_null(g("fragment")),          # url.fragment
            empty_to_null(userinfo),               # url.user_info
            username, password,
            empty_to_null(g("query")),             # url.query
            pc.struct_field(pex, "ext"),           # url.extension
        ]
        names = ["url.original", "url.domain", "url.scheme", "url.path",
                 "url.port", "url.fragment", "url.user_info",
                 "url.username", "url.password", "url.query",
                 "url.extension"]
        arrays = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                  for a in arrays]
        out = pa.StructArray.from_arrays(arrays, names=names)
        # unparseable rows (no scheme://) -> null struct like the error
        out = pc.if_else(pc.is_valid(ex), out, pa.nulls(n, out.type))
        return _masked(tbl, target, out, mask)

    def _op_from_unix(self, tbl, mask, target: str, src: str,
                      nanos: Any = 0):
        # func_unix.go: time.Unix(seconds, nanoseconds) -> timestamp
        sec = pc.cast(_val(tbl, Col(src)), pa.int64())
        ns = _val(tbl, nanos)
        if isinstance(ns, (pa.Array, pa.ChunkedArray)):
            ns = pc.cast(ns, pa.int64())
        total = pc.add(pc.multiply(sec, 1_000_000_000), ns)
        out = pc.cast(total, pa.timestamp("ns"))
        return _masked(tbl, target, out, mask)

    # --- OTTL lambda family over PATHS: runtime type dispatch -------
    # Filter/All/Any/Find compile to (param, op, value); the column
    # type picks the kernel — list columns use the vectorized list_*
    # ops on the VALUE param, struct columns fold KEY predicates at
    # the schema level (keys are schema constants in this model).

    _PYOPS = {"==": lambda a, b: a == b, "!=": lambda a, b: a != b,
              "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
              ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}

    def _lambda_dispatch(self, tbl, src, param):
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        if pa.types.is_struct(col_.type):
            if param != "key":
                raise ValueError(
                    "map lambdas must predicate on the KEY param "
                    "(value predicates over per-row maps are not columnar)")
            return col_, "struct"
        if param != "value":
            raise ValueError(
                "slice lambdas must predicate on the VALUE param")
        return col_, "list"

    def _op_ottl_filter(self, tbl, mask, target: str, src: str, param: str,
                        op: str, value: Any):
        col_, kind = self._lambda_dispatch(tbl, src, param)
        if kind == "list":
            return self._op_list_filter(tbl, mask, target, src, op, value)
        keep = {f.name for f in col_.type if self._PYOPS[op](f.name, value)}
        return self._struct_select(tbl, mask, target, src, keep)

    def _op_ottl_all(self, tbl, mask, target: str, src: str, param: str,
                     op: str, value: Any):
        col_, kind = self._lambda_dispatch(tbl, src, param)
        if kind == "list":
            return self._op_list_all(tbl, mask, target, src, op, value)
        ok = all(self._PYOPS[op](f.name, value) for f in col_.type)
        return _masked(tbl, target, pa.array([ok] * tbl.num_rows), mask)

    def _op_ottl_any(self, tbl, mask, target: str, src: str, param: str,
                     op: str, value: Any):
        col_, kind = self._lambda_dispatch(tbl, src, param)
        if kind == "list":
            return self._op_list_any(tbl, mask, target, src, op, value)
        ok = any(self._PYOPS[op](f.name, value) for f in col_.type)
        return _masked(tbl, target, pa.array([ok] * tbl.num_rows), mask)

    def _op_ottl_find(self, tbl, mask, target: str, src: str, param: str,
                      op: str, value: Any, mapped_sep: str | None = None):
        col_, kind = self._lambda_dispatch(tbl, src, param)
        if kind == "struct":
            names = [f.name for f in col_.type if self._PYOPS[op](f.name, value)]
            if not names:
                return _masked(tbl, target, pa.nulls(tbl.num_rows), mask)
            found = pc.struct_field(col_, names[0])
            if mapped_sep is not None:  # (k, v) => k <sep> String(v)
                found = pc.binary_join_element_wise(
                    pa.scalar(names[0]), self._go_str_array(found), mapped_sep)
            return _masked(tbl, target, found, mask)
        if mapped_sep is None:
            return self._op_list_find(tbl, mask, target, src, op, value)
        # mapped slice Find: first-match position <sep> String(elem)
        offs, flat, keep = self._list_elem_mask(tbl, src, op, value)
        lens = np.diff(offs)
        pos = np.arange(len(keep)) - np.repeat(offs[:-1], lens)
        big = np.where(keep, pos, np.iinfo(np.int64).max)
        first = np.minimum.reduceat(np.append(big, np.iinfo(np.int64).max),
                                    offs[:-1]) if len(offs) > 1 \
            else np.empty(0, np.int64)
        first = np.where(lens == 0, np.iinfo(np.int64).max, first)
        found_mask = first != np.iinfo(np.int64).max
        idx = np.where(found_mask, offs[:-1] + np.where(found_mask, first, 0), 0)
        vals = flat.take(pa.array(idx)) if len(flat) \
            else pa.nulls(len(lens), flat.type)
        joined = pc.binary_join_element_wise(
            pc.cast(pa.array(np.where(found_mask, first, 0)), pa.string()),
            self._go_str_array(vals), mapped_sep)
        out = pc.if_else(pa.array(found_mask), joined,
                         pa.nulls(len(lens), pa.string()))
        return _masked(tbl, target, out, mask)

    def _op_ottl_map_each(self, tbl, mask, target: str, src: str,
                          sep: str = ":"):
        # MapEach((k_or_i, v) => Concat([k, sep, String(v)], "")) —
        # list columns enumerate, struct columns render per field
        col_ = _val(tbl, Col(src))
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        if pa.types.is_struct(col_.type):
            return self._op_map_each_kv(tbl, mask, target, src, sep)
        return self._op_list_enumerate_concat(tbl, mask, target, src, sep)


def _et_parse_keep_decl(text: str):
    """ElementTree drops the <?xml?> declaration; remember it so the
    reference's round-trip outputs (which keep it) compare equal."""
    from xml.etree import ElementTree

    decl = ""
    stripped = text.lstrip()
    if stripped.startswith("<?xml"):
        end = stripped.index("?>") + 2
        decl = stripped[:end]
    return decl, ElementTree.fromstring(text)


def _et_findall_abs(root, path: str) -> list:
    """The reference uses absolute xmlquery XPaths (/a/b); translate
    the subset ElementTree understands: strip a leading /<root-tag>,
    map // to .//."""
    if path.startswith("//"):
        return root.findall("." + path)
    if path.startswith("/"):
        segs = path[1:].split("/")
        if segs[0] != root.tag:
            return []
        rel = "/".join(segs[1:])
        if rel.startswith("/"):  # /root//x — descendant axis mid-path
            rel = "./" + rel     # "/x" -> ".//x"
        return [root] if not rel else root.findall(rel)
    return root.findall(path)


def attrs_to_elements_xml(text: str, xpath: str | None = None) -> str:
    """func_convert_attributes_to_elements_xml.go: convert attributes
    of the matched elements (default //@* = everywhere) into child
    elements appended last, in attribute order; selecting an element
    (not its attributes) converts nothing, as in the reference."""
    from xml.etree import ElementTree

    decl, root = _et_parse_keep_decl(text)
    if not xpath or xpath == "//@*":
        targets = list(root.iter())
    elif xpath.endswith("/@*"):
        targets = _et_findall_abs(root, xpath[:-3])
    else:
        targets = []  # element-node matches are skipped by the reference
    for el in targets:
        for k, v in list(el.attrib.items()):
            child = ElementTree.Element(k)
            child.text = v
            el.append(child)
        el.attrib.clear()
    return decl + ElementTree.tostring(root, encoding="unicode",
                                       short_empty_elements=False)


def text_to_elements_xml(text: str, xpath: str | None = None,
                         element_name: str = "value") -> str:
    """func_convert_text_to_elements_xml.go: wrap extraneous text
    nodes in a dedicated element. A text node is extraneous when its
    parent holds more than one text/element child; a lone text child
    stays bare (reference rule: valueCount==0 or value+element<=1
    leaves the node alone)."""
    from xml.etree import ElementTree

    # the reference accepts multi-root fragments
    # (`<a>..</a><c>..</c>`); ElementTree needs one root — wrap and
    # strip a synthetic one
    fragment = False
    try:
        decl, root = _et_parse_keep_decl(text)
    except ElementTree.ParseError:
        decl, root = _et_parse_keep_decl(f"<__frag__>{text}</__frag__>")
        fragment = True

    def wrap(el):
        for c in list(el):
            wrap(c)
        value_count = (1 if el.text else 0) + sum(1 for c in el if c.tail)
        if value_count == 0 or value_count + len(el) <= 1:
            return
        new_children = []
        if el.text:
            w = ElementTree.Element(element_name)
            w.text = el.text
            el.text = None
            new_children.append(w)
        for c in list(el):
            new_children.append(c)
            if c.tail:
                w = ElementTree.Element(element_name)
                w.text = c.tail
                c.tail = None
                new_children.append(w)
        for c in list(el):
            el.remove(c)
        el.extend(new_children)

    if xpath and xpath != "/":
        targets = _et_findall_abs(root, xpath)
        if fragment:  # absolute path matches the fragment's real roots
            targets = targets or [c for c in root
                                  if xpath.strip("/") == c.tag]
    else:
        targets = list(root) if fragment else [root]
    for el in targets:
        wrap(el)
    out = ElementTree.tostring(root, encoding="unicode",
                               short_empty_elements=False)
    if fragment:
        out = out[len("<__frag__>"):-len("</__frag__>")]
    return decl + out


class ChainStatement:
    """A statement with prerequisite scratch-column statements (the
    textual front-end's nested converter calls); applies each in order
    and drops the scratch columns afterwards."""

    def __init__(self, statements: list, drop: list[str]):
        self.statements = statements
        self.drop = set(drop)
        self.editor = "chain"
        self.args = {"steps": [st.editor for st in statements]}

    def __call__(self, tbl: pa.Table) -> pa.Table:
        for st in self.statements:
            tbl = st(tbl)
        keep = [c for c in tbl.column_names if c not in self.drop]
        return tbl.select(keep)


@register("transform")
class TransformStage:
    """A fused statement sequence; one map_batches for the whole list."""

    def __init__(self, statements: list[dict[str, Any] | Statement], error_mode: str = "ignore"):
        self.statements = [
            s if not isinstance(s, dict)
            else Statement(s["editor"], s.get("args", {}), s.get("where"))
            for s in statements
        ]
        self.error_mode = error_mode

    def fn(self, batch: pa.Table) -> pa.Table:
        for st in self.statements:
            try:
                batch = st(batch)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, KeyError):
                if self.error_mode == "propagate":
                    raise
                # ignore: leave the batch unchanged for this statement
        return batch

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


@register("filter")
class FilterStage:
    """stanza filter / filterprocessor.

    ``mode='drop'`` removes matching rows (stanza filter,
    transformer/filter/config.go:38-68; filterprocessor logs.go:89-98
    'drop matching'); ``mode='keep'`` keeps matching rows.
    ``drop_ratio`` (stanza filter) drops only that fraction of the
    matching rows, selected deterministically by hashing ``ratio_key``
    — seeded-hash-mod, not RNG, so reruns are stable.
    """

    def __init__(self, condition: Any, mode: str = "drop", drop_ratio: float = 1.0, ratio_key: str | None = None):
        self.pred = compile_predicate(condition)
        if mode not in ("drop", "keep"):
            raise ValueError("mode must be drop|keep")
        self.mode = mode
        self.drop_ratio = drop_ratio
        self.ratio_key = ratio_key

    def fn(self, batch: pa.Table) -> pa.Table:
        m = self.pred(batch)
        if self.mode == "drop":
            m = pc.invert(m)  # keep-mask
            if self.drop_ratio < 1.0 and self.ratio_key is not None:
                h = md5_number_lower_arrow(pc.cast(batch[self.ratio_key], pa.string()))
                hv = h.to_numpy(zero_copy_only=False)
                spared = pa.array((hv % 10_000) >= int(self.drop_ratio * 10_000))
                m = pc.or_(m, spared)
        return batch.filter(m)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# derived from the ANSI CSI escape table the reference embeds
# (transformer/regexreplace/config.go:21)
ANSI_CSI_ESCAPE_RE = r"\x1B\[[\x30-\x3F]*[\x20-\x2F]*[\x40-\x7E]"


@register("regex_replace")
class RegexReplaceStage:
    """stanza regex_replace (transformer/regexreplace/config.go:39-81):
    substitute every match of ``regex`` (or the named
    ``ansi_control_sequences`` preset) in ``field`` with
    ``replace_with``. Exactly one of regex / regex_name must be set."""

    def __init__(self, field: str, regex: str | None = None,
                 regex_name: str | None = None, replace_with: str = ""):
        if (regex is None) == (regex_name is None):
            raise ValueError("either regex or regex_name must be set")
        if regex_name is not None:
            if regex_name != "ansi_control_sequences":
                raise ValueError(f"regex_name {regex_name} is unknown")
            regex = ANSI_CSI_ESCAPE_RE
        self.field = field
        self.regex = regex
        self.replace_with = replace_with

    def fn(self, batch: pa.Table) -> pa.Table:
        col = batch[self.field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = pc.replace_substring_regex(col, pattern=self.regex,
                                         replacement=self.replace_with)
        return batch.set_column(batch.schema.get_field_index(self.field),
                                self.field, out)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
