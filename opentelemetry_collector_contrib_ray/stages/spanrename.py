"""spanprocessor — span rename from/to attributes + status update.

Reference: processor/spanprocessor/span.go —
  * processFromAttributes (:121-151): span name becomes the separator-
    joined values of the configured attributes, only when EVERY
    attribute is present on the span;
  * processToAttributes (:153-205): each rule's regex runs against the
    (current) span name; named submatches become attributes and the
    matched portions are replaced by ``{attr_name}`` placeholders in
    the new name; ``keep_original_name`` skips the rename,
    ``break_after_match`` stops at the first matching rule — per span,
    so later rules still run on spans earlier rules missed;
  * processUpdateStatus (:207-224): force status code (+ description
    for Error).

Columnar execution: one ``pc.extract_regex`` per rule for the
submatches and one ``pc.replace_substring_regex`` per rule for the
rename — the rule pattern is re-segmented into numbered capture
groups so the RE2 rewrite string can splice ``{attr}`` placeholders
between the original matched text (no per-row regex work).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..expr import resolve_col
from . import register


def _segment_pattern(pattern: str) -> tuple[str, str, list[str]]:
    """Split a pattern at its top-level ``(?P<name>...)`` groups and
    build (numbered_pattern, rewrite, group_names): every literal
    segment and every named group becomes a numbered capture, and the
    rewrite string keeps literal segments (backrefs) while swapping
    each named group for ``{name}``. RE2 rewrites support \\1..\\9, so
    at most 9 total segments are supported (plenty for rename rules).
    """
    segs: list[tuple[str, str | None]] = []  # (regex, group_name|None)
    i, lit_start, depth = 0, 0, 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        m = re.match(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>", pattern[i:]) \
            if depth == 0 else None
        if m:
            if i > lit_start:
                segs.append((pattern[lit_start:i], None))
            # find the balanced close paren
            j = i + m.end()
            d = 1
            while j < n and d:
                if pattern[j] == "\\":
                    j += 2
                    continue
                if pattern[j] == "(":
                    d += 1
                elif pattern[j] == ")":
                    d -= 1
                j += 1
            segs.append((pattern[i + m.end():j - 1], m.group(1)))
            i = lit_start = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    if n > lit_start:
        segs.append((pattern[lit_start:], None))

    def decapture(body: str) -> str:
        # pc.extract_regex rejects unnamed groups and nested captures
        # would shift backref numbering — make inner groups
        # non-capturing (in-pattern backrefs are not supported)
        out, j = [], 0
        while j < len(body):
            if body[j] == "\\":
                out.append(body[j:j + 2])
                j += 2
                continue
            if body[j] == "(" and not body[j:].startswith("(?"):
                out.append("(?:")
                j += 1
                continue
            out.append(body[j])
            j += 1
        return "".join(out)

    numbered, rewrite, names = [], [], []
    for k, (body, name) in enumerate(segs, start=1):
        if k > 9:
            raise ValueError(
                f"to_attributes rule needs more than 9 capture groups: {pattern!r}")
        if name is None:
            numbered.append(f"(?P<_seg{k}>{decapture(body)})")
            rewrite.append(f"\\{k}")
        else:
            numbered.append(f"(?P<{name}>{decapture(body)})")
            rewrite.append("{" + name + "}")
            names.append(name)
    return "".join(numbered), "".join(rewrite), names


@register("span_rename")
class SpanProcessor:
    """from_attributes / to_attributes / set-status over a flat span
    table whose span name lives in ``name_col``."""

    def __init__(self, name_col: str = "name",
                 from_attributes: list[str] | None = None,
                 separator: str = "",
                 to_attributes: list[str] | None = None,
                 keep_original_name: bool = False,
                 break_after_match: bool = False,
                 status_code: str | None = None,
                 status_description: str = "",
                 status_where=None,
                 match_condition=None):
        self.name_col = name_col
        self.from_attributes = from_attributes or []
        self.separator = separator
        self.rules = [( _segment_pattern(p), p) for p in (to_attributes or [])]
        self.keep_original_name = keep_original_name
        self.break_after_match = break_after_match
        if status_code is not None and status_code not in ("Ok", "Error", "Unset"):
            raise ValueError(f"bad status code {status_code!r}")
        self.status_code = status_code
        self.status_description = status_description
        from ..expr import compile_predicate

        self.status_pred = compile_predicate(status_where) \
            if status_where is not None else None
        # processor-level include/exclude gate (spanprocessor
        # config.go embeds MatchConfig): every mutation below applies
        # only where this predicate holds
        self.match_pred = compile_predicate(match_condition) \
            if match_condition is not None else None

    def fn(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        gate = self.match_pred(batch) if self.match_pred is not None else None
        if self.from_attributes:
            parts, ok = [], pa.array([True] * n)
            for a in self.from_attributes:
                if a not in batch.column_names:
                    ok = pa.array([False] * n)
                    parts = []
                    break
                v = resolve_col(batch, a)
                ok = pc.and_(ok, pc.is_valid(v))
                parts.append(pc.cast(v, pa.string()))
            if parts:
                if gate is not None:
                    ok = pc.and_(ok, gate)
                joined = pc.binary_join_element_wise(*parts, self.separator) \
                    if len(parts) > 1 else parts[0]
                old = resolve_col(batch, self.name_col) \
                    if self.name_col in batch.column_names \
                    else pa.nulls(n, pa.string())
                name = pc.if_else(ok, joined, old)
            else:
                name = resolve_col(batch, self.name_col)
            idx = (batch.column_names.index(self.name_col)
                   if self.name_col in batch.column_names else None)
            batch = (batch.set_column(idx, self.name_col, name)
                     if idx is not None
                     else batch.append_column(self.name_col, name))

        name = resolve_col(batch, self.name_col)
        matched_any = pa.array([False] * n)
        for (numbered, rewrite, group_names), _pat in self.rules:
            ex = pc.extract_regex(name, pattern=numbered)
            hit = pc.is_valid(ex)
            if gate is not None:
                hit = pc.and_(hit, gate)
            if self.break_after_match:
                hit = pc.and_(hit, pc.invert(matched_any))
            # extract_regex returns numbered+named groups; named ones
            # land as struct fields by their name
            for g in group_names:
                vals = pc.struct_field(ex, g)
                if g in batch.column_names:
                    old = resolve_col(batch, g)
                    if old.type != vals.type:
                        old = pc.cast(old, vals.type)
                    merged = pc.if_else(hit, vals, old)
                    batch = batch.set_column(
                        batch.column_names.index(g), g, merged)
                else:
                    batch = batch.append_column(
                        g, pc.if_else(hit, vals, pa.nulls(n, vals.type)))
            if not self.keep_original_name:
                new_name = pc.replace_substring_regex(
                    name, pattern=numbered, replacement=rewrite,
                    max_replacements=1)
                name = pc.if_else(hit, new_name, name)
            matched_any = pc.or_(matched_any, hit)
        batch = batch.set_column(batch.column_names.index(self.name_col),
                                 self.name_col, name)

        if self.status_code is not None:
            mask = self.status_pred(batch) if self.status_pred is not None \
                else pa.array([True] * n)
            if gate is not None:
                mask = pc.and_(mask, gate)
            code = pa.array([self.status_code] * n)
            msg_val = (self.status_description
                       if self.status_code == "Error" else "")
            for colname, vals in (("status_code", code),
                                  ("status_message",
                                   pa.array([msg_val] * n))):
                if colname in batch.column_names:
                    old = resolve_col(batch, colname)
                    batch = batch.set_column(
                        batch.column_names.index(colname), colname,
                        pc.if_else(mask, vals, old))
                else:
                    batch = batch.append_column(
                        colname, pc.if_else(mask, vals,
                                            pa.nulls(n, pa.string())))
        return batch

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
