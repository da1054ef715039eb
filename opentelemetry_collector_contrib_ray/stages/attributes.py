"""attributesprocessor / resourceprocessor — ordered action lists.

Reference semantics (processor/attributesprocessor/README.md:25-38;
engine internal/coreinternal/attraction/attraction.go): an ordered
list of actions over attributes:

  insert  — set only if the key is absent
  update  — set only if the key exists
  upsert  — set unconditionally
  delete  — remove the key
  hash    — replace the value with its hash
  extract — regex named groups from the value -> new attributes
  convert — change the value's type

In the columnar model, attributes are columns, so each action compiles
to one OTTL-lite Statement (stages/transform.py) and the whole action
list fuses into a single map_batches — the same execution shape the
reference gets from its per-record action loop, vectorized.

redact() is the redactionprocessor analog (processor/redactionprocessor):
keep only allowed columns and mask value substrings matching blocked
patterns.
"""

from __future__ import annotations

from typing import Any

from ..expr import Col
from . import register
from .transform import Statement, TransformStage


def _action_to_statement(a: dict[str, Any], match: Any | None = None) -> Statement:
    """``match``: the processor-level include/exclude gate
    (processor/attributesprocessor/config.go:23 embeds MatchConfig) —
    actions apply only to matching records. With a gate, ``delete``
    nulls the value on matching rows (the column must survive for the
    non-matching rows) instead of dropping the whole column."""
    act = a["action"]
    key = a["key"]

    def gated(p):
        return p if match is None else ("and", match, p)

    if act == "insert":
        if match is None:
            # set only where currently missing (null)
            return Statement("coalesce", {"target": key, "sources": [Col(key)], "default": a["value"]})
        return Statement("set", {"target": key, "value": a["value"]},
                         where=gated(("is_null", Col(key))))
    if act == "update":
        return Statement("set", {"target": key, "value": a["value"]},
                         where=gated(("not_null", Col(key))))
    if act == "upsert":
        return Statement("set", {"target": key, "value": a["value"]},
                         where=match)
    if act == "delete":
        if match is None:
            return Statement("delete_keys", {"keys": [key]})
        return Statement("null_value", {"target": key}, where=match)
    if act == "hash":
        return Statement("hash", {"target": key, "src": key}, where=match)
    if act == "extract":
        return Statement("extract_patterns", {"src": key, "pattern": a["pattern"]},
                         where=match)
    if act == "convert":
        return Statement("cast", {"target": key, "to": a["converted_type"]},
                         where=match)
    raise ValueError(f"unknown attributes action {act!r}")


@register("attributes")
class AttributesProcessor(TransformStage):
    def __init__(self, actions: list[dict[str, Any]], error_mode: str = "ignore",
                 match_condition: Any | None = None):
        super().__init__([_action_to_statement(a, match_condition)
                          for a in actions], error_mode=error_mode)


@register("redaction")
class Redaction:
    """redactionprocessor with the full config surface
    (processor/redactionprocessor/config.go:31-92, processor.go
    maskValue:385-414):

      * ``allowed_keys`` (fail-closed) or ``allow_all_keys``;
      * ``ignored_keys`` / ``ignored_key_patterns`` pass through
        untouched;
      * ``blocked_key_patterns``: keys matching any pattern get the
        WHOLE value masked/hashed;
      * ``blocked_value_patterns`` (the reference's blocked_values):
        matching substrings masked/hashed — unless the whole value
        matches an ``allowed_values`` regex;
      * ``hash_function`` "" (fixed mask) | md5 | sha1 | sha3 — each
        regex MATCH is replaced by its hash (processor.go:385-402);
        the hash path is per-row over matching rows only, the mask
        path is one vectorized replace per (column, pattern);
      * ``summary`` info|debug: per-row ``redaction.masked.count``
        (+ ``.keys`` under debug) and the schema-level
        ``redaction.redacted.count`` of deleted keys (addMetaAttrs).
    """

    def __init__(
        self,
        allowed_keys: list[str] | None = None,
        blocked_value_patterns: list[str] | None = None,
        mask: str = "****",
        allow_all_keys: bool = False,
        blocked_key_patterns: list[str] | None = None,
        ignored_keys: list[str] | None = None,
        ignored_key_patterns: list[str] | None = None,
        allowed_values: list[str] | None = None,
        hash_function: str = "",
        summary: str = "silent",
    ):
        import re as _re

        if not allow_all_keys and not allowed_keys:
            raise ValueError(
                "allowed_keys is empty: the allow list fails closed — "
                "set allow_all_keys: true to keep every key")
        if hash_function not in ("", "md5", "sha1", "sha3"):
            raise ValueError(f"unsupported hash_function {hash_function!r}")
        if summary not in ("silent", "info", "debug"):
            raise ValueError(f"unsupported summary {summary!r}")
        self.allowed_keys = allowed_keys or []
        self.allow_all_keys = allow_all_keys
        self.blocked_values = blocked_value_patterns or []
        self.blocked_key_res = [_re.compile(p)
                                for p in (blocked_key_patterns or [])]
        self.ignored = set(ignored_keys or [])
        self.ignored_res = [_re.compile(p)
                            for p in (ignored_key_patterns or [])]
        self.allowed_values = allowed_values or []
        self.mask = mask
        self.hash_function = hash_function
        self.summary = summary

    def _hasher(self):
        import hashlib

        return {"md5": hashlib.md5, "sha1": hashlib.sha1,
                "sha3": hashlib.sha3_256}[self.hash_function]

    def _mask_column(self, col, pattern: str, whole: bool):
        """-> (new column, changed mask). Vectorized mask path; the
        hash path loops only over rows the pattern matches."""
        import re as _re

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        s = pc.cast(col, pa.string())
        hit = pc.fill_null(pc.match_substring_regex(s, pattern), False)
        if self.allowed_values:
            allowed = None
            for ap in self.allowed_values:
                m = pc.fill_null(pc.match_substring_regex(s, ap), False)
                allowed = m if allowed is None else pc.or_(allowed, m)
            hit = pc.and_(hit, pc.invert(allowed))
        if not pc.any(hit).as_py():
            return col, hit
        if not self.hash_function:
            if whole:
                new = pc.if_else(hit, pa.scalar(self.mask, pa.string()), s)
            else:
                rep = pc.replace_substring_regex(s, pattern=pattern,
                                                 replacement=self.mask)
                new = pc.if_else(hit, rep, s)
            return new, hit
        # hash mode: per-match digest (processor.go hashFunc)
        rx = _re.compile(pattern)
        h = self._hasher()

        def sub(m: "_re.Match") -> str:
            return h(m.group(0).encode()).hexdigest()

        vals = s.to_numpy(zero_copy_only=False).astype(object)
        for i in np.nonzero(hit.to_numpy(zero_copy_only=False))[0]:
            v = vals[int(i)]
            vals[int(i)] = (h(v.encode()).hexdigest() if whole
                            else rx.sub(sub, v))
        return pa.array(vals, pa.string()), hit

    def fn(self, batch):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n = batch.num_rows
        redacted: list[str] = []
        if not self.allow_all_keys:
            keep = [c for c in batch.column_names
                    if c in self.allowed_keys or c in self.ignored
                    or any(r.search(c) for r in self.ignored_res)]
            redacted = [c for c in batch.column_names if c not in keep]
            batch = batch.select(keep)
        masked_count = np.zeros(n, dtype=np.int64)
        masked_keys: dict[str, np.ndarray] = {}
        for c in list(batch.column_names):
            if c in self.ignored or any(r.search(c) for r in self.ignored_res):
                continue
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not (pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type)):
                continue
            changed_any = np.zeros(n, dtype=bool)
            if any(r.search(c) for r in self.blocked_key_res):
                col, hit = self._mask_column(col, ".*", whole=True)
                changed_any |= hit.to_numpy(zero_copy_only=False)
            else:
                for pat in self.blocked_values:
                    col, hit = self._mask_column(col, pat, whole=False)
                    changed_any |= hit.to_numpy(zero_copy_only=False)
            if changed_any.any():
                batch = batch.set_column(
                    batch.schema.get_field_index(c), c, col)
                masked_count += changed_any
                masked_keys[c] = changed_any
        if self.summary in ("info", "debug"):
            batch = batch.append_column(
                "redaction.masked.count", pa.array(masked_count))
            batch = batch.append_column(
                "redaction.redacted.count",
                pa.array(np.full(n, len(redacted), dtype=np.int64)))
            if self.summary == "debug":
                names = sorted(masked_keys)
                lists = [",".join(k for k in names if masked_keys[k][i])
                         for i in range(n)]
                batch = batch.append_column(
                    "redaction.masked.keys", pa.array(lists, pa.string()))
                batch = batch.append_column(
                    "redaction.redacted.keys",
                    pa.array([",".join(sorted(redacted))] * n, pa.string()))
        return batch

    def apply(self, ds):
        import ray.data  # noqa: F401

        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
