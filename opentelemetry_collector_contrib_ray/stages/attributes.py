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


def _action_to_statement(a: dict[str, Any]) -> Statement:
    act = a["action"]
    key = a["key"]
    if act == "insert":
        # set only where currently missing (null)
        return Statement("coalesce", {"target": key, "sources": [Col(key)], "default": a["value"]})
    if act == "update":
        return Statement("set", {"target": key, "value": a["value"]},
                         where=("not_null", Col(key)))
    if act == "upsert":
        return Statement("set", {"target": key, "value": a["value"]})
    if act == "delete":
        return Statement("delete_keys", {"keys": [key]})
    if act == "hash":
        return Statement("hash", {"target": key, "src": key})
    if act == "extract":
        return Statement("extract_patterns", {"src": key, "pattern": a["pattern"]})
    if act == "convert":
        return Statement("cast", {"target": key, "to": a["converted_type"]})
    raise ValueError(f"unknown attributes action {act!r}")


@register("attributes")
class AttributesProcessor(TransformStage):
    def __init__(self, actions: list[dict[str, Any]], error_mode: str = "ignore"):
        super().__init__([_action_to_statement(a) for a in actions], error_mode=error_mode)


@register("redaction")
class Redaction(TransformStage):
    """redactionprocessor: drop non-allowlisted columns, mask value
    substrings matching any blocked pattern."""

    def __init__(
        self,
        allowed_keys: list[str],
        blocked_value_patterns: list[str] | None = None,
        mask: str = "****",
    ):
        statements: list[Statement] = [Statement("keep_keys", {"keys": allowed_keys})]
        for pat in blocked_value_patterns or []:
            for k in allowed_keys:
                statements.append(
                    Statement("replace_pattern", {"target": k, "pattern": pat, "replacement": mask})
                )
        super().__init__(statements, error_mode="ignore")
