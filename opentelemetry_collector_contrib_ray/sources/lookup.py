"""Deterministic lookup/enrichment table (FIXTURES.md F2).

Mirrors the file-backed lookup source of the reference's
lookupprocessor (processor/lookupprocessor/lookupsource/filelookup.go):
a small dict keyed by ``"{role}:{tool}"`` mapping to enrichment
fields. A few keys are intentionally absent (every ``system:*`` key)
so per-field ``default`` handling is exercised
(processor/lookupprocessor/processor.go:209-237 value extraction with
defaults; misses are silent).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import md5_number_lower_np
from ..schema import ROLES, TOOLS

LOOKUP_PATH = "/tmp/graft_transcripts/lookup.parquet"

_TEAM_BY_ROLE = {"user": "humans", "assistant": "agents", "tool": "infra"}
_TOOL_KIND = {
    "": "none",
    "bash": "io",
    "search": "io",
    "browser": "io",
    "editor": "io",
    "python": "compute",
}

# Per-field defaults applied on lookup miss (the fixture's F2 contract).
DEFAULTS = {"team": "unknown", "cost_weight": 1.0, "tool_kind": "none"}


def build_lookup_table() -> pa.Table:
    keys, teams, weights, kinds = [], [], [], []
    for role in ROLES:
        if role == "system":
            continue  # deliberate misses -> defaults path
        for tool in [""] + TOOLS:
            key = f"{role}:{tool}"
            keys.append(key)
            teams.append(_TEAM_BY_ROLE[role])
            # deterministic per key, exactly representable (k/8)
            weights.append(float(md5_number_lower_np([key])[0] % 64) / 8.0)
            kinds.append(_TOOL_KIND[tool])
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "team": pa.array(teams, pa.string()),
            "cost_weight": pa.array(weights, pa.float64()),
            "tool_kind": pa.array(kinds, pa.string()),
        }
    )


def ensure_lookup() -> str:
    """Write (once) the lookup parquet; path is stable for oracle SQL."""
    if os.path.exists(LOOKUP_PATH):
        return LOOKUP_PATH
    os.makedirs(os.path.dirname(LOOKUP_PATH), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(LOOKUP_PATH), suffix=".parquet")
    os.close(fd)
    pq.write_table(build_lookup_table(), tmp)
    os.replace(tmp, LOOKUP_PATH)
    return LOOKUP_PATH
