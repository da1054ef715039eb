"""Per-partition manifest checkpointing — resumable batch runs.

The reference checkpoints file fingerprint+offset per tailed file
(pkg/stanza/fileconsumer/internal/checkpoint/checkpoint.go:27-67,
internal/reader/reader.go:32) so a restart resumes mid-file. The
finite-table equivalent (SURVEY.md §4 'checkpoint / resume'): each
pipeline STAGE/PARTITION commits a manifest entry after its output is
fully written — entry = lineage (input fragments), metrics (rows,
wall seconds) and output location. On resume, committed entries are
skipped. Commit is atomic (write temp + rename) and the manifest is
commit-LAST so a crash mid-write leaves the entry absent, never
half-true.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
import time
from typing import Any
from urllib.parse import quote, unquote


class Manifest:
    """One atomic JSON file PER entry key under ``<root>/_manifest/``.

    Per-key files make concurrent resumers safe without locking: two
    processes committing different partitions never touch the same
    file, and a same-key race is an idempotent last-writer-wins
    (entries describe the same finished output). Each is_done/entry is
    one stat/read — no O(n) reload of a monolithic manifest (round-1
    ADVICE). A legacy ``_manifest.json`` from older runs is still
    read (merged under the per-key files)."""

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_manifest")
        self.legacy_path = os.path.join(root, "_manifest.json")
        os.makedirs(self.dir, exist_ok=True)

    def _key_path(self, key: str) -> str:
        return os.path.join(self.dir, quote(key, safe="") + ".json")

    def _legacy_entries(self) -> dict[str, Any]:
        if not os.path.exists(self.legacy_path):
            return {}
        with open(self.legacy_path) as f:
            return json.load(f).get("entries", {})

    def is_done(self, key: str) -> bool:
        return os.path.exists(self._key_path(key)) or key in self._legacy_entries()

    def entry(self, key: str) -> dict[str, Any] | None:
        p = self._key_path(key)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return self._legacy_entries().get(key)

    def commit(self, key: str, *, inputs: list[str] | None = None,
               output: str | None = None, metrics: dict[str, Any] | None = None) -> None:
        entry = {
            "inputs": inputs or [],
            "output": output,
            "metrics": metrics or {},
            "committed_at": time.time(),
        }
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f, indent=1, sort_keys=True)
        os.replace(tmp, self._key_path(key))

    def entries(self) -> dict[str, Any]:
        out = dict(self._legacy_entries())
        for p in sorted(glob.glob(os.path.join(self.dir, "*.json"))):
            key = unquote(os.path.basename(p)[: -len(".json")])
            with open(p) as f:
                out[key] = json.load(f)
        return out


class StageTimer:
    """Collects per-stage metrics (rows in/out, wall time) for the
    manifest entry — the per-partition metrics the north rule asks
    to checkpoint."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.metrics: dict[str, Any] = {}

    def done(self, **extra) -> dict[str, Any]:
        self.metrics["wall_sec"] = round(time.perf_counter() - self.t0, 3)
        self.metrics.update(extra)
        return self.metrics
