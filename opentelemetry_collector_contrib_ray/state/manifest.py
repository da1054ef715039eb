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

import json
import os
import tempfile
import time
from typing import Any


class Manifest:
    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "_manifest.json")
        os.makedirs(root, exist_ok=True)

    def _load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {"entries": {}}
        with open(self.path) as f:
            return json.load(f)

    def is_done(self, key: str) -> bool:
        return key in self._load()["entries"]

    def entry(self, key: str) -> dict[str, Any] | None:
        return self._load()["entries"].get(key)

    def commit(self, key: str, *, inputs: list[str] | None = None,
               output: str | None = None, metrics: dict[str, Any] | None = None) -> None:
        data = self._load()
        data["entries"][key] = {
            "inputs": inputs or [],
            "output": output,
            "metrics": metrics or {},
            "committed_at": time.time(),
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def entries(self) -> dict[str, Any]:
        return self._load()["entries"]


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
