"""Dataset readers with column pruning.

The Ray-side equivalent of the filelog receiver boundary
(receiver/filelogreceiver, pkg/stanza/fileconsumer): our inputs are
finite Parquet tables, so file fingerprinting/offset checkpointing
(fileconsumer/internal/checkpoint/checkpoint.go:27-67) collapses to
"read these fragments"; resume lineage lives in the output manifests
(state/manifest.py) instead.
"""

from __future__ import annotations

import os

import ray.data

from .transcripts import ensure_transcripts


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read one driver testdata table with column pruning at the scan."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def read_transcripts(sf_dir_or_sf: str | float, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the synthetic transcript table for a scale factor."""
    path = ensure_transcripts(sf_dir_or_sf)
    return ray.data.read_parquet(path, columns=columns)
