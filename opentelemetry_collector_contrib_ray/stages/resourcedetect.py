"""Resource detection processor — attach detected resource attributes.

Reference semantics (processor/resourcedetectionprocessor):

  * configured ``detectors`` run once at startup; their resources are
    merged FIRST-DETECTOR-WINS per key
    (internal/resourcedetection.go:262 ``MergeResource(res, r, false)``).
  * the merged resource is then applied to every signal; the
    ``override`` config flag decides per key whether the detected
    value replaces an attribute already on the signal (override=true)
    or the signal's value wins (override=false) — MergeResource
    semantics at resourcedetection.go:298-320.
  * built-in detectors include ``env`` (parse
    ``OTEL_RESOURCE_ATTRIBUTES`` as "k=v,k=v", README "Environment
    Variable") and ``system`` (hostname / os.type metadata).

Ray mapping: detection is driver-side (it is per-process metadata,
not per-row data); the merged dict is closed over by a map_batches
fn as plain broadcast state, and applying it is a scalar
column-append — per-row work only where a column already exists and
override=false (coalesce keeps the row's value). Cloud-provider
detectors (aws/gcp/azure...) need instance-metadata endpoints that do
not exist here; the detector registry accepts callables so they slot
in unchanged on a real deployment.
"""

from __future__ import annotations

import os
import platform
import socket
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def env_detector(var: str = "OTEL_RESOURCE_ATTRIBUTES") -> dict[str, str]:
    """Parse "k1=v1,k2=v2" (README "Environment Variable")."""
    raw = os.environ.get(var, "")
    out: dict[str, str] = {}
    for pair in raw.split(","):
        if "=" in pair:
            k, _, v = pair.partition("=")
            if k.strip():
                out[k.strip()] = v.strip()
    return out


def system_detector() -> dict[str, str]:
    """host.name + os.type (internal/system detector's default set)."""
    return {"host.name": socket.gethostname(),
            "os.type": platform.system().lower()}


DETECTORS: dict[str, Callable[[], dict[str, str]]] = {
    "env": env_detector,
    "system": system_detector,
}


def detect_resource(
    detectors: list[str | Callable[[], dict[str, str]]],
) -> dict[str, str]:
    """Run detectors in order, merge first-wins per key
    (resourcedetection.go:262)."""
    merged: dict[str, str] = {}
    for d in detectors:
        fn = DETECTORS[d] if isinstance(d, str) else d
        for k, v in fn().items():
            merged.setdefault(k, v)
    return merged


def apply_resource(
    ds: ray.data.Dataset,
    resource: dict[str, str],
    *,
    override: bool = False,
    col_prefix: str = "",
) -> ray.data.Dataset:
    """Attach the detected resource to every row.

    Attribute key -> column ``col_prefix + key`` (dots kept; Arrow
    column names are free-form). Existing column + override=False:
    the row's non-null value wins (MergeResource !overrideTo branch);
    override=True: the detected value replaces the column wholesale.
    """
    items = {col_prefix + k: v for k, v in resource.items()}

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for name, value in items.items():
            scalar = pa.scalar(value, pa.string())
            if name in batch.column_names:
                if override:
                    col = pa.array([value] * n, pa.string())
                    batch = batch.set_column(
                        batch.column_names.index(name), name, col)
                else:
                    cur = batch[name]
                    if isinstance(cur, pa.ChunkedArray):
                        cur = cur.combine_chunks()
                    batch = batch.set_column(
                        batch.column_names.index(name), name,
                        pc.fill_null(pc.cast(cur, pa.string()), scalar))
            else:
                batch = batch.append_column(
                    name, pa.array([value] * n, pa.string()))
        return batch

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
