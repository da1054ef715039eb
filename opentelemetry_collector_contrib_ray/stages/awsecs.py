"""aws_ecs_attributes — ECS container-metadata enrichment from a
file-backed snapshot.

Reference semantics (processor/awsecsattributesprocessor):

  * ``container_id.sources`` (config.go:35-41, README "Configuration"):
    the ordered resource-attribute keys to read the container ID from;
    the FIRST non-empty value is used. If no container ID can be
    determined, no metadata is added (README "Pre-requisites").
  * ``attributes`` (config.go:16-18): regex patterns over metadata KEYS;
    a key is attached when ANY pattern matches; an empty list collects
    ALL available attributes. Patterns are validated at construction
    (config.go:58-62 Validate).
  * ``cache_ttl`` must be >= 60 (config.go:53-55) — accepted and
    validated; a static snapshot has no expiry to enforce.
  * the upstream component is a skeleton (README NOTE: "currently
    no-op passthroughs"); the enrichment contract implemented here is
    the documented design: Docker-API + ECS metadata endpoint cache,
    keyed by container ID, becomes a STATIC SNAPSHOT TABLE — one row
    per container, a ``container.id`` column plus the metadata columns
    (aws.ecs.task.arn, aws.ecs.cluster, docker.name, ...).

Source normalization: ECS docker log paths embed the full 64-hex
container ID (``/var/lib/docker/containers/<id>/<id>-json.log``), so a
``log.file.name`` source rarely IS the ID. Each source value
contributes the first 64-hex-char token it contains when one exists,
else the raw value — so both ``container.id`` and file-name sources
work unmodified.

Ray design: snapshot keys + payload are broadcast once (ray.put); each
batch resolves its container ID with vectorized Arrow kernels and joins
by ``pc.index_in`` — no shuffle, no Python row loop.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import register

_HEX64 = r"[0-9a-f]{64}"


@register("aws_ecs_attributes")
class AwsEcsAttributes:
    """``snapshot``: container-grain pa.Table (``container.id`` +
    metadata columns). ``sources``: ordered resource-attribute keys
    holding the container ID. ``attributes``: key-regex allowlist
    (empty/None = all)."""

    def __init__(
        self,
        snapshot: pa.Table,
        sources: list[str],
        attributes: list[str] | None = None,
        cache_ttl: int = 300,
    ):
        if not sources:
            raise ValueError(
                "at least one container ID source must be specified "
                "[container_id.sources]")  # config.go:48-50
        if cache_ttl < 60:
            raise ValueError(
                "cache_ttl cannot be less than 60 seconds")  # config.go:53-55
        pats = []
        for expr in attributes or []:
            try:
                pats.append(re.compile(expr))
            except re.error as e:  # config.go:58-62
                raise ValueError(
                    f"invalid expression found under attributes pattern "
                    f"{expr} - {e}") from e
        if "container.id" not in snapshot.column_names:
            raise ValueError(
                f"snapshot needs a 'container.id' column; has "
                f"{snapshot.column_names}")
        self.sources = list(sources)
        meta_cols = [c for c in snapshot.column_names if c != "container.id"]
        if pats:
            meta_cols = [c for c in meta_cols
                         if any(p.search(c) for p in pats)]
        self.meta_cols = meta_cols
        ids = snapshot["container.id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        self._ref = ray.put((ids, snapshot.select(meta_cols)))

    # ---------------------------------------------------------------- fn

    def fn(self, batch: pa.Table) -> pa.Table:
        ids, payload = ray.get(self._ref)
        n = batch.num_rows
        # "" = unresolved ("" is never a container ID); avoids null
        # propagation through the and_/or_ kernels below
        chosen = pa.array([""] * n, pa.string())
        for src in self.sources:
            if src not in batch.column_names:
                continue
            v = batch[src]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if not pa.types.is_string(v.type):
                v = pc.cast(v, pa.string())
            v = pc.fill_null(v, "")
            # first 64-hex token when present (log-path sources), else
            # the raw value
            ex = pc.extract_regex(v, pattern=f"(?P<id>{_HEX64})")
            tok = pc.if_else(ex.is_valid(), pc.struct_field(ex, "id"), v)
            # first non-empty source wins (README Configuration)
            empty = pc.equal(chosen, "")
            cand_ok = pc.not_equal(tok, "")
            chosen = pc.if_else(pc.and_(empty, cand_ok), tok, chosen)
        idx = pc.fill_null(pc.index_in(chosen, value_set=ids), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ok = idx >= 0
        take_idx = pa.array(np.where(ok, idx, 0), pa.int64())
        okp = pa.array(ok)
        out = batch
        for col in self.meta_cols:
            c = payload[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            vals = pc.if_else(okp, pc.take(c, take_idx),
                              pa.nulls(n, c.type))
            if col in out.column_names:
                out = out.set_column(out.column_names.index(col), col, vals)
            else:
                out = out.append_column(col, vals)
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
