"""Schema processor — versioned attribute-rename translation.

Reference semantics (processor/schemaprocessor):

  * a schema family publishes per-version changesets of attribute
    renames; converting a signal from its source version to the
    configured target applies every version's renames in order
    (forward for upgrades, reversed + descending for downgrades) —
    README.md "Configuration"; internal/translation applies
    changelists version by version.
  * hard rename (default): the old attribute is removed and the new
    name written.
  * soft "migration" mode for renames between ``from`` and the target
    version: BOTH old and new names are written; if both already
    exist on an incoming signal, NEITHER is overwritten
    (README.md "Migration").

Columnar mapping: an attribute is a column; per-row "exists" means
non-null. Hard rename moves non-null values of the old column into
the new name (old value wins where both are present — the Go map
rename overwrites the destination key) and drops the old column.
Soft rename fills only null slots of the new column from the old and
keeps the old column, which is exactly "neither is overwritten" when
both are present. Pure Arrow kernels per batch; streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _ver(v: str) -> tuple[int, ...]:
    return tuple(int(x) for x in v.split("."))


@dataclass
class SchemaTranslation:
    """One schema family: version -> {old_name: new_name} renames
    (the subset of the OTel schema-file changeset this engine's flat
    column model can express). ``metric_versions`` carries each
    version's ``rename_metrics`` map (schemaprocessor
    processor_metrics_test.go transformations): metric NAMES are
    VALUES of the metric-name column, so those renames remap values,
    not columns."""

    family: str
    versions: dict[str, dict[str, str]] = field(default_factory=dict)
    metric_versions: dict[str, dict[str, str]] = field(default_factory=dict)

    def ordered(self) -> list[tuple[tuple[int, ...], str, dict[str, str], dict[str, str]]]:
        vers = set(self.versions) | set(self.metric_versions)
        return sorted((_ver(v), v, self.versions.get(v, {}),
                       self.metric_versions.get(v, {})) for v in vers)


def _apply_renames(batch: pa.Table, renames: dict[str, str], soft: bool) -> pa.Table:
    for old, new in renames.items():
        if old not in batch.column_names:
            continue
        old_col = batch[old]
        if isinstance(old_col, pa.ChunkedArray):
            old_col = old_col.combine_chunks()
        if new in batch.column_names:
            new_col = batch[new]
            if isinstance(new_col, pa.ChunkedArray):
                new_col = new_col.combine_chunks()
            if soft:
                # fill only absent (null) new slots; keep old as-is
                merged = pc.if_else(pc.is_valid(new_col), new_col, old_col)
                batch = batch.set_column(
                    batch.column_names.index(new), new, merged)
            else:
                merged = pc.if_else(pc.is_valid(old_col), old_col, new_col)
                batch = batch.set_column(
                    batch.column_names.index(new), new, merged)
                batch = batch.drop_columns([old])
        else:
            if soft:
                batch = batch.append_column(new, old_col)
            else:
                idx = batch.column_names.index(old)
                batch = batch.set_column(idx, new, old_col)
    return batch


def schema_convert(
    ds: ray.data.Dataset,
    translation: SchemaTranslation,
    *,
    source: str,
    target: str,
    migrate_from: str | None = None,
    metric_name_col: str = "metric",
) -> ray.data.Dataset:
    """Convert from schema version ``source`` to ``target``.

    ``migrate_from`` turns renames in the (from, target] window (or
    [target, from) for downgrades) into soft renames that keep both
    names (README.md "Scoping with from"). ``rename_metrics`` entries
    remap VALUES of ``metric_name_col`` (always hard — a row carries
    one name) in the same version order, reversed on downgrade.
    """
    s, t = _ver(source), _ver(target)
    f = _ver(migrate_from) if migrate_from is not None else None
    steps: list[tuple[dict[str, str], dict[str, str], bool]] = []
    if s < t:  # upgrade: apply versions v with s < v <= t ascending
        for ver, _, renames, mrenames in translation.ordered():
            if s < ver <= t:
                soft = f is not None and f < ver <= t
                steps.append((renames, mrenames, soft))
    elif s > t:  # downgrade: reverse renames, t < v <= s descending
        for ver, _, renames, mrenames in reversed(translation.ordered()):
            if t < ver <= s:
                rev = {new: old for old, new in renames.items()}
                mrev = {new: old for old, new in mrenames.items()}
                soft = f is not None and t < ver <= f
                steps.append((rev, mrev, soft))
    if not steps:
        return ds

    def apply(batch: pa.Table) -> pa.Table:
        for renames, mrenames, soft in steps:
            batch = _apply_renames(batch, renames, soft)
            if mrenames and metric_name_col in batch.column_names:
                col = batch[metric_name_col]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                for old, new in mrenames.items():
                    # fill_null: a null metric name must stay null,
                    # not be nulled out by a null comparison
                    col = pc.if_else(pc.fill_null(pc.equal(col, old), False),
                                     pa.scalar(new, col.type), col)
                batch = batch.set_column(
                    batch.column_names.index(metric_name_col),
                    metric_name_col, col)
        return batch

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
