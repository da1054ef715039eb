"""Log template mining — the drainprocessor's job, columnar-first.

Reference: processor/drainprocessor/processor.go:43-198 mines
templates online with a Drain parse tree (masking variables, then
clustering by token prefix). The columnar equivalent for a finite
corpus: vectorized variable masking (numbers, hex ids, quoted
strings, durations) producing a deterministic template string, then a
grouped count — the mask IS the fixed-depth special case of Drain's
similarity clustering, exact and shuffle-light (per-batch partials).
The online tree variant (mergeable per-actor state) is noted as a
stretch path in SURVEY.md §2.4.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .aggregate import grouped_count_sum

MASKS: list[tuple[str, str]] = [
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"\b\d+(?:\.\d+)?\b", "<N>"),
]

# transcript-flavored masks: free-text message masked first, then ids
TRANSCRIPT_MASKS: list[tuple[str, str]] = [
    (r" :: .*$", " :: <MSG>"),
] + MASKS


def add_template_column(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out: str = "template",
    masks: list[tuple[str, str]] | None = None,
) -> ray.data.Dataset:
    masks = MASKS if masks is None else masks

    def mask(b: pa.Table) -> pa.Table:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        for pat, repl in masks:
            t = pc.replace_substring_regex(t, pattern=pat, replacement=repl)
        return b.append_column(out, t)

    return ds.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def mine_templates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    masks: list[tuple[str, str]] | None = None,
) -> ray.data.Dataset:
    """(template, n_rows) — grouped count over masked templates."""
    ds = add_template_column(ds, text_col, masks=masks)
    return grouped_count_sum(ds, ["template"], count_name="n_rows")
