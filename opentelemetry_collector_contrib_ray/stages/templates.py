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


class DrainLite:
    """Drain-style template clustering (He et al. ICWS'17, the
    algorithm behind processor/drainprocessor/processor.go:43-198),
    simplified to a two-level prefix index: logs group by
    (token_count, first_token), and within a group a log joins the
    first template whose fixed-token similarity >= ``sim_threshold``
    (wildcarding mismatched positions) or starts a new template.

    The state (template list + counts) is MERGEABLE: clustering the
    union of two states' templates (weighted by count) with the same
    rule gives the combined miner — which is what makes the
    distributed shape work: batch-local mining in parallel tasks, then
    a driver-side merge over the (small) per-batch template sets.
    """

    WILD = "<*>"

    def __init__(self, sim_threshold: float = 0.5, masks: list[tuple[str, str]] | None = None):
        import re

        self.sim_threshold = sim_threshold
        self.masks = [(re.compile(p), r) for p, r in (MASKS if masks is None else masks)]
        self.groups: dict[tuple[int, str], list[list[str]]] = {}
        self.counts: dict[tuple[int, str, int], int] = {}

    def _tokens(self, text: str) -> list[str]:
        for pat, repl in self.masks:
            text = pat.sub(repl, text or "")
        return text.split()

    def _add_tokens(self, toks: list[str], weight: int = 1) -> int:
        key = (len(toks), toks[0] if toks and self.WILD not in toks[0] else self.WILD)
        bucket = self.groups.setdefault(key, [])
        for i, tmpl in enumerate(bucket):
            same = sum(1 for a, b in zip(tmpl, toks) if a == b and a != self.WILD)
            if len(toks) == 0 or same / max(1, len(toks)) >= self.sim_threshold:
                bucket[i] = [a if a == b else self.WILD for a, b in zip(tmpl, toks)]
                self.counts[(key[0], key[1], i)] = self.counts.get((key[0], key[1], i), 0) + weight
                return i
        bucket.append(list(toks))
        self.counts[(len(toks), key[1], len(bucket) - 1)] = weight
        return len(bucket) - 1

    def add(self, text: str, weight: int = 1) -> int:
        return self._add_tokens(self._tokens(text), weight)

    def templates(self) -> list[tuple[str, int]]:
        out = []
        for (n, first), bucket in self.groups.items():
            for i, tmpl in enumerate(bucket):
                out.append((" ".join(tmpl), self.counts[(n, first, i)]))
        return out


def drain_mine(
    ds: ray.data.Dataset,
    text_col: str = "text",
    sim_threshold: float = 0.5,
    masks: list[tuple[str, str]] | None = None,
) -> "pd.DataFrame":
    """Distributed Drain-lite: mine templates per batch in parallel
    tasks, then merge the per-batch template sets on the driver
    (weighted re-clustering — valid because the clustering rule is
    associative over template representatives). Returns a pandas
    DataFrame (template, n_rows), largest first."""
    import pandas as pd
    import ray as _ray

    def mine_batch(b: pa.Table) -> pa.Table:
        # vectorized mask + tokenize for the whole batch (Arrow regex
        # kernels); only the Drain join itself — inherently a
        # per-record stateful tree walk, as in the reference — is a
        # Python loop over pre-tokenized lists
        miner = DrainLite(sim_threshold, masks)
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.fill_null(t, "")
        for pat, repl in (MASKS if masks is None else masks):
            t = pc.replace_substring_regex(t, pattern=pat, replacement=repl)
        token_lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t), pattern=r"\s+").to_pylist()
        for toks in token_lists:
            # "" splits to [""] — normalize to the old str.split() []
            miner._add_tokens([] if toks == [""] else toks)
        tmpls = miner.templates()
        return pa.table({
            "template": pa.array([t for t, _ in tmpls], pa.string()),
            "n_rows": pa.array([c for _, c in tmpls], pa.int64()),
        })

    partials = ds.map_batches(mine_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    tables = [_ray.get(r) for r in partials.materialize().to_arrow_refs()]
    merged = DrainLite(sim_threshold, masks=[])  # partial templates are pre-masked
    for t in tables:
        if "template" not in t.column_names:  # zero-column empty block
            continue
        for tmpl, cnt in zip(t["template"].to_pylist(), t["n_rows"].to_pylist()):
            merged.add(tmpl, weight=cnt)
    rows = sorted(merged.templates(), key=lambda x: (-x[1], x[0]))
    return pd.DataFrame(rows, columns=["template", "n_rows"])


def assign_templates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out: str = "log.record.template",
    sim_threshold: float = 0.5,
    masks: list[tuple[str, str]] | None = None,
) -> ray.data.Dataset:
    """Two-pass Drain tagging (processor/drainprocessor: every record
    gets its cluster's template in ``template_attribute``). The
    reference tags online with the cluster's CURRENT template
    mid-stream; the batch-engine analog mines the FINAL template set
    first (drain_mine, distributed) and tags every row with it — same
    clusters, more consistent values (no mid-stream snapshots).

    Pass 2 broadcasts the mined templates (grouped by token count,
    largest cluster first) and matches each row vectorized per length
    group: token == template token or template token is the wildcard.
    Cost is O(#templates-of-that-length) numpy passes per batch."""
    import numpy as np
    import ray as _ray

    mined = drain_mine(ds, text_col, sim_threshold, masks)
    by_len: dict[int, list[list[str]]] = {}
    for tmpl in mined["template"]:  # already largest-count-first
        toks = tmpl.split()
        by_len.setdefault(len(toks), []).append(toks)
    ref = _ray.put(by_len)
    mask_list = MASKS if masks is None else masks
    wild = DrainLite.WILD

    def tag(b: pa.Table) -> pa.Table:
        groups = _ray.get(ref)
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.fill_null(t, "")
        for pat, repl in mask_list:
            t = pc.replace_substring_regex(t, pattern=pat, replacement=repl)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t), pattern=r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        token_lists = toks.to_pylist()
        result = np.full(b.num_rows, None, dtype=object)
        for n in np.unique(lens):
            tmpls = groups.get(int(n))
            if not tmpls:
                continue
            sel = np.nonzero(lens == n)[0]
            if n == 0:
                continue
            tok_mat = np.array([token_lists[i] for i in sel], dtype=object)
            if tok_mat.ndim == 1:  # "" splits to [""]
                continue
            unassigned = np.ones(len(sel), dtype=bool)
            for tm in tmpls:
                tm_arr = np.array(tm, dtype=object)
                hit = ((tok_mat == tm_arr) | (tm_arr == wild)).all(axis=1)
                take = hit & unassigned
                if take.any():
                    result[sel[take]] = " ".join(tm)
                    unassigned &= ~hit
                if not unassigned.any():
                    break
        return b.append_column(out, pa.array(result, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
