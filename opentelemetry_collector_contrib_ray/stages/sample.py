"""Probabilistic sampling — deterministic hash-mod row drop.

Reference semantics (processor/probabilisticsamplerprocessor/
config.go:34-76, logsprocessor.go:122-168): hash a sampling key
(trace id or an attribute) with a seeded FNV, keep the row when the
hash falls under ``sampling_percentage``'s threshold; the same key
always samples the same way across collectors.

We hash with the MD5-derived u64 (functions/hashing.py) so the
decision is reproducible in the DuckDB oracle via
``md5_number_lower(key || seed)``. Same seeded-hash trick as skew
salting (SURVEY.md §4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import md5_number_lower_arrow
from . import register


@register("probabilistic_sampler")
class ProbabilisticSampler:
    def __init__(self, sampling_percentage: float, key: str, hash_seed: int = 0):
        if not 0 <= sampling_percentage <= 100:
            raise ValueError("sampling_percentage in [0,100]")
        self.threshold = int(sampling_percentage * 100)  # out of 10_000
        self.key = key
        self.seed = hash_seed

    def fn(self, batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[self.key], pa.string())
        if self.seed:
            key = pc.binary_join_element_wise(key, pa.scalar(str(self.seed)), "")
        h = md5_number_lower_arrow(key).to_numpy(zero_copy_only=False)
        keep = pa.array((h % 10_000) < self.threshold)
        return batch.filter(keep)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------
# OTEP-235 consistent sampling (proportional / equalizing modes)
# ---------------------------------------------------------------------
#
# Reference: processor/probabilisticsamplerprocessor/sampler_mode.go
# (equalizingSampler.decide :267-272, proportionalSampler.decide
# :285-303, commonShouldSampleLogic :470-527, priorityFunc
# logsprocessor.go:240-272) over pkg/sampling (threshold.go,
# probability.go ProbabilityToThresholdWithPrecision :33-78,
# randomness.go TraceIDToRandomness :47-55).
#
# The decision is T <= R where R is the low 56 bits of the second
# half of the trace id (or an explicit randomness value) and T is the
# rejection threshold derived from the sampling probability.

_MAX_ADJ = 1 << 56  # MaxAdjustedCount
_NUM_HEX = 14


def probability_to_threshold(fraction: float, precision: int = 4) -> int | None:
    """pkg/sampling ProbabilityToThresholdWithPrecision ported exactly
    (Frexp-based adaptive precision, round-half-away, hex-digit
    rounding). Returns the unsigned threshold in [0, 2^56], or None
    for the out-of-range error (the caller maps it to never-sample)."""
    import math

    if precision == 0:
        precision = _NUM_HEX
    if not (1.0 / _MAX_ADJ <= fraction <= 1.0):
        return None
    if fraction == 1.0:
        return 0
    _, exp_f = math.frexp(fraction)
    _, exp_r = math.frexp(1.0 - fraction)
    precision = min(_NUM_HEX,
                    max(precision + exp_f // -4, precision + exp_r // -4))
    scaled = int(math.floor(fraction * float(_MAX_ADJ) + 0.5))
    threshold = _MAX_ADJ - scaled
    shift = 4 * (_NUM_HEX - precision)
    if shift:
        threshold += 1 << (shift - 1)
        threshold >>= shift
        threshold <<= shift
    return threshold


def threshold_probability(threshold: int) -> float:
    """Threshold.Probability (threshold.go)."""
    return float(_MAX_ADJ - threshold) / float(_MAX_ADJ)


def tvalue_of(threshold: int) -> str:
    """Threshold.TValue: 14 hex digits with trailing zeros trimmed
    ('0' stays '0' for always-sample)."""
    s = format(threshold, "014x").rstrip("0")
    return s or "0"


def parse_tvalue(tv: str) -> int | None:
    """TValueToThreshold: right-pad hex digits to 14."""
    if not tv or len(tv) > _NUM_HEX:
        return None
    try:
        return int(tv.ljust(_NUM_HEX, "0"), 16)
    except ValueError:
        return None


@register("consistent_sampler")
class ConsistentSampler:
    """probabilisticsampler modes 'proportional' and 'equalizing'
    (+ fail_closed + sampling.priority) over a flat table.

    ``randomness_src`` is a 32-hex trace-id column (R = low 56 bits of
    the second half, TraceIDToRandomness); rows with missing/invalid
    randomness are dropped under ``fail_closed`` and kept otherwise.
    ``incoming_tvalue_src`` is the OTEP-235 ``sampling.threshold``
    t-value attribute; ``priority_src`` is the sampling.priority
    attribute (a percentage that, when valid and nonzero, REPLACES the
    decision threshold — logs treat priority as a request to sample).
    Emits ``tvalue_out`` (the updated sampling.threshold) when
    ``out_tvalue`` is set. Everything is vectorized; thresholds are
    exact 56-bit integer comparisons."""

    def __init__(self, mode: str, sampling_percentage: float,
                 randomness_src: str = "trace_id",
                 incoming_tvalue_src: str | None = None,
                 priority_src: str | None = None,
                 fail_closed: bool = False, precision: int = 4,
                 out_tvalue: str | None = None):
        if mode not in ("proportional", "equalizing"):
            raise ValueError(f"consistent_sampler: bad mode {mode!r}")
        self.mode = mode
        self.ratio = sampling_percentage / 100.0
        self.t_cfg = probability_to_threshold(self.ratio, precision)
        if self.t_cfg is None:
            self.t_cfg = _MAX_ADJ  # never
        self.randomness_src = randomness_src
        self.incoming_tvalue_src = incoming_tvalue_src
        self.priority_src = priority_src
        self.fail_closed = fail_closed
        self.precision = precision
        self.out_tvalue = out_tvalue

    def _randomness(self, batch: pa.Table):
        import numpy as np

        col = batch[self.randomness_src]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ok = pc.fill_null(pc.match_substring_regex(
            col, pattern=r"^[0-9a-fA-F]{32}$"), False)
        low14 = pc.utf8_slice_codeunits(
            pc.if_else(ok, col, pa.scalar("0" * 32)), start=18, stop=32)
        if isinstance(low14, pa.ChunkedArray):
            low14 = low14.combine_chunks()
        buf = np.frombuffer(low14.buffers()[2], np.uint8)
        offs = np.frombuffer(low14.buffers()[1], np.int32)[
            low14.offset:low14.offset + len(low14) + 1]
        m = buf[offs[0]:offs[-1]].reshape(-1, 14)
        digits = np.where(m >= ord("a"), m - ord("a") + 10,
                          np.where(m >= ord("A"), m - ord("A") + 10,
                                   m - ord("0"))).astype(np.uint64)
        powers = (np.uint64(16) ** np.arange(13, -1, -1, dtype=np.uint64))
        r = (digits * powers).sum(axis=1)
        return r, ok.to_numpy(zero_copy_only=False)

    def fn(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        if n == 0:
            if self.out_tvalue is not None:
                return batch.append_column(self.out_tvalue,
                                           pa.array([], pa.string()))
            return batch
        r, ok = self._randomness(batch)

        # incoming thresholds (sampling.threshold t-values) — t-values
        # repeat heavily, so parse each DISTINCT value once and map
        # back with index_in/take (no per-row python)
        if self.incoming_tvalue_src is not None \
                and self.incoming_tvalue_src in batch.column_names:
            col = batch[self.incoming_tvalue_src]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            uniq = pc.unique(col)
            parsed = [0 if tv is None else parse_tvalue(tv)
                      for tv in uniq.to_pylist()]
            idx = pc.index_in(col, value_set=uniq) \
                .to_numpy(zero_copy_only=False)
            t_tab = np.array([0 if p is None else p for p in parsed],
                             dtype=np.uint64)
            bad_tab = np.array([p is None for p in parsed], dtype=bool)
            t_in = t_tab[idx]
            ok = ok & ~bad_tab[idx]
        else:
            t_in = np.zeros(n, np.uint64)

        if self.mode == "equalizing":
            # decide: keep the larger (lower-probability) threshold
            t = np.maximum(np.uint64(self.t_cfg), t_in)
        else:
            # proportional: p_out = p_in * ratio, per distinct
            # incoming threshold (t-values repeat; group by unique)
            t = np.empty(n, np.uint64)
            for u in np.unique(t_in):
                p_out = threshold_probability(int(u)) * self.ratio
                tu = probability_to_threshold(p_out, self.precision)
                t[t_in == u] = _MAX_ADJ if tu is None else tu

        # fail_closed: errored rows never sample; fail-open: always
        t = np.where(ok, t, np.uint64(0 if not self.fail_closed else _MAX_ADJ))

        # sampling.priority: a valid nonzero percentage REPLACES the
        # threshold (after fail_closed, so priority can rescue errors)
        if self.priority_src is not None \
                and self.priority_src in batch.column_names:
            pr = pc.cast(batch[self.priority_src], pa.float64(), safe=False)
            pr = pc.fill_null(pr, 0.0).to_numpy(zero_copy_only=False)
            for u in np.unique(pr):
                if u == 0.0:
                    continue
                tu = probability_to_threshold(u / 100.0, self.precision)
                if tu is not None:
                    t[pr == u] = tu

        keep = t <= r
        out = batch.filter(pa.array(keep))
        if self.out_tvalue is not None:
            # thresholds take few distinct values: render each once
            kept_t = t[keep]
            uniq, inv = np.unique(kept_t, return_inverse=True)
            table = pa.array([tvalue_of(int(x)) for x in uniq], pa.string())
            out = out.append_column(self.out_tvalue,
                                    table.take(pa.array(inv)))
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
