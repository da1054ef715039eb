"""Distributed per-key ordered scans — cumsum / delta / rate / session
index — without a pandas frame per group.

Reference semantics covered: deltatocumulative running sums
(processor/deltatocumulativeprocessor/config.go:21-29),
cumulativetodelta (processor/cumulativetodeltaprocessor),
deltatorate (processor/deltatorateprocessor), and the sessionization
gap rule. Round-1 shipped these as ``groupby(key).map_groups`` with a
pandas frame per key — ~100us of frame overhead per group, billions of
groups at 100 TB (VERDICT round-1 #9/#10). This module replaces that
with the sort + segmented-kernel shape:

1. Sort ONCE by (key, ts[, tiebreak]) and materialize the sorted
   blocks (the sort is the unavoidable all-to-all; materializing pins
   the immutable blocks so two passes see identical boundaries).
2. Pass A: each block emits tiny per-boundary-key summaries (first/
   last ts+value, value sum, internal gap breaks), tagged with the
   block's first sort tuple — its unique, orderable "token". A sorted
   block shares at most its FIRST and LAST key with neighbours, so
   this is O(2 x n_blocks) rows regardless of key cardinality; a
   Zipf-hot key spanning many blocks costs one summary per block.
3. Driver: orders summaries by token, walks them once, computes each
   block's carry-in state for its continuing first key; broadcasts
   the tiny {(token, key): state} dict with ray.put.
4. Pass B: each block looks up its carry-in and applies the scan as
   segmented numpy (cumsum / shifted diff) — no Python per row.

The deterministic ``tiebreak_col`` (ADVICE round-1) makes duplicate
(key, ts) ordering identical to a SQL window ``ORDER BY ts, tiebreak``;
a 0-second gap yields a NULL rate, not inf.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _np_col(b: pa.Table, name: str) -> np.ndarray:
    c = b[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


@dataclass
class _Carry:
    last_ts: int
    last_val: float
    sum: float
    breaks: int


def _seg_starts(keys: np.ndarray) -> np.ndarray:
    if len(keys) == 0:
        return np.array([], dtype=np.int64)
    return np.nonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))[0]


class _SortedScan:
    """Shared machinery: sort+materialize, block summaries, carry map."""

    def __init__(self, ds: ray.data.Dataset, key_col: str, ts_col: str,
                 value_col: str | None, tiebreak_col: str | None,
                 gap_us: int | None = None):
        self.key_col, self.ts_col = key_col, ts_col
        self.value_col, self.tiebreak_col = value_col, tiebreak_col
        self.gap_us = gap_us
        sort_cols = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])
        self.sorted = ds.sort(sort_cols).materialize()
        self.carry_ref = ray.put(self._carry_map())

    def _token(self, b: pa.Table) -> tuple:
        tie = b[self.tiebreak_col][0].as_py() if self.tiebreak_col else None
        return (b[self.key_col][0].as_py(), int(_ts_us(b[self.ts_col])[0]), tie)

    def _summaries(self) -> list[dict]:
        key_col, ts_col, value_col = self.key_col, self.ts_col, self.value_col
        tiebreak, gap_us = self.tiebreak_col, self.gap_us

        def summarize(b: pa.Table) -> pa.Table:
            n = b.num_rows
            empty = {
                "tok_key": pa.array([], pa.string()), "tok_ts": pa.array([], pa.int64()),
                "tok_tie": pa.array([], pa.string()),
                "key": pa.array([], pa.string()), "pos": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()), "last_ts": pa.array([], pa.int64()),
                "first_val": pa.array([], pa.float64()), "last_val": pa.array([], pa.float64()),
                "sum_val": pa.array([], pa.float64()), "n_breaks": pa.array([], pa.int64()),
            }
            if n == 0:
                e = dict(empty)
                e["nat_key"] = pa.array([], b.schema.field(key_col).type)
                e["nat_tie"] = pa.array(
                    [], b.schema.field(tiebreak).type if tiebreak else pa.string())
                return pa.table(e)
            keys = _np_col(b, key_col)
            ts = _ts_us(b[ts_col])
            vals = _np_col(b, value_col).astype(np.float64) if value_col else np.zeros(n)
            starts = _seg_starts(keys)
            tok_key = str(keys[0])
            tok_ts = int(ts[0])
            tok_tie = "" if not tiebreak else str(b[tiebreak][0].as_py())
            # native first-key/tie for ORDERING the blocks on the driver
            # — str() would misorder numeric keys ("10" < "2")
            nat_key = keys[0].item() if hasattr(keys[0], "item") else keys[0]
            nat_tie = b[tiebreak][0].as_py() if tiebreak else ""
            segs = [(0, int(starts[1]) if len(starts) > 1 else n, 0)]
            if len(starts) > 1:
                segs.append((int(starts[-1]), n, 1))
            rows = {k: [] for k in empty}
            rows["nat_key"] = []
            rows["nat_tie"] = []
            for lo, hi, pos in segs:
                sts, svs = ts[lo:hi], vals[lo:hi]
                if gap_us is not None and hi - lo > 1:
                    nb = int((np.diff(sts) > gap_us).sum())
                else:
                    nb = 0
                rows["tok_key"].append(tok_key)
                rows["tok_ts"].append(tok_ts)
                rows["tok_tie"].append(tok_tie)
                rows["nat_key"].append(nat_key)
                rows["nat_tie"].append(nat_tie)
                rows["key"].append(str(keys[lo]))
                rows["pos"].append(pos)
                rows["first_ts"].append(int(sts[0]))
                rows["last_ts"].append(int(sts[-1]))
                rows["first_val"].append(float(svs[0]))
                rows["last_val"].append(float(svs[-1]))
                rows["sum_val"].append(float(svs.sum()))
                rows["n_breaks"].append(nb)
            tbl = {k: pa.array(v, empty[k].type) for k, v in rows.items()
                   if k not in ("nat_key", "nat_tie")}
            tbl["nat_key"] = pa.array(rows["nat_key"])
            tbl["nat_tie"] = pa.array(rows["nat_tie"])
            return pa.table(tbl)

        out = self.sorted.map_batches(
            summarize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).take_all()
        return out

    def _carry_map(self) -> dict:
        gap_us = self.gap_us
        rows = self._summaries()
        # order blocks by their NATIVE first sort tuple (str would
        # misorder numeric keys); pos keeps a block's first-key row
        # ahead of its last-key row
        rows.sort(key=lambda r: (r["nat_key"], r["tok_ts"], r["nat_tie"], r["pos"]))
        carry: dict[tuple, _Carry] = {}
        cur_key: str | None = None
        state: _Carry | None = None
        i = 0
        while i < len(rows):
            fb = rows[i]
            tok = (fb["tok_key"], fb["tok_ts"], fb["tok_tie"])
            block = [fb]
            if i + 1 < len(rows) and (rows[i + 1]["tok_key"], rows[i + 1]["tok_ts"],
                                      rows[i + 1]["tok_tie"]) == tok:
                block.append(rows[i + 1])
                i += 2
            else:
                i += 1
            first, last = block[0], block[-1]
            if cur_key is not None and first["key"] == cur_key and state is not None:
                carry[(tok, cur_key)] = _Carry(state.last_ts, state.last_val,
                                               state.sum, state.breaks)
                boundary_break = (
                    1 if gap_us is not None and first["first_ts"] - state.last_ts > gap_us else 0
                )
                state = _Carry(
                    last_ts=first["last_ts"], last_val=first["last_val"],
                    sum=state.sum + first["sum_val"],
                    breaks=state.breaks + boundary_break + first["n_breaks"],
                )
            else:
                state = _Carry(first["last_ts"], first["last_val"],
                               first["sum_val"], first["n_breaks"])
            if last is not first:
                state = _Carry(last["last_ts"], last["last_val"],
                               last["sum_val"], last["n_breaks"])
            cur_key = last["key"]
        return carry

    def apply(self, block_fn) -> ray.data.Dataset:
        """Run ``block_fn(b, carry_or_None)`` over the sorted blocks."""
        carry_ref = self.carry_ref
        key_col, ts_col = self.key_col, self.ts_col
        tiebreak = self.tiebreak_col

        def run(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return block_fn(b, None)
            head = b.slice(0, 1)
            tok_key = str(head[key_col][0].as_py())
            tok_ts = int(_ts_us(head[ts_col])[0])
            tok_tie = "" if not tiebreak else str(head[tiebreak][0].as_py())
            c = ray.get(carry_ref).get(((tok_key, tok_ts, tok_tie), tok_key))
            return block_fn(b, c)

        return self.sorted.map_batches(
            run, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )


def keyed_cumsum(ds: ray.data.Dataset, key_col: str, ts_col: str, value_col: str,
                 out_col: str = "running_total",
                 tiebreak_col: str | None = None) -> ray.data.Dataset:
    """deltatocumulative: per-key running sum in (ts, tiebreak) order."""
    scan = _SortedScan(ds, key_col, ts_col, value_col, tiebreak_col)

    def block(b: pa.Table, carry: _Carry | None) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        keys = _np_col(b, key_col)
        v = _np_col(b, value_col)
        starts = _seg_starts(keys)
        cs = np.cumsum(v)
        seg_base = cs[starts] - v[starts]
        lens = np.diff(np.append(starts, len(v)))
        out = cs - np.repeat(seg_base, lens)
        if carry is not None:
            first_len = int(lens[0])
            add = carry.sum
            if np.issubdtype(v.dtype, np.integer):
                add = int(add)
            out[:first_len] = out[:first_len] + add
        return b.append_column(out_col, pa.array(out))

    return scan.apply(block)


def keyed_delta(ds: ray.data.Dataset, key_col: str, ts_col: str, value_col: str,
                out_col: str = "delta",
                tiebreak_col: str | None = None) -> ray.data.Dataset:
    """cumulativetodelta: consecutive difference per key; first point
    of a stream has a null delta."""
    scan = _SortedScan(ds, key_col, ts_col, value_col, tiebreak_col)

    def block(b: pa.Table, carry: _Carry | None) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], pa.float64()))
        keys = _np_col(b, key_col)
        v = _np_col(b, value_col).astype(np.float64)
        starts = _seg_starts(keys)
        out = np.empty(len(v))
        out[1:] = v[1:] - v[:-1]
        out[starts] = np.nan
        if carry is not None:
            out[0] = v[0] - carry.last_val
        return b.append_column(out_col, pa.array(out, pa.float64(), from_pandas=True))

    return scan.apply(block)


def keyed_rate(ds: ray.data.Dataset, key_col: str, ts_col: str, value_col: str,
               out_col: str = "rate_per_s",
               tiebreak_col: str | None = None) -> ray.data.Dataset:
    """deltatorate: delta / elapsed seconds per key; first point and
    0-second gaps yield null (ADVICE round-1: never inf)."""
    scan = _SortedScan(ds, key_col, ts_col, value_col, tiebreak_col)

    def block(b: pa.Table, carry: _Carry | None) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], pa.float64()))
        keys = _np_col(b, key_col)
        v = _np_col(b, value_col).astype(np.float64)
        ts = _ts_us(b[ts_col]).astype(np.float64)
        starts = _seg_starts(keys)
        dv = np.empty(len(v))
        dt = np.empty(len(v))
        dv[1:] = v[1:] - v[:-1]
        dt[1:] = ts[1:] - ts[:-1]
        dv[starts] = np.nan
        dt[starts] = np.nan
        if carry is not None:
            dv[0] = v[0] - carry.last_val
            dt[0] = ts[0] - carry.last_ts
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(dt > 0, dv / (dt / 1e6), np.nan)
        return b.append_column(out_col, pa.array(out, pa.float64(), from_pandas=True))

    return scan.apply(block)


def keyed_session_index(ds: ray.data.Dataset, key_col: str, ts_col: str,
                        gap_minutes: float,
                        tiebreak_col: str | None = None) -> ray.data.Dataset:
    """Adds ``session_idx``: 0-based per-key session number where a new
    session starts when the gap to the previous event exceeds
    ``gap_minutes`` (SQL: SUM(gap > g) OVER (PARTITION BY key ORDER BY
    ts))."""
    gap_us = int(gap_minutes * 60 * 1_000_000)
    scan = _SortedScan(ds, key_col, ts_col, None, tiebreak_col, gap_us=gap_us)

    def block(b: pa.Table, carry: _Carry | None) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("session_idx", pa.array([], pa.int64()))
        keys = _np_col(b, key_col)
        ts = _ts_us(b[ts_col])
        starts = _seg_starts(keys)
        br = np.zeros(len(ts), dtype=np.int64)
        br[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        br[starts] = 0
        if carry is not None:
            br[0] = 1 if ts[0] - carry.last_ts > gap_us else 0
        cs = np.cumsum(br)
        seg_base = cs[starts] - br[starts]
        lens = np.diff(np.append(starts, len(ts)))
        sidx = cs - np.repeat(seg_base, lens)
        if carry is not None:
            sidx[: int(lens[0])] += carry.breaks
        return b.append_column("session_idx", pa.array(sidx, pa.int64()))

    return scan.apply(block)
