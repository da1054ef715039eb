"""Distributed as-of join — for every left row, the latest right row
with right.ts <= left.ts on the same key.

Not a reference-collector operator (the collector has no two-sided
time join; servicegraph pairs on exact ids) — this is one of the
"custom operators Ray Data lacks" the engine adds for training-data
pipelines (latest-feature lookup, last-checkpoint attribution,
price-as-of joins). Oracle: DuckDB ``ASOF LEFT JOIN`` with
``left.ts >= right.ts``.

Shape — the union-scan trick, not a hash join:

1. Tag right rows side=0 and left rows side=1, union the two streams
   into one table whose schema is (key, ts, side, left payload ∪
   right payload with nulls on the missing side).
2. ONE global sort by (key, ts, side) — right-before-left at ties
   makes the join inclusive; the sort is the only all-to-all.
3. Pass A: each sorted block emits 2 boundary summaries (its first
   and last key segment: did it see a right row? last right values);
   the driver walks blocks in sort order and assembles the carry-in
   (latest right row so far) for each block whose first key continues
   from the previous block — O(blocks) rows, no data volume.
4. Pass B: per block, a segmented ``np.maximum.accumulate`` forward-
   fill gathers each left row's latest right index; boundary rows use
   the carry. No per-row Python; the fill is one vectorized pass.

``tolerance_us`` nulls matches older than the window (DuckDB has no
tolerance; the oracle replays it as an explicit ts comparison).

Partitioning assumption: none beyond the sort — a Zipf-hot key
spanning many blocks costs one summary row per block, same as the
scan family in ``scan.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .scan import _np_col, _seg_starts, _ts_us


def _assemble_carry(rows: list[dict]) -> dict:
    """Walk boundary summaries in sort order and build the carry-in map
    (block token, key) -> latest right row seen before that block.

    Blocks are identified by their first row's (key, ts, side) token.
    Two sorted blocks can only share a token when a run of duplicate
    (key, ts, side) rows spans a block boundary — then the carry chain
    (and the join semantics among the differing payloads) is genuinely
    ambiguous, so fail loud rather than silently misgroup summaries
    (same policy as servicegraph.adjacent_edges_presorted). Each block
    emits exactly one pos=0 summary: a token with two pos=0 rows means
    two distinct blocks collided. (Ray 2.49's range-partition sort puts
    equal keys in one partition, so this is defensive against future
    block-slicing behavior, not a live path.)
    """
    import json as _json

    rows = sorted(rows, key=lambda r: (r["nat_key"], r["tok_ts"],
                                       r["tok_side"], r["pos"]))
    tok_first_seen: set = set()
    for r in rows:
        if r["pos"] == 0:
            t = (r["tok_key"], r["tok_ts"], r["tok_side"])
            if t in tok_first_seen:
                raise ValueError(
                    "asof_join: duplicate (key, ts, side) rows span a "
                    f"block boundary (token {t!r}); the latest-right choice "
                    "among them is ambiguous. Deduplicate the right stream "
                    "on (key, ts) or add a tiebreak column to ts."
                )
            tok_first_seen.add(t)

    carry: dict[tuple, tuple] = {}
    cur_key = None
    state: tuple | None = None  # (right_ts, values_dict)
    i = 0
    while i < len(rows):
        fb = rows[i]
        tok = (fb["tok_key"], fb["tok_ts"], fb["tok_side"])
        block = [fb]
        if i + 1 < len(rows) and (rows[i + 1]["tok_key"], rows[i + 1]["tok_ts"],
                                  rows[i + 1]["tok_side"]) == tok:
            block.append(rows[i + 1])
            i += 2
        else:
            i += 1
        first, last = block[0], block[-1]
        if cur_key is not None and first["key"] == cur_key and state is not None:
            carry[(tok, cur_key)] = state
        if first["has_right"]:
            state = (first["right_ts"], _json.loads(first["right_vals"]))
        elif first["key"] != cur_key:
            state = None  # new key, nothing seen yet
        cur_key = first["key"]
        if last is not first:
            # the last segment starts a different key inside this block
            state = (last["right_ts"], _json.loads(last["right_vals"])) \
                if last["has_right"] else None
            cur_key = last["key"]
    return carry


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
) -> ray.data.Dataset:
    """Backward inclusive as-of join. ``right_cols`` are the payload
    columns carried from the right stream (must not collide with left
    column names); output = every left row + right_cols of its latest
    right match (null when none)."""

    ls = left.schema()  # ray.data Schema: parallel .names / .types
    left_names = list(ls.names)
    ltypes = dict(zip(ls.names, ls.types))
    for c in right_cols:
        if c in left_names:
            raise ValueError(f"right col {c!r} collides with a left column")
    rs = right.schema()
    rtypes = {c: t for c, t in zip(rs.names, rs.types) if c in right_cols}

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out = b.append_column("__side", pa.array(np.ones(n, np.int8)))
        for c in right_cols:
            out = out.append_column(c, pa.nulls(n, rtypes[c]))
        return out

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {key_col: b[key_col], ts_col: b[ts_col]}
        for c in left_names:
            if c not in (key_col, ts_col):
                cols[c] = pa.nulls(n, ltypes[c])
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        for c in right_cols:
            cols[c] = b[c]
        # column order must match tag_left's output exactly for union
        order = left_names + ["__side"] + right_cols
        return pa.table({c: cols[c] for c in order})

    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    merged = lt.union(rt).sort([key_col, ts_col, "__side"]).materialize()

    # ---- pass A: boundary summaries -> driver carry map ----
    def summarize(b: pa.Table) -> pa.Table:
        cols = {"tok_key": [], "tok_ts": [], "tok_side": [], "key": [],
                "pos": [], "has_right": [], "right_ts": [], "right_vals": [],
                "nat_key": []}
        if b.num_rows:
            keys = _np_col(b, key_col)
            ts = _ts_us(b[ts_col])
            side = _np_col(b, "__side")
            starts = _seg_starts(keys)
            n = b.num_rows
            segs = [(0, int(starts[1]) if len(starts) > 1 else n, 0)]
            if len(starts) > 1:
                segs.append((int(starts[-1]), n, 1))
            import json as _json

            for lo, hi, pos in segs:
                r_idx = np.nonzero(side[lo:hi] == 0)[0]
                has_r = bool(len(r_idx))
                last_r = lo + int(r_idx[-1]) if has_r else -1
                vals = ""
                rts = 0
                if has_r:
                    row = {c: b[c][last_r].as_py() for c in right_cols}
                    vals = _json.dumps(row, default=str)
                    rts = int(ts[last_r])
                cols["tok_key"].append(str(keys[0]))
                cols["tok_ts"].append(int(ts[0]))
                cols["tok_side"].append(int(side[0]))
                cols["key"].append(str(keys[lo]))
                cols["pos"].append(pos)
                cols["has_right"].append(has_r)
                cols["right_ts"].append(rts)
                cols["right_vals"].append(vals)
                # native key for driver-side block ORDERING (str would
                # misorder numeric keys: "10" < "2")
                k0 = keys[0]
                cols["nat_key"].append(k0.item() if hasattr(k0, "item") else k0)
        nat = pa.array(cols["nat_key"])
        return pa.table({
            "nat_key": nat,
            "tok_key": pa.array(cols["tok_key"], pa.string()),
            "tok_ts": pa.array(cols["tok_ts"], pa.int64()),
            "tok_side": pa.array(cols["tok_side"], pa.int64()),
            "key": pa.array(cols["key"], pa.string()),
            "pos": pa.array(cols["pos"], pa.int64()),
            "has_right": pa.array(cols["has_right"], pa.bool_()),
            "right_ts": pa.array(cols["right_ts"], pa.int64()),
            "right_vals": pa.array(cols["right_vals"], pa.string()),
        })

    rows = merged.map_batches(summarize, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None).take_all()
    carry = _assemble_carry(rows)
    carry_ref = ray.put(carry)

    # ---- pass B: segmented forward fill ----
    def fill(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.drop_columns(["__side"])
        keys = _np_col(b, key_col)
        ts = _ts_us(b[ts_col])
        side = _np_col(b, "__side")
        n = b.num_rows
        starts = _seg_starts(keys)
        is_right = side == 0
        acc = np.maximum.accumulate(np.where(is_right, np.arange(n), -1))
        # per-row segment start
        lens = np.diff(np.append(starts, n))
        seg_start = np.repeat(starts, lens)
        in_seg = acc >= seg_start
        tok = ((str(keys[0]), int(ts[0]), int(side[0])), str(keys[0]))
        c = ray.get(carry_ref).get(tok)
        use_carry = (~in_seg) & (seg_start == 0)
        src = np.where(in_seg, acc, 0)
        out = b
        for col_name in right_cols:
            col = b[col_name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            filled = col.take(pa.array(src))
            valid = in_seg.copy()
            if c is not None and use_carry.any():
                cv = pa.array([c[1].get(col_name)] * n).cast(col.type) \
                    if c[1].get(col_name) is not None else pa.nulls(n, col.type)
                filled = pc.if_else(pa.array(use_carry), cv, filled)
                valid = valid | use_carry
            if tolerance_us is not None:
                rts = np.where(in_seg, ts[src], c[0] if c is not None else -10**18)
                valid = valid & (ts - rts <= tolerance_us)
            filled = pc.if_else(pa.array(valid), filled, pa.nulls(n, col.type))
            out = out.set_column(out.column_names.index(col_name), col_name, filled)
        return out.filter(pa.array(side == 1)).drop_columns(["__side"])

    return merged.map_batches(fill, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
