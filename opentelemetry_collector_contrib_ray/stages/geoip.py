"""GeoIP-style range enrichment — a concrete file-backed provider on
the broadcast range-join engine.

The reference's geoipprocessor (processor/geoipprocessor: resolve
source.address against an mmdb provider, attach geo.* attributes)
reduces, for a finite table, to a CIDR/interval lookup: the database
is a small table of non-overlapping IP ranges with payload columns,
broadcast once via ``ray.put``; every batch converts its IPv4 strings
to uint32 vectorized and binary-searches the sorted range starts —
O(log ranges) per row, no shuffle, the stream never leaves its task
(the same posture as ``rangejoin.range_join_broadcast``, which covers
the timestamp-interval flavor of the same join).

The "mmdb file" here is any parquet/CSV-shaped table with a ``cidr``
column — parse once with ``cidr_to_ranges`` and reuse across queries.
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_IP_RE = (r"^(?P<o1>\d{1,3})\.(?P<o2>\d{1,3})\."
          r"(?P<o3>\d{1,3})\.(?P<o4>\d{1,3})$")


def ipv4_to_uint32(col) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized dotted-quad -> uint32 (as int64 for Arrow interop).
    Returns (ip_int, valid_mask); malformed rows get valid=False."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ex = pc.extract_regex(col, pattern=_IP_RE)
    octs = [pc.cast(pc.fill_null(pc.struct_field(ex, i), "0"), pa.int64())
            .to_numpy(zero_copy_only=False) for i in range(4)]
    in_range = ((octs[0] < 256) & (octs[1] < 256)
                & (octs[2] < 256) & (octs[3] < 256))
    ip = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
    valid = pc.is_valid(ex).to_numpy(zero_copy_only=False) & in_range
    return ip, valid


def cidr_to_ranges(db: pa.Table, cidr_col: str = "cidr") -> pa.Table:
    """Parse the provider table's CIDR column into [start, end]
    uint32 bounds (inclusive), sorted and checked non-overlapping —
    ambiguous databases fail loud, like range_join_broadcast."""
    starts, ends = [], []
    for c in db[cidr_col].to_pylist():  # db is provider-sized: tiny
        net = ipaddress.ip_network(c, strict=False)
        starts.append(int(net.network_address))
        ends.append(int(net.broadcast_address))
    s = np.asarray(starts, np.int64)
    e = np.asarray(ends, np.int64)
    order = np.argsort(s, kind="stable")
    s, e = s[order], e[order]
    if len(s) > 1 and (e[:-1] >= s[1:]).any():
        raise ValueError("cidr_to_ranges: CIDR blocks overlap — "
                         "containment would be ambiguous")
    out = db.take(pa.array(order))
    out = out.append_column("_range_start", pa.array(s))
    return out.append_column("_range_end", pa.array(e))


def geoip_enrich(
    ds: ray.data.Dataset,
    ip_col: str,
    ranges: pa.Table,
    payload_cols: list[str],
    how: str = "left",
) -> ray.data.Dataset:
    """Attach ``payload_cols`` of the range containing each row's
    ``ip_col``. ``ranges`` comes from ``cidr_to_ranges``; rows with a
    malformed or unmatched IP get null payload ("left") or are
    dropped ("inner")."""
    s = ranges["_range_start"].to_numpy(zero_copy_only=False)
    e = ranges["_range_end"].to_numpy(zero_copy_only=False)
    ref = ray.put((s, e, ranges.select(payload_cols)))

    def join(b: pa.Table) -> pa.Table:
        starts, ends, payload = ray.get(ref)
        ip, valid = ipv4_to_uint32(b[ip_col])
        idx = np.searchsorted(starts, ip, side="right") - 1
        ok = valid & (idx >= 0) & (ip <= ends[np.clip(idx, 0, None)])
        idx_arr = pa.array(np.where(ok, idx, 0), pa.int64())
        okp = pa.array(ok)
        for c in payload_cols:
            col = payload[c]
            vals = pc.take(col.combine_chunks()
                           if isinstance(col, pa.ChunkedArray) else col,
                           idx_arr)
            vals = pc.if_else(okp, vals, pa.nulls(b.num_rows, vals.type))
            b = b.append_column(c, vals)
        if how == "inner":
            b = b.filter(okp)
        return b

    return ds.map_batches(join, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
