"""Service-graph style request/response edge metrics — two-sided
stateful pairing.

Reference semantics (connector/servicegraphconnector): the connector
keeps an in-flight store keyed by (trace_id, span_id); a client span
and the server span it called are matched when both sides arrive, and
the edge (client service -> server service) emits request count +
latency histogram metrics. On a finite table the wait/eviction store
collapses to an EQUIJOIN of the two sides (SURVEY.md §2.5 windows
note) — the genuinely two-sided shuffle shape the round-1 verdict
called out as missing.

Scale shape: ``Dataset.join`` hash join on the pairing key (the one
unavoidable co-location of the two streams), then the usual per-batch
partial -> tree-merge grouped aggregation of the edge metrics. The
join keys are high-cardinality (trace/conv ids) and hash-partition
evenly; edge dims are low-cardinality metric labels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .aggregate import grouped_count_sum


def service_graph_edges(
    client: ray.data.Dataset,
    server: ray.data.Dataset,
    on: list[str],
    edge_dims: list[str],
    client_ts: str = "ts",
    server_ts: str = "ts",
    num_partitions: int = 16,
    latency_name: str = "latency_us_sum",
    count_name: str = "n_calls",
    guard_empty: bool = False,
) -> ray.data.Dataset:
    """Join the client and server streams on ``on`` (the reference's
    (trace_id, span_id) pairing key) and emit one row per edge dim set
    with request count + summed latency in microseconds
    (server ts - client ts).

    ``guard_empty``: Ray 2.49's hash join crashes (ArrowInvalid on the
    key FieldRef) when one side dataset is COMPLETELY empty. The guard
    probes each side with limit(1) — but that costs a full extra pass
    through each side's upstream (limit does not early-stop through a
    fused task chain in 2.49), so it is opt-in: enable it when a side
    can legitimately filter to nothing; without it an empty side fails
    LOUD (never wrong data)."""
    if guard_empty and (client.limit(1).count() == 0 or server.limit(1).count() == 0):
        cols = {d: pa.array([], pa.string()) for d in edge_dims}
        cols[count_name] = pa.array([], pa.int64())
        cols[latency_name] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    joined = client.join(
        server, join_type="inner", num_partitions=num_partitions,
        on=tuple(on), right_on=tuple(on), right_suffix="_srv",
    )
    # note: a single join output may carry zero-column empty partitions
    # (see dedup.normalize_empty_blocks); the consumers below are
    # map_batches (which skip empty blocks) and grouped_count_sum
    # partials, neither of which joins again, so no normalization is
    # needed here — add it if this output ever feeds another join

    def latency(b: pa.Table) -> pa.Table:
        cts = b[client_ts] if client_ts in b.column_names else b[client_ts + "_srv"]
        sname = server_ts + "_srv" if server_ts + "_srv" in b.column_names else server_ts
        sts = b[sname]
        if isinstance(cts, pa.ChunkedArray):
            cts = cts.combine_chunks()
        if isinstance(sts, pa.ChunkedArray):
            sts = sts.combine_chunks()
        c_us = pc.cast(pc.cast(cts, pa.timestamp("us")), pa.int64())
        s_us = pc.cast(pc.cast(sts, pa.timestamp("us")), pa.int64())
        return b.append_column("_latency_us", pc.subtract(s_us, c_us))

    joined = joined.map_batches(latency, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return grouped_count_sum(
        joined, edge_dims, sum_cols={"_latency_us": latency_name}, count_name=count_name
    )


def adjacent_edges_presorted(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    *,
    client_role: str,
    server_role: str,
    role_col: str,
    ts_col: str,
    edge_dim: str,
    latency_name: str = "latency_us_sum",
    count_name: str = "n_calls",
    broadcast_edge_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Shuffle-free service-graph pairing for PRESORTED input.

    Same result as ``service_graph_edges`` joined on (group,
    order+1), but exploiting the layout the transcript cache
    guarantees (and `recombine`'s presorted strategy already relies
    on): rows globally ordered by (group, order), blocks cut anywhere.
    A client row then pairs with the row IMMEDIATELY AFTER it, so the
    whole join degenerates to one vectorized shift-compare per block
    plus an O(blocks) cross-block boundary fix-up:

      * per block: mask rows whose predecessor is the matching client
        (same group, order == predecessor order + 1, role transition),
        hash-groupby partial (edge_dim -> count, latency sum);
      * each block also emits its first and last row; the driver
        orders blocks by first (group, order) — unique under the sort
        — and pairs block k's last row with block k+1's first row;
      * driver merges the tiny partial stream + boundary pairs.

    Emits one row per edge_dim value. The partitioning assumption is
    the sort; it fails LOUD if order tokens collide (duplicate sort
    keys across blocks).
    """
    def block(b: pa.Table) -> pa.Table:
        empty = {
            "kind": pa.array([], pa.string()),
            "edge": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "lat": pa.array([], pa.int64()),
            "grp": pa.array([], pa.string()),
            "ord": pa.array([], pa.int64()),
            "role": pa.array([], pa.string()),
            "ts_us": pa.array([], pa.int64()),
        }
        if b.num_rows == 0:
            return pa.table(empty)
        grp = b[group_col].combine_chunks() if isinstance(b[group_col], pa.ChunkedArray) else b[group_col]
        order = pc.cast(b[order_col], pa.int64()).combine_chunks() \
            if isinstance(b[order_col], pa.ChunkedArray) else pc.cast(b[order_col], pa.int64())
        role = b[role_col]
        ts_us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        dim = b[edge_dim]
        n = b.num_rows
        if isinstance(role, pa.ChunkedArray):
            role = role.combine_chunks()
        o = order.to_numpy(zero_copy_only=False)
        t = ts_us.to_numpy(zero_copy_only=False)
        m = np.zeros(n, dtype=bool)
        if n > 1:
            same_grp = pc.equal(grp.slice(1), grp.slice(0, n - 1))
            cli = pc.equal(role.slice(0, n - 1), client_role)
            srv = pc.equal(role.slice(1), server_role)
            adj = pc.and_(pc.and_(same_grp, cli), srv) \
                .to_numpy(zero_copy_only=False)
            m[1:] = adj & (o[1:] == o[:-1] + 1)
        lat = np.zeros(n, dtype=np.int64)
        lat[1:] = t[1:] - t[:-1]
        g = (grp[0].as_py(), grp[-1].as_py())
        r = (role[0].as_py(), role[-1].as_py())
        paired = pa.table({"edge": dim, "lat": pa.array(lat)}).filter(pa.array(m))
        part = paired.group_by(["edge"]).aggregate([([], "count_all"), ("lat", "sum")])
        part = part.rename_columns(["edge", "n", "lat"])
        out = {
            "kind": pa.array(["partial"] * part.num_rows + ["first", "last"]),
            "edge": pa.concat_arrays([part["edge"].combine_chunks().cast(pa.string()),
                                      pa.array([None, None], pa.string())]),
            "n": pa.concat_arrays([part["n"].combine_chunks(),
                                   pa.array([0, 0], pa.int64())]),
            "lat": pa.concat_arrays([part["lat"].combine_chunks(),
                                     pa.array([0, 0], pa.int64())]),
            "grp": pa.array([None] * part.num_rows +
                            [str(g[0]), str(g[1])], pa.string()),
            "ord": pa.array([0] * part.num_rows + [int(o[0]), int(o[-1])], pa.int64()),
            "role": pa.array([None] * part.num_rows + [str(r[0]), str(r[1])], pa.string()),
            "ts_us": pa.array([0] * part.num_rows + [int(t[0]), int(t[-1])], pa.int64()),
        }
        # boundary rows carry the edge dim of the FIRST row too (the
        # server side of a cross-block pair is the block's first row)
        out["edge"] = pa.concat_arrays([
            out["edge"].slice(0, part.num_rows),
            pa.array([dim[0].as_py(), dim[-1].as_py()], pa.string())])
        return pa.table(out)

    # summary stream: per-block edge partials + 2 boundary rows per
    # block; pinned once, consumed by the boundary scan and the
    # partial merge below
    summary = ds.map_batches(block, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None
                             ).materialize()

    def _keep(kinds):
        ks = pa.array(kinds, pa.string())

        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["kind"], value_set=ks))
        return f

    # SIZE GATE probe: count() on a materialized dataset is
    # metadata-only, so deciding the strategy costs no execution pass.
    # Gate on total summary rows (partials + 2 boundary rows per
    # block) — marginally stricter than partial-count alone, same
    # 2M-row shape as tailsample's broadcast gate.
    small = summary.count() <= broadcast_edge_limit
    if small:
        # common path: ONE take_all of the whole summary, split by
        # kind driver-side — no extra filter/count executions
        rows = summary.take_all()
        partial_rows = [r for r in rows if r["kind"] == "partial"]
    else:
        # boundary rows are O(blocks) at any scale — always driver-side
        rows = summary.map_batches(_keep(["first", "last"]),
                                   batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   batch_size=None).take_all()
        partial_rows = None
    firsts = [r for r in rows if r["kind"] == "first"]
    lasts = [r for r in rows if r["kind"] == "last"]
    if len(firsts) != len(lasts):
        raise AssertionError("presorted pairing: mismatched block summaries")
    blks = sorted(zip(firsts, lasts), key=lambda p: (p[0]["grp"], p[0]["ord"]))
    tokens = [(f["grp"], f["ord"]) for f, _ in blks]
    if len(set(tokens)) != len(tokens):
        raise AssertionError(
            "presorted pairing: duplicate block order tokens — input is "
            "not (group, order)-sorted; use service_graph_edges instead")
    bedges, bns, blats = [], [], []
    for (pf, pl), (nf, nl) in zip(blks[:-1], blks[1:]):
        last, first = pl, nf
        if (last["grp"] == first["grp"] and first["ord"] == last["ord"] + 1
                and last["role"] == client_role and first["role"] == server_role):
            bedges.append(first["edge"])
            bns.append(1)
            blats.append(first["ts_us"] - last["ts_us"])
    boundary_tbl = pa.table({"edge": pa.array(bedges, pa.string()),
                             "n": pa.array(bns, pa.int64()),
                             "lat": pa.array(blats, pa.int64())})

    # The driver merge holds distinct-edges x blocks partial rows —
    # fine for service-pair cardinality, pathological for a
    # high-cardinality edge dim. Above the gate the merge stays
    # distributed and the result is never driver-resident.
    if partial_rows is not None:
        partials: dict[str, tuple[int, int]] = {}
        for rrow in partial_rows:
            cur = partials.get(rrow["edge"], (0, 0))
            partials[rrow["edge"]] = (cur[0] + rrow["n"], cur[1] + rrow["lat"])
        for e, dn, dl in zip(bedges, bns, blats):
            cur = partials.get(e, (0, 0))
            partials[e] = (cur[0] + dn, cur[1] + dl)
        edges = sorted(partials)
        return ray.data.from_arrow(pa.table({
            edge_dim: pa.array(edges, pa.string()),
            count_name: pa.array([partials[e][0] for e in edges], pa.int64()),
            latency_name: pa.array([partials[e][1] for e in edges], pa.int64()),
        }))
    parts = summary.map_batches(
        lambda b: _keep(["partial"])(b).select(["edge", "n", "lat"]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    merged = parts.union(ray.data.from_arrow(boundary_tbl)) \
        .groupby("edge").sum(["n", "lat"])

    def rename(b: pa.Table) -> pa.Table:
        m = {"edge": edge_dim, "sum(n)": count_name, "sum(lat)": latency_name}
        b = b.rename_columns([m.get(c, c) for c in b.column_names])
        return b.select([edge_dim, count_name, latency_name])

    return merged.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def service_graph_edges_virtual(
    client: ray.data.Dataset,
    server: ray.data.Dataset,
    on: list[str],
    *,
    client_svc_col: str,
    server_svc_col: str,
    peer_attr_cols: list[str] | None = None,
    server_is_root_col: str | None = None,
    client_ts: str = "ts",
    server_ts: str = "ts",
    num_partitions: int = 16,
    latency_name: str = "latency_us_sum",
    count_name: str = "n_calls",
) -> ray.data.Dataset:
    """service_graph_edges + the virtual-node feature gate
    (connector.go:356-385 onExpire): on a finite table "edge expired
    with one side missing" is exactly the FULL OUTER join's unmatched
    rows, so no timer store is needed.

      * unmatched CLIENT span -> edge to a virtual SERVER: the first
        non-null of ``peer_attr_cols`` (VirtualNodePeerAttributes,
        getPeerHost connector.go:723-731) else "unknown";
        virtual_node="server" (virtual-node-label-server golden).
      * unmatched SERVER span -> edge from the virtual client "user",
        ONLY for root spans (SpanIDIsEmpty key, connector.go:369-375)
        — pass the root flag via ``server_is_root_col``; non-root
        unmatched server spans are dropped like the reference's
        expired half-edges. virtual_node="client"
        (virtual-node-label-client golden).
      * paired rows keep latency; virtual edges count only (the
        missing side has no timestamp). connection_type =
        "virtual_node" on virtual edges, "" otherwise.
    """
    joined = client.join(
        server, join_type="full_outer", num_partitions=num_partitions,
        on=tuple(on), right_on=tuple(on), right_suffix="_srv",
    )
    peer_attr_cols = peer_attr_cols or []

    def classify(b: pa.Table) -> pa.Table:
        n = b.num_rows

        def col(name):
            c = b[name] if name in b.column_names else pa.nulls(n, pa.string())
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        csvc = col(client_svc_col)
        sname = server_svc_col + "_srv" if server_svc_col + "_srv" in b.column_names \
            else server_svc_col
        ssvc = col(sname)
        client_missing = pc.is_null(csvc)
        server_missing = pc.is_null(ssvc)
        # virtual server: first non-null peer attribute else "unknown"
        peer = pa.array(["unknown"] * n, pa.string())
        for pcn in reversed(peer_attr_cols):
            cand = col(pcn if pcn in b.column_names else pcn + "_srv")
            peer = pc.if_else(pc.is_valid(cand), cand, peer)
        out_client = pc.if_else(client_missing, "user", pc.fill_null(csvc, ""))
        out_server = pc.if_else(server_missing, peer, pc.fill_null(ssvc, ""))
        virtual = pc.or_(client_missing, server_missing)
        conn = pc.if_else(virtual, "virtual_node", "")
        vlabel = pc.if_else(client_missing, "client",
                            pc.if_else(server_missing, "server", ""))
        # latency only where both sides exist
        cts = col(client_ts)
        stsn = server_ts + "_srv" if server_ts + "_srv" in b.column_names else server_ts
        sts = col(stsn)
        lat = pa.nulls(n, pa.int64())
        if pa.types.is_timestamp(cts.type) and pa.types.is_timestamp(sts.type):
            c_us = pc.cast(pc.cast(cts, pa.timestamp("us")), pa.int64())
            s_us = pc.cast(pc.cast(sts, pa.timestamp("us")), pa.int64())
            lat = pc.subtract(s_us, c_us)
        keep = pc.invert(client_missing)
        if server_is_root_col is not None:
            rname = server_is_root_col + "_srv" \
                if server_is_root_col + "_srv" in b.column_names else server_is_root_col
            is_root = pc.fill_null(pc.cast(col(rname), pa.bool_()), False)
            keep = pc.or_(keep, is_root)
        out = pa.table({
            "client": out_client, "server": out_server,
            "connection_type": conn, "virtual_node": vlabel,
            "_latency_us": lat,
        })
        return out.filter(keep)

    edges = joined.map_batches(classify, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
    return grouped_count_sum(
        edges, ["client", "server", "connection_type", "virtual_node"],
        sum_cols={"_latency_us": latency_name}, count_name=count_name)
