"""Distributed connected components via min-label propagation.

Closes the round-1 review caveat on ``dedup.connected_components``
(driver-side union-find, valid only while LSH+verify keeps the edge
set driver-sized): this version never collects edges or labels to the
driver — labels live in a Dataset, each round is hash joins plus a
groupby-min, and convergence is detected with a scalar aggregate.

Algorithm (min-label propagation with pointer jumping, the standard
Hash-Min / two-phase CC shape from the MapReduce literature, e.g.
Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds"):

  labels[v] = v initially;
  each round:  relax   labels[v] = min(labels[v], min over (u,v) of labels[u])
               jump    labels[v] = labels[labels[v]]   (path halving)
  stop when sum(labels) stops decreasing.

The jump step makes chains converge in O(log diameter) rounds instead
of O(diameter). All intermediate tables are one row per node/edge —
nothing driver-resident grows with the graph. Partitioning
assumption: none beyond hash-join capacity; hot components are fine
because per-node state is a single int.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from .dedup import normalize_empty_blocks


def _components_driver(a: np.ndarray, b: np.ndarray) -> "pa.Table":
    """Hash-min over driver arrays for the size-gated small-graph fast
    path: the SAME algorithm as the distributed loop (relax both edge
    directions, pointer-jump, until fixpoint), as numpy scatter-min
    rounds. Factorization via np.unique handles string node ids."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[:len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = lab.copy()
        np.minimum.at(lab, ai, lab[bi])
        np.minimum.at(lab, bi, lab[ai])
        for _ in range(3):  # pointer jumping
            lab = lab[lab]
        if np.array_equal(lab, prev):
            break
    return pa.table({"node": pa.array(nodes), "component": pa.array(nodes[lab])})


def _rename(ds: ray.data.Dataset, names: list[str]) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b, n=tuple(names): b.rename_columns(list(n)),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def label_propagation_components(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    num_partitions: int | None = None,
    driver_edge_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Connected components of the undirected graph given by an edge
    Dataset. Returns (node, component) where component is the minimum
    node id reachable from node. Nodes are every edge endpoint;
    isolated nodes (no edges) do not appear — union them in upstream
    if needed. ``num_partitions`` (join fan-out) defaults to edge
    count / 2M clamped to [2, 64] — each hash-join partition then
    holds a few-MB label/edge slice at any graph size."""
    # .names/.types works for Arrow AND pandas-backed blocks (the
    # base_schema of a pandas block has no .field)
    sch = edges.schema()
    node_t = dict(zip(sch.names, sch.types))[src]

    def fwd(b: pa.Table) -> pa.Table:
        return pa.table({"a": b[src], "b": b[dst]})

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"a": b[dst], "b": b[src]})

    und = edges.map_batches(fwd, batch_format="pyarrow", zero_copy_batch=True, batch_size=None).union(
        edges.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    ).materialize()
    n_und = und.count()
    if n_und <= 2 * driver_edge_limit:  # und carries both directions
        # SIZE GATE: each distributed round costs ~3 executor floors
        # (seconds) regardless of graph size; below the gate the same
        # hash-min runs as numpy scatter-min rounds on two driver
        # arrays (16 bytes/edge), parity-tested against the loop below
        tabs = [t for t in (ray.get(r) for r in und.to_arrow_refs())
                if t.num_rows]
        if not tabs:
            return _rename(und, ["node", "component"])
        tbl = pa.concat_tables(tabs, promote_options="none")
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        return ray.data.from_arrow(_components_driver(a, b))
    if num_partitions is None:
        num_partitions = max(2, min(64, n_und // 4_000_000))

    # seed labels with one shuffle-free round of relaxation already
    # applied: labels[v] = min(v, min neighbor) — one groupby instead
    # of identity labels + a join
    labels = _rename(und.groupby("a").min("b"), ["node", "label"])

    def min_self(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": pc.min_element_wise(b["node"], b["label"])})

    labels = labels.map_batches(min_self, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    labels = normalize_empty_blocks(labels, {"node": node_t, "label": node_t}).materialize()

    if pa.types.is_string(node_t):
        # string node ids: convergence checksum over a label hash (the
        # scalar Sum can't add strings); equality-based detection needs
        # no monotonicity, only stability
        from ..functions.hashing import md5_number_lower_arrow

        def _sum_col(ds_):
            def h(b: pa.Table) -> pa.Table:
                hv = pc.cast(md5_number_lower_arrow(b["label"]), pa.int64(),
                             safe=False)
                return pa.table({"__lh": hv})

            hashed = ds_.map_batches(h, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
            return hashed.aggregate(Sum("__lh"))["sum(__lh)"]
    else:
        def _sum_col(ds_):
            return ds_.aggregate(Sum("label"))["sum(label)"]

    checksum = _sum_col(labels)

    def take_parent(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": b["p_label"]})

    # Each round runs as THREE dataset executions, not one per
    # operator — the per-execution scheduler overhead dominates small
    # graphs, so the relax join + union + groupby-min chain stays lazy
    # until the normalize that the jump join needs anyway:
    #   1. relax-join ∪ labels -> groupby min  (normalize = the only
    #      materialization; joins reject the groupby's zero-column
    #      empty blocks otherwise)
    #   2. jump join -> take_parent            (normalize again)
    #   3. scalar checksum for convergence
    for _ in range(max_iters):
        # relax: ship labels[a] across each edge (a,b)
        m = und.join(labels, join_type="inner", num_partitions=num_partitions,
                     on=("a",), right_on=("node",))
        prop = _rename(
            m.map_batches(lambda t: t.select(["b", "label"]),
                          batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
            ["node", "label"],
        )
        relaxed = _rename(labels.union(prop).groupby("node").min("label"), ["node", "label"])
        relaxed = normalize_empty_blocks(relaxed, {"node": node_t, "label": node_t})
        # jump: labels[v] = labels[labels[v]] (parent's label can only
        # be <= parent, so the joined label replaces the current one);
        # the right side is pre-renamed so no join-suffix ambiguity
        parents = _rename(relaxed, ["p_node", "p_label"])
        j = relaxed.join(parents, join_type="inner", num_partitions=num_partitions,
                         on=("label",), right_on=("p_node",))
        jumped = j.map_batches(take_parent, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        labels = normalize_empty_blocks(jumped, {"node": node_t, "label": node_t})
        new_sum = _sum_col(labels)
        if new_sum == checksum:
            break
        checksum = new_sum

    return _rename(labels, ["node", "component"])
