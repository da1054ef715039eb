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

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from .dedup import normalize_empty_blocks


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
    if num_partitions is None:
        num_partitions = max(2, min(64, und.count() // 4_000_000))

    # seed labels with one shuffle-free round of relaxation already
    # applied: labels[v] = min(v, min neighbor) — one groupby instead
    # of identity labels + a join
    labels = _rename(und.groupby("a").min("b"), ["node", "label"])

    def min_self(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": pc.min_element_wise(b["node"], b["label"])})

    labels = labels.map_batches(min_self, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    labels = normalize_empty_blocks(labels, {"node": node_t, "label": node_t}).materialize()
    checksum = labels.aggregate(Sum("label"))["sum(label)"]

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
        new_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if new_sum == checksum:
            break
        checksum = new_sum

    return _rename(labels, ["node", "component"])
