"""k8sattributes — pod-metadata enrichment from a file-backed snapshot.

Reference semantics (processor/k8sattributesprocessor):

  * ``pod_association`` (pod_association.go:20-66): an ORDERED list of
    associations, each a list of up to 4 sources; a row's identifier
    comes from the FIRST association whose sources ALL resolve to a
    non-empty value — and that identifier is final: if no pod matches
    it, no metadata is attached (the loop does NOT fall through to the
    next association on a lookup miss, only on an unresolved source).
  * the ``host.name`` source only resolves when its value parses as an
    IP address (pod_association.go:49-54); a non-IP host.name skips
    the whole association (pod_association_test.go:18-80).
  * with no associations configured, the identifier is the pod IP
    from ``k8s.pod.ip`` (extractPodIDNoAssociations).
  * ``extract.metadata`` lists the k8s.* attributes to attach;
    ``extract.labels`` / ``extract.annotations`` are
    {tag_name, key, from} rules (README "extracting attributes from
    pod labels and annotations").

The watcher/informer machinery (internal/kube/client.go) becomes a
STATIC SNAPSHOT TABLE for a finite-table engine: one row per pod,
columns named by their k8s.* attribute names (k8s.pod.name,
k8s.namespace.name, k8s.pod.uid, k8s.pod.ip, k8s.node.name, ...)
plus ``label.<key>`` / ``annotation.<key>`` columns for pod labels
and ``namespace.label.<key>`` for (denormalized) namespace labels.

Ray design: the snapshot is broadcast once (ray.put); each batch
resolves its association per row with vectorized kernels and joins by
``pc.index_in`` on composite key strings — no shuffle, no Python row
loop.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import register

# resource-attribute name -> snapshot column holding the pod-side value
_SOURCE_COLS = {
    "k8s.pod.ip": "k8s.pod.ip",
    "k8s.pod.name": "k8s.pod.name",
    "k8s.namespace.name": "k8s.namespace.name",
    "k8s.pod.uid": "k8s.pod.uid",
    "host.name": "k8s.pod.ip",  # host.name carries the pod IP in k8s
    "connection": "k8s.pod.ip",
    "ip": "k8s.pod.ip",
}

_SEP = "\x1f"  # composite-key separator (never appears in k8s names)

_DEFAULT_ASSOCIATIONS = [
    {"sources": [{"from": "resource_attribute", "name": "k8s.pod.ip"}]},
]


def _is_ipv4(arr: pa.Array) -> np.ndarray:
    """Vectorized net.ParseIP-for-IPv4: dotted quad with octets 0-255."""
    ex = pc.extract_regex(
        pc.fill_null(arr, ""),
        pattern=r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$")
    ok = ex.is_valid().to_numpy(zero_copy_only=False)
    if ok.any():
        for g in ("a", "b", "c", "d"):
            v = pc.cast(pc.struct_field(ex, g), pa.int64())
            v = pc.fill_null(v, 256).to_numpy(zero_copy_only=False)
            ok &= v <= 255
    return ok


def _string_col(tbl: pa.Table, name: str, n: int) -> pa.Array:
    if name not in tbl.column_names:
        return pa.nulls(n, pa.string())
    c = tbl[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if not pa.types.is_string(c.type):
        c = pc.cast(c, pa.string())
    return c


@register("k8sattributes")
class K8sAttributes:
    """``snapshot``: pod-grain pa.Table (columns = k8s.* attr names +
    label.* / annotation.* / namespace.label.*). ``pod_association``:
    the reference's ordered source lists. ``metadata``: k8s.* columns
    to attach. ``labels`` / ``annotations``: extract rules
    ({tag_name, key, from: pod|namespace})."""

    def __init__(
        self,
        snapshot: pa.Table,
        pod_association: list[dict[str, Any]] | None = None,
        metadata: list[str] | None = None,
        labels: list[dict[str, Any]] | None = None,
        annotations: list[dict[str, Any]] | None = None,
    ):
        self.associations = pod_association or _DEFAULT_ASSOCIATIONS
        self.metadata = metadata or ["k8s.pod.name", "k8s.namespace.name",
                                     "k8s.pod.uid"]
        # extract rules -> (tag_name, snapshot column)
        self.tag_cols: list[tuple[str, str]] = []
        for kind, rules in (("label", labels or []),
                            ("annotation", annotations or [])):
            for r in rules:
                frm = r.get("from", "pod")
                if frm == "pod":
                    col = f"{kind}.{r['key']}"
                elif frm in ("namespace", "node", "deployment",
                             "statefulset", "daemonset", "job"):
                    # config.go:86 From choices; owner/node metadata is
                    # denormalized onto the pod snapshot row as
                    # <from>.<kind>.<key> columns (the watcher joins
                    # owners at sync time; a static snapshot bakes the
                    # join in)
                    col = f"{frm}.{kind}.{r['key']}"
                else:
                    raise ValueError(
                        f"{frm} is not a valid choice for From. Must be "
                        "one of: pod, namespace, deployment, statefulset, "
                        "daemonset, job, node")  # config.go:86
                self.tag_cols.append((r["tag_name"], col))

        # validate + pre-build per-association snapshot key arrays and
        # the payload table ONCE (broadcast to every task)
        n = snapshot.num_rows
        self._assoc_sources: list[list[str]] = []
        keys: list[pa.Array] = []
        for a in self.associations:
            names = [s.get("name") or s.get("from", "")
                     for s in a["sources"]]
            for s in a["sources"]:
                nm = s.get("name") or s.get("from", "")
                if nm not in _SOURCE_COLS:
                    raise ValueError(
                        f"unsupported association source {nm!r}; supported: "
                        f"{sorted(_SOURCE_COLS)}")
            self._assoc_sources.append(names)
            parts = [_string_col(snapshot, _SOURCE_COLS[nm], n)
                     for nm in names]
            if len(parts) == 1:
                keys.append(parts[0])
            else:
                args = []
                for i, p in enumerate(parts):
                    if i:
                        args.append(pa.array([_SEP] * n, pa.string()))
                    args.append(p)
                keys.append(pc.binary_join_element_wise(*args, ""))
        payload_cols = [c for c in dict.fromkeys(
            self.metadata + [c for _, c in self.tag_cols])]
        missing = [c for c in payload_cols if c not in snapshot.column_names]
        if missing:
            raise ValueError(
                f"snapshot is missing extract columns {missing}; "
                f"has {snapshot.column_names}")
        self._ref = ray.put((keys, snapshot.select(payload_cols)))

    # ---------------------------------------------------------------- fn

    def fn(self, batch: pa.Table) -> pa.Table:
        keys, payload = ray.get(self._ref)
        n = batch.num_rows
        chosen = np.full(n, -1, dtype=np.int64)
        row_keys: list[pa.Array | None] = []
        for ai, names in enumerate(self._assoc_sources):
            resolved = np.ones(n, dtype=bool)
            parts = []
            for nm in names:
                v = _string_col(batch, nm, n) if nm in batch.column_names \
                    else pa.nulls(n, pa.string())
                nonempty = pc.and_(pc.is_valid(v),
                                   pc.not_equal(v, "")) \
                    .to_numpy(zero_copy_only=False)
                resolved &= np.asarray(nonempty, dtype=bool)
                if nm == "host.name":
                    # pod_association.go:49-54 — a non-IP host.name
                    # does not resolve
                    resolved &= _is_ipv4(v)
                parts.append(pc.fill_null(v, ""))
            if len(parts) == 1:
                rk = parts[0]
            else:
                args = []
                for i, p in enumerate(parts):
                    if i:
                        args.append(pa.array([_SEP] * n, pa.string()))
                    args.append(p)
                rk = pc.binary_join_element_wise(*args, "")
            row_keys.append(rk)
            # first fully-resolved association wins — FINAL even if the
            # lookup later misses (pod_association.go:60-63)
            chosen = np.where((chosen < 0) & resolved, ai, chosen)

        # per-association index_in, gathered into one pod-row index
        pod_idx = np.full(n, -1, dtype=np.int64)
        for ai in range(len(self._assoc_sources)):
            sel = chosen == ai
            if not sel.any():
                continue
            hit = pc.fill_null(pc.index_in(row_keys[ai], value_set=keys[ai]),
                               -1).to_numpy(zero_copy_only=False)
            pod_idx[sel] = hit.astype(np.int64)[sel]

        ok = pod_idx >= 0
        take_idx = pa.array(np.where(ok, pod_idx, 0), pa.int64())
        okp = pa.array(ok)
        out = batch
        emitted = set()
        for out_name, col in ([(m, m) for m in self.metadata]
                              + self.tag_cols):
            if out_name in emitted:
                continue
            emitted.add(out_name)
            c = payload[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            vals = pc.if_else(okp, pc.take(c, take_idx),
                              pa.nulls(n, c.type))
            if out_name in out.column_names:
                out = out.set_column(out.column_names.index(out_name),
                                     out_name, vals)
            else:
                out = out.append_column(out_name, vals)
        return out

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
