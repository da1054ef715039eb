"""Isolation forest — the actual tree model behind
processor/isolationforestprocessor, columnar and distributed.

The reference keeps an ONLINE forest per pipeline worker
(isolation_forest.go: onlineIsolationForest, sliding window, adaptive
threshold) and scores each record as 2^(-E[path]/c(n))
(isolation_forest.go:268-269, the Liu/Ting/Zhou 2008 formula). For a
finite table the Ray-Data-first equivalent is the classic BATCH
algorithm the online variant approximates:

  1. TRAIN on a deterministic bounded sample (``sample_cap`` rows —
     absolute cap, never a corpus fraction; same discipline as
     similarity.ivf_train). Trees are tiny (psi<=256 leaves), built on
     the driver with a seeded RNG so runs reproduce.
  2. BROADCAST the forest as packed numpy arrays (a few hundred KB)
     via ``ray.put`` once.
  3. SCORE the stream in one ``map_batches`` pass: every tree is
     traversed for ALL rows simultaneously, level by level, as numpy
     gathers — no Python per row, cost O(num_trees * max_depth) numpy
     ops per batch.

At 100 TB only step 3 touches the data; it is embarrassingly parallel
and shuffle-free. The training sample is capped, the model is
broadcast once, and the scorer holds O(model) memory per worker.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

_EULER = 0.5772156649015329


def c_factor(n) -> np.ndarray:
    """Expected path length of an unsuccessful BST search in a tree of
    n points (isolation_forest.go getExpectedPathLength):
    c(n) = 2*H(n-1) - 2(n-1)/n, c(2)=1, c(<=1)=0."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    big = n > 2
    nn = np.where(big, n, 3.0)
    out = np.where(big, 2.0 * (np.log(nn - 1.0) + _EULER) - 2.0 * (nn - 1.0) / nn, out)
    out = np.where(n == 2, 1.0, out)
    return out


class _Tree:
    """One isolation tree packed into flat arrays for vectorized
    traversal: feature[i] < 0 marks a leaf; left/right are node ids."""

    __slots__ = ("feature", "threshold", "left", "right", "depth", "size")

    def __init__(self):
        self.feature: list[int] = []
        self.threshold: list[float] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.depth: list[int] = []
        self.size: list[int] = []

    def _add(self, feature, threshold, depth, size) -> int:
        self.feature.append(feature)
        self.threshold.append(threshold)
        self.left.append(-1)
        self.right.append(-1)
        self.depth.append(depth)
        self.size.append(size)
        return len(self.feature) - 1

    def packed(self) -> dict[str, np.ndarray]:
        return {
            "feature": np.asarray(self.feature, np.int32),
            "threshold": np.asarray(self.threshold, np.float64),
            "left": np.asarray(self.left, np.int32),
            "right": np.asarray(self.right, np.int32),
            "depth": np.asarray(self.depth, np.int32),
            "size": np.asarray(self.size, np.int64),
        }


def _build_tree(X: np.ndarray, rng: np.random.Generator, max_depth: int) -> _Tree:
    t = _Tree()

    def grow(idx: np.ndarray, depth: int) -> int:
        n = len(idx)
        if depth >= max_depth or n <= 1:
            return t._add(-1, 0.0, depth, n)
        sub = X[idx]
        lo, hi = sub.min(axis=0), sub.max(axis=0)
        splittable = np.flatnonzero(hi > lo)
        if len(splittable) == 0:  # all duplicate points
            return t._add(-1, 0.0, depth, n)
        f = int(rng.choice(splittable))
        thr = float(rng.uniform(lo[f], hi[f]))
        node = t._add(f, thr, depth, n)
        mask = sub[:, f] < thr
        t.left[node] = grow(idx[mask], depth + 1)
        t.right[node] = grow(idx[~mask], depth + 1)
        return node

    grow(np.arange(len(X)), 0)
    return t


def train_iforest(
    ds: ray.data.Dataset,
    feature_cols: list[str],
    num_trees: int = 100,
    sample_cap: int = 256,
    seed: int = 7,
) -> dict:
    """Fit the forest on a deterministic bounded sample. ``sample_cap``
    is the per-tree psi (Liu et al. default 256); the driver pulls at
    most ``num_trees * sample_cap`` rows via Dataset.limit over a
    hash-shuffled-enough stream — an absolute cap, independent of
    corpus size."""
    need = num_trees * sample_cap
    feats = ds.select_columns(feature_cols)
    n_total = feats.count()
    frac = min(1.0, 2.0 * need / max(n_total, 1))  # 2x for variance
    sample = feats.random_sample(frac, seed=seed) if frac < 1.0 else feats
    X = sample.to_pandas().to_numpy(dtype=np.float64)
    if len(X) == 0:
        raise ValueError("train_iforest: empty training sample")
    rng = np.random.default_rng(seed)
    if len(X) > need:
        X = X[rng.choice(len(X), need, replace=False)]
    psi = min(sample_cap, len(X))
    max_depth = int(math.ceil(math.log2(max(psi, 2))))
    trees = []
    for _ in range(num_trees):
        pick = rng.choice(len(X), size=psi, replace=len(X) < psi)
        trees.append(_build_tree(X[pick], rng, max_depth).packed())
    return {"trees": trees, "psi": psi, "features": list(feature_cols),
            "cn": float(c_factor(psi))}


def _tree_path_lengths(tree: dict[str, np.ndarray], X: np.ndarray) -> np.ndarray:
    """Vectorized traversal: all rows walk the tree level by level."""
    n = len(X)
    node = np.zeros(n, np.int32)
    done = np.zeros(n, bool)
    out = np.zeros(n, np.float64)
    feature, threshold = tree["feature"], tree["threshold"]
    left, right = tree["left"], tree["right"]
    depth, size = tree["depth"], tree["size"]
    while not done.all():
        f = feature[node]
        leaf = (f < 0) & ~done
        if leaf.any():
            ln = node[leaf]
            out[leaf] = depth[ln] + c_factor(size[ln])
            done |= leaf
        active = ~done
        if not active.any():
            break
        an = node[active]
        go_left = X[active, feature[an]] < threshold[an]
        node[active] = np.where(go_left, left[an], right[an])
    return out


def score_iforest(
    ds: ray.data.Dataset,
    model: dict,
    score_col: str = "anomaly_score",
    flag_col: str = "is_anomaly",
    threshold: float = 0.6,
) -> ray.data.Dataset:
    """One streaming pass: anomaly_score = 2^(-E[h]/c(psi))
    (isolation_forest.go:268-269), flag = score > threshold. The model
    is shipped once via ray.put and read per task."""
    ref = ray.put(model)

    def score(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        X = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in m["features"]])
        X = np.nan_to_num(X, nan=0.0)
        total = np.zeros(len(X), np.float64)
        for tree in m["trees"]:
            total += _tree_path_lengths(tree, X)
        avg = total / len(m["trees"])
        s = np.clip(np.power(2.0, -avg / m["cn"]), 0.0, 1.0)
        b = b.append_column(score_col, pa.array(s))
        return b.append_column(flag_col, pa.array(s > threshold))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
