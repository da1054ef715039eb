"""Isolation forest (stages/iforest.py vs the reference
processor/isolationforestprocessor scoring formula): planted-anomaly
recall, vectorized-vs-recursive scorer parity, and score-range
invariants."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.iforest import (
    _tree_path_lengths,
    c_factor,
    score_iforest,
    train_iforest,
)


def _planted(n_normal=2000, n_anom=20, seed=3):
    rng = np.random.default_rng(seed)
    normal = rng.normal(0.0, 1.0, size=(n_normal, 2))
    anom = rng.uniform(8.0, 12.0, size=(n_anom, 2)) * rng.choice(
        [-1, 1], size=(n_anom, 2))
    X = np.vstack([normal, anom])
    labels = np.array([0] * n_normal + [1] * n_anom)
    order = rng.permutation(len(X))
    return X[order], labels[order]


def _ds_from(X):
    return ray.data.from_arrow(pa.table({"f0": X[:, 0], "f1": X[:, 1]}))


def test_c_factor_reference_values():
    # isolation_forest.go getExpectedPathLength: c(n)=2H(n-1)-2(n-1)/n
    assert c_factor(1) == 0.0
    assert c_factor(2) == 1.0
    euler = 0.5772156649015329
    n = 256
    want = 2 * (math.log(n - 1) + euler) - 2 * (n - 1) / n
    assert abs(float(c_factor(n)) - want) < 1e-12


def test_planted_anomaly_recall(ray_session):
    X, labels = _planted()
    ds = _ds_from(X)
    model = train_iforest(ds, ["f0", "f1"], num_trees=50, sample_cap=128)
    out = score_iforest(ds, model).to_pandas()
    scores = out["anomaly_score"].to_numpy()
    assert scores.min() >= 0.0 and scores.max() <= 1.0
    # the 20 planted far-out points must dominate the score ranking
    k = int(labels.sum())
    top = np.argsort(-scores)[:k]
    recall = labels[top].sum() / k
    assert recall >= 0.9, recall
    # and their mean score must clear the classic 0.6 anomaly bar
    assert scores[labels == 1].mean() > 0.6
    assert scores[labels == 0].mean() < 0.55


def test_vectorized_matches_recursive_scorer(ray_session):
    # the level-by-level numpy traversal must equal a per-row recursive
    # walk of the same packed tree (the reference's calculatePathLength)
    X, _ = _planted(n_normal=300, n_anom=5)
    ds = _ds_from(X)
    model = train_iforest(ds, ["f0", "f1"], num_trees=7, sample_cap=64)

    def recursive_path(tree, x):
        node, depth = 0, 0
        while tree["feature"][node] >= 0:
            f = tree["feature"][node]
            node = (tree["left"][node] if x[f] < tree["threshold"][node]
                    else tree["right"][node])
        return tree["depth"][node] + float(c_factor(tree["size"][node]))

    probe = X[:50]
    for tree in model["trees"]:
        fast = _tree_path_lengths(tree, probe)
        slow = np.array([recursive_path(tree, x) for x in probe])
        assert np.allclose(fast, slow)


def test_deterministic_across_runs(ray_session):
    X, _ = _planted(n_normal=500, n_anom=5)
    ds = _ds_from(X)
    m1 = train_iforest(ds, ["f0", "f1"], num_trees=10, sample_cap=64, seed=11)
    m2 = train_iforest(ds, ["f0", "f1"], num_trees=10, sample_cap=64, seed=11)
    s1 = score_iforest(ds, m1).to_pandas()["anomaly_score"]
    s2 = score_iforest(ds, m2).to_pandas()["anomaly_score"]
    assert np.array_equal(s1.to_numpy(), s2.to_numpy())


def test_duplicate_points_become_leaves(ray_session):
    # all-identical training data: trees are single leaves, every
    # score is the same neutral value, nothing crashes
    X = np.ones((100, 2))
    ds = _ds_from(X)
    model = train_iforest(ds, ["f0", "f1"], num_trees=5, sample_cap=32)
    out = score_iforest(ds, model).to_pandas()
    assert out["anomaly_score"].nunique() == 1
