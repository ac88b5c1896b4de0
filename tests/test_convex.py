"""Convex NMF (Ding-Li-Jordan 2010) — beyond-reference.

Oracles: monotone objective (paper Thms 5-6); the basis lives in the
column space of X by construction; mixed-sign data supported; near-exact
recovery when X has an exact convex rank-k structure.
"""
import numpy as np
import pytest

from tpunmf.solvers import convex_nmf


def test_objective_monotone_nonneg_data(rng):
    x = rng.random((30, 40)) + 0.05
    res = convex_nmf(x, 4, min_iter=80, max_iter=80, tol1=0.0, tol2=0.0)
    objs = np.asarray(res.obj_history)
    assert np.all(np.diff(objs) <= 1e-6 * np.abs(objs[:-1]) + 1e-8)
    assert res.w.shape == (30, 4) and res.h.shape == (4, 40)
    assert np.all(res.h >= 0)


def test_mixed_sign_data(rng):
    x = rng.standard_normal((24, 36))
    res = convex_nmf(x, 3, min_iter=60, max_iter=60, tol1=0.0, tol2=0.0)
    objs = np.asarray(res.obj_history)
    assert np.all(np.isfinite(objs))
    assert np.all(np.diff(objs) <= 1e-6 * np.abs(objs[:-1]) + 1e-8)
    # reconstruction better than the zero model
    assert objs[-1] < np.sum(x * x)


def test_recovers_clustered_structure(rng):
    # 3 well-separated column clusters: convex NMF should reconstruct
    # X nearly exactly with k=3 (centroids are convex combos of data)
    centers = rng.standard_normal((20, 3)) * 3
    labels = np.array([j % 3 for j in range(42)])
    x = centers[:, labels] + 0.01 * rng.standard_normal((20, 42))
    res = convex_nmf(x, 3, min_iter=200, max_iter=200, tol1=0.0, tol2=0.0)
    rel = res.obj_history[-1] / np.sum(x * x)
    assert rel < 0.01
    # dominant encoding follows the clusters (up to permutation)
    pred = np.argmax(res.h, axis=0)
    for c in range(3):
        assert len(set(pred[labels == c].tolist())) == 1


def test_validation(rng):
    x = rng.random((10, 8))
    with pytest.raises(ValueError):
        convex_nmf(x, 0)
    with pytest.raises(ValueError):
        convex_nmf(x, 3, w_init=np.ones((8, 3)))
    with pytest.raises(ValueError):
        convex_nmf(x, 3, w_init=np.ones((5, 3)), g_init=np.ones((5, 3)))
