"""Graph-regularized NMF (Cai et al. 2011) — beyond-reference.

Oracles: lambda_g=0 reproduces plain EU MUR exactly; the regularized
objective is monotone non-increasing (the paper's Thm 1); graph
smoothing pulls encodings of adjacent columns together; knn_graph
builds a symmetric zero-diagonal affinity with the right sparsity.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.solvers import gnmf, knn_graph, mur


def test_knn_graph_properties(rng):
    x = jnp.asarray(rng.random((12, 30)))
    a = np.asarray(knn_graph(x, n_neighbors=4))
    assert a.shape == (30, 30)
    np.testing.assert_allclose(a, a.T)
    assert np.all(np.diag(a) == 0)
    assert np.all(a >= 0)
    # each row has at least n_neighbors nonzeros (symmetrization adds)
    assert (a > 0).sum(axis=1).min() >= 4
    b = np.asarray(knn_graph(x, n_neighbors=4, mode="binary"))
    assert set(np.unique(b)).issubset({0.0, 1.0})
    with pytest.raises(ValueError):
        knn_graph(x, n_neighbors=0)
    with pytest.raises(ValueError):
        knn_graph(x, n_neighbors=4, mode="nope")


def test_lambda_zero_matches_mur(rng):
    m, n, k = 40, 32, 4
    x = rng.random((m, n)) + 0.05
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    a = np.zeros((n, n))
    kw = dict(w_init=w0, h_init=h0, min_iter=6, max_iter=6, tol1=0.0,
              tol2=0.0)
    g = gnmf(x, k, a, lambda_g=0.0, **kw)
    r = mur(x, k, distance_type="eu", **kw)
    np.testing.assert_allclose(g.w, r.w, rtol=1e-10)
    np.testing.assert_allclose(g.h, r.h, rtol=1e-10)


def test_objective_monotone_and_smoothing(rng):
    m, n, k = 30, 40, 3
    # two column clusters
    base = rng.random((m, 2))
    labels = np.array([j % 2 for j in range(n)])
    x = np.stack([base[:, c] * (0.5 + rng.random()) + 0.05 * rng.random(m)
                  for c in labels], axis=1)
    a = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j and labels[i] == labels[j]:
                a[i, j] = 1.0
    res = gnmf(x, k, a, lambda_g=0.5, min_iter=60, max_iter=60, tol1=0.0,
               tol2=0.0)
    objs = np.asarray(res.obj_history)
    assert np.all(np.diff(objs) <= 1e-6 * np.abs(objs[:-1]) + 1e-8)
    # within-cluster encoding distance << between-cluster distance
    h = res.h / (np.linalg.norm(res.h, axis=0, keepdims=True) + 1e-12)
    same = [np.linalg.norm(h[:, i] - h[:, j])
            for i in range(n) for j in range(i + 1, n)
            if labels[i] == labels[j]]
    diff = [np.linalg.norm(h[:, i] - h[:, j])
            for i in range(n) for j in range(i + 1, n)
            if labels[i] != labels[j]]
    assert np.mean(same) < 0.5 * np.mean(diff)


def test_validation(rng):
    x = rng.random((10, 8))
    with pytest.raises(ValueError):
        gnmf(x, 2, np.zeros((5, 5)))
    with pytest.raises(ValueError):
        gnmf(x, 2, np.zeros((8, 8)), lambda_g=-1.0)
