"""Symmetric NMF (Kuang-Yun-Park damped rule) — beyond-reference."""
import numpy as np
import pytest

from tpunmf.solvers import knn_graph, symnmf


def test_objective_monotone(rng):
    b = rng.random((20, 4))
    a = b @ b.T  # symmetric PSD nonneg
    res = symnmf(a, 4, min_iter=80, max_iter=80, tol1=0.0, tol2=0.0)
    objs = np.asarray(res.obj_history)
    assert np.all(np.diff(objs) <= 1e-6 * np.abs(objs[:-1]) + 1e-8)
    assert np.all(res.w >= 0)
    # near-exact for an exactly rank-k PSD nonneg factorizable A
    assert objs[-1] < 0.02 * np.sum(a * a)


def test_graph_clustering_with_knn():
    # two blobs of columns -> knn affinity -> symnmf labels
    # (own fixed seed: blob geometry must keep the kNN graph disconnected)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.normal(0, 0.15, (8, 15)),
                          rng.normal(3, 0.15, (8, 15))], axis=1)
    a = np.asarray(knn_graph(jnp.asarray(pts), n_neighbors=5))
    res = symnmf(a, 2, min_iter=150, max_iter=150, tol1=0.0, tol2=0.0)
    labels = np.argmax(res.w, axis=1)
    assert len(set(labels[:15].tolist())) == 1
    assert len(set(labels[15:].tolist())) == 1
    assert labels[0] != labels[15]


def test_validation(rng):
    with pytest.raises(ValueError):
        symnmf(rng.random((4, 5)), 2)
    with pytest.raises(ValueError):
        symnmf(rng.random((4, 4)), 2, beta=0.0)
    with pytest.raises(ValueError):
        symnmf(-np.ones((4, 4)), 2)
    with pytest.raises(ValueError):
        symnmf(np.ones((4, 4)), 2, h_init=np.ones((3, 2)))
