"""Orthogonal NMF (Ding et al. 2006) — beyond-reference.

Oracles: the orthogonality residual must shrink toward 0 from a random
init; the constrained factor approaches one-dominant-entry-per-column
(the clustering property); reconstruction stays sane on cluster-
structured data; 'w' variant is the exact transpose mirror.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.solvers import onmf, orthogonality_residual


@pytest.fixture
def clustered(rng):
    # 3 column clusters with distinct row supports
    m, k = 30, 3
    centers = np.zeros((m, k))
    centers[:10, 0] = 1.0
    centers[10:20, 1] = 1.0
    centers[20:, 2] = 1.0
    cols = []
    labels = []
    for j in range(45):
        c = j % 3
        labels.append(c)
        cols.append(centers[:, c] * (0.5 + rng.random())
                    + 0.02 * rng.random(m))
    return np.stack(cols, axis=1), np.array(labels)


def test_orthogonality_improves(clustered, rng):
    x, _ = clustered
    res0 = onmf(x, 3, min_iter=1, max_iter=1, tol1=0.0, tol2=0.0, key=None)
    res = onmf(x, 3, min_iter=100, max_iter=100, tol1=0.0, tol2=0.0)
    r0 = float(orthogonality_residual(jnp.asarray(res0.h)))
    r1 = float(orthogonality_residual(jnp.asarray(res.h)))
    assert r1 < r0
    assert r1 < 0.1  # near-orthogonal rows
    assert np.all(res.h >= 0) and np.all(res.w >= 0)


def test_recovers_column_clusters(clustered):
    x, labels = clustered
    res = onmf(x, 3, min_iter=150, max_iter=150, tol1=0.0, tol2=0.0)
    pred = np.argmax(res.h, axis=0)
    # cluster assignment must be consistent within each true cluster
    # (up to label permutation)
    for c in range(3):
        vals = pred[labels == c]
        assert len(set(vals.tolist())) == 1
    assert len(set(np.unique(pred).tolist())) == 3


def test_w_variant_is_transpose_mirror(clustered):
    x, _ = clustered
    a = onmf(x, 3, min_iter=10, max_iter=10, tol1=0.0, tol2=0.0, key=None)
    b = onmf(x.T, 3, orthogonal="w", min_iter=10, max_iter=10, tol1=0.0,
             tol2=0.0, key=None)
    np.testing.assert_allclose(b.w, a.h.T, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(b.h, a.w.T, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.obj_history),
                               np.asarray(a.obj_history), rtol=1e-10)


def test_validation(rng):
    with pytest.raises(ValueError):
        onmf(rng.random((10, 8)), 2, orthogonal="x")
    with pytest.raises(ValueError):
        onmf(rng.random((10, 8)), 2, w_init=rng.random((10, 2)))
