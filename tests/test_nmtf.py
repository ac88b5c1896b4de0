"""Tri-factorization co-clustering (Ding et al. 2006) — beyond-reference.

Oracles: block-structured data yields the correct simultaneous row and
column clusterings; reconstruction improves over iterations; validation.
"""
import numpy as np
import pytest

from tpunmf.solvers import nmtf


@pytest.fixture
def block_matrix(rng):
    # 2 row blocks x 3 column blocks with distinct intensities
    row_labels = np.array([i % 2 for i in range(24)])
    col_labels = np.array([j % 3 for j in range(30)])
    intensity = np.array([[1.0, 0.1, 0.6], [0.2, 0.9, 0.05]])
    x = intensity[row_labels][:, col_labels]
    x = x * (0.8 + 0.4 * rng.random(x.shape))
    return x, row_labels, col_labels


def test_coclustering_recovery(block_matrix):
    x, row_labels, col_labels = block_matrix
    res, s = nmtf(x, 2, 3, min_iter=250, max_iter=250, tol1=0.0, tol2=0.0)
    assert s.shape == (2, 3)
    pred_r = np.argmax(res.w, axis=1)
    pred_c = np.argmax(res.h, axis=0)
    for c in range(2):
        assert len(set(pred_r[row_labels == c].tolist())) == 1
    for c in range(3):
        assert len(set(pred_c[col_labels == c].tolist())) == 1
    # relative reconstruction is decent for exact block structure
    assert res.obj_history[-1] < 0.05 * np.sum(x * x)


def test_objective_decreases_overall(rng):
    x = rng.random((20, 25)) + 0.05
    res, _ = nmtf(x, 3, 4, min_iter=50, max_iter=50, tol1=0.0, tol2=0.0)
    objs = np.asarray(res.obj_history)
    assert objs[-1] < objs[0]
    assert np.all(np.isfinite(objs))


def test_validation(rng):
    x = rng.random((10, 8))
    with pytest.raises(ValueError):
        nmtf(x, 2, 2, f_init=np.ones((10, 2)))
