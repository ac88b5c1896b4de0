"""Data generators and loaders."""
import numpy as np
import pytest

from tpunmf.data import (
    flatten_stack,
    load_matrix,
    lowrank_dense,
    movielens_like,
    sparse_csr,
    tfidf_like,
)


def test_lowrank_dense_properties():
    x = lowrank_dense(100, 60, 5, seed=1)
    assert x.shape == (100, 60) and x.min() >= 0
    s = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    assert s[5] / s[0] < 0.05  # planted rank shows in the spectrum


def test_tfidf_like_properties():
    x = tfidf_like(200, 50, n_topics=5, seed=2)
    assert x.shape == (200, 50) and x.min() >= 0
    assert (x == 0).mean() > 0.3  # sparse-ish


def test_movielens_like_properties():
    x = movielens_like(80, 40, density=0.1, seed=3)
    assert x.shape == (80, 40)
    nz = x[x > 0]
    assert nz.min() >= 1 and nz.max() <= 5
    assert 0.02 < (x > 0).mean() < 0.3


def test_sparse_csr_properties():
    m = sparse_csr(100, 80, density=0.05, seed=4)
    assert m.shape == (100, 80)
    assert m.nnz <= int(100 * 80 * 0.05)
    assert m.data.min() >= 0


def test_flatten_stack_fortran_order(rng):
    a = rng.random((4, 3, 5))
    flat = flatten_stack(a)
    assert flat.shape == (12, 5)
    np.testing.assert_allclose(flat, a.reshape(12, 5, order="F"))


def test_load_matrix_roundtrip(tmp_path, rng):
    a = rng.random((10, 6)).astype(np.float32)
    np.save(tmp_path / "m.npy", a)
    np.savez(tmp_path / "m.npz", data=a)
    np.savetxt(tmp_path / "m.csv", a, delimiter=",")
    from scipy import io as sio

    sio.savemat(tmp_path / "m.mat", {"data": a})
    for name in ["m.npy", "m.npz", "m.csv", "m.mat"]:
        got = load_matrix(str(tmp_path / name))
        np.testing.assert_allclose(got, a, rtol=1e-6)


def test_load_matrix_mat_3d_flatten(tmp_path, rng):
    from scipy import io as sio

    a = rng.random((4, 3, 5)).astype(np.float32)
    sio.savemat(tmp_path / "stack.mat", {"msot": a})
    got = load_matrix(str(tmp_path / "stack.mat"), key="msot")
    assert got.shape == (12, 5)
