"""transform/inverse_transform — fixed-basis inference (beyond-reference).

Oracles: per-column scipy.optimize.nnls for EU; monotone KL decrease and
in-sample consistency for KL.
"""
import numpy as np
import pytest

from tpunmf.solvers import inverse_transform, mur, transform


@pytest.fixture
def basis_problem(rng):
    m, n, k = 40, 30, 5
    w = rng.random((m, k)) + 0.05
    h_true = rng.random((k, n))
    x = w @ h_true
    return w, h_true, x


def test_eu_transform_matches_scipy_nnls(basis_problem):
    from scipy.optimize import nnls as scipy_nnls

    w, _, x = basis_problem
    h = np.asarray(transform(w, x, distance_type="eu"))
    for j in range(x.shape[1]):
        ref, _ = scipy_nnls(w, x[:, j])
        np.testing.assert_allclose(h[:, j], ref, atol=1e-8)


def test_eu_transform_recovers_exact_coefficients(basis_problem):
    w, h_true, x = basis_problem
    h = np.asarray(transform(w, x, distance_type="eu"))
    np.testing.assert_allclose(h, h_true, atol=1e-6)
    rec = np.asarray(inverse_transform(w, h))
    np.testing.assert_allclose(rec, x, atol=1e-6)


def test_eu_transform_regularized_shrinks(basis_problem):
    w, _, x = basis_problem
    h0 = np.asarray(transform(w, x, distance_type="eu"))
    h1 = np.asarray(transform(w, x, distance_type="eu", lambda_h=5.0))
    assert np.sum(h1 * h1) < np.sum(h0 * h0)
    assert np.all(h1 >= 0)


def test_kl_transform_decreases_kl(basis_problem, rng):
    w, _, _ = basis_problem
    x_new = rng.random((w.shape[0], 12)) + 0.01

    def kl(x, wh):
        val = x * np.log(x / wh)
        val = np.where(np.isfinite(val), val, 0.0)
        return np.sum(val - x + wh)

    h1 = np.asarray(transform(w, x_new, distance_type="kl", n_iter=1))
    h200 = np.asarray(transform(w, x_new, distance_type="kl", n_iter=200))
    assert kl(x_new, w @ h200) < kl(x_new, w @ h1)
    assert np.all(h200 >= 0)


def test_transform_validation(basis_problem):
    w, _, x = basis_problem
    with pytest.raises(ValueError):
        transform(w, x[:-1])
    with pytest.raises(KeyError):
        transform(w, x, distance_type="nope")


def test_facade_transform_roundtrip(rng):
    from tpunmf import NMF

    x = rng.random((50, 40)) ** 2
    model = NMF(x, 6)
    model.factorize(method="mur", distance_type="eu", min_iter=20,
                    max_iter=300, tol1=1e-9, tol2=1e-9)
    x_new = rng.random((50, 7)) ** 2
    h_new = np.asarray(model.transform(x_new))
    assert h_new.shape == (6, 7) and np.all(h_new >= 0)
    rec = np.asarray(model.inverse_transform(h_new))
    # encoding training data must reconstruct at least as well as the fit
    h_in = np.asarray(model.transform(x))
    fit_err = np.linalg.norm(x - model.w @ model.h)
    enc_err = np.linalg.norm(x - model.w @ h_in)
    assert enc_err <= fit_err * (1 + 1e-6)
    with pytest.raises(RuntimeError):
        NMF(x, 6).transform(x_new)
