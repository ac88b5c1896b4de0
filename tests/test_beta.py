"""Generalized beta-divergence MUR (beyond-reference).

Oracles: the dedicated EU/KL solvers at beta=2/1; a numpy transcription
of the Fevotte-Idier update for fractional beta; monotone decrease of
each beta's own objective (the MM guarantee the gamma exponent buys).
"""
import numpy as np
import pytest

from tpunmf.solvers import beta_divergence, mur, mur_beta


@pytest.fixture
def problem(rng):
    m, n, k = 36, 28, 4
    x = (rng.random((m, k)) @ rng.random((k, n)) + 0.05).astype(np.float64)
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    return x, w0, h0


def test_beta_below_one_rejects_zero_init_reconstruction(problem):
    """beta < 1 raises zero reconstruction cells to a negative power; an
    explicit init that produces them must be rejected up front."""
    x, w0, h0 = problem
    w0 = w0.copy()
    w0[0, :] = 0.0  # whole row zero -> (w0 @ h0)[0, :] == 0
    with pytest.raises(ValueError, match="strictly positive"):
        mur_beta(x, 4, beta=0.5, w_init=w0, h_init=h0, min_iter=2,
                 max_iter=2, tol1=0.0, tol2=0.0)
    # a strictly positive explicit init is accepted unchanged
    res = mur_beta(x, 4, beta=0.5, w_init=problem[1], h_init=h0,
                   min_iter=2, max_iter=2, tol1=0.0, tol2=0.0)
    assert np.all(np.isfinite(res.obj_history))


def test_beta2_matches_eu_mur(problem):
    x, w0, h0 = problem
    kw = dict(w_init=w0, h_init=h0, min_iter=6, max_iter=6, tol1=0.0, tol2=0.0)
    res_b = mur_beta(x, 4, beta=2.0, **kw)
    res_e = mur(x, 4, distance_type="eu", **kw)
    np.testing.assert_allclose(res_b.w, res_e.w, rtol=1e-6)
    np.testing.assert_allclose(res_b.h, res_e.h, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res_b.obj_history),
                               np.asarray(res_e.obj_history), rtol=1e-8)


def test_beta1_matches_kl_mur(problem):
    x, w0, h0 = problem
    kw = dict(w_init=w0, h_init=h0, min_iter=6, max_iter=6, tol1=0.0, tol2=0.0)
    res_b = mur_beta(x, 4, beta=1.0, **kw)
    res_k = mur(x, 4, distance_type="kl", **kw)
    np.testing.assert_allclose(res_b.w, res_k.w, rtol=1e-6)
    np.testing.assert_allclose(res_b.h, res_k.h, rtol=1e-6)


def _numpy_beta_iter(x, w, h, beta, gamma, eps=1e-9):
    def halves(wh):
        whs = wh + eps
        return whs ** (beta - 2.0) * x, whs ** (beta - 1.0)

    num, den = halves(w @ h)
    w = w * ((num @ h.T) / (den @ h.T + eps)) ** gamma
    num, den = halves(w @ h)
    h = h * ((w.T @ num) / (w.T @ den + eps)) ** gamma
    return w, h


@pytest.mark.parametrize("beta,gamma", [(0.5, 1.0 / 1.5), (1.5, 1.0),
                                        (3.0, 0.5)])
def test_fractional_beta_matches_numpy(problem, beta, gamma):
    x, w0, h0 = problem
    res = mur_beta(x, 4, beta=beta, w_init=w0, h_init=h0, min_iter=4,
                   max_iter=4, tol1=0.0, tol2=0.0)
    w, h = w0.copy(), h0.copy()
    for _ in range(4):
        w, h = _numpy_beta_iter(x, w, h, beta, gamma)
    np.testing.assert_allclose(res.w, w, rtol=1e-8)
    np.testing.assert_allclose(res.h, h, rtol=1e-8)


@pytest.mark.parametrize("beta", [0.0, 0.5, 1.5, 2.5])
def test_objective_monotone(problem, beta):
    x, w0, h0 = problem
    res = mur_beta(x, 4, beta=beta, w_init=w0, h_init=h0, min_iter=2,
                   max_iter=50, tol1=0.0, tol2=0.0)
    o = np.asarray(res.obj_history)
    assert np.all(np.isfinite(o))
    assert np.all(o[1:] <= o[:-1] + 1e-8 * np.abs(o[:-1]) + 1e-12)
    assert np.all(res.w >= 0) and np.all(res.h >= 0)


def test_is_divergence_values():
    x = np.array([[1.0, 2.0, 0.0]])
    y = np.array([[2.0, 2.0, 1.0]])
    # IS: x/y - log(x/y) - 1 summed over x>0 cells
    expect = (0.5 - np.log(0.5) - 1.0) + 0.0
    np.testing.assert_allclose(float(beta_divergence(x, y, 0.0)), expect,
                               rtol=1e-12)
    # beta=2 and beta=1 agree with the dedicated formulas
    np.testing.assert_allclose(float(beta_divergence(x, y, 2.0)),
                               0.5 * ((1.0) + 0.0 + 1.0), rtol=1e-12)


def test_beta_via_facade(problem):
    from tpunmf import NMF

    x, _, _ = problem
    model = NMF(x, 4)
    res = model.factorize(method="mur", beta=0.5, min_iter=3, max_iter=25,
                          tol1=0.0, tol2=0.0)
    assert model.w.shape == (x.shape[0], 4)
    assert res.experiment.distance_type == "beta0.5"
    with pytest.raises(ValueError):
        model.factorize(method="mur", beta=0.5, mask=np.ones_like(x))
