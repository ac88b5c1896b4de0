"""Robust (l2,1-norm) NMF tests: monotonicity, outlier resistance,
facade routing."""
import contextlib
import io

import numpy as np
import pytest

from tpunmf.solvers import mur, robust_nmf


def _lowrank_with_outliers(m=60, n=80, k=4, n_out=4, seed=0):
    rng = np.random.default_rng(seed)
    w = np.abs(rng.standard_normal((m, k)))
    h = np.abs(rng.standard_normal((k, n)))
    x = w @ h
    x_corrupt = x.copy()
    out_cols = rng.choice(n, size=n_out, replace=False)
    x_corrupt[:, out_cols] += 50.0 * np.abs(rng.standard_normal((m, n_out)))
    return x, x_corrupt, out_cols


def test_monotone_l21_objective():
    _, x, _ = _lowrank_with_outliers()
    res = robust_nmf(x, 4, min_iter=80, max_iter=80, tol1=0, tol2=0)
    hist = np.asarray(res.obj_history)
    assert np.all(np.diff(hist) <= 1e-6 * np.maximum(1.0, np.abs(hist[:-1])))
    assert (res.w >= 0).all() and (res.h >= 0).all()


def test_objective_is_l21_not_frobenius():
    _, x, _ = _lowrank_with_outliers()
    res = robust_nmf(x, 4, max_iter=30, min_iter=30, tol1=0, tol2=0)
    recon = res.w @ res.h
    l21 = np.sum(np.linalg.norm(x - recon, axis=0))
    assert res.obj_history[-1] == pytest.approx(l21, rel=1e-4)


def test_outlier_resistance_vs_plain_mur():
    """On the CLEAN columns, the robust fit must reconstruct better than
    plain EU MUR fitted to the corrupted matrix."""
    x_clean, x_corrupt, out_cols = _lowrank_with_outliers(seed=3)
    keep = np.setdiff1d(np.arange(x_clean.shape[1]), out_cols)
    kw = dict(min_iter=100, max_iter=400, tol1=1e-9, tol2=1e-9)
    res_r = robust_nmf(x_corrupt, 4, **kw)
    res_m = mur(x_corrupt, 4, distance_type="eu",
                nndsvd_init=(True, "zero"), **kw)
    err_r = np.linalg.norm((x_clean - res_r.w @ res_r.h)[:, keep])
    err_m = np.linalg.norm((x_clean - res_m.w @ res_m.h)[:, keep])
    assert err_r < err_m


def test_explicit_init_and_validation():
    _, x, _ = _lowrank_with_outliers()
    rng = np.random.default_rng(1)
    w0 = np.abs(rng.standard_normal((x.shape[0], 4)))
    h0 = np.abs(rng.standard_normal((4, x.shape[1])))
    res = robust_nmf(x, 4, w_init=w0, h_init=h0, max_iter=10)
    assert res.experiment.method == "robust"
    assert res.experiment.distance_type == "l21"
    with pytest.raises(ValueError):
        robust_nmf(x, 4, w_init=w0)  # h_init missing
    with pytest.raises(ValueError):
        robust_nmf(-x, 4)


def test_facade_route():
    from tpunmf import NMF

    _, x, _ = _lowrank_with_outliers()
    model = NMF(x, 4)
    with contextlib.redirect_stdout(io.StringIO()):
        res = model.factorize(method="robust", max_iter=20)
    assert model.w.shape == (x.shape[0], 4)
    assert "robust" in model.default_save_name()
