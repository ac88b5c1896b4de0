"""HALS solver (beyond-reference capability, Gillis-Glineur accelerated).

The oracle is a plain numpy HALS sweep — and the EU objective itself:
HALS solves each rank-1 subproblem exactly, so the objective must be
monotonically non-increasing and converge at least as fast as MUR-EU
per outer iteration.
"""
import numpy as np
import pytest

from tpunmf.solvers import hals, mur


def _numpy_hals_iter(x, w, h, lam_w=0.0, lam_h=0.0, sweeps=1, eps=1e-16):
    xht = x @ h.T
    hht = h @ h.T
    for _ in range(sweeps):
        for l in range(w.shape[1]):
            numer = xht[:, l] - w @ hht[:, l] + w[:, l] * hht[l, l]
            w[:, l] = np.maximum(numer / (hht[l, l] + lam_w + eps), 0.0)
    wtx = w.T @ x
    wtw = w.T @ w
    for _ in range(sweeps):
        for l in range(h.shape[0]):
            numer = wtx[l, :] - wtw[l, :] @ h + wtw[l, l] * h[l, :]
            h[l, :] = np.maximum(numer / (wtw[l, l] + lam_h + eps), 0.0)
    return w, h


@pytest.mark.parametrize("sweeps", [1, 3])
def test_hals_matches_numpy_oracle(lowrank_data, sweeps):
    rng = np.random.default_rng(0)
    m, n = lowrank_data.shape
    k = 5
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    res = hals(lowrank_data, k, w_init=w0, h_init=h0, min_iter=4, max_iter=4,
               tol1=0.0, tol2=0.0, inner_sweeps=sweeps)
    w, h = w0.copy(), h0.copy()
    for _ in range(4):
        w, h = _numpy_hals_iter(lowrank_data, w, h, sweeps=sweeps)
    np.testing.assert_allclose(res.w, w, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(res.h, h, rtol=1e-6, atol=1e-10)


def test_hals_regularized_matches_oracle(lowrank_data):
    rng = np.random.default_rng(1)
    m, n = lowrank_data.shape
    k = 4
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    res = hals(lowrank_data, k, w_init=w0, h_init=h0, min_iter=3, max_iter=3,
               tol1=0.0, tol2=0.0, inner_sweeps=1, lambda_w=0.1, lambda_h=0.2)
    w, h = w0.copy(), h0.copy()
    for _ in range(3):
        w, h = _numpy_hals_iter(lowrank_data, w, h, lam_w=0.1, lam_h=0.2)
    np.testing.assert_allclose(res.w, w, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(res.h, h, rtol=1e-6, atol=1e-10)


def test_hals_monotone_and_nonnegative(lowrank_data):
    res = hals(lowrank_data, 6, min_iter=2, max_iter=40, tol1=0.0, tol2=0.0,
               key=None)
    o = np.asarray(res.obj_history)
    assert np.all(np.isfinite(o))
    assert np.all(o[1:] <= o[:-1] + 1e-7 * np.abs(o[:-1]))
    assert np.all(res.w >= 0) and np.all(res.h >= 0)


def test_hals_beats_mur_per_iteration(lowrank_data):
    """Same budget of outer iterations from the same init: HALS's exact
    rank-1 solves should reach a lower (or equal) EU objective than MUR."""
    rng = np.random.default_rng(2)
    m, n = lowrank_data.shape
    k = 5
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    kw = dict(w_init=w0, h_init=h0, min_iter=25, max_iter=25, tol1=0.0,
              tol2=0.0)
    res_h = hals(lowrank_data, k, inner_sweeps=2, **kw)
    res_m = mur(lowrank_data, k, distance_type="eu", **kw)
    assert res_h.obj_history[-1] <= res_m.obj_history[-1] * 1.001


def test_hals_convergence_and_validation(lowrank_data):
    res = hals(lowrank_data, 4, min_iter=5, max_iter=5000, tol1=1e-10,
               tol2=1e-10)
    assert res.i < 4999  # early stop fired
    with pytest.raises(KeyError):
        hals(lowrank_data, 4, distance_type="kl")
    with pytest.raises(ValueError):
        hals(lowrank_data, 4, inner_sweeps=0)


def test_hals_facade_and_persistence(tmp_path, lowrank_data):
    from tpunmf import NMF

    model = NMF(lowrank_data, 4)
    res = model.factorize(method="hals", min_iter=3, max_iter=20,
                          tol1=0.0, tol2=0.0)
    assert model.w.shape == (lowrank_data.shape[0], 4)
    path = model.save_factorization(save_dir=str(tmp_path))
    assert "nmf_hals_4_eu" in path
    loaded = NMF.load_factorization(path)
    np.testing.assert_allclose(loaded.results.w, res.w)


def test_hals_checkpoint_resume(tmp_path, lowrank_data):
    class _Interrupt(Exception):
        pass

    def _interrupt_after(n_blocks):
        count = {"n": 0}

        def cb(carry):
            count["n"] += 1
            if count["n"] >= n_blocks:
                raise _Interrupt

        return cb

    kw = dict(min_iter=2, max_iter=12, tol1=0.0, tol2=0.0)
    full = hals(lowrank_data, 4, **kw)
    ck = str(tmp_path / "hals_ck")
    try:
        hals(lowrank_data, 4, **kw, checkpoint_path=ck, checkpoint_every=4,
             on_block_end=_interrupt_after(2))
    except _Interrupt:
        pass
    resumed = hals(lowrank_data, 4, **kw, checkpoint_path=ck,
                   checkpoint_every=4, resume=True)
    np.testing.assert_allclose(resumed.w, full.w, rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(resumed.obj_history), np.asarray(full.obj_history),
        rtol=1e-8)
