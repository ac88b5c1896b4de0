"""Semi-NMF (mixed-sign data; Ding-Li-Jordan) — beyond-reference."""
import numpy as np
import pytest

from tpunmf.solvers import semi_nmf


def _numpy_semi_iter(x, w, h, lam=0.0, eps=1e-9):
    k = h.shape[0]
    gram_h = h @ h.T + 1e-10 * np.eye(k)
    w = np.linalg.solve(gram_h, (x @ h.T).T).T
    wtx = w.T @ x
    wtw = w.T @ w
    pos = lambda a: (np.abs(a) + a) / 2
    neg = lambda a: (np.abs(a) - a) / 2
    numer = pos(wtx) + neg(wtw) @ h
    denom = neg(wtx) + pos(wtw) @ h + lam * h + eps
    h = h * np.sqrt(numer / denom)
    return w, h


@pytest.fixture
def mixed_problem(rng):
    m, n, k = 40, 32, 4
    w_true = rng.standard_normal((m, k))          # mixed sign
    h_true = rng.random((k, n))
    x = w_true @ h_true + 0.01 * rng.standard_normal((m, n))
    return x


def test_matches_numpy_oracle(mixed_problem, rng):
    x = mixed_problem
    h0 = rng.random((4, x.shape[1])) + 0.1
    res = semi_nmf(x, 4, h_init=h0, min_iter=5, max_iter=5, tol1=0.0,
                   tol2=0.0)
    w = np.linalg.lstsq(h0.T, x.T, rcond=None)[0].T
    h = h0.copy()
    for _ in range(5):
        w, h = _numpy_semi_iter(x, w, h)
    np.testing.assert_allclose(res.h, h, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(res.w, w, rtol=1e-6, atol=1e-8)


def test_monotone_on_mixed_sign_data(mixed_problem):
    res = semi_nmf(mixed_problem, 4, min_iter=2, max_iter=80, tol1=0.0,
                   tol2=0.0)
    o = np.asarray(res.obj_history)
    assert np.all(np.isfinite(o))
    assert np.all(o[1:] <= o[:-1] + 1e-7 * np.abs(o[:-1]) + 1e-10)
    assert np.all(res.h >= 0)
    assert np.any(res.w < 0)  # W is genuinely free-sign on this data


def test_recovers_mixed_sign_factorization(mixed_problem):
    x = mixed_problem
    res = semi_nmf(x, 4, min_iter=30, max_iter=2000, tol1=1e-12, tol2=1e-12)
    rel = np.linalg.norm(x - res.w @ res.h) / np.linalg.norm(x)
    assert rel < 0.05  # near the noise floor, impossible for elevated MUR


def test_semi_via_facade_and_persistence(tmp_path, mixed_problem):
    from tpunmf import NMF

    model = NMF(mixed_problem, 4)
    res = model.factorize(method="semi_nmf", min_iter=3, max_iter=30,
                          tol1=0.0, tol2=0.0)
    assert model.w.shape == (mixed_problem.shape[0], 4)
    assert res.experiment.method == "semi_nmf"
    path = model.save_factorization(save_dir=str(tmp_path))
    loaded = NMF.load_factorization(path)
    np.testing.assert_allclose(loaded.results.w, res.w)
