"""NTF (CP/PARAFAC) solver tests — correctness against brute-force
reconstructions, monotonicity, N-way generality, persistence."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpunmf.solvers import cp_reconstruct, mttkrp, ntf


def _rand_cp(shape, k, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    factors = [np.abs(rng.standard_normal((s, k))).astype(dtype) for s in shape]
    x = np.asarray(cp_reconstruct([jnp.asarray(f) for f in factors]))
    return x, factors


def test_mttkrp_matches_bruteforce():
    rng = np.random.default_rng(1)
    x = np.abs(rng.standard_normal((5, 4, 3)))
    a, b, c = (np.abs(rng.standard_normal((s, 2))) for s in x.shape)
    got = np.asarray(mttkrp(jnp.asarray(x), [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)], 0))
    want = np.einsum("ijk,jr,kr->ir", x, b, c)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    got1 = np.asarray(mttkrp(jnp.asarray(x), [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)], 1))
    want1 = np.einsum("ijk,ir,kr->jr", x, a, c)
    np.testing.assert_allclose(got1, want1, rtol=1e-12)


@pytest.mark.parametrize("update", ["mur", "hals"])
def test_exact_rank_recovery_eu(update):
    x, _ = _rand_cp((12, 10, 8), 3, seed=2)
    iters = 3000 if update == "mur" else 400  # MUR's tail is slow
    res = ntf(x, 3, update=update, max_iter=iters, min_iter=50,
              tol1=1e-12, tol2=1e-12)
    xhat = np.asarray(cp_reconstruct([jnp.asarray(f) for f in res.factors]))
    rel = np.linalg.norm(x - xhat) / np.linalg.norm(x)
    assert rel < 1e-3
    assert all((f >= 0).all() for f in res.factors)


def test_mur_eu_monotone():
    rng = np.random.default_rng(3)
    x = np.abs(rng.standard_normal((9, 8, 7)))
    res = ntf(x, 4, update="mur", max_iter=60, min_iter=60, tol1=0, tol2=0)
    hist = np.asarray(res.obj_history)
    assert np.all(np.diff(hist) <= 1e-8 * np.maximum(1.0, np.abs(hist[:-1])))


def test_mur_kl_monotone_and_decreases():
    rng = np.random.default_rng(4)
    x = np.abs(rng.standard_normal((8, 7, 6)))
    res = ntf(x, 3, distance_type="kl", max_iter=50, min_iter=50,
              tol1=0, tol2=0)
    hist = np.asarray(res.obj_history)
    assert hist[-1] < hist[0]
    assert np.all(np.diff(hist) <= 1e-6 * np.maximum(1.0, np.abs(hist[:-1])))


def test_four_way_and_matrix_reduction():
    # 4-way smoke
    x, _ = _rand_cp((6, 5, 4, 3), 2, seed=5)
    res = ntf(x, 2, max_iter=200, tol1=1e-10, tol2=1e-10)
    assert len(res.factors) == 4
    xhat = np.asarray(cp_reconstruct([jnp.asarray(f) for f in res.factors]))
    assert np.linalg.norm(x - xhat) / np.linalg.norm(x) < 1e-2

    # N == 2 reduces to plain NMF (mode-1 factor is H^T)
    rng = np.random.default_rng(6)
    m = np.abs(rng.standard_normal((20, 15)))
    res2 = ntf(m, 5, max_iter=100)
    w, ht = res2.factors
    assert w.shape == (20, 5) and ht.shape == (15, 5)
    assert np.linalg.norm(m - w @ ht.T) / np.linalg.norm(m) < 1.0


def test_normalize_equilibrates_without_changing_objective():
    x, _ = _rand_cp((10, 9, 8), 3, seed=7)
    kw = dict(max_iter=40, min_iter=40, tol1=0, tol2=0)
    res_n = ntf(x, 3, normalize=True, **kw)
    res_u = ntf(x, 3, normalize=False, **kw)
    np.testing.assert_allclose(np.asarray(res_n.obj_history),
                               np.asarray(res_u.obj_history),
                               rtol=1e-6, atol=1e-8)
    norms = [np.linalg.norm(f, axis=0) for f in res_n.factors]
    # all modes carry comparable column magnitudes after equilibration
    ratio = np.max(norms) / max(np.min(norms), 1e-30)
    assert ratio < 10.0


def test_explicit_init_and_validation():
    x, factors = _rand_cp((7, 6, 5), 2, seed=8)
    res = ntf(x, 2, factors_init=factors, max_iter=20)
    assert res.experiment.method == "ntf"
    with pytest.raises(ValueError):
        ntf(x, 2, factors_init=factors[:2])
    with pytest.raises(ValueError):
        ntf(x, 2, distance_type="kl", update="hals")
    with pytest.raises(ValueError):
        ntf(-x, 2)
    with pytest.raises(ValueError):
        ntf(x, 2, lambdas=[0.1, 0.1])  # wrong length


def test_ridge_shrinks_factors():
    x, _ = _rand_cp((10, 8, 6), 2, seed=9)
    kw = dict(max_iter=100, min_iter=100, tol1=0, tol2=0, normalize=False)
    res0 = ntf(x, 2, lambdas=[0.0, 0.0, 0.0], **kw)
    res1 = ntf(x, 2, lambdas=[5.0, 5.0, 5.0], **kw)
    n0 = sum(np.linalg.norm(f) for f in res0.factors)
    n1 = sum(np.linalg.norm(f) for f in res1.factors)
    assert n1 < n0


def test_facade_route_and_persistence(tmp_path):
    from tpunmf import NMF
    from tpunmf.io.npz import load_ntf_results

    x, _ = _rand_cp((8, 7, 6), 2, seed=10)
    model = NMF(x, 2)
    res = model.factorize(method="ntf", max_iter=30)
    assert len(res.factors) == 3
    assert model.w is None and model.h is None  # no 2-D factors for tensors
    assert model.reconstruction_err_ == pytest.approx(res.obj_history[-1])
    path = model.save_factorization(save_dir=str(tmp_path))
    loaded = load_ntf_results(path)
    assert len(loaded["factors"]) == 3
    np.testing.assert_allclose(loaded["factors"][0], res.factors[0])
    assert loaded["experiment"]["method"] == "ntf"

    # facade-level round-trip (load_factorization sniffs the ntf layout)
    model2 = NMF.load_factorization(path)
    assert model2.results.experiment.method == "ntf"
    np.testing.assert_allclose(model2.results.factors[1], res.factors[1])

    # 2-D-only facade APIs fail with clear errors on tensor results
    assert model.fit_transform(method="ntf", max_iter=5).shape == (8, 2)
    with pytest.raises(RuntimeError, match="N-way"):
        model.transform(x[:, :, 0])
    with pytest.raises(RuntimeError, match="N-way"):
        model.inverse_transform(res.factors[1])


# ---------------------------------------------------------------------------
# Sharded CP (mode-0 slabs, psum'd MTTKRPs) vs single-device
# ---------------------------------------------------------------------------

def _needs_mesh():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh

    return build_mesh(shape=(8,), axis_names=("rows",))


@pytest.mark.parametrize("distance_type,update", [
    ("eu", "mur"), ("eu", "hals"), ("kl", "mur")])
def test_ntf_sharded_matches_single_device(distance_type, update):
    from tpunmf.parallel import ntf_sharded

    mesh = _needs_mesh()
    rng = np.random.default_rng(11)
    x = np.abs(rng.standard_normal((16, 10, 6))).astype(np.float64)
    factors0 = [np.abs(rng.standard_normal((s, 3))) for s in x.shape]
    kw = dict(distance_type=distance_type, update=update,
              min_iter=12, max_iter=12, tol1=0, tol2=0)
    res_s = ntf_sharded(mesh, x, 3, factors_init=factors0, **kw)
    res_1 = ntf(x, 3, factors_init=factors0, normalize=False, **kw)
    np.testing.assert_allclose(np.asarray(res_s.obj_history),
                               np.asarray(res_1.obj_history),
                               rtol=1e-9, atol=1e-9)
    for fs, f1 in zip(res_s.factors, res_1.factors):
        np.testing.assert_allclose(fs, f1, rtol=1e-8, atol=1e-10)


def test_ntf_sharded_validation():
    from tpunmf.parallel import ntf_sharded

    mesh = _needs_mesh()
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((15, 8, 4)))
    with pytest.raises(ValueError, match="divide"):
        ntf_sharded(mesh, x, 2)  # 8 does not divide 15
    x16 = np.abs(rng.standard_normal((16, 8, 4)))
    with pytest.raises(ValueError, match="least-squares"):
        ntf_sharded(mesh, x16, 2, distance_type="kl", update="hals")
    with pytest.raises(ValueError, match="non-negative"):
        ntf_sharded(mesh, -x16, 2)
    bad = [np.abs(rng.standard_normal((s, 2))) for s in (16, 8, 4)]
    bad[1] = bad[1][:, :1]  # wrong shape
    with pytest.raises(ValueError, match="factors_init"):
        ntf_sharded(mesh, x16, 2, factors_init=bad)


# ---------------------------------------------------------------------------
# Masked NTF (tensor completion)
# ---------------------------------------------------------------------------

def test_masked_completion_recovers_missing_cells():
    """Fit rank-3 CP from 60% of the cells; held-out cells must be
    reconstructed."""
    x, _ = _rand_cp((14, 12, 10), 3, seed=20)
    rng = np.random.default_rng(21)
    mask = (rng.random(x.shape) < 0.6).astype(np.float64)
    res = ntf(x, 3, mask=mask, max_iter=3000, min_iter=100,
              tol1=1e-13, tol2=1e-13)
    xhat = np.asarray(cp_reconstruct([jnp.asarray(f) for f in res.factors]))
    held = mask == 0
    rel = np.linalg.norm((x - xhat)[held]) / np.linalg.norm(x[held])
    assert rel < 0.05, rel


def test_masked_eu_monotone_and_matches_2d_masked_solver():
    rng = np.random.default_rng(22)
    x = np.abs(rng.standard_normal((20, 16)))
    mask = (rng.random(x.shape) < 0.7).astype(np.float64)
    w0 = np.abs(rng.standard_normal((20, 4)))
    h0 = np.abs(rng.standard_normal((16, 4)))

    res_t = ntf(x, 4, mask=mask, factors_init=[w0, h0], normalize=False,
                max_iter=25, min_iter=25, tol1=0, tol2=0)
    hist = np.asarray(res_t.obj_history)
    assert np.all(np.diff(hist) <= 1e-8 * np.maximum(1.0, np.abs(hist[:-1])))

    from tpunmf.solvers import mur_masked

    res_2d = mur_masked(x, mask, 4, distance_type="eu", w_init=w0,
                        h_init=h0.T, min_iter=25, max_iter=25,
                        tol1=0, tol2=0)
    # same masked objective trajectory (2-D CP == masked NMF updates)
    np.testing.assert_allclose(hist, np.asarray(res_2d.obj_history),
                               rtol=1e-6, atol=1e-9)


def test_masked_kl_decreases():
    x, _ = _rand_cp((10, 9, 8), 2, seed=23)
    rng = np.random.default_rng(24)
    mask = (rng.random(x.shape) < 0.7).astype(np.float64)
    res = ntf(x, 2, mask=mask, distance_type="kl", max_iter=40,
              min_iter=40, tol1=0, tol2=0)
    hist = np.asarray(res.obj_history)
    assert hist[-1] < hist[0]
    assert np.all(np.isfinite(hist))


def test_mask_validation():
    x, _ = _rand_cp((8, 7, 6), 2, seed=25)
    mask = np.ones_like(x)
    with pytest.raises(ValueError, match="update='mur'"):
        ntf(x, 2, mask=mask, update="hals")
    with pytest.raises(ValueError, match="mask shape"):
        ntf(x, 2, mask=mask[:4])
    with pytest.raises(ValueError, match="non-negative"):
        ntf(x, 2, mask=-mask)


# ---------------------------------------------------------------------------
# CP rank selection: CORCONDIA + ntf_rank_scan
# ---------------------------------------------------------------------------

def test_corcondia_exact_factors_near_100():
    from tpunmf.experiments import corcondia

    x, factors = _rand_cp((14, 12, 10), 3, seed=30)
    c = corcondia(x, factors)
    assert c > 99.0, c


def test_corcondia_collapses_when_overfit():
    from tpunmf.experiments import corcondia, ntf_rank_scan

    x, _ = _rand_cp((16, 14, 12), 3, seed=31)
    scan = ntf_rank_scan(x, [2, 3, 5], n_iter=400, update="hals")
    by_k = {row["k"]: row for row in scan}
    # fit improves with k...
    assert by_k[3]["rel_err"] < by_k[2]["rel_err"]
    # ...but core consistency is high at the true rank and collapses past it
    assert by_k[3]["corcondia"] > 50.0
    assert by_k[5]["corcondia"] < by_k[3]["corcondia"]
