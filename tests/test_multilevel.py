"""Multilevel NMF (arXiv:1009.0881 coarsen/prolongate warm start).

Oracles: coarsening algebra (X_c == X @ P exactly), prolongation shape/
mass preservation, and the paper's claim — from an equal fine-level
iteration budget, the multilevel warm start reaches a lower objective
than a cold start.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.solvers import hals, multilevel, mur, mur_multilevel
from tpunmf.solvers.multilevel import coarsen_columns, prolongate_h


def test_coarsen_is_column_aggregation(rng):
    x = jnp.asarray(rng.random((12, 20)))
    xc = coarsen_columns(x, 4)
    assert xc.shape == (12, 5)
    np.testing.assert_allclose(
        np.asarray(xc), np.asarray(x).reshape(12, 5, 4).sum(-1), rtol=1e-12)
    # ragged tail zero-pads
    xc2 = coarsen_columns(x[:, :18], 4)
    assert xc2.shape == (12, 5)
    np.testing.assert_allclose(np.asarray(xc2[:, 4]),
                               np.asarray(x[:, 16:18]).sum(1), rtol=1e-12)


def test_prolongate_preserves_group_mass(rng):
    h_c = jnp.asarray(rng.random((3, 5)))
    h = prolongate_h(h_c, 4, 18)
    assert h.shape == (3, 18)
    # full groups: mass preserved exactly
    np.testing.assert_allclose(
        np.asarray(h[:, :16]).reshape(3, 4, 4).sum(-1),
        np.asarray(h_c[:, :4]), rtol=1e-12)


@pytest.mark.parametrize("method", ["hals", "mur"])
def test_multilevel_beats_cold_start(rng, method):
    m, n, k = 80, 256, 5
    x = jnp.asarray((rng.random((m, k)) @ rng.random((k, n))) ** 2 + 0.01)
    fine_budget = 12
    kw = dict(min_iter=fine_budget, max_iter=fine_budget, tol1=0.0, tol2=0.0)
    if method == "mur":
        kw["distance_type"] = "eu"
    warm = multilevel(x, k, method=method, levels=2, factor=4,
                      coarse_iters=120, **kw)
    cold = (hals if method == "hals" else mur)(x, k, **kw)
    assert warm.obj_history[-1] < cold.obj_history[-1]
    assert np.all(np.asarray(warm.w) >= 0)


def test_multilevel_axis0_rows(rng):
    m, n, k = 256, 60, 4
    x = jnp.asarray((rng.random((m, k)) @ rng.random((k, n))) + 0.01)
    res = multilevel(x, k, method="hals", levels=1, factor=4, axis=0,
                     min_iter=5, max_iter=5, tol1=0.0, tol2=0.0)
    assert res.w.shape == (m, k) and res.h.shape == (k, n)
    assert np.isfinite(res.obj_history[-1])


def test_multilevel_kl_via_mur(rng):
    x = jnp.asarray((rng.random((60, 128)) + 0.02))
    res = mur_multilevel(x, 4, levels=1, factor=4, distance_type="kl",
                         min_iter=5, max_iter=5, tol1=0.0, tol2=0.0)
    assert np.isfinite(res.obj_history[-1])


def test_multilevel_validation(rng):
    x = jnp.asarray(rng.random((20, 40)))
    with pytest.raises(ValueError):
        multilevel(x, 3, levels=0)
    with pytest.raises(ValueError):
        multilevel(x, 3, factor=1)
    with pytest.raises(KeyError):
        multilevel(x, 3, method="anls")


def test_multilevel_via_facade(rng):
    import contextlib
    import io

    from tpunmf import NMF

    x = np.asarray((rng.random((60, 128)) + 0.02))
    m = NMF(x, 4)
    with contextlib.redirect_stdout(io.StringIO()):
        res = m.factorize(method="hals", multilevel={"levels": 1,
                                                     "factor": 4},
                          min_iter=4, max_iter=4, tol1=0.0, tol2=0.0)
    assert m.w.shape == (60, 4)
    assert np.isfinite(res.obj_history[-1])
    with pytest.raises(ValueError):
        m.factorize(method="admm", multilevel=True)


def test_axis0_lambda_swap(rng):
    """A lone lambda_w on axis=0 must regularize only the (transposed)
    W — i.e. behave like lambda_h on the transposed problem."""
    x = (rng.random((128, 30)) + 0.02)
    a = multilevel(x, 3, method="hals", levels=1, factor=4, axis=0,
                   lambda_w=0.5, min_iter=4, max_iter=4, tol1=0.0, tol2=0.0)
    b = multilevel(x.T, 3, method="hals", levels=1, factor=4, axis=1,
                   lambda_h=0.5, min_iter=4, max_iter=4, tol1=0.0, tol2=0.0)
    np.testing.assert_allclose(a.w, b.h.T, rtol=1e-10)
    np.testing.assert_allclose(a.h, b.w.T, rtol=1e-10)
