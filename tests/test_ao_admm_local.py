"""Local-sparsity AO-ADMM: coupled two-block W-update + adaptive rho.

Covers VERDICT item 4: the re-derivation of the reference's broken
nmf/ao_admm_local_sparsity.py as a first-class
``ao_admm(..., rho_mode='adaptive', reg_w=(lambda, 'l1inf'))`` config,
with the rho-adaptation logic golden-checked against a locally-repaired
NumPy run of the reference's ``update_residuals``
(nmf/ao_admm_local_sparsity.py:189-218).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.solvers.ao_admm import ao_admm
from tpunmf.solvers.ao_admm_local import balance_rho


def _problem(m=60, n=40, k=6, seed=0, sparse=False):
    rng = np.random.default_rng(seed)
    w = np.abs(rng.standard_normal((m, k)))
    h = np.abs(rng.standard_normal((k, n)))
    v = w @ h + 0.01 * np.abs(rng.standard_normal((m, n)))
    if sparse:
        mask = rng.random((m, n)) < 0.7
        v = v * mask
    return v.astype(np.float32)


# ---------------------------------------------------------------------------
# rho adaptation: golden check vs the repaired reference update_residuals
# ---------------------------------------------------------------------------

def _update_residuals_repaired(rho1, rho2, v_aux, v_aux_old, dual_v, w,
                               w_aux, w_aux_old, dual_w, h, tau, eta1, eta2):
    """nmf/ao_admm_local_sparsity.py:189-209 run locally with only its
    blockers repaired: identical residual definitions, tau factors, eta
    comparisons and dual rescaling.  (The eps bookkeeping, :211-216, is
    not part of the adaptation and is excluded.)"""
    la = np.linalg

    s = rho1 * (w_aux_old - w_aux) + rho2 * (v_aux_old - v_aux) @ h.T
    r1 = rho1 * (w_aux - w)
    r2 = rho2 * (v_aux - w @ h)

    if la.norm(r1) > eta1 * la.norm(s):
        rho1 = rho1 * tau
        dual_w = dual_w / tau
    elif la.norm(s) > eta1 * la.norm(r1):
        rho1 = rho1 / tau
        dual_w = dual_w * tau

    if la.norm(r2) > eta2 * la.norm(s):
        rho2 = rho2 * tau
        dual_v = dual_v / tau
    elif la.norm(s) > eta2 * la.norm(r2):
        rho2 = rho2 / tau
        dual_v = dual_v * tau

    return rho1, rho2, dual_w, dual_v


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_balance_rho_matches_repaired_reference(seed):
    rng = np.random.default_rng(seed)
    m, n, k = 12, 9, 4
    w = np.abs(rng.standard_normal((m, k)))
    w_aux = np.abs(rng.standard_normal((m, k)))
    w_aux_old = np.abs(rng.standard_normal((m, k)))
    v_aux = rng.standard_normal((m, n))
    v_aux_old = rng.standard_normal((m, n))
    dual_w = rng.standard_normal((m, k))
    dual_v = rng.standard_normal((m, n))
    h = np.abs(rng.standard_normal((k, n)))
    # scale rhos so different seeds exercise increase/decrease/hold arms
    rho1 = float(10.0 ** rng.uniform(-2, 2))
    rho2 = float(10.0 ** rng.uniform(-2, 2))
    tau, eta = 2.0, 1.0

    ref_rho1, ref_rho2, ref_dual_w, ref_dual_v = _update_residuals_repaired(
        rho1, rho2, v_aux, v_aux_old, dual_v, w, w_aux, w_aux_old, dual_w, h,
        tau, eta, eta,
    )

    # ours: same residual definitions, balance_rho per block
    s = rho1 * (w_aux_old - w_aux) + rho2 * (v_aux_old - v_aux) @ h.T
    r1 = rho1 * (w_aux - w)
    r2 = rho2 * (v_aux - w @ h)
    ns = jnp.linalg.norm(s)
    got_rho1, got_dual_w = balance_rho(
        jnp.asarray(rho1), jnp.linalg.norm(r1), ns, jnp.asarray(dual_w),
        tau=tau, eta=eta,
    )
    got_rho2, got_dual_v = balance_rho(
        jnp.asarray(rho2), jnp.linalg.norm(r2), ns, jnp.asarray(dual_v),
        tau=tau, eta=eta,
    )

    assert np.isclose(float(got_rho1), ref_rho1, rtol=1e-6)
    assert np.isclose(float(got_rho2), ref_rho2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dual_w), ref_dual_w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dual_v), ref_dual_v, rtol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end solver behavior
# ---------------------------------------------------------------------------

def test_local_sparsity_eu_converges():
    """config[3]-style: sparse data, l1inf on W, adaptive rho."""
    v = _problem(sparse=True, seed=1)
    res = ao_admm(
        v, 6, rho_mode="adaptive", reg_w=(0.5, "l1inf"), reg_h=(0, "l2n"),
        min_iter=5, max_iter=60, admm_iter=10, nndsvd_init=(True, "zero"),
    )
    hist = np.asarray(res.obj_history)
    assert np.all(np.isfinite(hist))
    # substantial decrease; with lambda=0.5 l1inf + ub=1 the regularizer
    # floors the attainable residual well above the unconstrained optimum
    assert hist[-1] < hist[0] * 0.75
    assert np.all(res.w >= 0)
    assert np.all(res.h >= 0)


def test_local_sparsity_kl_converges():
    v = _problem(seed=2) + 0.1  # strictly positive for KL
    res = ao_admm(
        v, 5, distance_type="kl", rho_mode="adaptive",
        reg_w=(0.3, "l1inf"), reg_h=(0, "nn"),
        min_iter=5, max_iter=40, admm_iter=8,
    )
    hist = np.asarray(res.obj_history)
    assert np.all(np.isfinite(hist))
    assert hist[-1] < hist[0]
    assert np.all(res.w >= 0)


def test_local_sparsity_w_rows_respect_budget():
    """The l1,inf water-filling keeps row l1 norms near the upper bound."""
    v = _problem(seed=3)
    ub = 1.0
    res = ao_admm(
        v, 6, rho_mode="adaptive", reg_w=(1.0, "l1inf"), reg_h=(0, "nn"),
        upper_bound=ub, min_iter=5, max_iter=60, admm_iter=10,
    )
    # W tracks its aux within the (relaxed) coupling; rows of the final W
    # should sit close to the l1 budget rather than growing unboundedly
    row_sums = np.sum(np.asarray(res.w), axis=1)
    assert np.median(row_sums) < 10 * ub


def test_adaptive_rho_plain_prox_converges():
    """rho_mode='adaptive' without l1inf: residual-balanced inner loops."""
    v = _problem(seed=4)
    res_fixed = ao_admm(v, 6, min_iter=5, max_iter=40)
    res_adapt = ao_admm(v, 6, rho_mode="adaptive", min_iter=5, max_iter=40)
    f_fixed = np.asarray(res_fixed.obj_history)[-1]
    f_adapt = np.asarray(res_adapt.obj_history)[-1]
    assert np.isfinite(f_adapt)
    # both should land in the same objective ballpark
    assert f_adapt < 3 * f_fixed + 1e-3


def test_adaptive_rho_kl_plain_prox_converges():
    v = _problem(seed=5) + 0.1
    res = ao_admm(v, 5, distance_type="kl", rho_mode="adaptive",
                  min_iter=5, max_iter=30)
    hist = np.asarray(res.obj_history)
    assert np.all(np.isfinite(hist))
    assert hist[-1] < hist[0]


def test_rho_mode_validation():
    v = _problem()
    with pytest.raises(ValueError):
        ao_admm(v, 4, rho_mode="bogus")


def test_fixed_mode_unchanged_by_new_params():
    """rho_mode='fixed' (default) must reproduce round-1 behavior exactly."""
    v = _problem(seed=6)
    r1 = ao_admm(v, 5, min_iter=5, max_iter=20)
    r2 = ao_admm(v, 5, min_iter=5, max_iter=20, rho_mode="fixed",
                 rho_tau=3.0, rho_eta=5.0, upper_bound=2.0)
    np.testing.assert_array_equal(r1.w, r2.w)
    np.testing.assert_array_equal(r1.h, r2.h)


def test_plain_l1inf_fixed_mode_stable():
    """Fixed-rho AO-ADMM with the plain l1inf prox must not diverge (the
    inner updates route to the stable ball prox) and must honor
    upper_bound."""
    v = _problem(seed=7)
    r1 = ao_admm(v, 4, reg_w=(0.5, "l1inf"), min_iter=3, max_iter=15,
                 tol1=0.0, tol2=0.0)
    r2 = ao_admm(v, 4, reg_w=(0.5, "l1inf"), upper_bound=5.0, min_iter=3,
                 max_iter=15, tol1=0.0, tol2=0.0)
    assert np.all(np.isfinite(r1.obj_history))
    assert np.all(np.isfinite(r2.obj_history))
    s1 = np.median(np.sum(r1.w, axis=1))
    s2 = np.median(np.sum(r2.w, axis=1))
    assert s2 > s1  # larger budget -> larger rows
