"""Local-sparsity AO-ADMM building blocks: adaptive-rho inner ADMM
updates and the coupled two-block l1,inf W-subproblem.

Re-derivation of the capability sketched by the reference's broken
local-sparsity file (reference: nmf/ao_admm_local_sparsity.py):

  * ``admm_local_sparsity_update`` — the W-subproblem with TWO couplings,
    ``W_aux = W`` (carrying the l1,inf "local sparsity" regularizer,
    penalty rho1) and ``V_aux = W @ H`` (carrying the data term, penalty
    rho2), alternated with per-block adaptive rho residual balancing
    (nmf/ao_admm_local_sparsity.py:110-156, 189-218).
  * ``admm_ls_update_adaptive`` / ``admm_kl_update_adaptive`` — the
    standard AO-ADMM inner updates (nmf/ao_admm.py:46-101) with the same
    residual-balancing rho adaptation folded into the inner loop.

Deliberate repairs vs the reference (documented, SURVEY §2 notes):
  * the V_aux update solves ``(1 + rho2) V_aux = V + rho2 (W H + dual_v)``
    — the correct stationarity condition of
    ``min 0.5||V - V_aux||^2 + rho2/2 ||W H - V_aux + dual_v||^2`` —
    instead of the reference's singular ``(I - rho2 I)`` system
    (nmf/ao_admm_local_sparsity.py:136-139, singular at rho2 = 1);
  * inner termination breaks when all residual norms fall BELOW their
    epsilons (the reference's test is inverted — requires every norm to
    EXCEED epsilon, :149-152);
  * ``eps_abs`` is a small constant (Boyd et al. §3.3.1) rather than the
    reference's ``||V||_F`` (:115) which makes the epsilons astronomically
    large;
  * the prox is applied at the fresh iterate ``W + dual_w`` rather than
    the stale ``W_aux`` (:133).

The rho-adaptation *logic itself* (tau up/down factors, eta-weighted
norm comparison, dual rescaling, the scaled residual definitions
``r1 = rho1 (W_aux - W)``, ``r2 = rho2 (V_aux - W H)``,
``s = rho1 (W_aux_old - W_aux) + rho2 (V_aux_old - V_aux) @ H^T``)
follows nmf/ao_admm_local_sparsity.py:189-209 exactly and is
golden-checked against a locally-repaired NumPy run of that function
(tests/test_ao_admm_local.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.linalg import spd_solve
from ..prox.operators import prox_l1inf_ball
from .ao_admm import _inner_prox
from .common import inner_loop

_EPS_ABS = 1e-6
_EPS_REL = 1e-3
_INNER_TOL = 1e-2


def balance_rho(rho, r_norm, s_norm, dual, *, tau, eta, lo=None, hi=None):
    """One residual-balancing step (nmf/ao_admm_local_sparsity.py:197-202).

    Increase rho (and rescale the scaled dual down) when the primal
    residual dominates the dual residual by more than ``eta``; decrease it
    in the symmetric case.  ``lo``/``hi`` optionally clamp rho to a trust
    region around its initial value (stability addition; the reference has
    no clamp — pass None for exact reference logic).  Returns
    ``(rho_new, dual_rescaled)``.
    """
    rho_new = jnp.where(
        r_norm > eta * s_norm, rho * tau,
        jnp.where(s_norm > eta * r_norm, rho / tau, rho),
    )
    if lo is not None:
        rho_new = jnp.maximum(rho_new, lo)
    if hi is not None:
        rho_new = jnp.minimum(rho_new, hi)
    return rho_new, dual * (rho / rho_new)


def _solve_spd(a, b, method):
    return spd_solve(a, b, method=method)


def _terminated_rel(h, h_prev, h_aux, dual):
    """Reference terminate() (nmf/ao_admm.py:33-43)."""
    r = jnp.linalg.norm(h - h_aux) / jnp.linalg.norm(h)
    s = jnp.linalg.norm(h - h_prev) / jnp.linalg.norm(dual)
    return jnp.logical_and(r < _INNER_TOL, s < _INNER_TOL)


def admm_ls_update_adaptive(y, w, h, dual, k, prox_type, admm_iter, lambda_,
                            spd_solver, tau, eta, upper_bound=1.0,
                            loop_style="while"):
    """Least-squares inner ADMM (nmf/ao_admm.py:46-68) with residual
    balancing on rho inside the loop.  rho restarts at trace(G)/k each
    (outer) call, like the reference's per-subproblem adaptive rho."""
    g = w.T @ w
    keye = jnp.eye(k, dtype=g.dtype)
    rho0 = jnp.trace(g) / k
    wty = w.T @ y

    def body(state):
        h, dual, rho = state
        h_aux = _solve_spd(g + rho * keye, wty + rho * (h + dual), spd_solver)
        h_prev = h
        h = _inner_prox(prox_type, h_aux, dual, rho=rho, lambda_=lambda_,
                        upper_bound=upper_bound)
        dual = dual + h - h_aux
        done = _terminated_rel(h, h_prev, h_aux, dual)
        # scaled residuals (Boyd §3.3): r = rho (h - h_aux), s = rho (h - h_prev)
        r_norm = rho * jnp.linalg.norm(h - h_aux)
        s_norm = rho * jnp.linalg.norm(h - h_prev)
        rho, dual = balance_rho(rho, r_norm, s_norm, dual, tau=tau, eta=eta)
        return (h, dual, rho), done

    h, dual, _ = inner_loop(body, (h, dual, rho0), admm_iter, loop_style)
    return h, dual


def admm_kl_update_adaptive(v, v_aux, dual_v, w, h, dual_h, k, prox_type,
                            admm_iter, lambda_, spd_solver, tau, eta,
                            upper_bound=1.0, loop_style="while"):
    """KL inner ADMM (nmf/ao_admm.py:71-101) with adaptive rho.

    ``dual_v`` is never rescaled on rho changes: the data-term split
    carries a unit penalty (the v_aux closed form hard-codes it,
    nmf/ao_admm.py:92-95), so its scaled dual is rho-independent.
    """
    g = w.T @ w
    keye = jnp.eye(k, dtype=g.dtype)
    rho0 = jnp.trace(g) / k

    def body(state):
        h, dual_h, v_aux, dual_v, rho = state
        h_aux = _solve_spd(
            g + rho * keye, w.T @ (v_aux + dual_v) + rho * (h + dual_h),
            spd_solver,
        )
        h_prev = h
        h = _inner_prox(prox_type, h_aux, dual_h, rho=rho, lambda_=lambda_,
                        upper_bound=upper_bound)

        wh_aux = w @ h_aux
        v_bar = wh_aux - dual_v
        v_aux = 0.5 * ((v_bar - 1.0) + jnp.sqrt((v_bar - 1.0) ** 2 + 4.0 * v))

        dual_h = dual_h + h - h_aux
        dual_v = dual_v + v_aux - wh_aux
        done = _terminated_rel(h, h_prev, h_aux, dual_h)
        r_norm = rho * jnp.linalg.norm(h - h_aux)
        s_norm = rho * jnp.linalg.norm(h - h_prev)
        rho, dual_h = balance_rho(rho, r_norm, s_norm, dual_h, tau=tau, eta=eta)
        return (h, dual_h, v_aux, dual_v, rho), done

    h, dual_h, v_aux, dual_v, _ = inner_loop(
        body, (h, dual_h, v_aux, dual_v, rho0), admm_iter, loop_style)
    return h, dual_h, v_aux, dual_v


_RHO_CLAMP = 8.0  # trust region around each rho's initial value


def admm_local_sparsity_update(v, w, w_aux, dual_w, h, k, admm_iter,
                               lambda_w, upper_bound, adaptive, tau, eta,
                               spd_solver, loop_style="while"):
    """Coupled two-block W-subproblem with l1,inf local sparsity
    (nmf/ao_admm_local_sparsity.py:110-156, re-derived — see module
    docstring for the deliberate repairs).

    Splittings: ``W_aux = W`` (regularizer, penalty rho1) and
    ``V_aux = W H`` (data term, penalty rho2).  Scaled-dual convention
    with duals ADDED (``dual += primal - aux``), so the W-block solve
    reads ``W (rho1 I + rho2 H H^T) = rho1 (W_aux - dual_w)
    + rho2 (V_aux - dual_v) H^T`` (cf. :126-128 with duals subtracted).

    Stability re-derivations beyond the bug repairs (found empirically —
    the reference's choices diverge within a handful of outer iterations):
      * rho2 starts at 1.0, the natural penalty for the unit-weight data
        term ``0.5||V - V_aux||^2``, NOT the reference's trace(G)/k
        (:112-113) which overweights the coupling by orders of magnitude;
      * the data-split state (V_aux, dual_v) is re-initialized at each
        subproblem entry (V_aux = W H, dual_v = 0): H has moved since the
        last outer iteration, so carried duals certify a stale constraint;
        (w_aux, dual_w) ARE warm-started across outer iterations;
      * adaptive rho moves are clamped to a x8 trust region around the
        initial value (balance_rho lo/hi).

    Returns ``(w, w_aux, dual_w)``.
    """
    g = h @ h.T
    keye = jnp.eye(k, dtype=g.dtype)
    rho1_0 = jnp.maximum(jnp.trace(g) / k, 1e-6)  # regularizer coupling
    rho2_0 = jnp.asarray(1.0, dtype=v.dtype)      # data-term coupling
    v_aux = w @ h
    dual_v = jnp.zeros_like(v)
    sqrt_w = jnp.sqrt(jnp.asarray(w.size, dtype=v.dtype))
    sqrt_v = jnp.sqrt(jnp.asarray(v.size, dtype=v.dtype))

    def body(state):
        w, w_aux, dual_w, v_aux, dual_v, rho1, rho2 = state
        # W block (:126-129): normal-equation solve + nonneg projection
        a = rho1 * keye + rho2 * g
        b = rho1 * (w_aux - dual_w) + rho2 * (v_aux - dual_v) @ h.T
        w = _solve_spd(a, b.T, spd_solver).T
        w = jnp.where(w < 0, 0.0, w)

        # W_aux block: l1,inf water-filling prox at the fresh iterate
        # z = W + dual (:131-133, repaired: prox at W + dual rather than
        # stale W_aux, and with the self-consistent exact water level —
        # prox/operators.prox_l1inf_ball — whose output is budget-bounded)
        w_aux_old = w_aux
        w_aux = prox_l1inf_ball(w + dual_w, rho=rho1, lambda_=lambda_w,
                                upper_bound=upper_bound)

        # V_aux block (:135-139, repaired closed form — see module docstring)
        wh = w @ h
        v_aux_old = v_aux
        v_aux = (v + rho2 * (wh + dual_v)) / (1.0 + rho2)

        # dual ascent (:141-143, sign convention flipped to added duals)
        dual_w = dual_w + w - w_aux
        dual_v = dual_v + wh - v_aux

        # residuals exactly as update_residuals (:193-195)
        s = rho1 * (w_aux_old - w_aux) + rho2 * (v_aux_old - v_aux) @ h.T
        r1 = rho1 * (w_aux - w)
        r2 = rho2 * (v_aux - wh)
        nr1 = jnp.linalg.norm(r1)
        nr2 = jnp.linalg.norm(r2)
        ns = jnp.linalg.norm(s)

        if adaptive:  # static flag
            rho1, dual_w = balance_rho(
                rho1, nr1, ns, dual_w, tau=tau, eta=eta,
                lo=rho1_0 / _RHO_CLAMP, hi=rho1_0 * _RHO_CLAMP,
            )
            rho2, dual_v = balance_rho(
                rho2, nr2, ns, dual_v, tau=tau, eta=eta,
                lo=rho2_0 / _RHO_CLAMP, hi=rho2_0 * _RHO_CLAMP,
            )

        # epsilons per update_residuals (:211-216) with eps_abs repaired
        # to a constant and the break condition un-inverted (:149-152)
        eps_pri1 = sqrt_w * _EPS_ABS + _EPS_REL * jnp.maximum(
            jnp.linalg.norm(w), jnp.linalg.norm(w_aux))
        eps_pri2 = sqrt_v * _EPS_ABS + _EPS_REL * jnp.maximum(
            jnp.linalg.norm(wh), jnp.linalg.norm(v_aux))
        eps_dual = sqrt_w * _EPS_ABS + _EPS_REL * jnp.linalg.norm(
            rho1 * dual_w + rho2 * dual_v @ h.T)
        done = (nr1 < eps_pri1) & (nr2 < eps_pri2) & (ns < eps_dual)
        return (w, w_aux, dual_w, v_aux, dual_v, rho1, rho2), done

    w, w_aux, dual_w, _, _, _, _ = inner_loop(
        body, (w, w_aux, dual_w, v_aux, dual_v, rho1_0, rho2_0),
        admm_iter, loop_style)
    return w, w_aux, dual_w
