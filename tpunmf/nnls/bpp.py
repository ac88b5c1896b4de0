"""Batched block principal pivoting NNLS (Kim & Park), XLA-native.

The reference ships a BPP implementation that is dead code with blocking
bugs — its convergence check hard-returns True so the loop runs once, its
index bookkeeping throws, and its grouped solve assigns mismatched shapes
(reference: nmf/bpp.py:125-130, :46-61, :92-93; SURVEY §2 row 9).  This is
a working re-derivation from the algorithm (Kim & Park, "Fast nonnegative
matrix factorization: an active-set-like method and comparisons"), built
for fixed shapes:

  per column j, partition variables into passive F and active G;
  solve x_F from CtC_FF, set y_G = CtC_G. x - CtA_G;
  infeasible set V = {i in F : x_i < 0} ∪ {i in G : y_i < 0};
  full exchange while |V| shrinks; 'backup' budget of 3 full exchanges
  otherwise; then Murty's single-variable rule (toggle the
  largest-index infeasible variable) which guarantees termination.

All sets are boolean masks, the exchange is a vectorized XOR, and the
per-column state (best |V|, backup budget) is carried in integer vectors —
one ``lax.while_loop`` over the whole batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .activeset import masked_solve, masked_solve_cg, _one_hot_cols


@partial(jax.jit, static_argnames=("max_iter", "backup_budget", "solve_method"))
def nnls_bpp(ct_c, ct_a, f_set0=None, *, max_iter: int = 0,
             backup_budget: int = 3, solve_method: str = "chol"):
    """Batched NNLS via block principal pivoting.

    Args/returns as :func:`tpunmf.nnls.nnls_activeset` — interchangeable;
    ``f_set0`` warm-starts the passive partition (answer unchanged).
    """
    l, p = ct_a.shape
    if max_iter == 0:
        max_iter = 10 * l + 50
    _solve = masked_solve if solve_method == "chol" else masked_solve_cg

    # dead components (zero Gram diagonal => zero C column, PSD): exact
    # coefficient is 0 — guard the masked solves against the singular row
    # (same rationale as nnls_activeset)
    dead = jnp.diag(ct_c) <= 0.0
    ct_c = ct_c + jnp.diag(jnp.where(dead, 1.0, 0.0))
    ct_a = jnp.where(dead[:, None], 0.0, ct_a)

    if f_set0 is None:
        # start from the all-active partition (x = 0, y = -CtA)
        f_set = jnp.zeros((l, p), dtype=bool)
        x = jnp.zeros_like(ct_a)
        y = -ct_a
    else:
        f_set = f_set0
        x = _solve(ct_c, ct_a, f_set)
        y = jnp.where(f_set, 0.0, ct_c @ x - ct_a)
    ninf = jnp.full((p,), l + 1, dtype=jnp.int32)     # best |V| so far
    backup = jnp.full((p,), backup_budget, dtype=jnp.int32)

    def infeasible(f_set, x, y):
        return jnp.logical_or(
            jnp.logical_and(f_set, x < 0),
            jnp.logical_and(~f_set, y < 0),
        )

    def cond(c):
        f_set, x, y, ninf, backup, it = c
        return jnp.logical_and(jnp.any(infeasible(f_set, x, y)), it < max_iter)

    def body(c):
        f_set, x, y, ninf, backup, it = c
        v = infeasible(f_set, x, y)
        nv = jnp.sum(v, axis=0).astype(jnp.int32)          # (p,)
        active_cols = nv > 0

        improved = nv < ninf
        ninf_new = jnp.where(improved, nv, ninf)
        backup_new = jnp.where(improved, backup_budget, backup)
        use_full = jnp.logical_or(improved, backup > 0)
        backup_new = jnp.where(
            jnp.logical_and(~improved, backup > 0), backup - 1, backup_new
        )

        # Murty's rule: toggle only the largest-index infeasible variable
        rev_first = jnp.argmax(v[::-1, :], axis=0)
        last_idx = (l - 1) - rev_first
        murty = _one_hot_cols(last_idx, l)

        toggle = jnp.where(use_full[None, :], v, jnp.logical_and(murty, v))
        toggle = jnp.logical_and(toggle, active_cols[None, :])
        f_set = jnp.logical_xor(f_set, toggle)

        x = _solve(ct_c, ct_a, f_set)
        y = ct_c @ x - ct_a
        # y only meaningful on G; zero it on F for the infeasibility test
        y = jnp.where(f_set, 0.0, y)
        return (f_set, x, y, ninf_new, backup_new, it + 1)

    f_set, x, y, _, _, _ = jax.lax.while_loop(
        cond, body, (f_set, x, y, ninf, backup, jnp.asarray(0, jnp.int32))
    )
    return jnp.maximum(x, 0.0)
