"""Project new data onto a FIXED basis W (NMF inference / 'transform').

Beyond-reference capability: the reference can only co-factorize a full
matrix; production NMF also needs the inference step — given the trained
basis W, encode unseen columns/rows X_new as non-negative coefficients:

    EU:  H* = argmin_{H >= 0} ||X_new - W H||_F^2  (+ lambda ||H||^2)
         — one exact batched NNLS on the normal equations
         (nnls/activeset.py: the fixed point is the unique optimum), the
         same kernel that powers ANLS.
    KL:  fixed-W Lee-Seung H-updates (nmf/mur.py:41-45 with W frozen)
         iterated to tolerance — KL has no finite NNLS equivalent.

``transform(w, x_new)`` returns H (k, n_new); ``NMF.transform`` wraps it
with the trained factors.  The reconstruction ``w @ h`` is
``inverse_transform``.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def transform(w, x_new, *, distance_type: str = "eu", lambda_h: float = 0.0,
              n_iter: int = 200, tol: float = 1e-6, nnls_opts=None):
    """Encode ``x_new`` (m, n_new) against the fixed basis ``w`` (m, k).

    Args:
      distance_type: 'eu' (exact batched NNLS) or 'kl' (fixed-W MUR).
      lambda_h: Tikhonov weight on H (EU: folded into the normal
        equations like ANLS, reference nmf/anls.py:21-22; KL: the
        regularized closed form nmf/mur.py:43-45).
      n_iter / tol: KL-only iteration budget and relative-change stop.
      nnls_opts: EU-only kwargs forwarded to ``nnls_activeset``.

    Returns: H with shape (k, n_new), H >= 0.
    """
    w = jnp.asarray(w)
    x_new = jnp.asarray(x_new, dtype=w.dtype)
    if x_new.ndim != 2 or x_new.shape[0] != w.shape[0]:
        raise ValueError(
            f"x_new must be (m={w.shape[0]}, n_new); got {x_new.shape}")
    k = w.shape[1]

    if distance_type == "eu":
        from ..nnls import nnls_activeset

        gram = w.T @ w + (2.0 * lambda_h) * jnp.eye(k, dtype=w.dtype)
        return nnls_activeset(gram, w.T @ x_new, **(nnls_opts or {}))

    if distance_type != "kl":
        raise KeyError("Unknown distance type.")

    # fixed-W KL MUR: h <- 2c / (d + sqrt(d^2 + 4 lambda c)) with
    # c = h * (w^T (x / (w h + eps))), d = colsum(w)
    import jax

    d = jnp.sum(w, axis=0)[:, None]
    h0 = jnp.full((k, x_new.shape[1]), jnp.mean(x_new) / max(k, 1) + _EPS,
                  dtype=w.dtype)

    def cond(c):
        i, h, h_prev = c
        rel = jnp.max(jnp.abs(h - h_prev)) / (jnp.max(jnp.abs(h_prev)) + _EPS)
        return jnp.logical_and(i < n_iter,
                               jnp.logical_or(i < 2, rel > tol))

    def body(c):
        i, h, _ = c
        r = x_new / (w @ h + _EPS)
        cc = h * (w.T @ r)
        h_new = 2.0 * cc / (d + jnp.sqrt(d * d + 4.0 * lambda_h * cc))
        return (i + 1, h_new, h)

    _, h, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), h0, jnp.zeros_like(h0)))
    return h


def inverse_transform(w, h):
    """Reconstruct data from coefficients: ``w @ h``."""
    return jnp.asarray(w) @ jnp.asarray(h)
