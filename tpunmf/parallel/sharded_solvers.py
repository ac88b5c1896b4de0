"""End-to-end sharded MUR drivers for the two remaining parallelism
patterns from SURVEY §2C: the Ulysses-style all_to_all layout flip and
rank (expert-parallel analog) sharding.

Both are *explicit-collective* solvers (shard_map bodies, jitted once)
whose iterates match the single-device MUR step (solvers/mur.py
step_eu/step_kl) up to float reassociation — tested on the 8-device CPU
mesh (tests/test_sharding.py).

The reference has no parallelism of any kind (its loops are sequential
numpy, e.g. nmf/mur.py:119); these are new TPU-native capability mandated
by BASELINE.json.

Why two layouts (Ulysses):
  * the W-update ``W *= (X H^T) / (W (H H^T))`` is embarrassingly row-
    parallel when X is ROW-sharded and H replicated;
  * the H-update ``H *= (W^T X) / ((W^T W) H)`` is column-parallel when X
    is COLUMN-sharded;
  * ``mur_ulysses`` therefore flips X between the two layouts with one
    ``all_to_all`` per half-iteration instead of keeping X replicated or
    paying a psum over partial products.  Peak per-device X memory is one
    panel — this is the layout-switch pattern the beyond-HBM W-update
    needs (VERDICT round-1 item 5).

Why rank sharding (EP analog):
  * at very large k, replicating W (m x k) and H (k x n) everywhere
    wastes HBM; ``mur_rank_sharded`` keeps each device on a k/p slice of
    the components (W P(None, 'rank'), H P('rank', None)) and
    reconstructs ``W @ H`` with one psum per half-step — the factors
    themselves are never gathered (SURVEY §2C 'EP').
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Ulysses-style alternating-layout MUR (EU)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("mesh", "axis", "n_iter", "distance_type"))
def _mur_ulysses_jit(mesh, x_rows, w, h, lambda_w, lambda_h, *, axis, n_iter,
                     distance_type="eu"):
    p = mesh.shape[axis]

    def f(x_loc, w_loc, h_rep):
        m_loc = x_loc.shape[0]
        n = x_loc.shape[1]
        n_loc = n // p
        idx = jax.lax.axis_index(axis)
        # X is loop-invariant, so the rows->cols flip happens ONCE before
        # the loop (XLA cannot hoist a collective out of a while loop);
        # per iteration only the small W gather + H gather move.  Peak
        # per-device X memory is two panels either way (both layouts are
        # live during a flip).
        x_cols = jax.lax.all_to_all(x_loc, axis, split_axis=1,
                                    concat_axis=0, tiled=True)

        def body_eu(t, carry):
            w_loc, h, _ = carry
            # --- W half: X row-sharded, H replicated — fully local
            gram_h = h @ h.T
            w_loc = w_loc * (x_loc @ h.T) / (
                w_loc @ gram_h + lambda_w * w_loc + _EPS)
            # --- layout switch (Ulysses): W gathered for the column half
            w_full = jax.lax.all_gather(w_loc, axis, axis=0, tiled=True)
            # --- H half: each device updates its own column block
            h_blk = jax.lax.dynamic_slice_in_dim(h, idx * n_loc, n_loc, axis=1)
            gram_w = w_full.T @ w_full
            h_blk = h_blk * (w_full.T @ x_cols) / (
                gram_w @ h_blk + lambda_h * h_blk + _EPS)
            h = jax.lax.all_gather(h_blk, axis, axis=1, tiled=True)
            # objective from the column panels (exact EU residual)
            d = x_cols - w_full @ h_blk
            obj = 0.5 * jax.lax.psum(jnp.sum(d * d), axis)
            return (w_loc, h, obj)

        def body_kl(t, carry):
            # regularized KL closed forms (nmf/mur.py:25-27,41-45); the
            # W half is local on the row panel, the H half on the column
            # panel after the layout switch
            w_loc, h, _ = carry
            r = x_loc / (w_loc @ h + _EPS)
            a = w_loc * (r @ h.T)
            b = jnp.sum(h, axis=1)[None, :]
            w_loc = 2.0 * a / (b + jnp.sqrt(b * b + 4.0 * lambda_w * a))
            w_full = jax.lax.all_gather(w_loc, axis, axis=0, tiled=True)
            h_blk = jax.lax.dynamic_slice_in_dim(h, idx * n_loc, n_loc, axis=1)
            r2 = x_cols / (w_full @ h_blk + _EPS)
            c = h_blk * (w_full.T @ r2)
            d = jnp.sum(w_full, axis=0)[:, None]
            h_blk = 2.0 * c / (d + jnp.sqrt(d * d + 4.0 * lambda_h * c))
            h = jax.lax.all_gather(h_blk, axis, axis=1, tiled=True)
            wh = w_full @ h_blk
            val = x_cols * jnp.log(x_cols / wh)
            val = jnp.where(val == jnp.inf, 0.0, val)
            val = jnp.where(jnp.isnan(val), 0.0, val)
            obj = jax.lax.psum(jnp.sum(val - x_cols + wh), axis)
            return (w_loc, h, obj)

        body = body_kl if distance_type == "kl" else body_eu
        obj0 = jnp.zeros((), dtype=x_loc.dtype)
        w_loc, h_rep, obj = jax.lax.fori_loop(
            0, n_iter, body, (w_loc, h_rep, obj0))
        return w_loc, h_rep, obj

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None, None)),
        out_specs=(P(axis, None), P(None, None), P()),
        check_vma=False,
    )(x_rows, w, h)


def mur_ulysses(mesh: Mesh, x, w, h, *, n_iter: int, lambda_w=0.0,
                lambda_h=0.0, axis: str | None = None,
                distance_type: str = "eu"):
    """Run ``n_iter`` MUR iterations (EU or KL) with the
    alternating-layout (all_to_all) schedule.  Requires m and n divisible
    by the mesh axis size.  Returns (w, h, final_objective); w comes back
    row-sharded, h replicated.
    """
    axis = axis or mesh.axis_names[0]
    p = mesh.shape[axis]
    m, n = x.shape
    if m % p or n % p:
        raise ValueError(f"m={m} and n={n} must divide the mesh axis ({p})")
    if distance_type not in ("eu", "kl"):
        raise ValueError("distance_type must be 'eu' or 'kl'")
    x = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    w = jax.device_put(w, NamedSharding(mesh, P(axis, None)))
    h = jax.device_put(h, NamedSharding(mesh, P()))
    return _mur_ulysses_jit(
        mesh, x, w, h, jnp.asarray(lambda_w, x.dtype),
        jnp.asarray(lambda_h, x.dtype), axis=axis, n_iter=int(n_iter),
        distance_type=distance_type)


# ---------------------------------------------------------------------------
# Rank-sharded MUR (EP analog)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("mesh", "axis", "n_iter", "distance_type"))
def _mur_rank_jit(mesh, x, w, h, lambda_w, lambda_h, *, axis, n_iter,
                  distance_type):
    def f(x_rep, w_loc, h_loc):
        def recon(wl, hl):
            return jax.lax.psum(wl @ hl, axis)

        def body_eu(t, carry):
            w_loc, h_loc, _ = carry
            wh = recon(w_loc, h_loc)
            # (W @ (H H^T))[:, slice] == (W H) @ H_slice^T — local given wh
            w_loc = w_loc * (x_rep @ h_loc.T) / (
                wh @ h_loc.T + lambda_w * w_loc + _EPS)
            wh = recon(w_loc, h_loc)
            # ((W^T W) H)[slice, :] == W_slice^T (W H) — local given wh
            h_loc = h_loc * (w_loc.T @ x_rep) / (
                w_loc.T @ wh + lambda_h * h_loc + _EPS)
            wh = recon(w_loc, h_loc)
            d = x_rep - wh
            obj = 0.5 * jnp.sum(d * d)
            return (w_loc, h_loc, obj)

        def body_kl(t, carry):
            # regularized KL closed form 2a/(b + sqrt(b^2 + 4*lambda*a))
            # (nmf/mur.py:25-27); row/col sums of the local factor slice
            # are exactly the slice of the full sums — fully local
            w_loc, h_loc, _ = carry
            wh = recon(w_loc, h_loc)
            r = x_rep / (wh + _EPS)
            a = w_loc * (r @ h_loc.T)
            b = jnp.sum(h_loc, axis=1)[None, :]
            w_loc = 2.0 * a / (b + jnp.sqrt(b * b + 4.0 * lambda_w * a))
            wh = recon(w_loc, h_loc)
            r2 = x_rep / (wh + _EPS)
            c = h_loc * (w_loc.T @ r2)
            d = jnp.sum(w_loc, axis=0)[:, None]
            h_loc = 2.0 * c / (d + jnp.sqrt(d * d + 4.0 * lambda_h * c))
            wh = recon(w_loc, h_loc)
            from ..core.losses import kl_elementwise_sum

            obj = kl_elementwise_sum(x_rep, wh)
            return (w_loc, h_loc, obj)

        body = body_kl if distance_type == "kl" else body_eu
        obj0 = jnp.zeros((), dtype=x_rep.dtype)
        return jax.lax.fori_loop(0, n_iter, body, (w_loc, h_loc, obj0))

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(None, None), P(None, axis), P(axis, None)),
        out_specs=(P(None, axis), P(axis, None), P()),
        check_vma=False,
    )(x, w, h)


def mur_rank_sharded(mesh: Mesh, x, w, h, *, n_iter: int,
                     distance_type: str = "eu", lambda_w=0.0, lambda_h=0.0,
                     axis: str = "rank"):
    """Run ``n_iter`` MUR iterations with the k (component) axis sharded
    over ``axis`` — W P(None, 'rank'), H P('rank', None), X replicated.
    The factors are never gathered; each half-step reconstructs W @ H
    with one psum.  Requires k divisible by the mesh axis size.  Returns
    (w, h, final_objective) with factors still rank-sharded.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis")
    p = mesh.shape[axis]
    k = w.shape[1]
    if k % p:
        raise ValueError(f"rank k={k} must divide the mesh axis ({p})")
    if distance_type not in ("eu", "kl"):
        raise ValueError("distance_type must be 'eu' or 'kl'")
    x = jax.device_put(x, NamedSharding(mesh, P()))
    w = jax.device_put(w, NamedSharding(mesh, P(None, axis)))
    h = jax.device_put(h, NamedSharding(mesh, P(axis, None)))
    return _mur_rank_jit(
        mesh, x, w, h, jnp.asarray(lambda_w, x.dtype),
        jnp.asarray(lambda_h, x.dtype), axis=axis, n_iter=int(n_iter),
        distance_type=distance_type)
