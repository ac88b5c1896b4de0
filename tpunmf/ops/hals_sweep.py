"""Pallas HALS Gauss-Seidel sweep kernel.

The HALS column sweep (solvers/hals.py:_hals_sweep_w, reference-free —
the reference package has no HALS) is a chain of k dependent rank-1
closed forms.  Driven as a ``lax.fori_loop`` of XLA ops it is
LATENCY-bound: 4k dependent small matvec dispatches per iteration put
headline-scale HALS at ~99 it/s while fused MUR-EU runs >1000 (round-2
docs/PERF.md).  The chain is only sequential along the RANK axis — each
row of W (column of H) updates independently — so the whole sweep maps
to one Pallas kernel: grid over strips of the parallel axis, the k-step
chain fully unrolled in-register, and the expensive per-column matvec
replaced by a rank-1 running update of the cross-product:

    P = G @ V                      (one MXU matmul per strip)
    for l in 0..k-1 (unrolled, static indices):
        numer_l = A[l, :] - P[l, :] + G[l, l] * V[l, :]
        v_new   = max(numer_l / (G[l, l] + lam + eps), 0)
        P      += G[:, l] (v_new - V[l, :])      (VPU outer product)
        V[l, :] = v_new

Both halves are the SAME kernel in a transposed frame:
  W sweep:  V = W^T (k, m), A = (X H^T)^T, G = H H^T
  H sweep:  V = H   (k, n), A = W^T X,     G = W^T W

Exactly the math of solvers/hals.py:47-74 (same 1e-16 epsilon), so the
XLA path remains the oracle; parity is pinned in tests/test_ops.py via
interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-16  # matches solvers/hals.py


def _gs_sweep_kernel(a_ref, g_ref, lam_ref, v_ref, out_ref, *, k: int,
                     nsweeps: int):
    v = v_ref[:]                                      # (k, bm)
    g = g_ref[:]                                      # (k, k)
    a = a_ref[:]                                      # (k, bm)
    lam = lam_ref[0, 0]
    p = jnp.dot(g, v, preferred_element_type=jnp.float32)
    for _ in range(nsweeps):
        for l in range(k):                            # static indices
            gll = g[l, l]
            numer = a[l, :] - p[l, :] + gll * v[l, :]
            new = jnp.maximum(numer / (gll + lam + _EPS), 0.0)
            delta = new - v[l, :]
            p = p + g[:, l:l + 1] * delta[None, :]
            v = v.at[l, :].set(new)
    out_ref[:] = v


def gs_sweep_tileable(k: int, mdim: int) -> int | None:
    """Strip width bm for the sweep kernel, or None if it can't engage.

    k rides the sublane axis (needs the f32 (8, 128) tile), the parallel
    axis is blocked into lanes.  The unrolled chain costs ~6k traced ops
    per sweep, so very large ranks are left to the XLA path."""
    if k % 8 or k > 256:
        return None
    budget = 12 * 1024 * 1024
    for bm in (2048, 1024, 512, 256, 128):
        if mdim % bm:
            continue
        if (3 * k * bm + k * k) * 4 <= budget:
            return bm
    return None


def gs_sweep(a, g, v, *, lam: float, nsweeps: int, bm: int,
             interpret: bool = False):
    """``nsweeps`` HALS Gauss-Seidel sweeps over the rows of ``v``.

    a, v: (k, M) transposed-frame numerator and factor; g: (k, k) Gram.
    Returns the updated (k, M) factor.  M must be divisible by ``bm``.
    """
    k, mdim = v.shape
    if mdim % bm:
        raise ValueError(f"bm={bm} must divide M={mdim}")
    grid = (mdim // bm,)
    strip = pl.BlockSpec((k, bm), lambda i: (0, i), memory_space=pltpu.VMEM)
    lam_arr = jnp.reshape(jnp.asarray(lam, dtype=jnp.float32), (1, 1))
    kern = functools.partial(_gs_sweep_kernel, k=k, nsweeps=nsweeps)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            strip,
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            strip,
        ],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((k, mdim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * mdim * (1 + nsweeps),
            bytes_accessed=(3 * k * mdim + k * k) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, g, lam_arr, v)
