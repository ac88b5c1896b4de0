"""Fused GEMM + elementwise passes (Pallas TPU kernels with XLA fallbacks).

These kernels implement the HBM-bandwidth-critical inner passes of the
solvers as single sweeps over the m x n data, computing the ``W @ H`` tile
in VMEM (MXU) and applying the elementwise epilogue without ever
materializing the m x n reconstruction in HBM:

  * ``eu_residual_obj``  : 0.5 * ||X - WH||_F^2      (objective pass)
  * ``kl_ratio``         : X / (WH + eps)            (MUR-KL numerator input,
                                                      reference nmf/mur.py:25,41)
  * ``kl_ratio_and_obj`` : the ratio plus the masked KL objective
                           (reference nmf/utils.py:21-26 semantics) in the
                           same sweep.

The reference materializes ``wh`` and every elementwise intermediate as a
full m x n numpy temporary (nmf/mur.py:112,124, nmf/utils.py:23-26) — at
least 4 extra HBM round-trips per iteration.  Here each pass reads X (and
W, H) once and writes at most one m x n output.

Objective sums accumulate into a single SMEM scalar across the grid —
well-defined because TPU grids execute sequentially on a core (the scalar
is zeroed by the first program).

Fallback: identically-shaped jnp expressions (XLA fuses these well too;
used on CPU, for f64 parity tests, and for shapes that don't tile).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_CANDIDATES = (1024, 512, 256, 128, 64, 32, 16, 8)


def _pick_block(dim: int) -> int | None:
    for b in _BLOCK_CANDIDATES:
        if dim % b == 0:
            return min(b, dim)
    return None


def _tileable(x, w, h) -> tuple[int, int] | None:
    """Return (bm, bn) if the problem can be tiled for the TPU kernels."""
    if x.dtype != jnp.float32:
        return None
    m, n = x.shape
    k = w.shape[1]
    if k > 2048:
        return None
    bm, bn = _pick_block(m), _pick_block(n)
    if bm is None or bn is None:
        return None
    # keep x-tile + w/h tiles + wh scratch comfortably inside VMEM (~16MB)
    def budget(bm_, bn_):
        return bm_ * bn_ * 4 * 3 + (bm_ + bn_) * k * 4
    while budget(bm, bn) > 8 * 1024 * 1024 and bm > 8:
        bm //= 2
        if m % bm:
            return None
    if budget(bm, bn) > 8 * 1024 * 1024:
        return None  # can't fit (e.g. very large k): use the XLA fallback
    return bm, bn


# ---------------------------------------------------------------- kernels


def _first_program():
    return jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)


def _eu_obj_kernel(x_ref, w_ref, h_ref, acc_ref):
    # TPU grids execute sequentially on one core, so a single SMEM scalar
    # accumulated across programs is well-defined.
    @pl.when(_first_program())
    def _():
        acc_ref[0, 0] = 0.0

    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    d = x_ref[:] - wh
    acc_ref[0, 0] += 0.5 * jnp.sum(d * d)


def _kl_ratio_kernel(x_ref, w_ref, h_ref, r_ref, *, eps):
    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    r_ref[:] = x_ref[:] / (wh + eps)


def _kl_obj_kernel(x_ref, w_ref, h_ref, acc_ref):
    @pl.when(_first_program())
    def _():
        acc_ref[0, 0] = 0.0

    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    xb = x_ref[:]
    val = xb * jnp.log(xb / wh)
    val = jnp.where(val == jnp.inf, 0.0, val)
    val = jnp.where(jnp.isnan(val), 0.0, val)
    acc_ref[0, 0] += jnp.sum(val - xb + wh)


def _kl_ratio_obj_kernel(x_ref, w_ref, h_ref, r_ref, acc_ref, *, eps):
    @pl.when(_first_program())
    def _():
        acc_ref[0, 0] = 0.0

    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    xb = x_ref[:]
    r_ref[:] = xb / (wh + eps)
    # masked KL term, exact reference semantics (nmf/utils.py:23-26):
    # zero +inf entries (x>0, wh==0), then zero NaNs (x==0), then add -x+wh.
    val = xb * jnp.log(xb / wh)
    val = jnp.where(val == jnp.inf, 0.0, val)
    val = jnp.where(jnp.isnan(val), 0.0, val)
    acc_ref[0, 0] += jnp.sum(val - xb + wh)


def _grid_specs(m, n, k, bm, bn):
    grid = (m // bm, n // bn)
    in_specs = [
        pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    return grid, in_specs


def _eu_obj_pallas(x, w, h, bm, bn, interpret=False):
    m, n = x.shape
    k = w.shape[1]
    grid, in_specs = _grid_specs(m, n, k, bm, bn)
    acc = pl.pallas_call(
        _eu_obj_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 3 * m * n,
            bytes_accessed=(m * n + m * k + k * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, h)
    return acc[0, 0]


def _kl_ratio_pallas(x, w, h, eps, bm, bn, interpret=False):
    m, n = x.shape
    k = w.shape[1]
    grid, in_specs = _grid_specs(m, n, k, bm, bn)
    return pl.pallas_call(
        partial(_kl_ratio_kernel, eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 2 * m * n,
            bytes_accessed=(2 * m * n + m * k + k * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, h)


def _kl_ratio_obj_pallas(x, w, h, eps, bm, bn, interpret=False):
    m, n = x.shape
    k = w.shape[1]
    grid, in_specs = _grid_specs(m, n, k, bm, bn)
    r, acc = pl.pallas_call(
        partial(_kl_ratio_obj_kernel, eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, n), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 6 * m * n,
            bytes_accessed=(2 * m * n + m * k + k * n) * 4,
            transcendentals=m * n,
        ),
        interpret=interpret,
    )(x, w, h)
    return r, acc[0, 0]


# ------------------------------------------------------------- dispatchers


def _kl_obj_pallas(x, w, h, bm, bn, interpret=False):
    m, n = x.shape
    k = w.shape[1]
    grid, in_specs = _grid_specs(m, n, k, bm, bn)
    acc = pl.pallas_call(
        _kl_obj_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 4 * m * n,
            bytes_accessed=(m * n + m * k + k * n) * 4,
            transcendentals=m * n,
        ),
        interpret=interpret,
    )(x, w, h)
    return acc[0, 0]


def kl_obj(x, w, h, *, use_pallas: bool = False, interpret: bool = False):
    """Masked KL objective alone (no ratio output) in one fused sweep."""
    if use_pallas:
        tile = _tileable(x, w, h)
        if tile is not None:
            return _kl_obj_pallas(x, w, h, *tile, interpret=interpret)
    wh = w @ h
    val = x * jnp.log(x / wh)
    val = jnp.where(val == jnp.inf, 0.0, val)
    val = jnp.where(jnp.isnan(val), 0.0, val)
    return jnp.sum(val - x + wh)


def eu_residual_obj(x, w, h, *, use_pallas: bool = False, interpret: bool = False):
    """0.5 * ||x - w @ h||_F^2 without materializing w @ h in HBM."""
    if use_pallas:
        tile = _tileable(x, w, h)
        if tile is not None:
            return _eu_obj_pallas(x, w, h, *tile, interpret=interpret)
    d = x - w @ h
    return 0.5 * jnp.sum(d * d)


def kl_ratio(x, w, h, *, eps: float = 1e-9, use_pallas: bool = False,
             interpret: bool = False):
    """x / (w @ h + eps) in one fused sweep (MUR-KL ratio, nmf/mur.py:25)."""
    if use_pallas:
        tile = _tileable(x, w, h)
        if tile is not None:
            return _kl_ratio_pallas(x, w, h, eps, *tile, interpret=interpret)
    return x / (w @ h + eps)


def kl_ratio_and_obj(x, w, h, *, eps: float = 1e-9, use_pallas: bool = False,
                     interpret: bool = False):
    """(x/(wh+eps), masked-KL objective) in one fused sweep."""
    if use_pallas:
        tile = _tileable(x, w, h)
        if tile is not None:
            return _kl_ratio_obj_pallas(x, w, h, eps, *tile, interpret=interpret)
    wh = w @ h
    r = x / (wh + eps)
    val = x * jnp.log(x / wh)
    val = jnp.where(val == jnp.inf, 0.0, val)
    val = jnp.where(jnp.isnan(val), 0.0, val)
    return r, jnp.sum(val - x + wh)
