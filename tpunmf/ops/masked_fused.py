"""Fused masked/weighted MUR kernels (Pallas TPU).

The masked solver (solvers/masked.py) fits only the observed cells:

    EU:  W <- W * ((M*X) @ H^T) / ((M*(W H)) @ H^T + lam W + eps)
    KL:  W <- 2a / (b + sqrt(b^2 + 4 lam a)),
         a = W * ((M*X/(W H + eps)) @ H^T),  b = M @ H^T

Driven as plain XLA this pays 4+ unfused m x n passes per half-update
(mask products, WH, the cross GEMMs).  These kernels reduce each half
to ONE pass over (X, M): the mask tile rides the same DMA as the X
tile, WH is formed tile-by-tile in-register (never materialized in
HBM), and both cross-products accumulate in VMEM.  Same two-pass grid
structure as ops/mur_fused.mur_w_update/mur_h_update; the masked
denominator breaks the Gram trick, so a masked single-pass variant
would need (k, n)-sized numerator AND denominator accumulators resident
— over VMEM at the headline width, hence two passes.

Math matches solvers/masked.py exactly (including the cold-row/column
guard: a fully-unobserved row keeps its factor entries).  The unmasked
limit (M = ones) reproduces solvers/mur.py's updates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9


def masked_tileable(x, k: int, mask_itemsize: int = 1):
    """(bm, bn) for the masked fused kernels, or None.

    Budget includes the mask strip (``mask_itemsize`` bytes/cell — int8
    for binary masks, X's width for real-valued weight masks) and the
    two (bm, k) accumulators the masked denominators need."""
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    xb = x.dtype.itemsize
    m, n = x.shape
    if k > 1024:
        return None
    from .fused import _pick_block

    bm = 256 if m % 256 == 0 else _pick_block(m)
    bn = 1024 if n % 1024 == 0 else _pick_block(n)
    if bm is None or bn is None:
        return None

    def budget(bm_, bn_):
        # x + mask strips (double-buffered), h block, w block, wh tile,
        # numer + denom accumulators
        return (2 * bm_ * bn_ * (xb + mask_itemsize) + bn_ * k * 4 * 2
                + bm_ * bn_ * 4 + 4 * bm_ * k * 4)

    # Mosaic native tile rules on the strip sublane dim (interpret mode
    # won't catch them): bf16 needs 16-multiples, int8 needs
    # 32-multiples; binary masks ride as int8 even when X is f32
    # (solvers/masked.py), so require the strictest participating rule
    min_bm = 32 if mask_itemsize == 1 else 16
    while budget(bm, bn) > 8 * 1024 * 1024 and bm > min_bm:
        bm //= 2
        if m % bm:
            return None
    if budget(bm, bn) > 8 * 1024 * 1024 or bm % min_bm:
        return None
    return bm, bn


# ------------------------------------------------------------- W kernels


def _w_eu_masked_kernel(x_ref, m_ref, h_ref, w_ref, lam_ref, out_ref,
                        den_ref, *, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        den_ref[:] = jnp.zeros_like(den_ref)

    msk = m_ref[:].astype(jnp.float32)
    xb = x_ref[:].astype(jnp.float32) * msk
    h = h_ref[:]
    ht = h.T
    out_ref[:] += jnp.dot(xb, ht, preferred_element_type=jnp.float32)
    wh = jnp.dot(w_ref[:], h, preferred_element_type=jnp.float32)
    den_ref[:] += jnp.dot(msk * wh, ht, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        w = w_ref[:]
        lam = lam_ref[0, 0]
        out_ref[:] = w * out_ref[:] / (den_ref[:] + lam * w + _EPS)


def _w_kl_masked_kernel(x_ref, m_ref, h_ref, w_ref, lam_ref, out_ref,
                        b_ref, *, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    msk = m_ref[:].astype(jnp.float32)
    h = h_ref[:]
    ht = h.T
    wh = jnp.dot(w_ref[:], h, preferred_element_type=jnp.float32)
    r = msk * x_ref[:].astype(jnp.float32) / (wh + _EPS)
    out_ref[:] += jnp.dot(r, ht, preferred_element_type=jnp.float32)
    b_ref[:] += jnp.dot(msk, ht, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        w = w_ref[:]
        a = w * out_ref[:]
        lam = lam_ref[0, 0]
        b = b_ref[:]
        den = b + jnp.sqrt(b * b + 4.0 * lam * a)
        # cold rows (fully unobserved): den == 0 -> keep the old entry
        out_ref[:] = jnp.where(den > 0, 2.0 * a / jnp.where(den > 0, den, 1.0), w)


def masked_w_update(x, mask, w, h, *, distance_type: str, lam: float,
                    bm: int, bn: int, interpret: bool = False):
    """One fused pass over (X, M) producing the masked-updated W."""
    m, n = x.shape
    k = w.shape[1]
    if m % bm or n % bn:
        raise ValueError(
            f"(bm={bm}, bn={bn}) must divide (m={m}, n={n}) — the grid "
            "would silently truncate")
    nj = n // bn
    grid = (m // bm, nj)
    x_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    lam_arr = jnp.reshape(jnp.asarray(lam, dtype=jnp.float32), (1, 1))
    lam_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    kern = functools.partial(
        _w_eu_masked_kernel if distance_type == "eu" else _w_kl_masked_kernel,
        nj=nj)
    # the denominator accumulator lives in VMEM scratch: it is consumed
    # in the j == nj-1 epilogue and never needed on the host, so an HBM
    # output would only add an m x k allocation + write-back per call
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, x_spec, h_spec, w_spec, lam_spec],
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * n * k,
            bytes_accessed=m * n * (x.dtype.itemsize + mask.dtype.itemsize)
            + (2 * m * k + k * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, mask, h, w, lam_arr)
    return out


# ------------------------------------------------------------- H kernels


def _h_eu_masked_kernel(x_ref, m_ref, w_ref, h_ref, lam_ref, out_ref,
                        den_ref, *, ni):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        den_ref[:] = jnp.zeros_like(den_ref)

    msk = m_ref[:].astype(jnp.float32)
    xb = x_ref[:].astype(jnp.float32) * msk
    w = w_ref[:]
    wt = w.T
    out_ref[:] += jnp.dot(wt, xb, preferred_element_type=jnp.float32)
    wh = jnp.dot(w, h_ref[:], preferred_element_type=jnp.float32)
    den_ref[:] += jnp.dot(wt, msk * wh, preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        h = h_ref[:]
        lam = lam_ref[0, 0]
        out_ref[:] = h * out_ref[:] / (den_ref[:] + lam * h + _EPS)


def _h_kl_masked_kernel(x_ref, m_ref, w_ref, h_ref, lam_ref, out_ref,
                        d_ref, *, ni):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        d_ref[:] = jnp.zeros_like(d_ref)

    msk = m_ref[:].astype(jnp.float32)
    w = w_ref[:]
    wt = w.T
    wh = jnp.dot(w, h_ref[:], preferred_element_type=jnp.float32)
    r = msk * x_ref[:].astype(jnp.float32) / (wh + _EPS)
    out_ref[:] += jnp.dot(wt, r, preferred_element_type=jnp.float32)
    d_ref[:] += jnp.dot(wt, msk, preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        h = h_ref[:]
        c = h * out_ref[:]
        lam = lam_ref[0, 0]
        d = d_ref[:]
        den = d + jnp.sqrt(d * d + 4.0 * lam * c)
        out_ref[:] = jnp.where(den > 0, 2.0 * c / jnp.where(den > 0, den, 1.0), h)


def masked_h_update(x, mask, w, h, *, distance_type: str, lam: float,
                    bm: int, bn: int, interpret: bool = False):
    """One fused pass over (X, M) producing the masked-updated H (uses
    the already-updated W, matching solvers/masked.py sequencing)."""
    m, n = x.shape
    k = w.shape[1]
    if m % bm or n % bn:
        raise ValueError(
            f"(bm={bm}, bn={bn}) must divide (m={m}, n={n}) — the grid "
            "would silently truncate")
    ni = m // bm
    grid = (n // bn, ni)  # row index varies fastest
    x_spec = pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((k, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((k, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    lam_arr = jnp.reshape(jnp.asarray(lam, dtype=jnp.float32), (1, 1))
    lam_spec = pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM)
    kern = functools.partial(
        _h_eu_masked_kernel if distance_type == "eu" else _h_kl_masked_kernel,
        ni=ni)
    # denominator accumulator in VMEM scratch (see masked_w_update)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, x_spec, w_spec, h_spec, lam_spec],
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * n * k,
            bytes_accessed=m * n * (x.dtype.itemsize + mask.dtype.itemsize)
            + (m * k + 2 * k * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, mask, w, h, lam_arr)
    return out
