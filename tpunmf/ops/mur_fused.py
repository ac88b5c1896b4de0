"""Fully-fused MUR iteration kernels (Pallas TPU).

At rank ~128 the MUR iteration is HBM-bandwidth-bound: every pass over the
m x n data costs ~bytes(X)/BW regardless of FLOPs.  The unfused iteration
reads X three times (X@H^T, W^T@X, objective) plus elementwise traffic;
these kernels reduce an entire Euclidean iteration to TWO passes over X
with every elementwise update fused into the GEMM epilogues, and the KL
iteration to THREE passes with no m x n ratio array ever materialized:

  W-kernel  (grid m/bm x n/bn, column-fastest):
      accumulate numer_i += X_ij @ H_j^T in the output block itself;
      on the last column step apply the multiplicative update in-register:
      EU: W_i <- W_i * numer / (W_i Gh + lw W_i + eps)        (nmf/mur.py:29)
      KL: numer uses the tile ratio X/(W H + eps); update via the
          regularized closed form 2a/(b + sqrt(b^2 + 4 lw a)) (nmf/mur.py:25-27)

  H-kernel  (grid n/bn x m/bm, row-fastest):
      accumulate numer_j += W_i^T X_ij (EU) or W_i^T (X/(W H+eps))_ij (KL);
      on the last row step emit the raw numerator (the W^T X cross-product
      the Gram-trick objective needs) AND the updated H_j.

The reference's loop body is ~10 m*n*k-equivalent GEMM passes with 4+
m x n temporaries (nmf/mur.py:20-49,112-127); the fused iteration is
bandwidth-optimal for EU up to the single objective pass (which the
Gram-trick objective eliminates entirely).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import _pick_block

_EPS = 1e-9


def mur_tileable(x, k: int):
    """(bm, bn) tiling for the fused iteration kernels, or None.

    X may be float32 or bfloat16 (bf16 data halves bytes/pass — the
    binding roofline term at rank ~128); the factors stay float32."""
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    xb = x.dtype.itemsize
    m, n = x.shape
    if k > 1024:
        return None
    # (256, 1024) measured marginally best on v5e (docs/PERF.md sweep);
    # fall back to the largest dividing block
    bm = 256 if m % 256 == 0 else _pick_block(m)
    bn = 1024 if n % 1024 == 0 else _pick_block(n)
    if bm is None or bn is None:
        return None
    # bf16 blocks need a (16, 128) tile: the X strips' sublane dim (bm)
    # must stay a multiple of 16 or Mosaic rejects the BlockSpec on
    # hardware (interpret mode doesn't check tiling)
    min_bm = 16 if xb == 2 else 8
    def budget(bm_, bn_):
        return bm_ * bn_ * xb * 2 + (bm_ + bn_) * k * 4 * 2
    while budget(bm, bn) > 8 * 1024 * 1024 and bm > min_bm:
        bm //= 2
        if m % bm:
            return None
    if budget(bm, bn) > 8 * 1024 * 1024 or bm % min_bm:
        return None  # can't fit: fall back to the jnp step
    return bm, bn


# ------------------------------------------------------------- W kernels


def _w_eu_kernel(x_ref, h_ref, w_ref, gh_ref, lam_ref, out_ref, *, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xb = x_ref[:]
    h_t = h_ref[:].T.astype(xb.dtype)
    out_ref[:] += jnp.dot(xb, h_t, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        w = w_ref[:]
        lam = lam_ref[0, 0]
        denom = jnp.dot(w, gh_ref[:], preferred_element_type=jnp.float32)
        out_ref[:] = w * out_ref[:] / (denom + lam * w + _EPS)


def _w_kl_kernel(x_ref, h_ref, w_ref, hsum_ref, lam_ref, out_ref, *, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    r = x_ref[:].astype(jnp.float32) / (wh + _EPS)
    out_ref[:] += jnp.dot(r, h_ref[:].T, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        a = w_ref[:] * out_ref[:]
        lam = lam_ref[0, 0]
        b = hsum_ref[:]  # (1, k) broadcast row: ones_like(x) @ h.T
        out_ref[:] = 2.0 * a / (b + jnp.sqrt(b * b + 4.0 * lam * a))


def _w_kl_obj_kernel(x_ref, h_ref, w_ref, hsum_ref, lam_ref, out_ref, acc_ref,
                     *, nj):
    """KL W-update pass that also emits KL(x, w@h) for the INCOMING
    (w, h) — the 'lagged' objective: the wh tiles are already formed for
    the ratio, so the objective of the previous iterate costs nothing."""
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, j == 0))
    def _():
        acc_ref[0, 0] = 0.0

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    xb = x_ref[:].astype(jnp.float32)
    r = xb / (wh + _EPS)
    out_ref[:] += jnp.dot(r, h_ref[:].T, preferred_element_type=jnp.float32)

    # masked KL of the incoming iterate (nmf/utils.py:23-26 semantics)
    val = xb * jnp.log(xb / wh)
    val = jnp.where(val == jnp.inf, 0.0, val)
    val = jnp.where(jnp.isnan(val), 0.0, val)
    acc_ref[0, 0] += jnp.sum(val - xb + wh)

    @pl.when(j == nj - 1)
    def _():
        a = w_ref[:] * out_ref[:]
        lam = lam_ref[0, 0]
        b = hsum_ref[:]
        out_ref[:] = 2.0 * a / (b + jnp.sqrt(b * b + 4.0 * lam * a))


def _compiler_params(semantics, interpret):
    """dimension_semantics hint for the Mosaic pipeliner (None = default).

    For the plain fused kernels the first grid axis is embarrassingly
    parallel (disjoint output rows/cols) and the second is the revisiting
    contraction axis.  NOT true for kernels that accumulate a scalar
    across axis 0 (the lagged-objective KL W-kernel) — their callers must
    not pass PARALLEL for that axis (enforced in mur_w_update)."""
    if semantics is None or interpret:
        return None
    # the LAST grid axis of every 2-pass kernel revisits/accumulates into
    # the output block (out_ref[:] += ...): PARALLEL there would race the
    # accumulation on megacore hardware and silently corrupt the factors
    last = semantics[-1]
    if str(getattr(last, "value", last)).lower() != "arbitrary":
        raise ValueError(
            "the last grid axis is the revisiting contraction axis; "
            "dimension_semantics[-1] must be ARBITRARY")
    return pltpu.CompilerParams(dimension_semantics=semantics)


def mur_w_update(x, w, h, *, distance_type: str, lam: float, bm: int, bn: int,
                 with_lagged_obj: bool = False, interpret: bool = False,
                 dimension_semantics=None):
    """One fused pass over X producing the updated W.

    With ``with_lagged_obj`` (KL only) also returns KL(x, w@h) of the
    INCOMING factors — free, since the pass forms those wh tiles anyway.
    """
    if with_lagged_obj and dimension_semantics is not None:
        # the lagged-objective kernel accumulates a scalar across grid
        # axis 0 — PARALLEL semantics there would race the accumulator
        first = dimension_semantics[0]
        if str(getattr(first, "value", first)).lower() != "arbitrary":
            raise ValueError(
                "with_lagged_obj accumulates across grid axis 0; "
                "dimension_semantics[0] must be ARBITRARY"
            )
    m, n = x.shape
    k = w.shape[1]
    if m % bm or n % bn:
        raise ValueError(
            f"(bm={bm}, bn={bn}) must divide (m={m}, n={n}) — the grid "
            "would silently truncate")
    nj = n // bn
    grid = (m // bm, nj)
    x_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=(2 if distance_type == "eu" else 4) * m * n * k,
        bytes_accessed=(m * n + 2 * m * k + k * n) * 4,
        transcendentals=m * n if with_lagged_obj else 0,
    )
    lam_arr = jnp.reshape(jnp.asarray(lam, dtype=jnp.float32), (1, 1))
    lam_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    if distance_type == "eu":
        if with_lagged_obj:
            raise ValueError("lagged objective is a KL-only mode")
        gh = h @ h.T
        kern = functools.partial(_w_eu_kernel, nj=nj)
        extra = (pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                 w_spec,
                 pl.BlockSpec((k, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        args = (x, h, w, gh, lam_arr)
        in_specs = [x_spec, *extra, lam_spec]
    else:
        hsum = jnp.sum(h, axis=1, keepdims=True).T  # (1, k)
        kern = functools.partial(
            _w_kl_obj_kernel if with_lagged_obj else _w_kl_kernel, nj=nj
        )
        extra = (pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                 w_spec,
                 pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        args = (x, h, w, hsum, lam_arr)
        in_specs = [x_spec, *extra, lam_spec]

    cparams = _compiler_params(dimension_semantics, interpret)
    if with_lagged_obj:
        w_new, acc = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                out_spec,
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((m, k), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ),
            cost_estimate=cost,
            interpret=interpret,
            compiler_params=cparams,
        )(*args)
        return w_new, acc[0, 0]

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=cparams,
    )(*args)


# ------------------------------------------- single-pass EU iteration

def _iter_eu_kernel(x_ref, ht_ref, w_ref, gh_ref, lw_ref, w_out_ref,
                    wtx_ref, gw_ref):
    """One grid step processes a full (bm, n) row strip of X:
    W-numerator GEMM, in-register W update, and the H-numerator +
    W-Gram accumulations — X is read from HBM exactly ONCE per
    iteration (the 2-pass kernels read it twice).  H^T arrives
    pre-transposed AND pre-cast to X's dtype: keeping only the x-dtype
    copy resident (instead of f32 + an in-kernel cast copy) frees ~6 MB
    of VMEM in bf16 mode, which doubles the strip height to bm=128 —
    full 128-deep MXU utilization on BOTH GEMMs (the second GEMM's
    reduction dim is bm)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        wtx_ref[:] = jnp.zeros_like(wtx_ref)
        gw_ref[:] = jnp.zeros_like(gw_ref)

    xb = x_ref[:]                                     # (bm, n)
    numer = jnp.dot(xb, ht_ref[:].astype(xb.dtype),
                    preferred_element_type=jnp.float32)
    w = w_ref[:]
    lw = lw_ref[0, 0]
    denom = jnp.dot(w, gh_ref[:], preferred_element_type=jnp.float32)
    w_new = w * numer / (denom + lw * w + _EPS)
    w_out_ref[:] = w_new
    wtx_ref[:] += jnp.dot(w_new.T.astype(xb.dtype), xb,
                          preferred_element_type=jnp.float32)
    gw_ref[:] += jnp.dot(w_new.T, w_new, preferred_element_type=jnp.float32)


def iter_eu_tileable(x, k: int):
    """Strip height bm for the single-pass iteration kernel, or None.

    Needs the full-width X strip (double-buffered), H^T (X's dtype), and
    the WtX accumulator resident in VMEM (~16 MB/core)."""
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    m, n = x.shape
    xb = x.dtype.itemsize
    budget = 14 * 1024 * 1024
    # ht arrives pre-cast to X's dtype (xb bytes); wtx accumulates in f32
    fixed = k * n * xb + k * n * 4 + k * k * 4 * 2
    # bf16 strips need a 16-multiple sublane dim (Mosaic tile rule)
    cands = (512, 256, 128, 64, 32, 16) if xb == 2 else \
            (512, 256, 128, 64, 32, 16, 8)
    for bm in cands:
        if m % bm:
            continue
        need = fixed + 2 * bm * n * xb + 3 * bm * k * 4
        if need <= budget:
            return bm
    return None


def mur_iteration_eu(x, w, h, *, lam_w: float, bm: int,
                     interpret: bool = False):
    """Whole EU-MUR W-half + H-numerator in ONE pass over X.

    Returns (w_new, wtx, gram_w): the caller finishes with the (cheap,
    k-sized) H update ``h * wtx / (gram_w @ h + lam_h*h + eps)`` and the
    free Gram-trick objective.  Exactly the same math as
    mur_w_update + mur_h_update (nmf/mur.py:29,45) at half the HBM
    traffic — X is the dominant term at rank ~128.
    """
    m, n = x.shape
    k = w.shape[1]
    if m % bm:
        raise ValueError(f"bm={bm} must divide m={m} (grid would truncate)")
    ni = m // bm
    gh = h @ h.T
    ht = h.T.astype(x.dtype)  # pre-cast: identical math to the previous
    # in-kernel astype (the kernel's astype is now a no-op), but only the
    # x-dtype copy is VMEM-resident — see iter_eu_tileable
    lam_arr = jnp.reshape(jnp.asarray(lam_w, dtype=jnp.float32), (1, 1))
    kern = _iter_eu_kernel
    cost = pl.CostEstimate(
        flops=4 * m * n * k,
        bytes_accessed=(m * n + 4 * m * k + 2 * k * n) * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        kern,
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(x, ht, w, gh, lam_arr)


# ----------------------- single-pass EU iteration, manual DMA pipeline


def _iter_eu_dma_kernel(x_hbm, ht_ref, gh_ref, w_hbm, lw_ref,
                        wout_hbm, wtx_ref, gw_ref,
                        xbuf, wbuf, wobuf, x_sem, w_sem, wo_sem,
                        *, ni, bm):
    """mur_iteration_eu with MANUALLY double-buffered strip I/O.

    The auto-pipelined variant (grid + BlockSpecs, _iter_eu_kernel) leaves
    bf16 mode at ~0.64 of the measured HBM roofline — the Mosaic pipeline
    serializes part of the X-strip DMA against the two MXU GEMMs.  Here X
    and W stay in HBM; the kernel runs the strip loop itself, issuing the
    next strip's DMA before computing the current one and draining W
    write-backs two slots behind, so the X read, W read/write and compute
    all overlap explicitly (pallas_guide.md double-buffering pattern).
    H^T arrives PRE-CAST to X's dtype — resident VMEM halves for bf16 and
    the per-strip cast disappears from the critical path."""
    lw = lw_ref[0, 0]
    wtx_ref[:] = jnp.zeros_like(wtx_ref)
    gw_ref[:] = jnp.zeros_like(gw_ref)
    ht = ht_ref[:]
    gh = gh_ref[:]

    def x_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * bm, bm), :], xbuf.at[slot], x_sem.at[slot])

    def w_dma(slot, i):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(i * bm, bm), :], wbuf.at[slot], w_sem.at[slot])

    def wo_dma(slot, i):
        return pltpu.make_async_copy(
            wobuf.at[slot], wout_hbm.at[pl.ds(i * bm, bm), :],
            wo_sem.at[slot])

    x_dma(0, 0).start()
    w_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < ni)
        def _():
            x_dma(nxt, i + 1).start()
            w_dma(nxt, i + 1).start()

        x_dma(slot, i).wait()
        w_dma(slot, i).wait()
        xb = xbuf[slot]                               # (bm, n) x-dtype
        w = wbuf[slot]                                # (bm, k) f32
        numer = jnp.dot(xb, ht, preferred_element_type=jnp.float32)
        denom = jnp.dot(w, gh, preferred_element_type=jnp.float32)
        w_new = w * numer / (denom + lw * w + _EPS)

        # the write-back two strips ago still owns this wobuf slot
        @pl.when(i >= 2)
        def _():
            wo_dma(slot, i - 2).wait()

        wobuf[slot] = w_new
        wo_dma(slot, i).start()

        wtx_ref[:] += jnp.dot(w_new.T.astype(xb.dtype), xb,
                              preferred_element_type=jnp.float32)
        gw_ref[:] += jnp.dot(w_new.T, w_new,
                             preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, ni, body, 0)

    # drain the last (up to two) W write-backs
    @pl.when(ni >= 2)
    def _():
        wo_dma(jax.lax.rem(ni - 2, 2), ni - 2).wait()
    wo_dma(jax.lax.rem(ni - 1, 2), ni - 1).wait()


def iter_eu_dma_tileable(x, k: int):
    """Strip height bm for the manual-DMA single-pass kernel, or None.

    VMEM: pre-cast H^T + WtX accumulator + 2 X strip slots + 3 small
    (bm, k) f32 buffers (w in x2, w out x2 counted below)."""
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    m, n = x.shape
    xb = x.dtype.itemsize
    budget = 13 * 1024 * 1024
    fixed = k * n * xb + k * n * 4 + 2 * k * k * 4    # ht(cast) + wtx + grams
    for bm in (256, 128, 64, 32):
        if m % bm or m // bm < 2:
            continue
        need = fixed + 2 * bm * n * xb + 4 * bm * k * 4
        if need <= budget:
            return bm
    return None


def mur_iteration_eu_dma(x, w, h, *, lam_w: float, bm: int):
    """Whole EU-MUR W-half + H-numerator in ONE manually-pipelined pass.

    Same contract as mur_iteration_eu (returns (w_new, wtx, gram_w));
    X/W strip traffic is explicitly double-buffered against the MXU
    GEMMs.  No interpret mode — the XLA path and mur_iteration_eu are
    the CPU oracles (equivalence is checked on TPU hardware,
    benchmarks/sweep_dma.py)."""
    m, n = x.shape
    k = w.shape[1]
    if m % bm:
        raise ValueError(f"bm={bm} must divide m={m} (grid would truncate)")
    ni = m // bm
    if ni < 2:
        raise ValueError("need at least 2 strips to double-buffer")
    gh = h @ h.T
    ht = h.T.astype(x.dtype)                          # pre-cast, resident
    lam_arr = jnp.reshape(jnp.asarray(lam_w, dtype=jnp.float32), (1, 1))
    kern = functools.partial(_iter_eu_dma_kernel, ni=ni, bm=bm)
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # ht (pre-cast)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # gh
            pl.BlockSpec(memory_space=pltpu.ANY),     # w in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),    # lam
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),     # w_new in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # wtx
            pl.BlockSpec(memory_space=pltpu.VMEM),    # gram_w
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bm, n), x.dtype),
            pltpu.VMEM((2, bm, k), jnp.float32),
            pltpu.VMEM((2, bm, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k,
            bytes_accessed=m * n * x.dtype.itemsize + (4 * m * k + 2 * k * n) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x, ht, gh, w, lam_arr)


# ------------------------------------------- single-pass KL iteration

def _iter_kl_kernel(x_ref, h_ref, w_ref, hsum_ref, lw_ref,
                    w_out_ref, wtr_ref, obj_ref):
    """One grid step runs the WHOLE KL iteration for a (bm, n) row strip:
    ratio vs the incoming W, regularized closed-form W update, the
    H-numerator ``W_new^T (X / (W_new H + eps))`` against the fresh W,
    and the masked KL objective of the incoming iterate (lagged, free —
    the wh tiles are already formed).  X is read from HBM once; the
    2-pass fused path reads it twice plus an objective pass."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        wtr_ref[:] = jnp.zeros_like(wtr_ref)
        obj_ref[0, 0] = 0.0

    xb = x_ref[:].astype(jnp.float32)                 # (bm, n)
    h = h_ref[:]                                      # (k, n) f32
    w = w_ref[:]                                      # (bm, k) f32
    wh = jnp.dot(w, h, preferred_element_type=jnp.float32)
    r = xb / (wh + _EPS)
    # r @ h^T without materializing the transpose: contract n with n
    numer = jax.lax.dot_general(
        r, h, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # lagged masked KL of the incoming iterate (nmf/utils.py:23-26)
    val = xb * jnp.log(xb / wh)
    val = jnp.where(val == jnp.inf, 0.0, val)
    val = jnp.where(jnp.isnan(val), 0.0, val)
    obj_ref[0, 0] += jnp.sum(val - xb + wh)
    # regularized closed form 2a/(b + sqrt(b^2 + 4*lam*a)) (nmf/mur.py:25-27)
    a = w * numer
    lw = lw_ref[0, 0]
    b = hsum_ref[:]                                   # (1, k)
    w_new = 2.0 * a / (b + jnp.sqrt(b * b + 4.0 * lw * a))
    w_out_ref[:] = w_new
    # H-numerator with the FRESH W (nmf/mur.py:122-124 sequencing)
    wh2 = jnp.dot(w_new, h, preferred_element_type=jnp.float32)
    r2 = xb / (wh2 + _EPS)
    wtr_ref[:] += jnp.dot(w_new.T, r2, preferred_element_type=jnp.float32)


def iter_kl_tileable(x, k: int):
    """(bm, bs) for the single-pass KL kernel, or None.

    bs=None selects the resident variant: two (bm, n) f32 wh/ratio temps
    live in VMEM alongside the strip, H and the WtR accumulator.  Strips
    below 64 rows lose to the 2-pass path (measured: bm=32 at n=8192 runs
    481 it/s vs 498 for 2-pass — too many grid steps), so only >=64
    engages.

    The column-subblocked variant (bs=int, see _iter_kl_blocked_kernel)
    would extend single-pass to wider n, but it LOSES to the 2-pass path
    everywhere it fits and the resident variant doesn't (measured at
    8192x8192 r128 through the solver loop: f32 bm=64/bs=2048 421 it/s vs
    441 2-pass; bf16-X bm=128/bs=1024 456 it/s vs 530 2-pass — the
    resident X row strip forces tiles whose MXU/pipeline efficiency costs
    more than the saved second X read).  So it is opt-in via
    ``mur_iteration_kl(..., bs=...)`` and never auto-selected."""
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    m, n = x.shape
    xb = x.dtype.itemsize
    budget = 14 * 1024 * 1024
    fixed = 2 * k * n * 4                  # h + wtr (f32)
    for bm in (128, 64):
        if m % bm:
            continue
        need = fixed + 2 * bm * n * xb + 2 * bm * n * 4 + 3 * bm * k * 4
        if need <= budget:
            return bm, None
    return None


def _iter_kl_blocked_kernel(x_ref, h_ref, w_ref, hsum_ref, lw_ref,
                            w_out_ref, wtr_ref, obj_ref, *, bs):
    """Column-subblocked single-pass KL iteration.

    Same math and I/O as _iter_kl_kernel, but wh and the ratio are formed
    (bm, bs) at a time inside two in-kernel loops — the full-width (bm, n)
    f32 temps never exist, so the strip layout fits VMEM at n where the
    resident variant can't (n ~ 8k at rank 128).  X is still read from HBM
    exactly once; the second loop re-reads the strip from VMEM only."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        wtr_ref[:] = jnp.zeros_like(wtr_ref)
        obj_ref[0, 0] = 0.0

    w = w_ref[:]                                      # (bm, k) f32
    bm, k = w.shape
    nj = h_ref.shape[1] // bs

    # Both loops are unrolled at trace time with STATIC slices: a
    # lax.fori_loop with pl.ds dynamic slices compiles but defeats
    # Mosaic's scheduling (measured 385 it/s vs 527+ unrolled at
    # 8192x8192 r128, bm=64 bs=1024).
    numer = jnp.zeros((bm, k), jnp.float32)
    obj = jnp.float32(0.0)
    for j in range(nj):
        xs = x_ref[:, j * bs:(j + 1) * bs].astype(jnp.float32)
        hs = h_ref[:, j * bs:(j + 1) * bs]            # (k, bs)
        wh = jnp.dot(w, hs, preferred_element_type=jnp.float32)
        r = xs / (wh + _EPS)
        numer = numer + jax.lax.dot_general(
            r, hs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        val = xs * jnp.log(xs / wh)
        val = jnp.where(val == jnp.inf, 0.0, val)
        val = jnp.where(jnp.isnan(val), 0.0, val)
        obj = obj + jnp.sum(val - xs + wh)
    obj_ref[0, 0] += obj

    a = w * numer
    lw = lw_ref[0, 0]
    b = hsum_ref[:]                                   # (1, k)
    w_new = 2.0 * a / (b + jnp.sqrt(b * b + 4.0 * lw * a))
    w_out_ref[:] = w_new

    for j in range(nj):
        xs = x_ref[:, j * bs:(j + 1) * bs].astype(jnp.float32)
        hs = h_ref[:, j * bs:(j + 1) * bs]
        wh2 = jnp.dot(w_new, hs, preferred_element_type=jnp.float32)
        r2 = xs / (wh2 + _EPS)
        # w_new^T @ r2 without materializing the transpose
        wtr_ref[:, j * bs:(j + 1) * bs] += jax.lax.dot_general(
            w_new, r2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def mur_iteration_kl(x, w, h, *, lam_w: float, bm: int, bs: int | None = None,
                     interpret: bool = False):
    """Whole KL-MUR W-half + H-numerator + lagged objective in ONE pass.

    Returns (w_new, wtr, obj_lagged) where obj_lagged is KL(x, w@h) of
    the INCOMING factors; the caller finishes with the cheap H closed
    form ``2c/(d + sqrt(d^2 + 4*lam_h*c))`` (c = h*wtr, d = colsum(w)).
    ``bs`` selects the column-subblocked kernel (see iter_kl_tileable).
    """
    m, n = x.shape
    k = w.shape[1]
    if m % bm:
        raise ValueError(f"bm={bm} must divide m={m} (grid would truncate)")
    if bs is not None and n % bs:
        raise ValueError(f"bs={bs} must divide n={n} (grid would truncate)")
    ni = m // bm
    hsum = jnp.sum(h, axis=1, keepdims=True).T  # (1, k)
    lam_arr = jnp.reshape(jnp.asarray(lam_w, dtype=jnp.float32), (1, 1))
    if bs is not None:
        kern = functools.partial(_iter_kl_blocked_kernel, bs=bs)
    else:
        kern = _iter_kl_kernel
    cost = pl.CostEstimate(
        flops=8 * m * n * k,
        bytes_accessed=(m * n + 4 * m * k + 2 * k * n) * 4,
        transcendentals=m * n,
    )
    w_new, wtr, obj = pl.pallas_call(
        kern,
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(x, h, w, hsum, lam_arr)
    return w_new, wtr, obj[0, 0]


# ------------------------------------------------------------- H kernels


def _h_eu_kernel(x_ref, w_ref, h_ref, gw_ref, lam_ref, h_out_ref, wtx_ref, *, ni):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        h_out_ref[:] = jnp.zeros_like(h_out_ref)

    xb = x_ref[:]
    h_out_ref[:] += jnp.dot(w_ref[:].T.astype(xb.dtype), xb,
                            preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        numer = h_out_ref[:]
        wtx_ref[:] = numer
        h = h_ref[:]
        lam = lam_ref[0, 0]
        denom = jnp.dot(gw_ref[:], h, preferred_element_type=jnp.float32)
        h_out_ref[:] = h * numer / (denom + lam * h + _EPS)


def _h_kl_kernel(x_ref, w_ref, h_ref, wsum_ref, lam_ref, h_out_ref, wtr_ref, *, ni):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        h_out_ref[:] = jnp.zeros_like(h_out_ref)

    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    r = x_ref[:].astype(jnp.float32) / (wh + _EPS)
    h_out_ref[:] += jnp.dot(w_ref[:].T, r, preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        numer = h_out_ref[:]
        wtr_ref[:] = numer
        c = h_ref[:] * numer
        lam = lam_ref[0, 0]
        d = wsum_ref[:]  # (k, 1) column: w.T @ ones_like(x)
        h_out_ref[:] = 2.0 * c / (d + jnp.sqrt(d * d + 4.0 * lam * c))


def mur_h_update(x, w, h, *, distance_type: str, lam: float, bm: int, bn: int,
                 interpret: bool = False, dimension_semantics=None):
    """One fused pass over X producing (updated H, raw numerator).

    The numerator is W^T X (EU) / W^T(X/(WH+eps)) (KL) with the *updated*
    W — for EU it feeds the free Gram-trick objective."""
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
    out_specs = (
        pl.BlockSpec((k, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((k, n), jnp.float32),
        jax.ShapeDtypeStruct((k, n), jnp.float32),
    )
    cost = pl.CostEstimate(
        flops=(2 if distance_type == "eu" else 4) * m * n * k,
        bytes_accessed=(m * n + m * k + 3 * k * n) * 4,
        transcendentals=0,
    )
    lam_arr = jnp.reshape(jnp.asarray(lam, dtype=jnp.float32), (1, 1))
    lam_spec = pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM)
    if distance_type == "eu":
        gw = w.T @ w
        kern = functools.partial(_h_eu_kernel, ni=ni)
        in_specs = [x_spec, w_spec, h_spec,
                    pl.BlockSpec((k, k), lambda j, i: (0, 0),
                                 memory_space=pltpu.VMEM), lam_spec]
        args = (x, w, h, gw, lam_arr)
    else:
        wsum = jnp.sum(w, axis=0, keepdims=True).T  # (k, 1)
        kern = functools.partial(_h_kl_kernel, ni=ni)
        in_specs = [x_spec, w_spec, h_spec,
                    pl.BlockSpec((k, 1), lambda j, i: (0, 0),
                                 memory_space=pltpu.VMEM), lam_spec]
        args = (x, w, h, wsum, lam_arr)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=_compiler_params(dimension_semantics, interpret),
    )(*args)
