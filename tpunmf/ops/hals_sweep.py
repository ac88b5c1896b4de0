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
    # row-selector masks: jnp.ndarray.at[].set lowers to the scatter
    # primitive (unsupported by the Mosaic TPU backend) even for static
    # indices, so single-row updates are constant-mask selects instead —
    # the (row_iota == l) mask folds at compile time
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    for _ in range(nsweeps):
        for l in range(k):                            # static indices
            gll = g[l, l]
            numer = a[l, :] - p[l, :] + gll * v[l, :]
            new = jnp.maximum(numer / (gll + lam + _EPS), 0.0)
            delta = new - v[l, :]
            p = p + g[:, l:l + 1] * delta[None, :]
            v = jnp.where(row_iota == l, new[None, :], v)
    out_ref[:] = v


def _gs_sweep_fori_kernel(a_ref, g_ref, diag_ref, lam_ref, v_ref, out_ref,
                          *, k: int, nsweeps: int):
    """Trace-light variant: the column chain as an in-kernel fori_loop.

    Mosaic has no value-level ``dynamic_slice`` lowering, so every
    dynamic access is a REF load/store with a sublane-axis ``pl.ds``
    (row slices of the (k, *) VMEM refs) or an SMEM scalar read (the
    Gram diagonal); ``out_ref`` doubles as the in-place sweep state.
    The cross-product row ``g[l, :] @ V`` is computed on demand (k * bm
    MACs — the same total work as the rank-1 running update, with ~k x
    smaller traced program than the unrolled form)."""
    lam = lam_ref[0, 0]
    out_ref[:] = v_ref[:]

    def col(l, carry):
        row = g_ref[pl.ds(l, 1), :]                           # (1, k)
        gll = diag_ref[0, l]
        al = a_ref[pl.ds(l, 1), :]                            # (1, bm)
        vl = out_ref[pl.ds(l, 1), :]
        v = out_ref[:]                                        # (k, bm)
        numer = al - jnp.dot(row, v, preferred_element_type=jnp.float32) \
            + gll * vl
        new = jnp.maximum(numer / (gll + lam + _EPS), 0.0)
        out_ref[pl.ds(l, 1), :] = new
        return carry

    def sweep(t, carry):
        return jax.lax.fori_loop(0, k, col, carry)

    jax.lax.fori_loop(0, nsweeps, sweep, jnp.int32(0))


def gs_sweep_tileable(k: int, mdim: int) -> int | None:
    """Strip width bm for the sweep kernel, or None if it can't engage.

    k rides the sublane axis (needs the f32 (8, 128) tile), the parallel
    axis is blocked into lanes.  The unrolled chain costs ~6k traced ops
    per sweep, so very large ranks are left to the XLA path."""
    if k % 8 or k > 256:
        return None
    budget = 14 * 1024 * 1024
    for bm in (2048, 1024, 512, 256, 128):
        if mdim % bm:
            continue
        # residency, counted the way Mosaic actually allocates it: the
        # three moving (k, bm) windows (a, v, out) are DOUBLE-buffered by
        # the pipeline (6 strips), the in-kernel p = G @ V and loaded v/a
        # (3 more), plus the live temporaries of the unrolled select
        # chain — MEASURED on v5e: the compiler's scoped-vmem stack for
        # this kernel is ~20 (k, bm)-equivalents at k=128 (21.06 MB at
        # bm=2048, from the AOT error), so budget 24 with headroom
        if (24 * k * bm + k * k) * 4 <= budget:
            return bm
    return None


# ------------------------------------------ single-pass HALS iteration


def _hals_iter_kernel(x_ref, ht_ref, hht_ref, w_ref, lam_ref,
                      w_out_ref, wtx_ref, gw_ref, *, k: int, nsweeps: int):
    """One grid step = full W-half for a (bm, n) row strip in ONE X read:
    the X@H^T strip GEMM, the in-register Gauss-Seidel sweeps, then the
    H-numerator W_new^T X and W-Gram accumulations — the HALS analog of
    ops/mur_fused._iter_eu_kernel.  Same per-iteration HBM traffic as
    single-pass MUR-EU, but each iteration is an exact coordinate solve
    (HALS converges in far fewer iterations on the EU objective)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        wtx_ref[:] = jnp.zeros_like(wtx_ref)
        gw_ref[:] = jnp.zeros_like(gw_ref)

    xb = x_ref[:]                                     # (bm, n)
    xht = jnp.dot(xb, ht_ref[:].astype(xb.dtype),
                  preferred_element_type=jnp.float32)  # (bm, k)
    w = w_ref[:]                                      # (bm, k) f32
    g = hht_ref[:]                                    # (k, k)
    lam = lam_ref[0, 0]
    p = jnp.dot(w, g, preferred_element_type=jnp.float32)
    # constant-mask column selects instead of .at[].set (scatter is
    # unsupported by the Mosaic TPU backend; see _gs_sweep_kernel)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    for _ in range(nsweeps):
        for l in range(k):                            # static indices
            gll = g[l, l]
            numer = xht[:, l] - p[:, l] + gll * w[:, l]
            new = jnp.maximum(numer / (gll + lam + _EPS), 0.0)
            delta = new - w[:, l]
            p = p + delta[:, None] * g[l:l + 1, :]
            w = jnp.where(col_iota == l, new[:, None], w)
    w_out_ref[:] = w
    wtx_ref[:] += jnp.dot(w.T.astype(xb.dtype), xb,
                          preferred_element_type=jnp.float32)
    gw_ref[:] += jnp.dot(w.T, w, preferred_element_type=jnp.float32)


def hals_iter_tileable(x, k: int) -> int | None:
    """Strip height bm for the single-pass HALS kernel, or None.

    Needs the full-width X strip (double-buffered), H^T, the WtX
    accumulator, and the sweep temporaries resident — iter_eu_tileable's
    layout plus (bm, k) sweep state."""
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if k % 8 or k > 256:
        return None
    m, n = x.shape
    xb = x.dtype.itemsize
    budget = 13 * 1024 * 1024
    # ht arrives pre-cast to X's dtype (see hals_iteration_eu); wtx f32
    fixed = k * n * xb + k * n * 4 + 2 * k * k * 4
    for bm in (256, 128, 64, 32):
        if m % bm:
            continue
        need = fixed + 2 * bm * n * xb + 5 * bm * k * 4
        if need <= budget:
            return bm
    return None


def hals_iteration_eu(x, w, h, *, lam_w: float, nsweeps: int, bm: int,
                      interpret: bool = False):
    """Whole HALS W-half (strip GEMM + sweeps) + H-numerator in ONE pass
    over X.  Returns (w_new, wtx, gram_w); the caller runs the H sweeps
    against (wtx, gram_w) — e.g. via gs_sweep — and gets the Gram-trick
    objective for free.  Math identical to solvers/hals.py's
    xht/fori-sweep path (same epsilon, same sweep order)."""
    m, n = x.shape
    k = w.shape[1]
    if m % bm:
        raise ValueError(f"bm={bm} must divide m={m} (grid would truncate)")
    ni = m // bm
    hht = h @ h.T
    ht = h.T.astype(x.dtype)  # pre-cast: identical math to the in-kernel
    # astype (now a no-op); frees the f32 H^T from VMEM in bf16 mode
    lam_arr = jnp.reshape(jnp.asarray(lam_w, dtype=jnp.float32), (1, 1))
    kern = functools.partial(_hals_iter_kernel, k=k, nsweeps=nsweeps)
    return pl.pallas_call(
        kern,
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k + 2 * (1 + nsweeps) * m * k * k,
            bytes_accessed=m * n * x.dtype.itemsize + (4 * m * k + 2 * k * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ht, hht, w, lam_arr)


def gs_sweep(a, g, v, *, lam: float, nsweeps: int, bm: int,
             interpret: bool = False, unrolled: bool = True):
    """``nsweeps`` HALS Gauss-Seidel sweeps over the rows of ``v``.

    a, v: (k, M) transposed-frame numerator and factor; g: (k, k) Gram.
    Returns the updated (k, M) factor.  M must be divisible by ``bm``.
    ``unrolled=False`` selects the fori_loop kernel body (same math,
    ~k x smaller traced program — the fallback if the unrolled chain
    compiles slowly on a given toolchain)."""
    k, mdim = v.shape
    if mdim % bm:
        raise ValueError(f"bm={bm} must divide M={mdim}")
    grid = (mdim // bm,)
    strip = pl.BlockSpec((k, bm), lambda i: (0, i), memory_space=pltpu.VMEM)
    lam_arr = jnp.reshape(jnp.asarray(lam, dtype=jnp.float32), (1, 1))
    cost = pl.CostEstimate(
        flops=2 * k * k * mdim * (1 + nsweeps),
        bytes_accessed=(3 * k * mdim + k * k) * 4,
        transcendentals=0,
    )
    gram_spec = pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    lam_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    if unrolled:
        kern = functools.partial(_gs_sweep_kernel, k=k, nsweeps=nsweeps)
        in_specs = [strip, gram_spec, lam_spec, strip]
        args = (a, g, lam_arr, v)
    else:
        kern = functools.partial(_gs_sweep_fori_kernel, k=k, nsweeps=nsweeps)
        diag = jnp.reshape(jnp.diagonal(g), (1, k)).astype(jnp.float32)
        in_specs = [strip, gram_spec,
                    pl.BlockSpec((1, k), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    lam_spec, strip]
        args = (a, g, diag, lam_arr, v)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((k, mdim), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
