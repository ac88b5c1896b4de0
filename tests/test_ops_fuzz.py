"""Kernel-shape fuzz tier (round-4): the Pallas kernels in interpret
mode across dtype x (m, n, k) x tile-boundary combinations, asserting
equality with the jnp step formulas.

Interpret mode validates the math and the grid/indexing/accumulator
logic (block truncation, epilogue-on-last-step, revisit accumulation);
the Mosaic rules hardware additionally enforces (sublane tile multiples,
VMEM budgets) are covered by the *_tileable gates in test_ops.py /
test_layout_rank.py.  This tier protects the round-3 hardware fixes —
the bf16 pre-cast H^T single-pass path and the int8-mask DMA ride —
from shape-dependent regressions.

Reference math: nmf/mur.py:29-49 (updates), nmf/utils.py (objectives);
masked variants per solvers/masked.py's oracle in test_masked.py.
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

EPS = 1e-9


def _problem(seed, m, n, k, zeros=False):
    rng = np.random.default_rng(seed)
    x = (rng.random((m, n)) + 0.05).astype(np.float32)
    if zeros:
        x[x < 0.3] = 0.0
    w = (rng.random((m, k)) + 0.1).astype(np.float32)
    h = (rng.random((k, n)) + 0.1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(w), jnp.asarray(h)


# (m, n, k, bm, bn) — single-block, multi-block on each axis, non-pow2
# and non-8-multiple ranks, rank 1, and tall/wide aspect ratios
TWO_PASS_SHAPES = [
    (8, 128, 4, 8, 128),       # single block both axes
    (16, 128, 8, 8, 128),      # 2 row blocks
    (8, 256, 8, 8, 128),       # 2 col blocks
    (32, 384, 12, 16, 128),    # 2x3 grid, k % 8 != 0
    (64, 256, 16, 32, 256),    # bn == n/1 boundary
    (24, 128, 20, 8, 128),     # 3 row blocks, k=20
    (128, 512, 8, 64, 128),    # wide grid
    (16, 128, 1, 16, 128),     # rank 1
    (40, 640, 24, 8, 128),     # 5x5 grid, odd-ish everything
]


@pytest.mark.parametrize("dist", ["eu", "kl"])
@pytest.mark.parametrize("shape", TWO_PASS_SHAPES,
                         ids=[f"{m}x{n}x{k}" for m, n, k, _, _ in TWO_PASS_SHAPES])
@pytest.mark.parametrize("lam", [0.0, 0.15])
def test_w_update_fuzz(shape, dist, lam):
    from tpunmf.ops.mur_fused import mur_w_update

    m, n, k, bm, bn = shape
    x, w, h = _problem(m * 1000 + n + k, m, n, k)
    got = mur_w_update(x, w, h, distance_type=dist, lam=lam,
                       bm=bm, bn=bn, interpret=True)
    if dist == "eu":
        want = w * (x @ h.T) / (w @ (h @ h.T) + lam * w + EPS)
    else:
        r = x / (w @ h + EPS)
        a = w * (r @ h.T)
        b = jnp.sum(h, axis=1)[None, :]
        want = 2.0 * a / (b + jnp.sqrt(b * b + 4.0 * lam * a))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("dist", ["eu", "kl"])
@pytest.mark.parametrize("shape", TWO_PASS_SHAPES[:6],
                         ids=[f"{m}x{n}x{k}"
                              for m, n, k, _, _ in TWO_PASS_SHAPES[:6]])
def test_h_update_fuzz(shape, dist):
    from tpunmf.ops.mur_fused import mur_h_update

    m, n, k, bm, bn = shape
    lam = 0.05
    x, w, h = _problem(m + n * 31 + k, m, n, k)
    h_new, aux = mur_h_update(x, w, h, distance_type=dist, lam=lam,
                              bm=bm, bn=bn, interpret=True)
    if dist == "eu":
        want = h * (w.T @ x) / ((w.T @ w) @ h + lam * h + EPS)
        np.testing.assert_allclose(np.asarray(aux), np.asarray(w.T @ x),
                                   rtol=3e-4, atol=3e-5)
    else:
        r = x / (w @ h + EPS)
        c = h * (w.T @ r)
        d = jnp.sum(w, axis=0)[:, None]
        want = 2.0 * c / (d + jnp.sqrt(d * d + 4.0 * lam * c))
    np.testing.assert_allclose(np.asarray(h_new), np.asarray(want),
                               rtol=3e-4, atol=3e-5)


# (m, n, k, bm): full-m strip, multi-strip, bf16-legal strips
ITER_EU_SHAPES = [
    (32, 128, 8, 32),     # single strip
    (64, 128, 8, 16),     # 4 strips
    (96, 256, 16, 32),    # 3 strips
    (128, 384, 12, 64),   # k % 8 != 0
    (48, 128, 24, 16),
    (256, 128, 8, 128),   # the hardware bm=128 layout
]


@pytest.mark.parametrize("xdtype", ["f32", "bf16"])
@pytest.mark.parametrize("shape", ITER_EU_SHAPES,
                         ids=[f"{m}x{n}x{k}bm{bm}"
                              for m, n, k, bm in ITER_EU_SHAPES])
def test_single_pass_iter_eu_fuzz(shape, xdtype):
    """The single-pass EU iteration kernel incl. the bf16 pre-cast-H^T
    path (round-3 hardware fix) across strip layouts."""
    from tpunmf.ops.mur_fused import mur_iteration_eu

    m, n, k, bm = shape
    lam = 0.1
    x, w, h = _problem(m * 7 + n + k, m, n, k)
    if xdtype == "bf16":
        x = x.astype(jnp.bfloat16)
    w1, wtx, gw = mur_iteration_eu(x, w, h, lam_w=lam, bm=bm, interpret=True)
    xf = np.asarray(x.astype(jnp.float32))
    # mirror the kernel's compute dtypes: numerator GEMM consumes the
    # x-dtype H^T copy
    ht = np.asarray(h.T.astype(x.dtype).astype(jnp.float32))
    w_ref = np.asarray(w) * (xf @ ht) / (
        np.asarray(w @ (h @ h.T)) + lam * np.asarray(w) + EPS)
    tol = dict(rtol=2e-2, atol=2e-3) if xdtype == "bf16" else \
        dict(rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(w1), w_ref, **tol)
    # wtx accumulates across strips in f32; its GEMM consumes the
    # x-dtype cast of w_new
    wtx_ref = w_ref.astype(np.asarray(x).dtype).astype(np.float32).T @ xf
    np.testing.assert_allclose(np.asarray(wtx), wtx_ref, **tol)
    np.testing.assert_allclose(np.asarray(gw), w_ref.T @ w_ref, **tol)


ITER_KL_SHAPES = [
    (32, 128, 8, 32, None),
    (64, 256, 8, 16, None),
    (64, 256, 8, 16, 128),    # column-subblocked
    (96, 384, 16, 32, 128),
    (48, 128, 12, 16, None),  # k % 8 != 0
]


@pytest.mark.parametrize("shape", ITER_KL_SHAPES,
                         ids=[f"{m}x{n}x{k}bm{bm}bs{bs}"
                              for m, n, k, bm, bs in ITER_KL_SHAPES])
def test_single_pass_iter_kl_fuzz(shape):
    from tpunmf.ops.mur_fused import mur_iteration_kl

    m, n, k, bm, bs = shape
    lam = 0.2
    x, w, h = _problem(m + n + k * 13, m, n, k, zeros=True)
    w1, wtr, obj = mur_iteration_kl(x, w, h, lam_w=lam, bm=bm, bs=bs,
                                    interpret=True)
    xn, wn, hn = map(np.asarray, (x, w, h))
    wh = wn @ hn
    a = wn * ((xn / (wh + EPS)) @ hn.T)
    b = np.sum(hn, axis=1)[None, :]
    w_ref = 2.0 * a / (b + np.sqrt(b * b + 4.0 * lam * a))
    np.testing.assert_allclose(np.asarray(w1), w_ref, rtol=3e-4, atol=3e-5)
    wtr_ref = w_ref.T @ (xn / (w_ref @ hn + EPS))
    np.testing.assert_allclose(np.asarray(wtr), wtr_ref, rtol=3e-4, atol=3e-5)
    with np.errstate(divide="ignore", invalid="ignore"):
        val = xn * np.log(xn / wh)
    val[~np.isfinite(val)] = 0.0
    obj_ref = np.sum(val - xn + wh)
    np.testing.assert_allclose(float(obj), obj_ref, rtol=1e-3, atol=1e-3)


MASKED_SHAPES = [
    (8, 128, 4, 8, 128),
    (32, 256, 8, 16, 128),
    (24, 384, 12, 8, 128),
    (64, 128, 16, 32, 128),
]


@pytest.mark.parametrize("mask_dtype", ["f32", "int8"])
@pytest.mark.parametrize("dist", ["eu", "kl"])
@pytest.mark.parametrize("shape", MASKED_SHAPES,
                         ids=[f"{m}x{n}x{k}" for m, n, k, _, _ in MASKED_SHAPES])
def test_masked_updates_fuzz(shape, dist, mask_dtype):
    """Masked W/H kernels with binary masks riding as int8 (the
    round-3 DMA-bytes fix) and real-valued f32 weight masks."""
    from tpunmf.ops.masked_fused import masked_h_update, masked_w_update

    m, n, k, bm, bn = shape
    lam = 0.05
    rng = np.random.default_rng(m * 31 + n + k)
    x, w, h = _problem(m + n + k, m, n, k)
    mask_np = (rng.random((m, n)) < 0.6).astype(np.float32)
    mask_np[min(3, m - 1), :] = 0.0  # cold row
    if mask_dtype == "f32" and dist == "eu":
        mask_np *= (0.5 + rng.random((m, n))).astype(np.float32)  # weights
    mask = jnp.asarray(mask_np.astype(
        np.int8 if mask_dtype == "int8" else np.float32))
    mf = jnp.asarray(mask_np if mask_dtype == "f32"
                     else mask_np.astype(np.int8).astype(np.float32))

    got_w = masked_w_update(x, mask, w, h, distance_type=dist, lam=lam,
                            bm=bm, bn=bn, interpret=True)
    if dist == "eu":
        want_w = w * ((mf * x) @ h.T) / ((mf * (w @ h)) @ h.T + lam * w + EPS)
    else:
        r = mf * x / (w @ h + EPS)
        a = w * (r @ h.T)
        b = mf @ h.T
        den = b + jnp.sqrt(b * b + 4.0 * lam * a)
        want_w = jnp.where(den > 0, 2.0 * a / jnp.where(den > 0, den, 1.0), w)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=3e-4, atol=3e-5)

    got_h = masked_h_update(x, mask, got_w, h, distance_type=dist, lam=lam,
                            bm=bm, bn=bn, interpret=True)
    wn = got_w
    if dist == "eu":
        want_h = h * (wn.T @ (mf * x)) / (
            wn.T @ (mf * (wn @ h)) + lam * h + EPS)
    else:
        r = mf * x / (wn @ h + EPS)
        c = h * (wn.T @ r)
        d = wn.T @ mf
        den = d + jnp.sqrt(d * d + 4.0 * lam * c)
        want_h = jnp.where(den > 0, 2.0 * c / jnp.where(den > 0, den, 1.0), h)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=3e-4, atol=3e-5)


HALS_SHAPES = [
    (32, 128, 8, 32),
    (64, 256, 8, 16),
    (96, 128, 16, 32),
    (64, 384, 24, 16),
]


@pytest.mark.parametrize("nsweeps", [1, 2])
@pytest.mark.parametrize("shape", HALS_SHAPES,
                         ids=[f"{m}x{n}x{k}" for m, n, k, _ in HALS_SHAPES])
def test_hals_single_pass_fuzz(shape, nsweeps):
    from tpunmf.ops.hals_sweep import hals_iteration_eu
    from tpunmf.solvers.hals import _hals_sweep_w

    m, n, k, bm = shape
    lam = 0.05
    x, w, h = _problem(m * 3 + n + k, m, n, k)
    xht = (x @ h.T).astype(jnp.float32)
    hht = (h @ h.T).astype(jnp.float32)
    want_w = w
    for _ in range(nsweeps):
        want_w = _hals_sweep_w(want_w, xht, hht, lam)
    got_w, got_wtx, got_gw = hals_iteration_eu(
        x, w, h, lam_w=lam, nsweeps=nsweeps, bm=bm, interpret=True)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_wtx),
                               np.asarray(want_w.T @ x), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_gw),
                               np.asarray(want_w.T @ want_w),
                               rtol=3e-4, atol=3e-4)


GS_SHAPES = [(16, 8, 16), (32, 8, 8), (64, 16, 32), (48, 24, 16)]


@pytest.mark.parametrize("unrolled", [True, False])
@pytest.mark.parametrize("shape", GS_SHAPES,
                         ids=[f"n{n}k{k}bm{bm}" for n, k, bm in GS_SHAPES])
def test_gs_sweep_fuzz(shape, unrolled):
    from tpunmf.ops.hals_sweep import gs_sweep
    from tpunmf.solvers.hals import _hals_sweep_h

    n, k, bm = shape
    m = 40
    x, w, h = _problem(n * 5 + k, m, n, k)
    wtx = (w.T @ x).astype(jnp.float32)
    wtw = (w.T @ w).astype(jnp.float32)
    want = _hals_sweep_h(h, wtx, wtw, 0.1)
    got = gs_sweep(wtx, wtw, h, lam=0.1, nsweeps=1, bm=bm,
                   interpret=True, unrolled=unrolled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fuzz_combo_count():
    """The tier sweeps >= 50 distinct shape combinations (VERDICT r3)."""
    count = (len(TWO_PASS_SHAPES) * 2 * 2      # w_update: dist x lam
             + 6 * 2                           # h_update: dist
             + len(ITER_EU_SHAPES) * 2         # dtype
             + len(ITER_KL_SHAPES)
             + len(MASKED_SHAPES) * 2 * 2      # dist x mask dtype
             + len(HALS_SHAPES) * 2            # nsweeps
             + len(GS_SHAPES) * 2)             # unrolled
    assert count >= 50, count


# (b, n, dtype): single-tile, exact-multiple, ragged tails just above
# and below tile boundaries, odd batches, bf16 — the blockmax+relayout
# kernel behind the serving exact top-k (ops/topk_select.py)
BLOCKMAX_SHAPES = [
    (1, 16384, "f32"),       # exactly one (128*128) tile, b=1
    (4, 16383, "f32"),       # one short of a tile
    (4, 16385, "f32"),       # one past a tile
    (3, 32768, "f32"),       # 2 exact tiles, odd batch
    (7, 50000, "f32"),       # ragged mid-tile tail
    (8, 131072, "bf16"),     # 8 exact tiles bf16
    (5, 99999, "bf16"),      # ragged bf16
]


@pytest.mark.parametrize("shape", BLOCKMAX_SHAPES,
                         ids=[f"{b}x{n}-{d}" for b, n, d in BLOCKMAX_SHAPES])
def test_blockmax_relayout_fuzz(shape):
    from tpunmf.ops.topk_select import (blockmax_relayout,
                                        blockmax_relayout_jnp)

    b, n, d = shape
    dtype = jnp.bfloat16 if d == "bf16" else jnp.float32
    rng = np.random.default_rng(b * 100000 + n)
    s = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)).astype(dtype)
    bm_k, s3_k = blockmax_relayout(s, interpret=True)
    bm_j, s3_j = blockmax_relayout_jnp(s)
    np.testing.assert_array_equal(np.asarray(bm_k, np.float32),
                                  np.asarray(bm_j, np.float32))
    np.testing.assert_array_equal(np.asarray(s3_k, np.float32),
                                  np.asarray(s3_j, np.float32))
    # tail fill is finfo.min, never -inf (0 * -inf NaN-poisons consumers)
    pad = s3_k.shape[1] * s3_k.shape[2] - n
    if pad:
        tail = np.asarray(s3_k, np.float32).reshape(b, -1)[:, n:]
        assert np.all(tail == float(jnp.finfo(dtype).min))
