"""Block-max + relayout kernel for verified-exact serving top-k.

The serving retrieval (serve/topk.py, the BASELINE "sharded W @ H^T
scoring + top-k kernel" the reference lacks) needs, per score row, the
maxima of contiguous ``sel_block``-wide column blocks AND the scores
re-laid-out as (b, n_blocks, sel_block) so the top blocks can be
gathered along the sublane axis (measured ~0.04 ms for 108 blocks/row
at (64, 1M) — vs 18.6 ms for the same gather against the flat row
layout, and ~3.4 ms for XLA's (b, n) -> (b, nb, sel_block) relayout
that a plain ``reshape`` triggers).

This kernel produces both outputs in ONE streaming pass at HBM speed
(measured 0.69 ms for 256 MB on v5e, ~0.37 ms of which is the
unavoidable read): each grid step reads a (b, LANES*sel_block) strip,
splits the minor axis in VMEM (free), reduces the trailing axis on the
VPU, and DMAs both the (b, LANES) maxima tile and the (b, LANES,
sel_block) relayout tile back out.  A ragged tail is masked in-kernel
to ``finfo.min`` (NOT -inf: downstream consumers may feed the blocks
through arithmetic where ``0 * -inf`` would poison NaNs).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lanes per output tile: the Mosaic lowering requires >= 128 lanes on
# the block-max output block, which fixes the strip width at
# LANES * sel_block columns (16384 for the default sel_block=128 ->
# 4 MB f32 strips at b=64, comfortably double-buffered).
_LANES = 128


# row-tile cap: VMEM windows are 2 * (rb * bn + rb * bn) elements
# (double-buffered in-strip + relayout-out-strip), so the batch axis is
# tiled at 64 rows to keep the f32 budget at 16 MB regardless of b.
# 64 is a multiple of both the f32 (8) and bf16 (16) sublane tile rules.
_ROW_TILE = 64


def _bmax_epilogue(scores, bmax_ref, s3_ref, *, n, bn, sel_block, nt):
    """Shared kernel tail: mask the ragged final strip to finfo.min,
    split the minor axis into sel_block-wide blocks, store the relayout
    and the per-block maxima.  ``scores`` is the (rb, bn) strip already
    in VMEM (a loaded ref for the plain kernel, an MXU result for the
    fused one)."""
    j = pl.program_id(1)
    rb = scores.shape[0]
    lo = jnp.finfo(scores.dtype).min

    @pl.when(j == nt - 1)
    def _():
        # ragged tail: lanes past n are out-of-bounds garbage (reads or
        # products of garbage H columns)
        gcol = j * bn + jax.lax.broadcasted_iota(jnp.int32, (rb, bn), 1)
        x3 = jnp.where(gcol < n, scores, lo).reshape(
            rb, bn // sel_block, sel_block)
        s3_ref[:] = x3
        bmax_ref[:] = jnp.max(x3, -1)

    @pl.when(j != nt - 1)
    def _():
        x3 = scores.reshape(rb, bn // sel_block, sel_block)
        s3_ref[:] = x3
        bmax_ref[:] = jnp.max(x3, -1)


def _bmax_kernel(x_ref, bmax_ref, s3_ref, *, n, bn, sel_block, nt):
    _bmax_epilogue(x_ref[:], bmax_ref, s3_ref, n=n, bn=bn,
                   sel_block=sel_block, nt=nt)


@partial(jax.jit, static_argnames=("sel_block", "interpret"))
def blockmax_relayout(scores, sel_block: int = 128, interpret: bool = False):
    """(b, n) scores -> (block maxima (b, nbp), relayout (b, nbp, sel_block)).

    nbp = ceil(n / (128*sel_block)) * 128 blocks; tail blocks beyond the
    data are filled with ``finfo(dtype).min``.  ``sel_block`` must be a
    multiple of 128 (it becomes the minor tile dim of the relayout).
    Rows are tiled at 64 per grid step, so VMEM residency is independent
    of the batch size (a ragged final row tile is legal: out-of-bounds
    input rows read garbage that flows only to out-of-bounds output
    rows, whose writes Mosaic masks).
    """
    b, n = scores.shape
    if sel_block % 128:
        raise ValueError(f"sel_block {sel_block} must be a multiple of 128")
    bn = _LANES * sel_block
    nt = -(-n // bn)
    nbp = nt * _LANES
    rb = b if b <= _ROW_TILE else _ROW_TILE
    nr = -(-b // rb)
    kern = partial(_bmax_kernel, n=n, bn=bn, sel_block=sel_block, nt=nt)
    return pl.pallas_call(
        kern,
        grid=(nr, nt),
        in_specs=[pl.BlockSpec((rb, bn), lambda i, j: (i, j))],
        out_specs=[
            pl.BlockSpec((rb, _LANES), lambda i, j: (i, j)),
            pl.BlockSpec((rb, _LANES, sel_block), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nbp), scores.dtype),
            jax.ShapeDtypeStruct((b, nbp, sel_block), scores.dtype),
        ],
        # in-strip + relayout-out-strip double buffered = 4 windows of
        # 4 MB (f32, rb=64) plus the maxima tiles: past the default
        # 16 MB scoped budget by the maxima buffers alone, so state it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scores)


def _score_bmax_kernel(w_ref, h_ref, bmax_ref, s3_ref, *, n, bn, sel_block,
                       nt):
    # (rb, r) @ (r, bn) on the MXU with f32 accumulation AND f32 output:
    # emitting the input dtype (bf16) would tie up to ~90 of 1M scores
    # at the selection threshold (8-bit mantissa), which defeats the
    # verified-exact fast path downstream (serve/topk._exact_topk).
    scores = jax.lax.dot_general(
        w_ref[:], h_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    _bmax_epilogue(scores, bmax_ref, s3_ref, n=n, bn=bn,
                   sel_block=sel_block, nt=nt)


# VMEM budget for the fused kernel: double-buffered H strips + relayout
# out strips + the resident W tile.  Kept at the 64 MB the proven
# blockmax kernel uses (a 116 MB limit — close to the chip's 128 MB
# physical VMEM — was in effect when the first on-device run wedged the
# device; conservatively ruled out).  The fits-check reserves headroom
# for the (rb, bn) f32 score intermediate the estimate below does not
# itemize.
_FUSED_VMEM_LIMIT = 64 * 1024 * 1024
_FUSED_FIT_BUDGET = 48 * 1024 * 1024


def score_blockmax_fits(b: int, r: int, h_itemsize: int,
                        sel_block: int = 128) -> bool:
    """Whether the fused scoring kernel's VMEM windows fit the budget."""
    bn = _LANES * sel_block
    rb = min(b, _ROW_TILE)
    need = 2 * (r * bn * h_itemsize        # H strip (double buffered)
                + rb * bn * 4              # s3 out strip (f32)
                + rb * _LANES * 4)         # bmax out tile
    need += rb * r * 4                     # resident W tile
    need += rb * bn * 4                    # (rb, bn) f32 score intermediate
    return need <= _FUSED_FIT_BUDGET


@partial(jax.jit, static_argnames=("sel_block", "interpret"))
def score_blockmax_relayout(w_batch, h, sel_block: int = 128,
                            interpret: bool = False):
    """Fused serving scoring + block-max + relayout: ONE pass over H.

    Computes ``scores = w_batch @ h`` (f32 accumulation and output
    regardless of input dtype) and emits the same (block maxima,
    (b, nbp, sel_block) relayout) pair as :func:`blockmax_relayout` —
    without ever materializing the (b, n) score matrix in HBM.  At
    (64, 1M) r128 bf16-H that cuts the scoring+selection HBM traffic
    from ~1 GB (H + scores written + scores re-read + relayout written)
    to ~0.5 GB (H read + relayout written).  That traffic model holds
    for b <= 64 (one row tile); larger batches re-stream all of H once
    per 64-row tile — ceil(b/64) H reads — so size serving batches at
    64 rows when H dominates the byte budget.

    ``w_batch`` should already be in the dtype you want the MXU to read
    (cast it to ``h.dtype`` for a quantized stage).  Output is always
    f32.  Callers must check :func:`score_blockmax_fits` first — very
    large ranks overflow the VMEM window budget (fall back to the
    unfused matmul + :func:`blockmax_relayout` compose).
    """
    b, r = w_batch.shape
    r2, n = h.shape
    assert r == r2, (w_batch.shape, h.shape)
    if sel_block % 128:
        raise ValueError(f"sel_block {sel_block} must be a multiple of 128")
    bn = _LANES * sel_block
    nt = -(-n // bn)
    nbp = nt * _LANES
    rb = b if b <= _ROW_TILE else _ROW_TILE
    nr = -(-b // rb)
    kern = partial(_score_bmax_kernel, n=n, bn=bn, sel_block=sel_block, nt=nt)
    return pl.pallas_call(
        kern,
        grid=(nr, nt),
        in_specs=[
            pl.BlockSpec((rb, r), lambda i, j: (i, 0)),
            pl.BlockSpec((r, bn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((rb, _LANES), lambda i, j: (i, j)),
            pl.BlockSpec((rb, _LANES, sel_block), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nbp), jnp.float32),
            jax.ShapeDtypeStruct((b, nbp, sel_block), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=interpret,
    )(w_batch, h)


def score_blockmax_relayout_jnp(w_batch, h, sel_block: int = 128):
    """Pure-XLA producer with identical output semantics (CPU / fallback)."""
    scores = jnp.matmul(w_batch, h, preferred_element_type=jnp.float32)
    return blockmax_relayout_jnp(scores, sel_block)


def blockmax_relayout_jnp(scores, sel_block: int = 128):
    """Pure-XLA reference/CPU producer with identical output semantics.

    On TPU the reshape below is a full relayout (~3.4 ms at (64, 1M) —
    the reason the Pallas kernel exists); on CPU it is a cheap copy.
    """
    b, n = scores.shape
    bn = _LANES * sel_block
    nbp = -(-n // bn) * _LANES
    pad = nbp * sel_block - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((b, pad), jnp.finfo(scores.dtype).min,
                              scores.dtype)], axis=1)
    s3 = scores.reshape(b, nbp, sel_block)
    return jnp.max(s3, -1), s3
