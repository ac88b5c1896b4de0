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


def _bmax_kernel(x_ref, bmax_ref, s3_ref, *, n, bn, sel_block, nt):
    j = pl.program_id(1)
    rb = x_ref.shape[0]
    lo = jnp.finfo(x_ref.dtype).min

    @pl.when(j == nt - 1)
    def _():
        # ragged tail: lanes past n are out-of-bounds garbage reads
        gcol = j * bn + jax.lax.broadcasted_iota(jnp.int32, (rb, bn), 1)
        x3 = jnp.where(gcol < n, x_ref[:], lo).reshape(
            rb, bn // sel_block, sel_block)
        s3_ref[:] = x3
        bmax_ref[:] = jnp.max(x3, -1)

    @pl.when(j != nt - 1)
    def _():
        x3 = x_ref[:].reshape(rb, bn // sel_block, sel_block)
        s3_ref[:] = x3
        bmax_ref[:] = jnp.max(x3, -1)


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
