"""int8-quantized X experiment for the single-pass EU iteration.

X is stored as int8 (symmetric per-matrix scale s = max|x|/127); the
kernel dequantizes each strip in VMEM registers and the factors stay
f32.  Quarter the X traffic of f32, half of bf16.  Measures speed and
the quantization's effect on the converged objective.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpunmf.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9


def _iter_eu_int8_kernel(x_ref, h_ref, w_ref, gh_ref, s_ref, w_out_ref,
                         wtx_ref, gw_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        wtx_ref[:] = jnp.zeros_like(wtx_ref)
        gw_ref[:] = jnp.zeros_like(gw_ref)

    s = s_ref[0, 0]
    xb = x_ref[:].astype(jnp.bfloat16)               # int8 -> bf16 (exact)
    numer = jnp.dot(xb, h_ref[:].T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * s
    w = w_ref[:]
    denom = jnp.dot(w, gh_ref[:], preferred_element_type=jnp.float32)
    w_new = w * numer / (denom + _EPS)
    w_out_ref[:] = w_new
    wtx_ref[:] += jnp.dot(w_new.T.astype(jnp.bfloat16), xb,
                          preferred_element_type=jnp.float32)
    gw_ref[:] += jnp.dot(w_new.T, w_new, preferred_element_type=jnp.float32)


def iter_eu_int8(xq, scale, w, h, bm):
    m, n = xq.shape
    k = w.shape[1]
    gh = h @ h.T
    s_arr = jnp.reshape(scale.astype(jnp.float32), (1, 1))
    w_new, wtx_q, gw = pl.pallas_call(
        _iter_eu_int8_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(xq, h, w, gh, s_arr)
    return w_new, wtx_q * scale, gw


def make_run(bm):
    @jax.jit
    def run(xq, scale, w, h, iters):
        def body(t, c):
            w, h = c
            w, wtx, gw = iter_eu_int8(xq, scale, w, h, bm)
            h = h * wtx / (gw @ h + _EPS)
            return (w, h)
        w, h = jax.lax.fori_loop(0, iters, body, (w, h))
        return w, h, jnp.sum(w[0]) + jnp.sum(h[:, 0])

    return run


if __name__ == "__main__":
    from tpunmf.ops.mur_fused import iter_eu_tileable, mur_iteration_eu

    m = n = 8192
    k = 128
    key = jax.random.PRNGKey(0)
    kw_, kh_ = jax.random.split(key)
    w0 = jax.random.uniform(kw_, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh_, (k, n), dtype=jnp.float32)
    x = w0 @ h0 + 0.05
    scale = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)

    iters = 30
    for bm in (128, 256):
        run = make_run(bm)
        _, _, o = run(xq, scale, w0, h0, 2)
        float(o)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, o = run(xq, scale, w0, h0, iters)
            float(o)
            best = min(best, time.perf_counter() - t0)
        print(f"int8 single-pass bm={bm}: {best/iters*1e3:.3f} ms/iter "
              f"({iters/best:.1f} it/s)", flush=True)

    # accuracy: 30 iterations int8 vs f32 exact objective
    wq, hq, _ = make_run(128)(xq, scale, w0, h0, 30)
    obj_q = float(0.5 * jnp.sum((x - wq @ hq) ** 2))

    @jax.jit
    def run_f32(x, w, h, iters):
        bm = iter_eu_tileable(x, k)

        def body(t, c):
            w, h = c
            w, wtx, gw = mur_iteration_eu(x, w, h, lam_w=0.0, bm=bm)
            h = h * wtx / (gw @ h + _EPS)
            return (w, h)
        return jax.lax.fori_loop(0, iters, body, (w, h))

    wf, hf = run_f32(x, w0, h0, 30)
    obj_f = float(0.5 * jnp.sum((x - wf @ hf) ** 2))
    print(f"objective after 30 iters: int8 {obj_q:.6e} vs f32 {obj_f:.6e} "
          f"(rel dev {(obj_q-obj_f)/obj_f:+.3%})", flush=True)
