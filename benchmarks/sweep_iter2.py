"""Single-pass iteration kernel variants: hoisted bf16 H^T, folded
H-update, MXU-peak probe."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9


# V1: X strip + precomputed bf16 H^T (no per-step cast/transpose)
def _v1_kernel(x_ref, ht_ref, w_ref, gh_ref, w_out_ref, wtx_ref, gw_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        wtx_ref[:] = jnp.zeros_like(wtx_ref)
        gw_ref[:] = jnp.zeros_like(gw_ref)

    xb = x_ref[:]
    numer = jnp.dot(xb, ht_ref[:], preferred_element_type=jnp.float32)
    w = w_ref[:]
    denom = jnp.dot(w, gh_ref[:], preferred_element_type=jnp.float32)
    w_new = w * numer / (denom + _EPS)
    w_out_ref[:] = w_new
    wtx_ref[:] += jnp.dot(w_new.T.astype(xb.dtype), xb,
                          preferred_element_type=jnp.float32)
    gw_ref[:] += jnp.dot(w_new.T, w_new, preferred_element_type=jnp.float32)


def v1_iter(x, w, h, bm):
    m, n = x.shape
    k = w.shape[1]
    gh = h @ h.T
    ht = h.T.astype(x.dtype)
    return pl.pallas_call(
        _v1_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(x, ht, w, gh)


# V2: V1 + H update folded into the last grid step
def _v2_kernel(x_ref, ht_ref, h_ref, w_ref, gh_ref, w_out_ref, h_out_ref,
               wtx_ref, gw_ref, *, ni):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        wtx_ref[:] = jnp.zeros_like(wtx_ref)
        gw_ref[:] = jnp.zeros_like(gw_ref)

    xb = x_ref[:]
    numer = jnp.dot(xb, ht_ref[:], preferred_element_type=jnp.float32)
    w = w_ref[:]
    denom = jnp.dot(w, gh_ref[:], preferred_element_type=jnp.float32)
    w_new = w * numer / (denom + _EPS)
    w_out_ref[:] = w_new
    wtx_ref[:] += jnp.dot(w_new.T.astype(xb.dtype), xb,
                          preferred_element_type=jnp.float32)
    gw_ref[:] += jnp.dot(w_new.T, w_new, preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        h = h_ref[:]
        hd = jnp.dot(gw_ref[:], h, preferred_element_type=jnp.float32)
        h_out_ref[:] = h * wtx_ref[:] / (hd + _EPS)


def v2_iter(x, w, h, bm):
    m, n = x.shape
    k = w.shape[1]
    gh = h @ h.T
    ht = h.T.astype(x.dtype)
    kern = functools.partial(_v2_kernel, ni=m // bm)
    return pl.pallas_call(
        kern,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
        ),
    )(x, ht, h, w, gh)


def bench(fn, x, w0, h0, iters=30, reps=3):
    float(fn(x, w0, h0, 2))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x, w0, h0, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def make_v1(bm):
    @jax.jit
    def run(x, w, h, iters):
        def body(t, c):
            w, h = c
            w, wtx, gw = v1_iter(x, w, h, bm)
            h = h * wtx / (gw @ h + _EPS)
            return (w, h)
        w, h = jax.lax.fori_loop(0, iters, body, (w, h))
        return jnp.sum(w[0]) + jnp.sum(h[:, 0])
    return run


def make_v2(bm):
    @jax.jit
    def run(x, w, h, iters):
        def body(t, c):
            w, h = c
            w, h, wtx, gw = v2_iter(x, w, h, bm)
            return (w, h)
        w, h = jax.lax.fori_loop(0, iters, body, (w, h))
        return jnp.sum(w[0]) + jnp.sum(h[:, 0])
    return run


if __name__ == "__main__":
    # correctness on small shapes (interpret off, CPU-incompatible; rely on
    # numeric check against jnp on TPU directly)
    m = n = 8192
    k = 128
    key = jax.random.PRNGKey(0)
    kw_, kh_ = jax.random.split(key)
    w0 = jax.random.uniform(kw_, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh_, (k, n), dtype=jnp.float32)
    x = (w0 @ h0).astype(jnp.bfloat16)

    # numeric spot-check of v1 vs jnp reference (one iteration)
    w1, wtx, gw = v1_iter(x, w0, h0, 128)
    xf = x.astype(jnp.float32)
    wr = w0 * (xf @ h0.T.astype(jnp.float32)) / (w0 @ (h0 @ h0.T) + _EPS)
    rel = float(jnp.max(jnp.abs(w1 - wr)) / jnp.max(wr))
    print("v1 w rel err vs jnp:", rel)

    for bm in (128, 256, 512):
        try:
            t = bench(make_v1(bm), x, w0, h0)
            print(f"v1 bm={bm}: {t*1e3:.3f} ms  {1/t:.1f} it/s")
        except Exception as e:
            print(f"v1 bm={bm} FAILED: {str(e)[:100]}")

    # compute-bound MXU probe: tall-skinny output
    a = jax.random.uniform(key, (2048, 65536), dtype=jnp.float32).astype(jnp.bfloat16)
    b = jax.random.uniform(kh_, (65536, 2048), dtype=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def gp(a, b, iters):
        def body(t, c):
            return 0.5 * c + 0.5 * jnp.dot(a, b, preferred_element_type=jnp.float32)
        return jnp.sum(jax.lax.fori_loop(0, iters, body,
                                         jnp.zeros((2048, 2048)))[0])

    float(gp(a, b, 2))
    t0 = time.perf_counter()
    float(gp(a, b, 10))
    t = (time.perf_counter() - t0) / 10
    print(f"MXU probe (2048x65536x2048 bf16): {t*1e3:.2f} ms -> "
          f"{2*2048*65536*2048/t/1e12:.1f} TFLOP/s")
