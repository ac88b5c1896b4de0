"""TPU sweep: dimension_semantics x tile shapes x data dtype for the
fused MUR iteration.  Timing via host-fetch of a scalar (axon tunnel:
block_until_ready can return at dispatch)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpunmf.ops.mur_fused import mur_h_update, mur_w_update


def make_iter(m, n, k, bm, bn, dtype, semantics):
    @jax.jit
    def run(x, w, h, iters):
        def body(t, carry):
            w, h = carry
            w = mur_w_update(x, w, h, distance_type="eu", lam=0.0, bm=bm,
                            bn=bn, dimension_semantics=semantics)
            h, _ = mur_h_update(x, w, h, distance_type="eu", lam=0.0, bm=bm,
                               bn=bn, dimension_semantics=semantics)
            return (w, h)
        w, h = jax.lax.fori_loop(0, iters, body, (w, h))
        return jnp.sum(w[0]) + jnp.sum(h[:, 0])

    return run


def bench(m=8192, n=8192, k=128, iters=30, bm=256, bn=1024,
          dtype=jnp.float32, semantics=None, reps=3):
    key = jax.random.PRNGKey(0)
    kx, kw, kh = jax.random.split(key, 3)
    w0 = jax.random.uniform(kw, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh, (k, n), dtype=jnp.float32)
    x = (w0 @ h0).astype(dtype)
    run = make_iter(m, n, k, bm, bn, dtype, semantics)
    float(run(x, w0, h0, 2))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, w0, h0, iters))
        best = min(best, time.perf_counter() - t0)
    t_it = best / iters
    return t_it


if __name__ == "__main__":
    from jax.experimental.pallas import tpu as pltpu

    PAR = pltpu.GridDimensionSemantics.PARALLEL
    ARB = pltpu.GridDimensionSemantics.ARBITRARY
    cfgs = [
        ("f32 base (256,1024)", dict()),
        ("f32 par/arb", dict(semantics=(PAR, ARB))),
        ("f32 arb/arb", dict(semantics=(ARB, ARB))),
        ("bf16 base", dict(dtype=jnp.bfloat16)),
        ("bf16 par/arb", dict(dtype=jnp.bfloat16, semantics=(PAR, ARB))),
        ("bf16 (512,1024)", dict(dtype=jnp.bfloat16, bm=512)),
        ("bf16 (256,2048)", dict(dtype=jnp.bfloat16, bn=2048)),
        ("bf16 (512,2048)", dict(dtype=jnp.bfloat16, bm=512, bn=2048)),
        ("bf16 (1024,1024)", dict(dtype=jnp.bfloat16, bm=1024)),
        ("bf16 par/arb (512,2048)", dict(dtype=jnp.bfloat16, bm=512, bn=2048,
                                         semantics=(PAR, ARB))),
    ]
    for name, kw in cfgs:
        try:
            t = bench(**kw)
            print(f"{name:28s} t_iter = {t*1e3:7.3f} ms   it/s = {1/t:7.1f}")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
