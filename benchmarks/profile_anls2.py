"""ANLS attribution by on-device knob sweep (host-side component timing
is impossible through the tunnel — per-dispatch overhead ~35-200 ms).

Runs the full jitted ANLS loop with (max_outer, cg_iters) variants and
compares rate + final objective: how much do the active-set outer steps
and the CG depth actually cost, and how far can they be cut before the
solution quality moves?
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpunmf.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from tpunmf.nnls import nnls_activeset

_EPS = 1e-9


def make_loop(k, max_outer, ulps):
    solve = partial(nnls_activeset, solve_method="cg", max_outer=max_outer,
                    opt_tol_ulps=ulps)

    @jax.jit
    def run(x, w, h, iters):
        eye = jnp.eye(k, dtype=x.dtype)

        def body(t, carry):
            w, h = carry
            ct_c = h @ h.T
            w = solve(ct_c, h @ x.T, w.T > 0).T
            ct_c = w.T @ w
            h = solve(ct_c, w.T @ x, h > 0)
            return (w, h)

        w, h = jax.lax.fori_loop(0, iters, body, (w, h))
        obj = 0.5 * jnp.sum((x - w @ h) ** 2)
        return w, h, obj

    return run


def bench(run, x, w0, h0, iters=10, reps=3):
    _, _, obj = run(x, w0, h0, 2)
    float(obj)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _, _, obj = run(x, w0, h0, iters)
        obj = float(obj)
        best = min(best, time.perf_counter() - t0)
    return best / iters, obj


def main():
    m, n, k = 4096, 2048, 64
    key = jax.random.PRNGKey(0)
    kw_, kh_ = jax.random.split(key)
    w0 = jax.random.uniform(kw_, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh_, (k, n), dtype=jnp.float32)
    x = w0 @ h0 + 0.05

    for mo, ulps in ((330, 100.0), (128, 100.0), (64, 100.0),
                     (330, 1000.0), (330, 10000.0), (64, 1000.0),
                     (16, 1000.0)):
        run = make_loop(k, mo, ulps)
        t, obj = bench(run, x, w0, h0)
        print(f"max_outer={mo:3d} ulps={ulps:7.0f}: {t*1e3:7.1f} ms/iter "
              f"({1/t:6.1f} it/s)  obj={obj:.6e}", flush=True)


if __name__ == "__main__":
    main()
