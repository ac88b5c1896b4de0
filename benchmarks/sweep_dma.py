"""Measure the manual-DMA single-pass EU kernel vs the auto-pipelined
one on TPU hardware, and check numerical equivalence.

Usage: python benchmarks/sweep_dma.py [--m 8192] [--n 8192] [--k 128]
       [--iters 50] [--dtype f32|bf16] [--bm 0 (auto)]

Prints one JSON line per variant.  Run serialized (one TPU process).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--bm", type=int, default=0)
    ap.add_argument("--variants", default="auto,dma")
    args = ap.parse_args()

    from tpunmf.ops.mur_fused import (
        iter_eu_dma_tileable,
        iter_eu_tileable,
        mur_iteration_eu,
        mur_iteration_eu_dma,
    )
    from tpunmf.utils import enable_compilation_cache

    enable_compilation_cache()
    m, n, k = args.m, args.n, args.k
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    kx, kw, kh = jax.random.split(key, 3)
    w0 = jax.random.uniform(kw, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh, (k, n), dtype=jnp.float32)
    x = (w0 @ h0 + 0.01 * jax.random.uniform(kx, (m, n))).astype(dtype)
    float(jnp.sum(w0))  # materialize

    import functools

    # bm and iters MUST be static: mur_iteration_eu validates `m % bm`
    # with Python control flow at trace time (a traced bm would raise
    # TracerBoolConversionError before anything runs)
    @functools.partial(jax.jit, static_argnames=("iters", "bm"))
    def run_auto(x, w, h, iters, bm):
        def body(t, c):
            w, h = c
            w, wtx, gw = mur_iteration_eu(x, w, h, lam_w=0.0, bm=bm)
            h = h * wtx / (gw @ h + 1e-9)
            return (w, h)
        return jax.lax.fori_loop(0, iters, body, (w, h))

    @functools.partial(jax.jit, static_argnames=("iters", "bm"))
    def run_dma(x, w, h, iters, bm):
        def body(t, c):
            w, h = c
            w, wtx, gw = mur_iteration_eu_dma(x, w, h, lam_w=0.0, bm=bm)
            h = h * wtx / (gw @ h + 1e-9)
            return (w, h)
        return jax.lax.fori_loop(0, iters, body, (w, h))

    runners = {
        "auto": (iter_eu_tileable(x, k),
                 lambda bm: functools.partial(run_auto, bm=bm)),
        "dma": (iter_eu_dma_tileable(x, k),
                lambda bm: functools.partial(run_dma, bm=bm)),
    }

    results = {}
    for name in args.variants.split(","):
        bm_auto, make = runners[name]
        bm = args.bm or bm_auto
        if bm is None:
            print(json.dumps({"variant": name, "error": "not tileable"}))
            continue
        fn = make(bm)

        def timed(n_it):
            t0 = time.perf_counter()
            w, h = fn(x, w0, h0, n_it)
            s = float(jnp.sum(h))  # host fetch = true completion
            return time.perf_counter() - t0, w, h, s

        # two-point delta timing: the per-call fixed cost (host dispatch
        # round-trip through the axon tunnel, ~10-15 ms) is ~30% of a
        # 50-iteration call, so rate the (iters vs 5*iters) DELTA instead
        timed(args.iters)          # compile + warm short count
        timed(5 * args.iters)      # compile long count
        t1 = min(timed(args.iters)[0], timed(args.iters)[0])
        t2, w, h, s = timed(5 * args.iters)
        it_s = 4 * args.iters / max(t2 - t1, 1e-3)
        xb = jnp.dtype(dtype).itemsize
        bytes_iter = m * n * xb + (4 * m * k + 4 * k * n) * 4
        results[name] = (w, h)
        print(json.dumps({
            "variant": name, "bm": bm, "dtype": args.dtype,
            "iters_per_sec": round(it_s, 2),
            "achieved_gbps_required_traffic": round(bytes_iter * it_s / 1e9, 1),
            "checksum": s,
        }))

    if len(results) == 2:
        wa, ha = results["auto"]
        wd, hd = results["dma"]
        dw = float(jnp.max(jnp.abs(wa - wd)) / (jnp.max(jnp.abs(wa)) + 1e-30))
        dh = float(jnp.max(jnp.abs(ha - hd)) / (jnp.max(jnp.abs(ha)) + 1e-30))
        print(json.dumps({"equivalence_rel_max": {"w": dw, "h": dh}}))


if __name__ == "__main__":
    main()
