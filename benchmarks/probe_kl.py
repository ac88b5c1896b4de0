"""Attribute the KL 2-pass roofline gap (round-4 VERDICT item 4).

BENCH_r04 measures the fused lagged-objective KL iteration at ~0.35 of
the HBM roofline while EU reaches ~0.9 at the same shape.  The KL
kernels move the same bytes but add VPU work per X tile: a divide
(x / (wh + eps)), and — in the W pass with the lagged objective — an
elementwise log.  This probe times each kernel pass in isolation at the
headline shape so the gap is attributed by measurement:

  * w_eu     — the bandwidth control (same tiles, no divide/log)
  * w_kl     — + divide
  * w_kl+obj — + log (the production lagged-objective W pass)
  * h_kl     — the H pass (+ divide)

Usage: python benchmarks/probe_kl.py [m n k]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tpunmf.ops.mur_fused import mur_h_update, mur_tileable, mur_w_update  # noqa: E402


def delta_rate(fn, iters=30):
    """Warm delta-timed calls/s: (t_5N - t_N) / 4N over best-of-2."""
    @jax.jit
    def chain(w, it):
        def body(t, acc):
            # each trip consumes the last trip's output (no hoisting/CSE)
            return fn(acc)[:1, :1] * 1e-12 + 1.0

        return jax.lax.fori_loop(0, it, body, w)[0, 0]

    w0 = jnp.ones((1, 1), jnp.float32)

    def wall(it):
        float(chain(w0, it))
        t0 = time.perf_counter()
        float(chain(w0, it))
        return time.perf_counter() - t0

    wall(2)
    t1 = min(wall(iters), wall(iters))
    t5 = min(wall(5 * iters), wall(5 * iters))
    return 4 * iters / max(t5 - t1, 1e-4)


def main():
    m, n, k = 8192, 8192, 128
    if len(sys.argv) > 1:
        m, n, k = map(int, sys.argv[1:4])
    key = jax.random.PRNGKey(0)
    kx, kw_, kh = jax.random.split(key, 3)
    x = (jax.random.uniform(kx, (m, n), dtype=jnp.float32) + 0.05
         ).astype(jnp.bfloat16)
    w = jax.random.uniform(kw_, (m, k), dtype=jnp.float32) + 0.1
    h = jax.random.uniform(kh, (k, n), dtype=jnp.float32) + 0.1
    bm, bn = mur_tileable(x, k)
    print(f"shape {m}x{n}x{k} bf16-X, tile ({bm}, {bn})", flush=True)

    xb = jnp.dtype(x.dtype).itemsize
    pass_bytes = m * n * xb  # X once per pass (factors are noise)
    out = {"shape": [m, n, k], "tile": [bm, bn]}

    cases = {
        "w_eu": lambda ww: mur_w_update(
            x, w * ww[0, 0], h, distance_type="eu", lam=0.0, bm=bm, bn=bn),
        "w_kl": lambda ww: mur_w_update(
            x, w * ww[0, 0], h, distance_type="kl", lam=0.0, bm=bm, bn=bn),
        "w_kl_lagged_obj": lambda ww: mur_w_update(
            x, w * ww[0, 0], h, distance_type="kl", lam=0.0, bm=bm, bn=bn,
            with_lagged_obj=True)[0],
        "h_kl": lambda ww: mur_h_update(
            x, w * ww[0, 0], h, distance_type="kl", lam=0.0, bm=bm,
            bn=bn)[0],
    }
    for name, fn in cases.items():
        r = delta_rate(fn)
        out[name] = {
            "passes_per_s": round(r, 1),
            "x_read_gbps": round(r * pass_bytes / 1e9, 1),
        }
        print(f"{name:16s}: {r:8.1f} passes/s  "
              f"{out[name]['x_read_gbps']:7.1f} GB/s", flush=True)
    print(json.dumps(out))
    with open("benchmarks/kl_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
