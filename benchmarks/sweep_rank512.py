"""Round-4 probe: compute-bound MUR at rank 512 — MFU vs measured MXU peak.

BASELINE.json's ">=70% of MXU peak" target is memory-bound-impossible at
rank 128 (crossover k~480, docs/PERF.md); this sweep runs the SAME
production solver block at rank 512 where the iteration is compute-bound
and reports achieved TFLOP/s / measured-MXU-probe TFLOP/s (MFU).

Run on the real chip:  python benchmarks/sweep_rank512.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import bench_mur_eu  # noqa: E402


def delta_time(fn, i1, i2):
    float(fn(i1))
    float(fn(i2))

    def wall(it):
        t0 = time.perf_counter()
        float(fn(it))
        return time.perf_counter() - t0

    t1 = min(wall(i1), wall(i1))
    t2 = min(wall(i2), wall(i2))
    return max(t2 - t1, 1e-4) / (i2 - i1)


def mxu_probe(m=4096, n=4096, k=4096, dtype=jnp.bfloat16):
    """Measured bf16 MXU ceiling: plain XLA GEMM chained through a
    fori_loop (each trip depends on the last so nothing is hoisted)."""
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)

    @jax.jit
    def run(a, it):
        def body(t, c):
            return jnp.dot(c, b, preferred_element_type=jnp.float32
                           ).astype(dtype) * 1e-3

        return jax.lax.fori_loop(0, it, body, a)[0, 0]

    t = delta_time(lambda it: run(a, it), 5, 30)
    return 2 * m * n * k / t


def main():
    print("device:", jax.devices()[0].device_kind)
    peak = mxu_probe()
    print(f"MXU probe (bf16 4096^3): {peak/1e12:.1f} TFLOP/s")
    peak_f32 = mxu_probe(dtype=jnp.float32)
    print(f"MXU probe (f32 4096^3):  {peak_f32/1e12:.1f} TFLOP/s")

    shapes = [
        (8192, 2048, 512),
        (16384, 2048, 512),
        (4096, 4096, 512),
        (8192, 4096, 512),
        (8192, 8192, 512),
        (8192, 2048, 1024),
    ]
    results = {}
    for (m, n, k) in shapes:
        try:
            r = bench_mur_eu(m=m, n=n, k=k, iters=20,
                             data_dtype=jnp.bfloat16)
            tf = r["gflops_per_chip"] / 1e3
            mfu = r["gflops_per_chip"] * 1e9 / peak
            results[f"{m}x{n}x{k}"] = {
                "it_per_s": round(r["iters_per_sec"], 1),
                "tflops": round(tf, 1),
                "mfu_vs_probe": round(mfu, 3),
                "single_pass": r["single_pass"],
            }
            print(f"{m}x{n}x{k}: {r['iters_per_sec']:.1f} it/s, "
                  f"{tf:.1f} TFLOP/s, MFU {mfu:.3f} "
                  f"(single_pass={r['single_pass']})")
        except Exception as e:
            results[f"{m}x{n}x{k}"] = {"error": str(e)[:200]}
            print(f"{m}x{n}x{k}: ERROR {str(e)[:200]}")
    out = {"mxu_probe_tflops_bf16": round(peak / 1e12, 1),
           "mxu_probe_tflops_f32": round(peak_f32 / 1e12, 1),
           "shapes": results}
    with open("/root/repo/benchmarks/rank512_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
