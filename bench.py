"""Benchmark: MUR iterations/sec and GFLOPS/chip at rank 128 (BASELINE.json).

Runs the flagship fused Euclidean-MUR iteration loop on one chip at
8192 x 8192 rank 128 (f32 storage; TPU MXU executes matmuls at bf16-input
rate under the default precision), measures steady-state iterations/sec,
and reports achieved GFLOP/s against the chip's bf16 peak.

Per-iteration FLOPs of this implementation: 3 fused GEMM passes over the
m x n data (X@H^T, W^T@X, fused residual objective) = 6*m*n*k, plus
O((m+n)k^2) Gram work.  (The reference's loop structure does ~10 m*n*k;
we report OUR flops, not the reference-equivalent count.)

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline = achieved / (0.70 * chip peak): >= 1.0 means the
BASELINE.json ">=70% of matmul peak" target is met.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# chip bf16 peak FLOP/s by device_kind substring
_PEAKS = {
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6 lite": 918e12,  # v6e / Trillium
    "v6e": 918e12,
}


def _chip_peak() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in _PEAKS.items():
        if key in kind:
            return val
    return 197e12  # assume v5e-class


def bench_mur_eu(m=8192, n=8192, k=128, iters=50, warmup=True):
    from tpunmf.ops.fused import eu_residual_obj
    from tpunmf.solvers.common import init_carry, while_block

    use_pallas = jax.default_backend() == "tpu"
    eps = 1e-9

    key = jax.random.PRNGKey(0)
    kx, kw, kh = jax.random.split(key, 3)
    w0 = jax.random.uniform(kw, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh, (k, n), dtype=jnp.float32)
    x = w0 @ h0 + 0.01 * jax.random.uniform(kx, (m, n), dtype=jnp.float32)
    x = jax.block_until_ready(x)

    def step(inner, i):
        w, h = inner
        gram_h = h @ h.T
        w = w * (x @ h.T) / (w @ gram_h + eps)
        wtx = w.T @ x
        gram_w = w.T @ w
        h = h * wtx / (gram_w @ h + eps)
        obj = eu_residual_obj(x, w, h, use_pallas=use_pallas)
        return (w, h), obj

    @jax.jit
    def run(carry, stop_i):
        return while_block(step, carry, stop_i, 0.0, 0.0,
                           min_iter=iters + 1, max_iter=iters + 1)

    obj0 = jnp.asarray(0.0, dtype=jnp.float32)
    carry = init_carry(obj0, iters + 1, (w0, h0))

    if warmup:
        jax.block_until_ready(run(carry, 2))

    carry = init_carry(obj0, iters + 1, (w0, h0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(carry, iters))
    dt = time.perf_counter() - t0

    assert int(out.i) == iters
    iters_per_sec = iters / dt
    flops_per_iter = 6 * m * n * k + 4 * (m + n) * k * k
    gflops = flops_per_iter * iters_per_sec / 1e9
    return {
        "iters_per_sec": iters_per_sec,
        "gflops_per_chip": gflops,
        "final_obj": float(out.obj),
        "m": m, "n": n, "k": k, "iters": iters,
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
    }


def main():
    peak = _chip_peak()
    r = bench_mur_eu()
    target = 0.70 * peak
    print(json.dumps({
        "metric": "mur_eu_rank128_gflops_per_chip",
        "value": round(r["gflops_per_chip"], 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(r["gflops_per_chip"] * 1e9 / target, 3),
        "extra": {
            "iters_per_sec": round(r["iters_per_sec"], 2),
            "shape": [r["m"], r["n"], r["k"]],
            "device": r["device"],
            "peak_flops_assumed": peak,
            "note": "vs_baseline = achieved/(0.70*bf16 peak); >=1.0 meets the BASELINE.json 70%-of-peak target",
        },
    }))


if __name__ == "__main__":
    main()
