"""Benchmark: MUR iterations/sec and GFLOPS/chip at rank 128 (BASELINE.json).

Runs the flagship fused Euclidean-MUR iteration (2 Pallas passes over X
with in-kernel multiplicative updates + the free Gram-trick objective)
on one chip at 8192 x 8192 rank 128 f32 and reports:

  value        achieved GFLOP/s (our FLOPs: 4*m*n*k per fused iteration)
  vs_baseline  measured iteration time vs 70% of the ROOFLINE iteration
               time.  At rank 128 the iteration is HBM-bound: each of the
               two passes must read X once, so
                   t_roofline = max(bytes_moved / BW, flops / MXU_peak)
               and >= 1.0 means the BASELINE.json "70% of peak" intent is
               met against the binding hardware limit (memory bandwidth,
               not the MXU, for this shape).

Timing note: results are fetched to host inside the timed region —
`block_until_ready` alone can return before remote-tunnel execution
completes, which silently measures dispatch only.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# (bf16 MXU peak FLOP/s, HBM bytes/s) by device_kind substring
_CHIP = {
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6 lite": (918e12, 1640e9),
    "v6e": (918e12, 1640e9),
}


def _chip_limits() -> tuple[float, float]:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in _CHIP.items():
        if key in kind:
            return val
    return 197e12, 819e9


def bench_mur_eu(m=8192, n=8192, k=128, iters=50, data_dtype=jnp.float32):
    from tpunmf.ops.mur_fused import mur_tileable
    from tpunmf.solvers.common import init_carry, while_block
    from tpunmf.solvers.mur import _mur_block

    use_pallas = jax.default_backend() == "tpu"

    key = jax.random.PRNGKey(0)
    kx, kw, kh = jax.random.split(key, 3)
    w0 = jax.random.uniform(kw, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh, (k, n), dtype=jnp.float32)
    x = w0 @ h0 + 0.01 * jax.random.uniform(kx, (m, n), dtype=jnp.float32)
    x = x.astype(data_dtype)
    xsq = jnp.sum(x.astype(jnp.float32) ** 2)
    float(xsq)  # materialize inputs before timing

    fused_tile = mur_tileable(x, k) if use_pallas else None

    def run(carry, stop_i):
        return _mur_block(
            x, xsq, carry, stop_i, 0.0, 0.0, 0.0, 0.0,
            distance_type="eu", min_iter=iters + 1, max_iter=iters + 1,
            objective="gram", use_pallas=use_pallas, fused_tile=fused_tile,
            verbose=False,
        )

    obj0 = jnp.asarray(0.0, dtype=jnp.float32)
    carry = init_carry(obj0, iters + 1, (w0, h0))
    out = run(carry, 2)
    float(out.obj)  # warm-up: compile + one real execution

    best_dt = float("inf")
    final_obj = None
    for _ in range(3):
        carry = init_carry(obj0, iters + 1, (w0, h0))
        float(carry.obj)
        t0 = time.perf_counter()
        out = run(carry, iters)
        final_obj = float(out.obj)  # host fetch = true completion
        best_dt = min(best_dt, time.perf_counter() - t0)

    assert int(out.i) == iters
    iters_per_sec = iters / best_dt
    flops_per_iter = 4 * m * n * k + 6 * (m + n) * k * k
    # roofline: 2 passes read X (+ f32 factor traffic); MXU does 4mnk
    xb = jnp.dtype(data_dtype).itemsize
    bytes_per_iter = 2 * m * n * xb + (4 * m * k + 6 * k * n) * 4
    peak_flops, hbm_bw = _chip_limits()
    t_roofline = max(bytes_per_iter / hbm_bw, flops_per_iter / peak_flops)
    return {
        "iters_per_sec": iters_per_sec,
        "gflops_per_chip": flops_per_iter * iters_per_sec / 1e9,
        "roofline_fraction": t_roofline * iters_per_sec,  # = t_roof/t_meas
        "t_iter_ms": 1e3 / iters_per_sec,
        "t_roofline_ms": t_roofline * 1e3,
        "final_obj": final_obj,
        "fused": fused_tile is not None,
        "m": m, "n": n, "k": k, "iters": iters,
        "device": jax.devices()[0].device_kind,
        "peak_flops": peak_flops,
        "hbm_bw": hbm_bw,
    }


def main():
    try:
        from tpunmf.utils import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    r = bench_mur_eu()
    r16 = bench_mur_eu(data_dtype=jnp.bfloat16)
    print(json.dumps({
        "metric": "mur_eu_rank128_gflops_per_chip",
        "value": round(r["gflops_per_chip"], 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(r["roofline_fraction"] / 0.70, 3),
        "extra": {
            "iters_per_sec": round(r["iters_per_sec"], 2),
            "t_iter_ms": round(r["t_iter_ms"], 4),
            "t_roofline_ms": round(r["t_roofline_ms"], 4),
            "roofline_fraction": round(r["roofline_fraction"], 3),
            "shape": [r["m"], r["n"], r["k"]],
            "fused_kernels": r["fused"],
            "bf16_data_mode": {
                "iters_per_sec": round(r16["iters_per_sec"], 2),
                "gflops_per_chip": round(r16["gflops_per_chip"], 1),
                "roofline_fraction": round(r16["roofline_fraction"], 3),
            },
            "device": r["device"],
            "note": "vs_baseline = fraction-of-HBM/MXU-roofline / 0.70; "
                    ">=1.0 meets the BASELINE.json 70%-of-peak target "
                    "against the binding limit (bandwidth at rank 128)",
        },
    }))


if __name__ == "__main__":
    main()
