"""Sweep ANLS CG step counts + matmul precision on hardware (round 4).

Measures warm it/s (delta-timed) and the final EU objective after a
fixed 40 iterations for cg_iters in {0 (=l+8), 32, 24, 16} at
2048x1024 rank 64, each under both TPU matmul precisions:

  * 'default'  — 1-pass bf16 MXU GEMMs (~1e-2 relative noise on the
    k x k Grams: the active-set duals and CG residuals live at that
    noise floor);
  * 'highest'  — 3-pass f32 (3x the MXU flops on rank-sized GEMMs,
    which are a rounding error next to the X-sized products).

The init is computed ONCE outside the timed region (the first sweep
version re-ran exact NNDSVD — a multi-second QDWH SVD on TPU — inside
every timed call, saturating the deltas), and the data is full-rank
uniform (an exactly-rank-k matrix + tiny noise makes the converged
Grams near-singular and the trajectory chaotic under bf16 GEMM noise).

Usage: python benchmarks/sweep_anls_cg.py [m n k iters]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpunmf.init import nndsvd  # noqa: E402
from tpunmf.solvers import anls  # noqa: E402


def run_case(x, w0, h0, k, cg_iters, iters, precision):
    # precision must be EXPLICIT per arm: anls() setdefaults the TPU
    # NNLS-internals precision to 'highest', which would silently turn
    # the 'default' arm into a highest-internals run and destroy the
    # very comparison this sweep exists for.
    kw = dict(
        distance_type="eu", tol1=1e-12, tol2=1e-12,
        w_init=w0, h_init=h0,
        masked_solver="cg",
        nnls_opts={"cg_iters": cg_iters,
                   "precision": None if precision == "default" else precision},
    )

    def wall(n):
        t0 = time.perf_counter()
        r = anls(x, k, min_iter=n, max_iter=n, **kw)
        return time.perf_counter() - t0, r

    wall(2)  # warm the jits
    n1 = max(iters // 5, 2)
    wall(n1)
    t1 = min(wall(n1)[0], wall(n1)[0])
    t5, res = wall(iters)
    t5 = min(t5, wall(iters)[0])
    rate = (iters - n1) / max(t5 - t1, 1e-3)
    return rate, float(res.obj_history[-1])


def main():
    m, n, k = 2048, 1024, 64
    iters = 40
    if len(sys.argv) > 1:
        m, n, k, iters = map(int, sys.argv[1:5])
    rng = np.random.default_rng(0)
    x = (rng.random((m, n)) + 0.05).astype(np.float32)  # full rank
    w0, h0 = nndsvd(jnp.asarray(x), k, variant="zero")
    w0 = np.asarray(w0)
    h0 = np.asarray(h0)

    out = {"shape": [m, n, k], "iters": iters,
           "backend": jax.default_backend(), "cases": {}}
    for prec in ("default", "highest"):
        jax.config.update("jax_default_matmul_precision", prec)
        for cg in (0, 32, 24, 16):
            rate, obj = run_case(x, w0, h0, k, cg, iters)
            out["cases"][f"{prec}/cg{cg}"] = {
                "it_per_s": round(rate, 1), "final_obj": obj}
            print(f"{prec:8s} cg_iters={cg:3d}: {rate:8.1f} it/s  "
                  f"obj={obj:.6e}", flush=True)
    ref = out["cases"]["highest/cg0"]["final_obj"]
    for case in out["cases"].values():
        case["obj_rel_err_vs_exact"] = abs(case["final_obj"] - ref) / abs(ref)
    print(json.dumps(out))
    with open("benchmarks/anls_cg_sweep.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
