"""Time-to-objective: HALS vs MUR-EU at benchmark scale (TPU).

HALS solves each rank-1 subproblem exactly, so it needs far fewer sweeps
than MUR for the same Euclidean objective; per outer iteration both move
~2 passes over X.  This measures the real currency — wall-clock to a
target objective — at the headline shape (8192 x 8192, rank 128, f32)
from an identical random init.

Run (serialized — single tunneled chip):  python benchmarks/bench_hals.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpunmf.solvers import hals, mur

M, N, K, ITERS = 8192, 8192, 128, 150


def run(fn, n_it, **kw):
    t0 = time.perf_counter()
    res = fn(X, K, w_init=W0, h_init=H0, min_iter=n_it, max_iter=n_it,
             tol1=0.0, tol2=0.0, **kw)
    dt = time.perf_counter() - t0
    return res, dt


key = jax.random.PRNGKey(0)
kx, kw_, kh = jax.random.split(key, 3)
Wt = jax.random.uniform(kw_, (M, K), dtype=jnp.float32)
Ht = jax.random.uniform(kh, (K, N), dtype=jnp.float32)
X = Wt @ Ht + 0.1 * jax.random.uniform(kx, (M, N), dtype=jnp.float32)
W0 = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (M, K)))
H0 = np.asarray(jax.random.uniform(jax.random.PRNGKey(8), (K, N)))

out = {}
for name, fn, kw in (("mur_eu", mur, dict(distance_type="eu")),
                     ("hals_s1", hals, dict(inner_sweeps=1)),
                     ("hals_s2", hals, dict(inner_sweeps=2)),
                     ("hals_s4", hals, dict(inner_sweeps=4))):
    run(fn, 3, **kw)                       # compile (short count)
    run(fn, ITERS, **kw)                   # compile (long count)
    res, dt = run(fn, ITERS, **kw)         # measured
    obj = np.asarray(res.obj_history, dtype=np.float64)
    out[name] = {"s_total": round(dt, 3), "it_per_s": round(ITERS / dt, 1),
                 "obj": obj}
    print(name, out[name]["s_total"], "s,", out[name]["it_per_s"], "it/s,",
          "final obj", f"{obj[-1]:.6e}", flush=True)

# time for each solver to first reach the WORST final objective among them
target = max(v["obj"][-1] for v in out.values()) * (1 + 1e-9)
summary = {}
for name, v in out.items():
    hit = np.argmax(v["obj"] <= target)
    reached = bool(v["obj"][hit] <= target)
    t_hit = hit / v["it_per_s"] if reached else float("inf")
    summary[name] = {
        "it_per_s": v["it_per_s"],
        "final_obj": float(v["obj"][-1]),
        "iters_to_target": int(hit) if reached else None,
        "s_to_target": round(t_hit, 3) if reached else None,
    }
print(json.dumps({"shape": [M, N, K], "iters": ITERS,
                  "target_obj": float(target), "solvers": summary}, indent=1))
