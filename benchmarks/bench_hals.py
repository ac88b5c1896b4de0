"""Time-to-objective: HALS vs MUR-EU at benchmark scale (TPU).

HALS solves each rank-1 subproblem exactly, so it needs far fewer sweeps
than MUR for the same Euclidean objective; per outer iteration both move
~2 passes over X.  This measures the real currency — wall-clock to a
target objective — at the headline shape (8192 x 8192, rank 128, f32)
from an identical random init.

Run ONE config per process (a timeout SIGTERM mid-compile wedges the
tunneled TPU worker for ~20 min; each config needs fresh multi-minute
compiles), appending JSONL records:

    for c in mur_eu hals_s1 hals_s2; do
        python benchmarks/bench_hals.py $c /tmp/bench_hals.jsonl
    done
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

try:
    from tpunmf.utils import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

CONFIGS = {
    "mur_eu": (mur, dict(distance_type="eu")),
    "hals_s1": (hals, dict(inner_sweeps=1)),
    "hals_s2": (hals, dict(inner_sweeps=2)),
}

# One config per process (argv[1]), results appended to argv[2] as JSONL:
# a single process needs 2+ tunnel compiles (~2-5 min each on a bad hour)
# and a timeout SIGTERM mid-compile wedges the remote worker for ~20 min
# — run each config in its own bounded invocation instead.
name = sys.argv[1]
out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_hals.jsonl"
fn, kw = CONFIGS[name]
run(fn, ITERS, **kw)                   # compile + warm
res, dt = run(fn, ITERS, **kw)         # measured
obj = np.asarray(res.obj_history, dtype=np.float64)
rec = {"name": name, "s_total": round(dt, 3),
       "it_per_s": round(ITERS / dt, 1), "shape": [M, N, K],
       "obj": [float(v) for v in obj]}
with open(out_path, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(name, rec["s_total"], "s,", rec["it_per_s"], "it/s, final obj",
      f"{obj[-1]:.6e}", flush=True)
