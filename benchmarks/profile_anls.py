"""Where does ANLS time go?  Component breakdown on TPU (VERDICT weak #2).

Times, at the PERF.md shape (4096 x 2048 rank 64, f32):
  1. a full ANLS iteration through the solver (reference total),
  2. one nnls_activeset call per subproblem (cold + warm-started sets),
  3. one masked_solve_cg call alone (the inner CG solve),
  4. the iteration's GEMMs (Grams + cross products) alone,
and derives how many masked solves per iteration the active-set loops
actually execute.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpunmf.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpunmf.nnls import nnls_activeset
from tpunmf.nnls.activeset import masked_solve_cg
from tpunmf.solvers import anls


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)  # force
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    m, n, k = 4096, 2048, 64
    key = jax.random.PRNGKey(0)
    kw_, kh_ = jax.random.split(key)
    w0 = jax.random.uniform(kw_, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh_, (k, n), dtype=jnp.float32)
    x = w0 @ h0 + 0.05

    # realistic factors: a few ANLS iterations first
    res = anls(x, k, w_init=np.asarray(w0), h_init=np.asarray(h0),
               min_iter=3, max_iter=3, tol1=0.0, tol2=0.0)
    w = jnp.asarray(res.w)
    h = jnp.asarray(res.h)

    # full-iteration reference rate (delta of 20 vs 5 iterations)
    def run_iters(n_it):
        t0 = time.perf_counter()
        anls(x, k, w_init=np.asarray(w), h_init=np.asarray(h),
             min_iter=n_it, max_iter=n_it, tol1=0.0, tol2=0.0)
        return time.perf_counter() - t0

    run_iters(5); run_iters(20)
    d = run_iters(20) - run_iters(5)
    t_iter = d / 15
    print(f"full ANLS iteration: {t_iter*1e3:.1f} ms  ({1/t_iter:.1f} it/s)",
          flush=True)

    # subproblem pieces
    eye = jnp.eye(k, dtype=x.dtype)
    ct_c_w = h @ h.T + 0.0 * eye
    ct_a_w = h @ x.T                    # (k, m) -> W subproblem
    ct_c_h = w.T @ w
    ct_a_h = w.T @ x                    # (k, n) -> H subproblem

    t_gemms = timeit(jax.jit(
        lambda w, h, x: (h @ h.T, h @ x.T, w.T @ w, w.T @ x)), w, h, x)
    print(f"iteration GEMMs alone: {t_gemms*1e3:.2f} ms", flush=True)

    solve = jax.jit(lambda c, a, p: masked_solve_cg(c, a, p))
    p_w = (w.T > 0)
    t_cg_w = timeit(solve, ct_c_w, ct_a_w, p_w)
    print(f"one masked CG solve, W-side (p={m}): {t_cg_w*1e3:.2f} ms", flush=True)
    p_h = (h > 0)
    t_cg_h = timeit(solve, ct_c_h, ct_a_h, p_h)
    print(f"one masked CG solve, H-side (p={n}): {t_cg_h*1e3:.2f} ms", flush=True)

    act = jax.jit(lambda c, a, p: nnls_activeset(c, a, p, solve_method="cg"))
    t_as_w = timeit(act, ct_c_w, ct_a_w, p_w)
    t_as_h = timeit(act, ct_c_h, ct_a_h, p_h)
    print(f"nnls_activeset warm, W-side: {t_as_w*1e3:.1f} ms "
          f"(~{t_as_w/t_cg_w:.1f} solve-equivalents)", flush=True)
    print(f"nnls_activeset warm, H-side: {t_as_h*1e3:.1f} ms "
          f"(~{t_as_h/t_cg_h:.1f} solve-equivalents)", flush=True)
    print(f"accounted: {(t_as_w+t_as_h+t_gemms)*1e3:.1f} ms of "
          f"{t_iter*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
