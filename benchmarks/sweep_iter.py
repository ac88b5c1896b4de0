"""TPU: single-pass whole-iteration EU kernel vs the 2-pass pair."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from tpunmf.ops.mur_fused import mur_iteration_eu, iter_eu_tileable, mur_h_update, mur_w_update

_EPS = 1e-9

def make_single(bm):
    @jax.jit
    def run(x, w, h, iters):
        def body(t, carry):
            w, h = carry
            w, wtx, gw = mur_iteration_eu(x, w, h, lam_w=0.0, bm=bm)
            h = h * wtx / (gw @ h + _EPS)
            return (w, h)
        w, h = jax.lax.fori_loop(0, iters, body, (w, h))
        return jnp.sum(w[0]) + jnp.sum(h[:, 0])
    return run

def make_two(bm, bn):
    @jax.jit
    def run(x, w, h, iters):
        def body(t, carry):
            w, h = carry
            w = mur_w_update(x, w, h, distance_type="eu", lam=0.0, bm=bm, bn=bn)
            h, _ = mur_h_update(x, w, h, distance_type="eu", lam=0.0, bm=bm, bn=bn)
            return (w, h)
        w, h = jax.lax.fori_loop(0, iters, body, (w, h))
        return jnp.sum(w[0]) + jnp.sum(h[:, 0])
    return run

def bench(run, x, w0, h0, iters=30, reps=3):
    float(run(x, w0, h0, 2))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, w0, h0, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters

if __name__ == "__main__":
    m = n = 8192; k = 128
    key = jax.random.PRNGKey(0)
    kx, kw, kh = jax.random.split(key, 3)
    w0 = jax.random.uniform(kw, (m, k), dtype=jnp.float32)
    h0 = jax.random.uniform(kh, (k, n), dtype=jnp.float32)
    xf = w0 @ h0
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = xf.astype(dtype)
        bm = iter_eu_tileable(x, k)
        print(f"-- {name}: single-pass bm={bm}")
        if bm:
            t = bench(make_single(bm), x, w0, h0)
            print(f"{name} single-pass      t_iter = {t*1e3:7.3f} ms  it/s = {1/t:7.1f}")
            for bm2 in (64, 256):
                if m % bm2 == 0 and iter_eu_tileable(x, k):
                    try:
                        t = bench(make_single(bm2), x, w0, h0)
                        print(f"{name} single bm={bm2:4d}   t_iter = {t*1e3:7.3f} ms  it/s = {1/t:7.1f}")
                    except Exception as e:
                        print(f"{name} single bm={bm2}: FAILED {str(e)[:80]}")
        t = bench(make_two(256, 1024), x, w0, h0)
        print(f"{name} two-pass (256,1024) t_iter = {t*1e3:7.3f} ms  it/s = {1/t:7.1f}")
