"""Single-config warm-rate probes for round-3 TPU validation.

One config per process invocation (tunnel discipline: never pack
multiple fresh compiles behind one timeout).  Two-point delta timing as
in bench.py cancels fixed per-call costs.

    python benchmarks/rate_probe.py ao_admm_chol   [out.jsonl]
    python benchmarks/rate_probe.py ao_admm_cg     [out.jsonl]
    python benchmarks/rate_probe.py masked_eu_headline [out.jsonl]
    python benchmarks/rate_probe.py masked_kl_headline [out.jsonl]
    python benchmarks/rate_probe.py hals_headline  [out.jsonl]
    python benchmarks/rate_probe.py mur_eu_headline [out.jsonl]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def two_point_rate(call, iters, delta):
    """Warm it/s from the (iters vs iters+delta) wall-time delta."""
    call(iters)
    call(iters + delta)      # compile both trip counts
    t1 = min(call(iters), call(iters))
    t2 = call(iters + delta)
    return delta / max(t2 - t1, 0.05)


def main():
    which = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    try:
        from tpunmf.utils import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rec = {"probe": which, "device": jax.devices()[0].device_kind}

    if which.startswith("ao_admm"):
        from tpunmf.solvers import ao_admm

        m, n, k = 2048, 1024, 64
        key = jax.random.PRNGKey(1)
        kx, kw, kh = jax.random.split(key, 3)
        w0 = np.asarray(jax.random.uniform(kw, (m, k)))
        h0 = np.asarray(jax.random.uniform(kh, (k, n)))
        x = jnp.asarray(w0 @ h0 + 0.05)
        solver = "cg" if which.endswith("cg") else "chol"

        def call(n_it):
            t0 = time.perf_counter()
            res = ao_admm(x, k, w_init=w0, h_init=h0, min_iter=n_it,
                          max_iter=n_it, tol1=0.0, tol2=0.0,
                          spd_solver=solver)
            assert len(res.obj_history) >= n_it
            rec["final_obj"] = float(res.obj_history[-1])
            return time.perf_counter() - t0

        rec["it_per_s"] = round(two_point_rate(call, 8, 2000), 2)

    elif which.startswith("masked"):
        from tpunmf.solvers import mur_masked

        m, n, k = 8192, 8192, 128
        dist = "kl" if "kl" in which else "eu"
        key = jax.random.PRNGKey(2)
        kx, kw, kh, km = jax.random.split(key, 4)
        w0 = np.asarray(jax.random.uniform(kw, (m, k)))
        h0 = np.asarray(jax.random.uniform(kh, (k, n)))
        x = jnp.asarray(w0 @ h0 + 0.05, dtype=jnp.float32)
        mask = (jax.random.uniform(km, (m, n)) < 0.25).astype(jnp.float32)

        def call(n_it):
            t0 = time.perf_counter()
            res = mur_masked(x, mask, k, distance_type=dist, w_init=w0,
                             h_init=h0, min_iter=n_it, max_iter=n_it,
                             tol1=0.0, tol2=0.0)
            rec["final_obj"] = float(res.obj_history[-1])
            return time.perf_counter() - t0

        rec["it_per_s"] = round(two_point_rate(call, 5, 300), 2)

    elif which in ("hals_headline", "hals_single_pass_headline",
                   "hals_headline_fori"):
        from tpunmf.solvers import hals

        if which == "hals_single_pass_headline":
            from tpunmf.solvers import tpu_defaults as td

            td.hals_single_pass = lambda backend: True
        if which == "hals_headline_fori":
            # A/B the trace-light fori sweep body against the unrolled one
            import importlib

            hals_mod = importlib.import_module("tpunmf.solvers.hals")
            import tpunmf.ops.hals_sweep as hs

            orig = hs.gs_sweep
            hals_mod.gs_sweep = lambda *a, **k2: orig(
                *a, **{**k2, "unrolled": False})

        m, n, k = 8192, 8192, 128
        key = jax.random.PRNGKey(3)
        kx, kw, kh = jax.random.split(key, 3)
        w0 = np.asarray(jax.random.uniform(kw, (m, k)))
        h0 = np.asarray(jax.random.uniform(kh, (k, n)))
        x = jnp.asarray(w0 @ h0 + 0.05, dtype=jnp.float32)

        def call(n_it):
            t0 = time.perf_counter()
            res = hals(x, k, w_init=w0, h_init=h0, min_iter=n_it,
                       max_iter=n_it, tol1=0.0, tol2=0.0, objective="gram")
            rec["final_obj"] = float(res.obj_history[-1])
            return time.perf_counter() - t0

        rec["it_per_s"] = round(two_point_rate(call, 5, 500), 2)

    elif which == "mur_eu_headline":
        from tpunmf.solvers import mur

        m, n, k = 8192, 8192, 128
        key = jax.random.PRNGKey(4)
        kx, kw, kh = jax.random.split(key, 3)
        w0 = np.asarray(jax.random.uniform(kw, (m, k)))
        h0 = np.asarray(jax.random.uniform(kh, (k, n)))
        x = jnp.asarray(w0 @ h0 + 0.05, dtype=jnp.float32)

        def call(n_it):
            t0 = time.perf_counter()
            res = mur(x, k, distance_type="eu", w_init=w0, h_init=h0,
                      min_iter=n_it, max_iter=n_it, tol1=0.0, tol2=0.0,
                      objective="gram")
            rec["final_obj"] = float(res.obj_history[-1])
            return time.perf_counter() - t0

        rec["it_per_s"] = round(two_point_rate(call, 5, 500), 2)

    elif which in ("ntf_headline_mur", "ntf_headline_hals"):
        # 3-way CP at a production-ish shape: 512x512x512 r64 f32
        # (~134M cells; per iteration 3 MTTKRP einsum chains)
        from tpunmf.solvers import ntf

        dims, k = (512, 512, 512), 64
        key = jax.random.PRNGKey(5)
        keys = jax.random.split(key, 3)
        f0 = [np.asarray(jax.random.uniform(kk2, (d, k)) + 0.01)
              for kk2, d in zip(keys, dims)]
        x = jnp.einsum("ir,jr,kr->ijk", *[jnp.asarray(f) for f in f0])
        upd = "hals" if which.endswith("hals") else "mur"

        def call(n_it):
            t0 = time.perf_counter()
            res = ntf(x, k, update=upd, factors_init=f0, min_iter=n_it,
                      max_iter=n_it, tol1=0.0, tol2=0.0)
            rec["final_obj"] = float(res.obj_history[-1])
            return time.perf_counter() - t0

        rec["it_per_s"] = round(two_point_rate(call, 3, 100), 2)

    elif which == "robust_headline":
        from tpunmf.solvers import robust_nmf

        m, n, k = 8192, 8192, 128
        key = jax.random.PRNGKey(6)
        kw, kh = jax.random.split(key)
        w0 = np.asarray(jax.random.uniform(kw, (m, k)))
        h0 = np.asarray(jax.random.uniform(kh, (k, n)))
        x = jnp.asarray(w0 @ h0 + 0.05, dtype=jnp.float32)

        def call(n_it):
            t0 = time.perf_counter()
            res = robust_nmf(x, k, w_init=w0, h_init=h0, min_iter=n_it,
                             max_iter=n_it, tol1=0.0, tol2=0.0)
            rec["final_obj"] = float(res.obj_history[-1])
            return time.perf_counter() - t0

        rec["it_per_s"] = round(two_point_rate(call, 5, 300), 2)

    else:
        raise SystemExit(f"unknown probe {which!r}")

    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
