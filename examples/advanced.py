"""Advanced features tour: sharded solvers, local sparsity, out-of-core.

Run on any machine (uses an emulated 8-device CPU mesh):

    python examples/advanced.py
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from tpunmf.parallel import build_mesh, mur_rank_sharded, mur_ulysses
from tpunmf.solvers import ao_admm, mur_streaming_sharded

rng = np.random.default_rng(0)
m, n, k = 64, 96, 8
x = (rng.random((m, k)) @ rng.random((k, n))).astype(np.float32)
w0 = rng.random((m, k)).astype(np.float32)
h0 = rng.random((k, n)).astype(np.float32)

# 1. Ulysses-style alternating-layout MUR: X flips between row- and
#    column-sharded layouts with one all_to_all per half-iteration
mesh = build_mesh(shape=(8,), axis_names=("cols",))
w, h, obj = mur_ulysses(mesh, x, w0, h0, n_iter=50)
print(f"mur_ulysses:      obj = {float(obj):.4f}")

# 2. Rank-sharded (expert-parallel analog) MUR: the k components are
#    sharded across devices; factors are never gathered
rank_mesh = build_mesh(shape=(8,), axis_names=("rank",))
w, h, obj = mur_rank_sharded(rank_mesh, x, w0, h0, n_iter=50,
                             distance_type="eu")
print(f"mur_rank_sharded: obj = {float(obj):.4f}")

# 3. Local-sparsity AO-ADMM: l1,inf-regularized W via the coupled
#    two-block subproblem with adaptive rho balancing
res = ao_admm(x + 0.05, k, rho_mode="adaptive", reg_w=(0.3, "l1inf"),
              reg_h=(0, "nn"), min_iter=5, max_iter=40, admm_iter=8)
print(f"local-sparsity AO-ADMM: obj {res.obj_history[0]:.1f} -> "
      f"{res.obj_history[-1]:.1f}, median row-l1 of W = "
      f"{np.median(res.w.sum(axis=1)):.3f}")

# 4. Out-of-core: sparse V streamed in row blocks, H column-sharded,
#    each block densified exactly once per iteration
dense = rng.random((m, n)).astype(np.float32)
dense[dense < 0.6] = 0.0
res = mur_streaming_sharded(sp.csr_matrix(dense), k, mesh, row_block=32,
                            min_iter=5, max_iter=30)
print(f"streaming sharded: obj {res.obj_history[0]:.1f} -> "
      f"{res.obj_history[-1]:.1f}  (i = {res.i})")

# 5. Full solver semantics (convergence, Results) over an explicit
#    schedule, and HALS — the fast beyond-reference EU solver
from tpunmf.parallel import mur_sharded
from tpunmf.solvers import hals

res = mur_sharded(x, k, mesh, schedule="ulysses", distance_type="eu",
                  min_iter=5, max_iter=200, tol1=1e-8, tol2=1e-8)
print(f"mur_sharded:      obj = {res.obj_history[-1]:.4f}  (i = {res.i})")
res = hals(x, k, min_iter=5, max_iter=200, tol1=1e-8, tol2=1e-8)
print(f"hals:             obj = {res.obj_history[-1]:.4f}  (i = {res.i})")

# 6. Serving beyond HBM: H streamed in column panels from the host,
#    running top-k merged on device
from tpunmf.serve import topk_streaming

vals, ids = topk_streaming(res.w[:3], res.h, n, k=5, panel_cols=40,
                           mesh=mesh)
print(f"topk_streaming:   top items/user = {np.asarray(ids).tolist()}")

# 7. Missing-data factorization, generalized objectives, inference
from tpunmf.solvers import mur_beta, mur_masked, transform

mask = (rng.random((m, n)) < 0.5).astype(np.float32)
res = mur_masked(x, mask, k, distance_type="eu", min_iter=5, max_iter=60)
held = mask == 0
rmse = float(np.sqrt(np.mean(((res.w @ res.h) - x)[held] ** 2)))
print(f"masked completion: heldout rmse = {rmse:.4f}")
res = mur_beta(x + 0.05, k, beta=0.0, min_iter=5, max_iter=40)   # Itakura-Saito
print(f"IS-NMF:           obj {res.obj_history[0]:.2f} -> {res.obj_history[-1]:.2f}")
h_new = transform(res.w, x[:, :8] + 0.05, distance_type="kl")
print(f"transform:        encoded 8 new columns -> {np.asarray(h_new).shape}")

# 8. Rank selection: multi-seed consensus dispersion (vmapped seeds)
from tpunmf.experiments import rank_scan

scores = rank_scan(x, ks=(4, k, 2 * k), n_seeds=5, n_iter=80)
print("rank_scan:        ", [(s["k"], round(s["dispersion"], 3)) for s in scores])
