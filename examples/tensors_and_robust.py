"""Round-3 additions tour: native tensor CP, robust l2,1 NMF, and
quantized serving.

Run on any machine (uses an emulated 8-device CPU mesh):

    python examples/tensors_and_robust.py
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
import jax.numpy as jnp

from tpunmf.parallel import build_mesh, ntf_sharded
from tpunmf.serve import recall_at_k, topk_retrieval
from tpunmf.solvers import cp_reconstruct, ntf, robust_nmf

rng = np.random.default_rng(0)

# 1. Native 3-way CP: a rank-4 "spectral imaging" stack (x, y, band) —
#    the reference's legacy CLI would flatten this to 2-D and lose the
#    band structure (nmf/nmf_old.py:40-42); CP keeps all three modes.
dims, k = (48, 40, 16), 4
true = [np.abs(rng.standard_normal((d, k))) for d in dims]
stack = np.asarray(cp_reconstruct([jnp.asarray(f) for f in true]))
res = ntf(stack, k, update="hals", max_iter=300, tol1=1e-12, tol2=1e-12)
xhat = np.asarray(cp_reconstruct([jnp.asarray(f) for f in res.factors]))
print("CP-HALS rel err:",
      np.linalg.norm(stack - xhat) / np.linalg.norm(stack),
      "| mode shapes:", [f.shape for f in res.factors])

# 2. The same factorization sharded over a mesh (mode-0 slabs; the
#    mode-0 MTTKRP is local, the other modes cost one psum each)
mesh = build_mesh(shape=(8,), axis_names=("rows",))
res_s = ntf_sharded(mesh, stack, k, update="hals", max_iter=50)
print("sharded CP objective:", res_s.obj_history[-1])

# 3. Robust l2,1 NMF: corrupt a few columns and compare the basis
#    recovered by the robust objective vs plain Euclidean MUR from the
#    same NNDSVD init (l2,1 weighs a wild column linearly, EU
#    quadratically — the quadratic penalty drags the basis toward the
#    outliers)
from tpunmf.solvers import mur

m, n, r = 80, 100, 5
x_clean = np.abs(rng.standard_normal((m, r))) @ np.abs(rng.standard_normal((r, n)))
x = x_clean.copy()
bad = [3, 40, 77]
x[:, bad] += 80.0 * np.abs(rng.standard_normal((m, len(bad))))
keep = np.setdiff1d(np.arange(n), bad)
kw = dict(min_iter=100, max_iter=2000, tol1=1e-12, tol2=1e-12,
          nndsvd_init=(True, "zero"))
res_rob = robust_nmf(x, r, **kw)
res_eu = mur(x, r, distance_type="eu", **kw)
for name, rr in (("robust-l21", res_rob), ("mur-eu", res_eu)):
    err = np.linalg.norm((x_clean - rr.w @ rr.h)[:, keep]) \
        / np.linalg.norm(x_clean[:, keep])
    print(f"{name}: clean-column rel err {err:.3f}")

# 4. Quantized serving: bf16 first-stage scoring of the whole catalog,
#    exact f32 rescore of the oversampled candidates
w_users = np.abs(rng.standard_normal((8, r))).astype(np.float32)
h_items = np.asarray(res_eu.h, dtype=np.float32)
v_ex, i_ex = topk_retrieval(None, jnp.asarray(w_users), jnp.asarray(h_items), 10)
v_q, i_q = topk_retrieval(None, jnp.asarray(w_users), jnp.asarray(h_items), 10,
                          first_stage_dtype="bf16", oversample=4)
print("quantized-serving recall@10 vs exact:",
      recall_at_k(np.asarray(i_q), np.asarray(i_ex)))
