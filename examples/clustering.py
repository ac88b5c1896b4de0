"""Clustering-family tour: ONMF, symmetric NMF, tri-factorization,
graph regularization, and the multilevel warm start.

Run on any machine (CPU is fine):

    python examples/clustering.py
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpunmf.solvers import (
    gnmf,
    hals,
    knn_graph,
    multilevel,
    nmtf,
    onmf,
    orthogonality_residual,
    symnmf,
)

rng = np.random.default_rng(0)

# --- synthetic: 3 column clusters over 2 row groups -------------------
row_groups = np.array([i % 2 for i in range(40)])
col_groups = np.array([j % 3 for j in range(60)])
intensity = np.array([[1.0, 0.15, 0.6], [0.25, 0.9, 0.1]])
x = intensity[row_groups][:, col_groups] * (0.7 + 0.6 * rng.random((40, 60)))

# --- orthogonal NMF: soft k-means on columns --------------------------
res = onmf(x, 3, min_iter=150, max_iter=150, tol1=0.0, tol2=0.0)
labels = res.h.argmax(axis=0)
import jax.numpy as jnp

print(f"ONMF: orthogonality residual "
      f"{float(orthogonality_residual(jnp.asarray(res.h))):.3f}, "
      f"3 clusters sized {np.bincount(labels).tolist()}")

# --- tri-factorization: rows and columns simultaneously ---------------
res, core = nmtf(x, 2, 3, min_iter=150, max_iter=150, tol1=0.0, tol2=0.0)
print(f"NMTF: row clusters {np.bincount(res.w.argmax(1)).tolist()}, "
      f"col clusters {np.bincount(res.h.argmax(0)).tolist()}, "
      f"core=\n{np.round(core, 2)}")

# --- symmetric NMF on a kNN affinity ----------------------------------
a = knn_graph(jnp.asarray(x), n_neighbors=6)
res = symnmf(np.asarray(a), 3, min_iter=150, max_iter=150, tol1=0.0, tol2=0.0)
print(f"SymNMF: clusters {np.bincount(res.w.argmax(1)).tolist()}")

# --- graph-regularized NMF: smooth encodings --------------------------
res = gnmf(x, 3, a, lambda_g=0.5, min_iter=100, max_iter=100,
           tol1=0.0, tol2=0.0)
print(f"GNMF: final regularized objective {res.obj_history[-1]:.3f}")

# --- multilevel warm start: coarse-to-fine HALS -----------------------
# its regime: a LARGE low-rank matrix where coarse-level iterations are
# cheap relative to the fine problem
big = (rng.random((200, 2048)) ** 2)
big = (big[:, :6] @ rng.random((6, 2048))) + 0.01 * rng.random((200, 2048))
warm = multilevel(big, 6, method="hals", levels=2, factor=4,
                  coarse_iters=150, min_iter=8, max_iter=8,
                  tol1=0.0, tol2=0.0)
cold = hals(big, 6, min_iter=8, max_iter=8, tol1=0.0, tol2=0.0)
print(f"Multilevel: obj {warm.obj_history[-1]:.3f} vs cold "
      f"{cold.obj_history[-1]:.3f} after the same fine budget")
