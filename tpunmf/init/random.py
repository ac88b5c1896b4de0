"""Random factor initialization.

The reference draws |N(0,1)| factors from the global numpy RNG
(reference: nmf/mur.py:108-109, nmf/admm.py:23-24) or U[0,1) for ANLS
(nmf/anls.py:104-105).  Here initialization is explicit-PRNG (jax.random),
so runs are reproducible by construction; solvers also accept explicit
(w_init, h_init) arrays for exact cross-implementation parity runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_init(key, m: int, n: int, k: int, kind: str = "abs_normal",
                dtype=jnp.float32):
    """Return (w0, h0). kind: 'abs_normal' (|randn|) or 'uniform' (U[0,1))."""
    kw, kh = jax.random.split(key)
    if kind == "abs_normal":
        w = jnp.abs(jax.random.normal(kw, (m, k), dtype=dtype))
        h = jnp.abs(jax.random.normal(kh, (k, n), dtype=dtype))
    elif kind == "uniform":
        w = jax.random.uniform(kw, (m, k), dtype=dtype)
        h = jax.random.uniform(kh, (k, n), dtype=dtype)
    else:
        raise ValueError(f"Unknown random init kind: {kind}")
    return w, h
