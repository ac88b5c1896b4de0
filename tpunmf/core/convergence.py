"""Convergence predicate shared by all solver drivers.

Matches the reference ``convergence_check`` (reference: nmf/utils.py:4-15):
converged iff the new objective is below ``tol1`` (absolute) OR failed to
decrease by at least ``tol2`` (absolute, not relative).  Here it is a pure
jnp predicate usable inside ``lax.while_loop``; the reference's print
side-effects become optional host callbacks in the drivers.
"""
from __future__ import annotations

import jax.numpy as jnp


def converged(new, old, tol1, tol2):
    """jit-friendly convergence test: (new < tol1) | (new >= old - tol2)."""
    return jnp.logical_or(new < tol1, new >= old - tol2)


def convergence_check(new, old, tol1, tol2) -> bool:
    """Host-side variant with the reference's exact return semantics."""
    return bool(new < tol1 or new >= old - tol2)
