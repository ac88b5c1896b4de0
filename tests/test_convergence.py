"""Convergence predicate semantics must match nmf/utils.py:4-15 exactly:
converged iff new < tol1 (absolute) OR new >= old - tol2 (absolute)."""
import numpy as np

from tpunmf.core import converged, convergence_check

from conftest import requires_reference


def test_absolute_tolerance_semantics():
    # below tol1 -> converged regardless of decrease
    assert bool(converged(1e-6, 1.0, 1e-5, 1e-9))
    # large decrease -> not converged
    assert not bool(converged(0.5, 1.0, 1e-5, 1e-3))
    # insufficient decrease -> converged
    assert bool(converged(0.9999999, 1.0, 1e-5, 1e-3))
    # objective increased -> converged (reference behavior)
    assert bool(converged(1.1, 1.0, 1e-5, 1e-3))


@requires_reference
def test_matches_reference_truth_table():
    from nmf import utils as ref_utils

    cases = [
        (1e-6, 1.0, 1e-5, 1e-9),
        (0.5, 1.0, 1e-5, 1e-3),
        (0.9999999, 1.0, 1e-5, 1e-3),
        (1.1, 1.0, 1e-5, 1e-3),
        (0.0, 0.0, 0.0, 0.0),
        (2.0, 2.0, 1e-5, 0.0),
    ]
    for new, old, t1, t2 in cases:
        assert convergence_check(new, old, t1, t2) == ref_utils.convergence_check(
            new, old, t1, t2
        ), (new, old, t1, t2)
    # jnp variant agrees with host variant
    for new, old, t1, t2 in cases:
        assert bool(converged(new, old, t1, t2)) == convergence_check(new, old, t1, t2)
