"""Property-based solver invariants (hypothesis): random shapes, betas
and observation patterns must preserve non-negativity, finiteness and
the MM monotonicity guarantees."""
import numpy as np
from hypothesis import given, settings, strategies as st

from tpunmf.solvers import mur_beta, mur_masked


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    m=st.integers(4, 24),
    n=st.integers(4, 24),
    k=st.integers(1, 5),
    beta=st.floats(0.0, 2.5),
)
def test_beta_mur_invariants(seed, m, n, k, beta):
    rng = np.random.default_rng(seed)
    x = rng.random((m, n)) + 0.02
    res = mur_beta(x, k, beta=round(beta, 3), min_iter=2, max_iter=12,
                   tol1=0.0, tol2=0.0, key=None)
    o = np.asarray(res.obj_history)
    assert np.all(np.isfinite(o))
    # MM guarantee: each beta's own objective never increases
    assert np.all(o[1:] <= o[:-1] + 1e-6 * np.abs(o[:-1]) + 1e-9)
    assert np.all(res.w >= 0) and np.all(res.h >= 0)


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    m=st.integers(4, 20),
    n=st.integers(4, 20),
    k=st.integers(1, 4),
    observed=st.floats(0.05, 1.0),
    distance_type=st.sampled_from(["eu", "kl"]),
)
def test_masked_mur_invariants(seed, m, n, k, observed, distance_type):
    rng = np.random.default_rng(seed)
    x = rng.random((m, n)) + 0.02
    mask = (rng.random((m, n)) < observed).astype(float)
    res = mur_masked(x, mask, k, distance_type=distance_type, min_iter=2,
                     max_iter=12, tol1=0.0, tol2=0.0, key=None)
    o = np.asarray(res.obj_history)
    assert np.all(np.isfinite(o))
    assert np.all(o[1:] <= o[:-1] + 1e-6 * np.abs(o[:-1]) + 1e-9)
    assert np.all(np.isfinite(res.w)) and np.all(np.isfinite(res.h))
    assert np.all(res.w >= 0) and np.all(res.h >= 0)
