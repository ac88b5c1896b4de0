"""Property-based NNLS tests (hypothesis): random shapes, conditioning and
sparsity patterns vs the scipy Lawson-Hanson oracle."""
import numpy as np
from hypothesis import given, settings, strategies as st
from scipy import optimize

from tpunmf.nnls import nnls_activeset, nnls_bpp


def _scipy_columns(c, a):
    out = np.zeros((c.shape[1], a.shape[1]))
    for j in range(a.shape[1]):
        out[:, j], _ = optimize.nnls(c, a[:, j])
    return out


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    l=st.integers(2, 20),
    p=st.integers(1, 12),
    neg_frac=st.floats(0.0, 0.9),
)
def test_activeset_matches_scipy(seed, l, p, neg_frac):
    rng = np.random.default_rng(seed)
    n_obs = l + rng.integers(1, 20)
    c = rng.random((n_obs, l)) + 0.05
    a = c @ rng.random((l, p))
    # push a fraction of columns into constrained territory
    mask = rng.random((n_obs, p)) < neg_frac
    a = np.where(mask, a - rng.random((n_obs, p)) * a.max(), a)
    expect = _scipy_columns(c, a)
    got = np.asarray(nnls_activeset(c.T @ c, c.T @ a))
    scale = max(1.0, np.abs(expect).max())
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-6 * scale)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), l=st.integers(2, 16), p=st.integers(1, 8))
def test_bpp_matches_scipy(seed, l, p):
    rng = np.random.default_rng(seed)
    c = rng.random((l + 10, l)) + 0.05
    a = rng.standard_normal((l + 10, p))
    expect = _scipy_columns(c, a)
    got = np.asarray(nnls_bpp(c.T @ c, c.T @ a))
    scale = max(1.0, np.abs(expect).max())
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-6 * scale)
