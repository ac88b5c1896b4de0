"""Batched NNLS kernels vs scipy's Lawson-Hanson oracle (SURVEY §4.2)."""
import numpy as np
import pytest
from scipy import optimize

from tpunmf.nnls import masked_solve, nnls_activeset, nnls_bpp


def _scipy_columns(c, a):
    out = np.zeros((c.shape[1], a.shape[1]))
    for j in range(a.shape[1]):
        out[:, j], _ = optimize.nnls(c, a[:, j])
    return out


@pytest.fixture
def problem(rng):
    n_obs, l, p = 40, 10, 25
    c = rng.random((n_obs, l))
    # mix of easy (non-negative-compatible) and hard columns
    a = c @ rng.random((l, p)) + 0.5 * rng.standard_normal((n_obs, p))
    return c, a


def test_masked_solve_matches_gathered(rng):
    l, p = 6, 12
    c = rng.random((20, l))
    ct_c = c.T @ c + 0.1 * np.eye(l)
    ct_a = rng.standard_normal((l, p))
    p_set = rng.random((l, p)) > 0.4
    out = np.asarray(masked_solve(ct_c, ct_a, p_set))
    for j in range(p):
        m = p_set[:, j]
        expect = np.zeros(l)
        if m.any():
            expect[m] = np.linalg.solve(ct_c[np.ix_(m, m)], ct_a[m, j])
        np.testing.assert_allclose(out[:, j], expect, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("solver", [nnls_activeset, nnls_bpp])
def test_matches_scipy_nnls(problem, solver):
    c, a = problem
    expect = _scipy_columns(c, a)
    got = np.asarray(solver(c.T @ c, c.T @ a))
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("solver", [nnls_activeset, nnls_bpp])
def test_already_feasible_is_unconstrained(rng, solver):
    """When the unconstrained solution is positive, NNLS returns it."""
    l, p = 8, 10
    c = rng.random((30, l)) + 0.1
    k_true = rng.random((l, p)) + 0.5
    a = c @ k_true
    got = np.asarray(solver(c.T @ c, c.T @ a))
    np.testing.assert_allclose(got, k_true, rtol=1e-7, atol=1e-9)


def test_rank64_no_overflow(rng):
    """The reference's cssls set-encoding overflows int64 at rank > 62
    (nmf/fcnnls.py:28); the masked kernels must not care."""
    l, p = 64, 8
    c = rng.random((200, l))
    a = rng.standard_normal((200, p))
    got = np.asarray(nnls_activeset(c.T @ c, c.T @ a))
    expect = _scipy_columns(c, a)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_masked_solve_chunked_matches_direct(rng, monkeypatch):
    """The memory-capped chunked path must equal the direct batched solve."""
    from tpunmf.nnls import activeset

    l, p = 8, 37
    c = rng.random((30, l))
    ct_c = c.T @ c + 0.1 * np.eye(l)
    ct_a = rng.standard_normal((l, p))
    p_set = rng.random((l, p)) > 0.4
    direct = np.asarray(activeset.masked_solve(ct_c, ct_a, p_set))
    monkeypatch.setattr(activeset, "_MASKED_SOLVE_BYTES_BUDGET", 8 * 8 * 8 * 5)
    chunked = np.asarray(activeset.masked_solve(ct_c, ct_a, p_set))
    np.testing.assert_allclose(chunked, direct, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("solver", [nnls_activeset, nnls_bpp])
def test_cg_solve_method_matches_chol(problem, solver):
    """The GEMM-shaped CG inner solver must land on the same NNLS optimum
    as the direct Cholesky solves."""
    c, a = problem
    chol = np.asarray(solver(c.T @ c, c.T @ a, solve_method="chol"))
    cg = np.asarray(solver(c.T @ c, c.T @ a, solve_method="cg"))
    np.testing.assert_allclose(cg, chol, rtol=1e-6, atol=1e-7)


def test_masked_solve_cg_matches_direct(rng):
    from tpunmf.nnls import masked_solve, masked_solve_cg

    l, p = 12, 30
    c = rng.random((40, l))
    ct_c = c.T @ c + 0.05 * np.eye(l)
    ct_a = rng.standard_normal((l, p))
    p_set = rng.random((l, p)) > 0.4
    direct = np.asarray(masked_solve(ct_c, ct_a, p_set))
    cg = np.asarray(masked_solve_cg(ct_c, ct_a, p_set))
    np.testing.assert_allclose(cg, direct, rtol=1e-8, atol=1e-10)


def test_spd_solve_cg_matches_chol(rng):
    from tpunmf.core.linalg import spd_solve

    k, p = 24, 40
    g = rng.random((60, k))
    a = g.T @ g + 0.5 * np.eye(k)
    b = rng.standard_normal((k, p))
    direct = np.asarray(spd_solve(a, b, method="chol"))
    cg = np.asarray(spd_solve(a, b, method="cg"))
    np.testing.assert_allclose(cg, direct, rtol=1e-9, atol=1e-11)


def test_freeze_stalled_guard_preserves_optimum(rng):
    """The objective-stall guard must not change exact solutions (the
    exact path strictly decreases; the guard only retires noise-cycling
    columns)."""
    import numpy as np

    from tpunmf.nnls import nnls_activeset

    l, p = 12, 40
    c = rng.standard_normal((30, l))
    ct_c = c.T @ c + 1e-6 * np.eye(l)
    ct_a = c.T @ rng.standard_normal((30, p))
    on = np.asarray(nnls_activeset(ct_c, ct_a, freeze_stalled=True))
    off = np.asarray(nnls_activeset(ct_c, ct_a, freeze_stalled=False))
    np.testing.assert_allclose(on, off, rtol=1e-10, atol=1e-12)


def test_dead_component_zero_gram_diagonal(rng):
    """A zero column of C (e.g. an all-zero NNDSVD factor row) must solve
    to exactly 0 instead of NaN-ing the whole batch (singular seed solve)."""
    from tpunmf.nnls import nnls_activeset, nnls_bpp

    n_obs, l, p = 30, 6, 9
    c = rng.random((n_obs, l)) + 0.05
    c[:, 2] = 0.0                      # dead component
    a = rng.random((n_obs, p))
    for solver in (nnls_activeset, nnls_bpp):
        k = np.asarray(solver(c.T @ c, c.T @ a))
        assert np.all(np.isfinite(k)), solver.__name__
        np.testing.assert_array_equal(k[2], 0.0)
        # remaining components match scipy on the reduced problem
        from scipy.optimize import nnls as scipy_nnls

        keep = [0, 1, 3, 4, 5]
        for j in range(p):
            ref, _ = scipy_nnls(c[:, keep], a[:, j])
            np.testing.assert_allclose(k[keep, j], ref, atol=1e-8)


def test_warm_start_values_cg_matches_scipy(problem):
    """k0 value warm starts (CG x0) keep the exact NNLS fixed point —
    from a perturbed near-solution AND from a bad (wrong-support) one."""
    c, a = problem
    ct_c, ct_a = c.T @ c, c.T @ a
    expect = _scipy_columns(c, a)
    rng = np.random.default_rng(5)
    near = expect * (1.0 + 0.05 * rng.standard_normal(expect.shape))
    near = np.maximum(near, 0.0)
    got = np.asarray(nnls_activeset(ct_c, ct_a, near > 0, near,
                                    solve_method="cg"))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)
    bad = np.maximum(rng.standard_normal(expect.shape), 0.0)
    got2 = np.asarray(nnls_activeset(ct_c, ct_a, bad > 0, bad,
                                     solve_method="cg"))
    np.testing.assert_allclose(got2, expect, rtol=1e-4, atol=1e-6)


def test_warm_start_values_require_support():
    ct_c = np.eye(3)
    ct_a = np.ones((3, 2))
    with pytest.raises(ValueError, match="require p_set0"):
        nnls_activeset(ct_c, ct_a, None, np.ones((3, 2)))


def test_k0_ignored_by_chol_path(problem):
    """The direct solver must be bitwise-identical with and without k0
    (golden ANLS parity rides this path)."""
    c, a = problem
    ct_c, ct_a = c.T @ c, c.T @ a
    p0 = _scipy_columns(c, a) > 0
    base = np.asarray(nnls_activeset(ct_c, ct_a, p0))
    with_k0 = np.asarray(nnls_activeset(ct_c, ct_a, p0, np.maximum(
        _scipy_columns(c, a), 0.0)))
    np.testing.assert_array_equal(base, with_k0)
