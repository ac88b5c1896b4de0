"""Golden-parity and property tests for the MUR solver
(reference: nmf/mur.py:52-146)."""
import contextlib
import io

import numpy as np
import pytest

from tpunmf.solvers import mur

from conftest import requires_reference


def _run_reference_mur(x, k, **kw):
    from nmf import mur as ref_mur

    with contextlib.redirect_stdout(io.StringIO()):
        return ref_mur.mur(x.copy(), k, **kw)


@requires_reference
@pytest.mark.parametrize("distance_type", ["eu", "kl"])
@pytest.mark.parametrize("lambdas", [(0.0, 0.0), (0.1, 0.05)])
def test_iterate_parity(lowrank_data, distance_type, lambdas):
    """Iterate-for-iterate objective-trace parity on identical (NNDSVD) init."""
    lw, lh = lambdas
    kw = dict(
        distance_type=distance_type,
        min_iter=10,
        max_iter=120,
        tol1=1e-10,
        tol2=1e-10,
        lambda_w=lw,
        lambda_h=lh,
        nndsvd_init=(True, "zero"),
    )
    ref = _run_reference_mur(lowrank_data, 5, **kw)
    ours = mur(lowrank_data, 5, **kw)

    assert ours.i == ref.i
    ro, oo = np.array(ref.obj_history), np.array(ours.obj_history)
    assert len(ro) == len(oo)
    np.testing.assert_allclose(oo, ro, rtol=1e-10)
    np.testing.assert_allclose(ours.w, ref.w, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(ours.h, ref.h, rtol=1e-7, atol=1e-10)


@requires_reference
def test_convergence_stop_parity(lowrank_data):
    """Both implementations stop at the same iteration under loose tols."""
    kw = dict(
        distance_type="eu",
        min_iter=5,
        max_iter=500,
        tol1=1e-6,
        tol2=1e-6,
        nndsvd_init=(True, "zero"),
    )
    ref = _run_reference_mur(lowrank_data, 5, **kw)
    ours = mur(lowrank_data, 5, **kw)
    assert ours.i == ref.i
    assert np.isclose(ours.obj_history[-1], ref.obj_history[-1], rtol=1e-8)


@requires_reference
def test_negative_data_elevation(rng):
    """min(x) < 0 data is elevated before factorization (nmf/mur.py:99-102)."""
    x = rng.random((40, 30)) - 0.02
    kw = dict(distance_type="eu", min_iter=5, max_iter=60, tol1=1e-12, tol2=1e-12,
              nndsvd_init=(True, "zero"))
    ref = _run_reference_mur(x, 4, **kw)
    ours = mur(x, 4, **kw)
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-9
    )


def test_eu_objective_monotone_nonincreasing(lowrank_data):
    """Lee-Seung theorem: exact unregularized EU-MUR never increases the
    objective (SURVEY §4 invariant tier)."""
    res = mur(lowrank_data, 5, distance_type="eu", min_iter=5, max_iter=150,
              tol1=1e-14, tol2=1e-14, nndsvd_init=(True, "zero"))
    hist = np.array(res.obj_history)
    assert np.all(np.diff(hist) <= 1e-10 * np.maximum(hist[:-1], 1.0))


def test_factors_nonnegative(lowrank_data):
    res = mur(lowrank_data, 5, distance_type="kl", min_iter=5, max_iter=50,
              tol1=1e-12, tol2=1e-12, nndsvd_init=(True, "zero"))
    assert res.w.min() >= 0 and res.h.min() >= 0


def test_explicit_init_and_gram_objective(lowrank_data, rng):
    w0 = rng.random((60, 5))
    h0 = rng.random((5, 48))
    res_exact = mur(lowrank_data, 5, distance_type="eu", min_iter=5, max_iter=80,
                    tol1=1e-14, tol2=1e-14, w_init=w0, h_init=h0, objective="exact")
    res_gram = mur(lowrank_data, 5, distance_type="eu", min_iter=5, max_iter=80,
                   tol1=1e-14, tol2=1e-14, w_init=w0, h_init=h0, objective="gram")
    np.testing.assert_allclose(
        np.array(res_exact.obj_history), np.array(res_gram.obj_history), rtol=1e-9
    )
    np.testing.assert_allclose(res_exact.w, res_gram.w, rtol=1e-9)


def test_blocked_execution_matches_single_dispatch(lowrank_data):
    kw = dict(distance_type="eu", min_iter=5, max_iter=70, tol1=1e-12, tol2=1e-12,
              nndsvd_init=(True, "zero"))
    a = mur(lowrank_data, 5, **kw)
    b = mur(lowrank_data, 5, block_size=13, **kw)
    assert a.i == b.i
    np.testing.assert_allclose(np.array(a.obj_history), np.array(b.obj_history))
    np.testing.assert_allclose(a.w, b.w)


def test_blocked_objective_every_is_block_size_invariant(lowrank_data):
    """With objective_every > 1, blocked execution must not force extra
    real objectives at block boundaries: the trace (including which slots
    are NaN), the stopping iteration, and the factors are identical to a
    single-dispatch run.  Block boundaries falling off-cadence (13 % 3
    != 0) make this a real exercise of the refresh gate."""
    kw = dict(distance_type="eu", min_iter=4, max_iter=31, tol1=1e-12,
              tol2=1e-12, nndsvd_init=(True, "zero"), objective_every=3)
    a = mur(lowrank_data, 5, **kw)
    b = mur(lowrank_data, 5, block_size=13, **kw)
    assert a.i == b.i
    ha, hb = np.array(a.obj_history), np.array(b.obj_history)
    assert np.array_equal(np.isnan(ha), np.isnan(hb))
    np.testing.assert_array_equal(ha[~np.isnan(ha)], hb[~np.isnan(hb)])
    np.testing.assert_array_equal(np.array(a.w), np.array(b.w))


def test_bf16_data_mode(lowrank_data, rng):
    """bf16 X storage with f32 factors: converges and tracks the f32 run at
    data-precision tolerance."""
    import jax.numpy as jnp

    w0 = rng.random((60, 5))
    h0 = rng.random((5, 48))
    kw = dict(distance_type="eu", min_iter=3, max_iter=30, tol1=1e-12,
              tol2=1e-12, w_init=w0, h_init=h0)
    f32 = mur(lowrank_data.astype(np.float32), 5, **kw)
    b16 = mur(lowrank_data.astype(np.float32), 5, data_dtype=jnp.bfloat16, **kw)
    assert b16.w.dtype == np.float32  # factors stay f32
    rel = np.linalg.norm(b16.w - f32.w) / np.linalg.norm(f32.w)
    assert rel < 0.05
    assert b16.obj_history[-1] < b16.obj_history[0]


@requires_reference
def test_random_init_parity_via_replayed_rng(lowrank_data):
    """Random-init path: replay the reference's global-RNG draws
    (nmf/mur.py:108-109) and feed the same arrays as explicit inits."""
    np.random.seed(1234)
    w0 = np.abs(np.random.randn(60, 5))
    h0 = np.abs(np.random.randn(5, 48))

    np.random.seed(1234)
    ref = _run_reference_mur(
        lowrank_data, 5, distance_type="eu", min_iter=5, max_iter=60,
        tol1=1e-10, tol2=1e-10, nndsvd_init=(False, "zero"),
    )
    ours = mur(lowrank_data, 5, distance_type="eu", min_iter=5, max_iter=60,
               tol1=1e-10, tol2=1e-10, w_init=w0, h_init=h0)
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-9
    )


@pytest.mark.parametrize("distance_type", ["eu", "kl"])
def test_objective_every_cadence(lowrank_data, distance_type):
    """objective_every=N: factors bitwise-identical to every-iteration
    recording, NaN at skipped slots, real entries match the dense trace
    exactly, and the final entry is always real."""
    kw = dict(distance_type=distance_type, min_iter=4, max_iter=11,
              tol1=1e-12, tol2=1e-12, nndsvd_init=(True, "zero"))
    dense = mur(lowrank_data, 5, **kw)
    every3 = mur(lowrank_data, 5, objective_every=3, **kw)

    # Precondition for the fixed real-slot mask below: the tight tols
    # must not trigger early convergence — the run uses its full budget
    # (i == max_iter - 1).  If the fixture ever converges within the
    # budget, the run stops at a refresh iteration and the mask
    # assertion would fail confusingly; fail loudly here instead.
    assert dense.i == 10
    assert every3.i == dense.i
    assert np.array_equal(np.array(dense.w), np.array(every3.w))
    assert np.array_equal(np.array(dense.h), np.array(every3.h))
    hd, h3 = np.array(dense.obj_history), np.array(every3.obj_history)
    assert len(hd) == len(h3)
    real = ~np.isnan(h3)
    # init slot, every 3rd iteration, and the final slot are real
    expect = np.zeros(len(h3), bool)
    expect[0] = True
    expect[3::3] = True
    expect[-1] = True
    assert np.array_equal(real, expect)
    np.testing.assert_array_equal(h3[real], hd[real])


def test_objective_every_convergence_across_gap(lowrank_data):
    """The convergence check compares across the cadence gap: a
    loose-tol2 run with objective_every=4 still stops early, at a
    refresh iteration, with a real final objective."""
    kw = dict(distance_type="eu", min_iter=5, max_iter=400,
              tol1=1e-12, tol2=1e-2, nndsvd_init=(True, "zero"))
    dense = mur(lowrank_data, 5, **kw)
    cad = mur(lowrank_data, 5, objective_every=4, **kw)
    assert dense.i < 399  # the dense run stops early at this tol2
    assert cad.i < 399
    # stops on a refresh iteration: obj_history[i+1] is real
    assert not np.isnan(np.array(cad.obj_history)[-1])


def test_objective_every_validation(lowrank_data):
    with pytest.raises(ValueError):
        mur(lowrank_data, 5, objective_every=0, max_iter=3, min_iter=1)
