"""Ulysses-style all_to_all layout flip + rank-sharded (EP) solver
(VERDICT round-1 items 5 and 6): the flip collectives must equal plain
resharding, and both end-to-end sharded MUR drivers must reproduce the
single-device MUR iterates on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.parallel import (
    build_mesh,
    mur_rank_sharded,
    mur_ulysses,
    reshard_cols_to_rows,
    reshard_rows_to_cols,
)

needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (emulated) devices"
)

_EPS = 1e-9


def _mur_eu_steps(x, w, h, n_iter, lw=0.0, lh=0.0):
    """Single-device reference iterates (solvers/mur.py step_eu formulas)."""
    for _ in range(n_iter):
        w = w * (x @ h.T) / (w @ (h @ h.T) + lw * w + _EPS)
        h = h * (w.T @ x) / ((w.T @ w) @ h + lh * h + _EPS)
    return w, h, 0.5 * np.sum((x - w @ h) ** 2)


def _mur_kl_steps(x, w, h, n_iter, lw=0.0, lh=0.0):
    for _ in range(n_iter):
        r = x / (w @ h + _EPS)
        a = w * (r @ h.T)
        b = np.sum(h, axis=1)[None, :]
        w = 2.0 * a / (b + np.sqrt(b * b + 4.0 * lw * a))
        r2 = x / (w @ h + _EPS)
        c = h * (w.T @ r2)
        d = np.sum(w, axis=0)[:, None]
        h = 2.0 * c / (d + np.sqrt(d * d + 4.0 * lh * c))
    wh = w @ h
    val = x * np.log(x / wh)
    val = np.where(np.isfinite(val), val, 0.0)
    return w, h, np.sum(val - x + wh)


@needs_8_devices
def test_reshard_roundtrip(rng):
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    x = rng.random((64, 96))
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_rows = jax.device_put(x, NamedSharding(mesh, P("cols", None)))
    x_cols = reshard_rows_to_cols(mesh, x_rows)
    # the flip must equal plain resharding of the same global array
    np.testing.assert_array_equal(np.asarray(x_cols), x)
    assert x_cols.sharding.spec == P(None, "cols")
    x_back = reshard_cols_to_rows(mesh, x_cols)
    np.testing.assert_array_equal(np.asarray(x_back), x)
    assert x_back.sharding.spec == P("cols", None)


@needs_8_devices
def test_mur_ulysses_matches_single_device(rng):
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    m, n, k = 64, 96, 8
    x = rng.random((m, n))
    w0 = rng.random((m, k))
    h0 = rng.random((k, n))

    w_s, h_s, obj_s = mur_ulysses(mesh, x, w0, h0, n_iter=12)
    w_ref, h_ref, obj_ref = _mur_eu_steps(x, w0.copy(), h0.copy(), 12)

    np.testing.assert_allclose(np.asarray(w_s), w_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(h_s), h_ref, rtol=1e-8)
    np.testing.assert_allclose(float(obj_s), obj_ref, rtol=1e-10)


@needs_8_devices
def test_mur_ulysses_with_regularization(rng):
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    x = rng.random((32, 48))
    w0 = rng.random((32, 6))
    h0 = rng.random((6, 48))
    w_s, h_s, obj_s = mur_ulysses(mesh, x, w0, h0, n_iter=6,
                                  lambda_w=0.1, lambda_h=0.2)
    w_ref, h_ref, obj_ref = _mur_eu_steps(x, w0.copy(), h0.copy(), 6, 0.1, 0.2)
    np.testing.assert_allclose(np.asarray(w_s), w_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(h_s), h_ref, rtol=1e-8)


@needs_8_devices
def test_mur_ulysses_shape_validation(rng):
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    with pytest.raises(ValueError):
        mur_ulysses(mesh, rng.random((30, 48)), rng.random((30, 4)),
                    rng.random((4, 48)), n_iter=1)


@needs_8_devices
@pytest.mark.parametrize("distance_type", ["eu", "kl"])
def test_mur_rank_sharded_matches_single_device(rng, distance_type):
    mesh = build_mesh(shape=(8,), axis_names=("rank",))
    m, n, k = 48, 56, 16  # k=16 over 8 devices -> 2 components each
    x = rng.random((m, n)) + 0.05
    w0 = rng.random((m, k))
    h0 = rng.random((k, n))

    w_s, h_s, obj_s = mur_rank_sharded(mesh, x, w0, h0, n_iter=10,
                                       distance_type=distance_type)
    steps = _mur_kl_steps if distance_type == "kl" else _mur_eu_steps
    w_ref, h_ref, obj_ref = steps(x, w0.copy(), h0.copy(), 10)

    np.testing.assert_allclose(np.asarray(w_s), w_ref, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(h_s), h_ref, rtol=1e-7)
    np.testing.assert_allclose(float(obj_s), obj_ref, rtol=1e-8)


@needs_8_devices
def test_mur_rank_sharded_factors_stay_sharded(rng):
    from jax.sharding import PartitionSpec as P

    mesh = build_mesh(shape=(8,), axis_names=("rank",))
    x = rng.random((24, 32))
    w0 = rng.random((24, 8))
    h0 = rng.random((8, 32))
    w_s, h_s, _ = mur_rank_sharded(mesh, x, w0, h0, n_iter=2)
    assert tuple(w_s.sharding.spec) == (None, "rank")
    assert tuple(h_s.sharding.spec)[:1] == ("rank",)


@needs_8_devices
def test_mur_rank_sharded_validation(rng):
    mesh = build_mesh(shape=(8,), axis_names=("rank",))
    with pytest.raises(ValueError):
        mur_rank_sharded(mesh, rng.random((16, 16)), rng.random((16, 6)),
                         rng.random((6, 16)), n_iter=1)  # k=6 not /8
    mesh2 = build_mesh(shape=(8,), axis_names=("cols",))
    with pytest.raises(ValueError):
        mur_rank_sharded(mesh2, rng.random((16, 16)), rng.random((16, 8)),
                         rng.random((8, 16)), n_iter=1)


@needs_8_devices
def test_ring_rotate_h_matches_dense(rng):
    """The genuine beyond-HBM ring: X stays put, only H panels rotate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpunmf.parallel import ring_xht_rotate_h

    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    m, n, k = 64, 96, 8
    x = rng.random((m, n))
    h = rng.random((k, n))
    xs = jax.device_put(x, NamedSharding(mesh, P("cols", None)))
    hs = jax.device_put(h, NamedSharding(mesh, P(None, "cols")))
    out = ring_xht_rotate_h(mesh, xs, hs)
    np.testing.assert_allclose(np.asarray(out), x @ h.T, rtol=1e-10)
    assert tuple(out.sharding.spec)[:1] == ("cols",)


@needs_8_devices
@pytest.mark.parametrize("schedule", ["ulysses", "rank"])
def test_mur_sharded_solver_matches_gspmd_mur(rng, schedule):
    """The full convergence-driven driver (Results, obj_history, early
    stop) reproduces solvers.mur on the same init and tolerances."""
    from tpunmf.parallel import mur_sharded
    from tpunmf.solvers import mur

    axis = "rank" if schedule == "rank" else "cols"
    mesh = build_mesh(shape=(8,), axis_names=(axis,))
    m, n, k = 64, 96, 8
    x = rng.random((m, n)) + 0.05
    w0 = rng.random((m, k))
    h0 = rng.random((k, n))
    kw = dict(distance_type="eu", min_iter=5, max_iter=200, tol1=1e-12,
              tol2=1e-6, w_init=w0, h_init=h0)
    res_s = mur_sharded(x, k, mesh, schedule=schedule, **kw)
    res_ref = mur(x, k, **kw)
    assert res_s.i == res_ref.i  # identical early-stop iteration
    np.testing.assert_allclose(
        np.asarray(res_s.obj_history), np.asarray(res_ref.obj_history),
        rtol=1e-8)
    np.testing.assert_allclose(res_s.w, res_ref.w, rtol=1e-6)
    np.testing.assert_allclose(res_s.h, res_ref.h, rtol=1e-6)
    assert res_s.experiment.method == "mur"


@needs_8_devices
def test_mur_sharded_kl_and_elevation(rng):
    """KL schedule run + negative-data elevation (nmf/mur.py:99-102)."""
    from tpunmf.parallel import mur_sharded
    from tpunmf.solvers import mur

    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    x = rng.random((32, 48)) - 0.2  # negative entries -> elevation path
    kw = dict(distance_type="kl", min_iter=3, max_iter=30, tol1=0.0,
              tol2=0.0, key=jax.random.PRNGKey(3))
    res_s = mur_sharded(x, 4, mesh, schedule="ulysses", **kw)
    res_ref = mur(x, 4, **kw)
    np.testing.assert_allclose(
        np.asarray(res_s.obj_history), np.asarray(res_ref.obj_history),
        rtol=1e-6)


@needs_8_devices
def test_mur_sharded_via_facade(rng):
    from tpunmf import NMF

    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    x = rng.random((32, 48))
    model = NMF(x, 4, mesh=mesh)
    res = model.factorize(method="mur", schedule="ulysses",
                          distance_type="eu", min_iter=2, max_iter=20,
                          tol1=0.0, tol2=0.0)
    assert model.w.shape == (32, 4) and model.h.shape == (4, 48)
    assert len(res.obj_history) == 21
    with pytest.raises(ValueError):
        NMF(x, 4).factorize(method="mur", schedule="ulysses", max_iter=2)


@needs_8_devices
def test_mur_ulysses_kl_matches_single_device(rng):
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    m, n, k = 64, 96, 8
    x = rng.random((m, n)) + 0.05
    w0 = rng.random((m, k))
    h0 = rng.random((k, n))
    w_s, h_s, obj_s = mur_ulysses(mesh, x, w0, h0, n_iter=10,
                                  distance_type="kl")
    w_ref, h_ref, obj_ref = _mur_kl_steps(x, w0.copy(), h0.copy(), 10)
    np.testing.assert_allclose(np.asarray(w_s), w_ref, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(h_s), h_ref, rtol=1e-7)
    np.testing.assert_allclose(float(obj_s), obj_ref, rtol=1e-8)
