"""Multi-device sharding on the emulated 8-device CPU mesh (SURVEY §4.3):
sharded runs must match single-device runs to deterministic-reduction
tolerance, and the explicit shard_map collectives must equal their dense
specifications."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.parallel import (
    build_mesh,
    gram_h,
    gram_w,
    nmf_shardings,
    ring_xht,
    shard_problem,
    wtx_psum,
    xht_psum,
)
from tpunmf.solvers import mur

needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (emulated) devices"
)


@pytest.fixture
def problem(rng):
    m, n, k = 64, 96, 8
    x = rng.random((m, n))
    w = rng.random((m, k))
    h = rng.random((k, n))
    return x, w, h


@needs_8_devices
def test_mesh_shapes():
    mesh = build_mesh()
    assert set(mesh.axis_names) <= {"rows", "cols"}
    assert np.prod(list(mesh.shape.values())) == 8
    mesh1d = build_mesh(shape=(8,), axis_names=("cols",))
    assert mesh1d.shape["cols"] == 8


@needs_8_devices
@pytest.mark.parametrize("shape,axes", [((8,), ("cols",)), ((2, 4), ("rows", "cols"))])
def test_collectives_match_dense(problem, shape, axes):
    x, w, h = problem
    mesh = build_mesh(shape=shape, axis_names=axes)
    xs, ws, hs = shard_problem(mesh, x, w, h)
    np.testing.assert_allclose(np.asarray(gram_h(mesh, hs)), h @ h.T, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gram_w(mesh, ws)), w.T @ w, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(xht_psum(mesh, xs, hs)), x @ h.T, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(wtx_psum(mesh, ws, xs)), w.T @ x, rtol=1e-10)


@needs_8_devices
def test_ring_equals_psum(problem):
    x, _, h = problem
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    xs, hs = jax.device_put(x, nmf_shardings(mesh)["v"]), jax.device_put(
        h, nmf_shardings(mesh)["h"]
    )
    np.testing.assert_allclose(
        np.asarray(ring_xht(mesh, xs, hs)), x @ h.T, rtol=1e-10
    )


@needs_8_devices
@pytest.mark.parametrize("distance_type", ["eu", "kl"])
def test_sharded_mur_matches_single_device(lowrank_data, distance_type):
    """GSPMD path: jitting the same solver on sharded inputs must reproduce
    the single-device run (deterministic-reduction tolerance)."""
    kw = dict(distance_type=distance_type, min_iter=5, max_iter=40,
              tol1=1e-12, tol2=1e-12, nndsvd_init=(True, "zero"))
    single = mur(lowrank_data, 5, **kw)

    mesh = build_mesh(shape=(2, 4), axis_names=("rows", "cols"))
    xs = jax.device_put(jnp.asarray(lowrank_data), nmf_shardings(mesh)["v"])
    sharded = mur(xs, 5, **kw)
    assert sharded.i == single.i
    np.testing.assert_allclose(
        np.array(sharded.obj_history), np.array(single.obj_history), rtol=1e-9
    )
    np.testing.assert_allclose(sharded.w, single.w, rtol=1e-8)


@needs_8_devices
def test_host_local_ingestion(rng):
    """Single-host emulation of the multi-host ingestion path: assemble a
    globally column-sharded array from the host's column panel."""
    from tpunmf.parallel import assemble_global_columns, host_local_column_range

    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    n = 64
    start, stop = host_local_column_range(mesh, n)
    assert (start, stop) == (0, 64)  # one host owns everything here
    block = rng.random((16, stop - start))
    arr = assemble_global_columns(mesh, block, n)
    assert arr.shape == (16, 64)
    np.testing.assert_allclose(np.asarray(arr), block)
    # sharded over cols
    assert len(arr.sharding.device_set) == 8


@needs_8_devices
def test_rank_sharding_collectives(rng):
    """EP analog: k sharded over a 'rank' axis; reconstruction via psum and
    Gram via all_gather match the dense results."""
    from tpunmf.parallel import gram_h_rank, rank_shardings, wh_psum_rank

    mesh = build_mesh(shape=(8,), axis_names=("rank",))
    m, n, k = 32, 48, 16
    w = rng.random((m, k))
    h = rng.random((k, n))
    sh = rank_shardings(mesh)
    ws = jax.device_put(w, sh["w"])
    hs = jax.device_put(h, sh["h"])
    np.testing.assert_allclose(np.asarray(wh_psum_rank(mesh, ws, hs)), w @ h,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gram_h_rank(mesh, hs)), h @ h.T,
                               rtol=1e-10)


@needs_8_devices
@pytest.mark.parametrize("solver_name", ["admm", "anls", "ao_admm"])
def test_sharded_solvers_match_single_device(lowrank_data, solver_name):
    """GSPMD path for the remaining solver families."""
    from tpunmf import solvers

    solver = getattr(solvers, solver_name)
    kw = dict(min_iter=3, max_iter=12, tol1=1e-12, tol2=1e-12,
              nndsvd_init=(True, "zero"))
    single = solver(lowrank_data, 5, **kw)

    mesh = build_mesh(shape=(2, 4), axis_names=("rows", "cols"))
    xs = jax.device_put(jnp.asarray(lowrank_data), nmf_shardings(mesh)["v"])
    sharded = solver(xs, 5, **kw)
    assert sharded.i == single.i
    np.testing.assert_allclose(
        np.array(sharded.obj_history), np.array(single.obj_history), rtol=1e-8
    )
    np.testing.assert_allclose(sharded.w, single.w, rtol=1e-7, atol=1e-10)


@needs_8_devices
def test_sharded_hals_matches_single_device(lowrank_data):
    """GSPMD HALS: the column-sweep fori_loop partitions like any other
    jitted body; sharded inputs must reproduce the single-device run."""
    from tpunmf.solvers import hals

    kw = dict(min_iter=3, max_iter=25, tol1=1e-12, tol2=1e-12,
              nndsvd_init=(True, "zero"), inner_sweeps=2)
    single = hals(lowrank_data, 5, **kw)
    mesh = build_mesh(shape=(2, 4), axis_names=("rows", "cols"))
    xs = jax.device_put(jnp.asarray(lowrank_data), nmf_shardings(mesh)["v"])
    sharded = hals(xs, 5, **kw)
    assert sharded.i == single.i
    np.testing.assert_allclose(
        np.array(sharded.obj_history), np.array(single.obj_history), rtol=1e-9)
    np.testing.assert_allclose(sharded.w, single.w, rtol=1e-7)
