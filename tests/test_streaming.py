"""Out-of-core streaming MUR vs the in-core solver: identical trajectories."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpunmf.solvers import mur
from tpunmf.solvers.streaming import mur_streaming


@pytest.fixture
def sparse_problem(rng):
    # values exactly representable in float32 so the f32 panel path and the
    # f64 in-core path see identical inputs
    dense = np.round(rng.random((90, 70)) * 256) / 256
    dense[dense < 0.5] = 0.0  # ~50% zeros
    return sp.csr_matrix(dense.astype(np.float64)), dense


@pytest.mark.parametrize("distance_type", ["eu", "kl"])
def test_streaming_matches_incore(sparse_problem, rng, distance_type):
    csr, dense = sparse_problem
    w0 = rng.random((90, 6))
    h0 = rng.random((6, 70))
    kw = dict(distance_type=distance_type, min_iter=3, max_iter=20,
              tol1=1e-12, tol2=1e-12)
    incore = mur(dense, 6, w_init=w0, h_init=h0, **kw)
    # ragged tiles on purpose (90/32, 70/32 both non-integral)
    streamed = mur_streaming(csr, 6, w_init=w0, h_init=h0, row_block=32,
                             col_panel=32, dtype=np.float64, **kw)
    np.testing.assert_allclose(
        np.array(streamed.obj_history), np.array(incore.obj_history),
        rtol=1e-8,
    )
    np.testing.assert_allclose(streamed.w, incore.w, rtol=1e-7)
    np.testing.assert_allclose(streamed.h, incore.h, rtol=1e-7)


def test_streaming_skips_empty_panels(rng):
    """A matrix with an all-zero column band: EU numerator passes skip
    those panels and the result is still exact."""
    dense = np.zeros((64, 96))
    dense[:, :32] = np.round(rng.random((64, 32)) * 256) / 256
    dense[:, 64:] = np.round(rng.random((64, 32)) * 256) / 256
    csr = sp.csr_matrix(dense)
    w0 = rng.random((64, 4))
    h0 = rng.random((4, 96))
    kw = dict(distance_type="eu", min_iter=2, max_iter=10, tol1=1e-12,
              tol2=1e-12)
    a = mur_streaming(csr, 4, w_init=w0, h_init=h0, row_block=32,
                      col_panel=32, dtype=np.float64, **kw)
    b = mur(dense, 4, w_init=w0, h_init=h0, **kw)
    np.testing.assert_allclose(np.array(a.obj_history),
                               np.array(b.obj_history), rtol=1e-8)


def test_streaming_kl_zero_band(rng):
    """KL with an all-zero column band: empty panels contribute their
    analytic sum(WH) to the objective; trajectory still matches in-core."""
    dense = np.zeros((64, 96))
    dense[:, :32] = np.round(rng.random((64, 32)) * 256) / 256
    dense[:, 64:] = np.round(rng.random((64, 32)) * 256) / 256
    csr = sp.csr_matrix(dense)
    w0 = rng.random((64, 4)) + 0.1
    h0 = rng.random((4, 96)) + 0.1
    kw = dict(distance_type="kl", min_iter=2, max_iter=12, tol1=1e-12,
              tol2=1e-12)
    a = mur_streaming(csr, 4, w_init=w0, h_init=h0, row_block=32,
                      col_panel=32, dtype=np.float64, **kw)
    b = mur(dense, 4, w_init=w0, h_init=h0, **kw)
    np.testing.assert_allclose(np.array(a.obj_history),
                               np.array(b.obj_history), rtol=1e-8)


def test_sharded_streaming_matches_incore(rng):
    """Config[4]-shaped path: H column-sharded on the mesh, V streamed in
    row blocks with per-shard densification — must reproduce the in-core
    trajectory."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh
    from tpunmf.solvers.streaming_sharded import mur_streaming_sharded

    m, n, k = 72, 96, 5  # n divisible by 8 shards; ragged row blocks (72/32)
    dense = np.round(rng.random((m, n)) * 256) / 256
    dense[dense < 0.4] = 0.0
    csr = sp.csr_matrix(dense)
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1

    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    kw = dict(min_iter=3, max_iter=15, tol1=1e-12, tol2=1e-12)
    sharded = mur_streaming_sharded(csr, k, mesh, w_init=w0, h_init=h0,
                                    row_block=32, dtype=np.float64, **kw)
    incore = mur(dense, k, distance_type="eu", w_init=w0, h_init=h0,
                 objective="gram", **kw)
    np.testing.assert_allclose(
        np.array(sharded.obj_history), np.array(incore.obj_history), rtol=1e-8
    )
    np.testing.assert_allclose(sharded.w, incore.w, rtol=1e-8)
    np.testing.assert_allclose(sharded.h, incore.h, rtol=1e-8)


def test_sharded_streaming_kl_matches_incore(rng):
    """KL variant of the sharded out-of-core path."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh
    from tpunmf.solvers.streaming_sharded import mur_streaming_sharded

    m, n, k = 72, 96, 5
    dense = np.round(rng.random((m, n)) * 256) / 256
    dense[dense < 0.4] = 0.0
    csr = sp.csr_matrix(dense)
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((5, 96)) + 0.1

    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    kw = dict(min_iter=3, max_iter=12, tol1=1e-12, tol2=1e-12)
    sharded = mur_streaming_sharded(csr, k, mesh, distance_type="kl",
                                    w_init=w0, h_init=h0, row_block=32,
                                    dtype=np.float64, **kw)
    incore = mur(dense, k, distance_type="kl", w_init=w0, h_init=h0, **kw)
    np.testing.assert_allclose(
        np.array(sharded.obj_history), np.array(incore.obj_history), rtol=1e-8
    )
    np.testing.assert_allclose(sharded.w, incore.w, rtol=1e-8)


def test_sharded_streaming_default_row_block_small_m(rng):
    """Review finding: default row_block (8192) with m < row_block must not
    crash (PanelStream clamps; the driver must use the clamped value)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh
    from tpunmf.solvers.streaming_sharded import mur_streaming_sharded

    dense = np.round(rng.random((72, 96)) * 256) / 256
    csr = sp.csr_matrix(dense)
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    res = mur_streaming_sharded(csr, 4, mesh, min_iter=2, max_iter=8,
                                tol1=1e-9, tol2=1e-9)  # default row_block
    assert np.isfinite(res.obj_history[-1])


def test_streaming_coo_duplicates(rng):
    """Review finding: COO duplicate coordinates are summed by the panel
    path; the gram-trick objective must use the deduplicated values."""
    rows = np.array([0, 0, 1, 2, 2, 2])
    cols = np.array([1, 1, 0, 3, 3, 2])
    vals = np.array([1.0, 2.0, 3.0, 0.5, 0.25, 1.0])
    coo = sp.coo_matrix((vals, (rows, cols)), shape=(8, 8))
    dense = coo.toarray()
    w0 = rng.random((8, 2)) + 0.1
    h0 = rng.random((2, 8)) + 0.1
    kw = dict(distance_type="eu", min_iter=2, max_iter=10, tol1=1e-12,
              tol2=1e-12)
    a = mur_streaming(coo, 2, w_init=w0, h_init=h0, row_block=4,
                      col_panel=4, dtype=np.float64, **kw)
    b = mur(dense, 2, w_init=w0, h_init=h0, **kw)
    np.testing.assert_allclose(np.array(a.obj_history),
                               np.array(b.obj_history), rtol=1e-8)


def test_sharded_streaming_densifies_each_block_once(rng, monkeypatch):
    """VERDICT round-1 item 2: the restructured EU loop must read each
    row block exactly once per pass — (iters + 1) passes total (one for
    the initial objective), with one densify per addressable shard."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    import tpunmf.solvers.streaming_sharded as ss
    from tpunmf.parallel import build_mesh

    created = []
    orig = ss.PanelStream

    def capture(*a, **k):
        st = orig(*a, **k)
        created.append(st)
        return st

    monkeypatch.setattr(ss, "PanelStream", capture)

    m, n, k, iters = 64, 96, 4, 6
    dense = rng.random((m, n))
    dense[dense < 0.5] = 0.0
    csr = sp.csr_matrix(dense)
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    ss.mur_streaming_sharded(csr, k, mesh, row_block=32, min_iter=iters,
                             max_iter=iters, tol1=0.0, tol2=0.0)
    (stream,) = created
    rb = stream.grid[0]
    n_shards = 8
    assert stream.densify_count == n_shards * rb * (iters + 1)


def test_sharded_streaming_kl_lagged_objective(rng):
    """objective='lagged' must equal the exact trajectory shifted by one
    iteration (1 streamed pass per iteration instead of 2)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh
    from tpunmf.solvers.streaming_sharded import mur_streaming_sharded

    m, n, k, iters = 64, 96, 4, 8
    dense = rng.random((m, n))
    dense[dense < 0.5] = 0.0
    csr = sp.csr_matrix(dense)
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    kw = dict(distance_type="kl", w_init=w0, h_init=h0, row_block=32,
              dtype=np.float64, min_iter=iters, max_iter=iters,
              tol1=0.0, tol2=0.0)
    exact = mur_streaming_sharded(csr, k, mesh, objective="exact", **kw)
    lagged = mur_streaming_sharded(csr, k, mesh, objective="lagged", **kw)
    np.testing.assert_allclose(
        np.array(lagged.obj_history),
        np.array(exact.obj_history)[: len(lagged.obj_history)],
        rtol=1e-10,
    )


def test_sharded_streaming_prefetch_off_matches(rng):
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh
    from tpunmf.solvers.streaming_sharded import mur_streaming_sharded

    m, n, k = 64, 96, 4
    dense = rng.random((m, n))
    dense[dense < 0.5] = 0.0
    csr = sp.csr_matrix(dense)
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    kw = dict(w_init=w0, h_init=h0, row_block=32, dtype=np.float64,
              min_iter=3, max_iter=6, tol1=0.0, tol2=0.0)
    on = mur_streaming_sharded(csr, k, mesh, prefetch=True, **kw)
    off = mur_streaming_sharded(csr, k, mesh, prefetch=False, **kw)
    np.testing.assert_array_equal(on.w, off.w)
    np.testing.assert_array_equal(on.h, off.h)


def test_panel_bf16_matches_f32(rng):
    """Native bf16 densify == f32 densify rounded (RNE)."""
    import ml_dtypes
    import scipy.sparse as sp

    from tpunmf.data.sparse_panels import PanelStream

    m, n = 96, 80
    dense = (rng.random((m, n)) * (rng.random((m, n)) < 0.2)).astype(
        np.float32)
    stream = PanelStream(sp.csr_matrix(dense), row_block=32, col_panel=40)
    for i in range(3):
        for j in range(2):
            got = stream.panel_bf16(i, j)
            assert got.dtype == ml_dtypes.bfloat16
            want = stream.panel(i, j).astype(ml_dtypes.bfloat16)
            np.testing.assert_array_equal(
                got.view(np.uint16), want.view(np.uint16))


def test_streaming_bf16_transfer_close_to_f32(rng):
    """transfer_dtype=bf16 converges to ~the same objective (the data is
    bf16-rounded, so exact equality is not expected)."""
    import scipy.sparse as sp

    from tpunmf.solvers import mur_streaming

    m, n, k = 60, 52, 4
    dense = (rng.random((m, k)) @ rng.random((k, n))).astype(np.float32)
    dense *= rng.random((m, n)) < 0.4
    x = sp.csr_matrix(dense)
    w0 = (rng.random((m, k)) + 0.1).astype(np.float32)
    h0 = (rng.random((k, n)) + 0.1).astype(np.float32)
    kw = dict(min_iter=5, max_iter=5, tol1=0.0, tol2=0.0, row_block=32,
              col_panel=32, w_init=w0, h_init=h0)
    a = mur_streaming(x, k, distance_type="eu", **kw)
    b = mur_streaming(x, k, distance_type="eu",
                      transfer_dtype=jnp.bfloat16, **kw)
    assert abs(a.obj_history[-1] - b.obj_history[-1]) <= (
        2e-2 * abs(a.obj_history[-1]) + 1e-6)
    # KL route also runs finite with bf16 panels
    c = mur_streaming(x, k, distance_type="kl",
                      transfer_dtype=jnp.bfloat16, **kw)
    assert np.all(np.isfinite(c.obj_history))


def test_pipelined_schedule_preserves_trajectory(rng):
    """The pipelined transfer refactor must not change iterates at all
    (accumulation order per block is unchanged)."""
    import scipy.sparse as sp

    from tpunmf.solvers import mur, mur_streaming

    m, n, k = 48, 40, 3
    dense = (rng.random((m, k)) @ rng.random((k, n))).astype(np.float64)
    x = sp.csr_matrix(dense)
    w0 = rng.random((m, k)) + 0.1
    h0 = rng.random((k, n)) + 0.1
    r_st = mur_streaming(x, k, distance_type="eu", min_iter=6, max_iter=6,
                         tol1=0.0, tol2=0.0, row_block=16, col_panel=16,
                         w_init=w0, h_init=h0, dtype=jnp.float64,
                         skip_empty_panels=False)
    r_in = mur(dense, k, distance_type="eu", min_iter=6, max_iter=6,
               tol1=0.0, tol2=0.0, w_init=w0, h_init=h0, objective="gram")
    # panels densify to f32 (the host panelizer's dtype), so parity with
    # the f64 in-core run is f32-grade
    np.testing.assert_allclose(r_st.w, r_in.w, rtol=1e-6, atol=1e-8)


def test_streaming_sharded_bf16_transfer(rng):
    """Sharded out-of-core path with bf16 block transfer stays close to
    the f32 run and finite."""
    import jax
    import pytest
    import scipy.sparse as sp

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh
    from tpunmf.solvers.streaming_sharded import mur_streaming_sharded

    m, n, k = 64, 48, 4
    dense = (rng.random((m, k)) @ rng.random((k, n))).astype(np.float32)
    dense *= rng.random((m, n)) < 0.5
    x = sp.csr_matrix(dense)
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    w0 = (rng.random((m, k)) + 0.1).astype(np.float32)
    h0 = (rng.random((k, n)) + 0.1).astype(np.float32)
    kw = dict(min_iter=4, max_iter=4, tol1=0.0, tol2=0.0, row_block=32,
              w_init=w0, h_init=h0)
    a = mur_streaming_sharded(x, k, mesh, **kw)
    b = mur_streaming_sharded(x, k, mesh, transfer_dtype=jnp.bfloat16, **kw)
    assert abs(a.obj_history[-1] - b.obj_history[-1]) <= (
        2e-2 * abs(a.obj_history[-1]) + 1e-6)
    assert np.all(np.isfinite(b.obj_history))
