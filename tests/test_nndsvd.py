"""NNDSVD initialization: golden parity vs reference (nmf/utils.py:36-93)
and structural properties."""
import numpy as np
import pytest

from tpunmf.init import nndsvd, randomized_svd

from conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("variant", ["zero", "mean"])
def test_matches_reference(rng, variant):
    from nmf import utils as ref_utils

    x = rng.random((50, 40)) + 0.05
    rw, rh = ref_utils.nndsvd(x, 7, variant=variant)
    w, h = nndsvd(x, 7, variant=variant)
    np.testing.assert_allclose(np.asarray(w), rw, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(h), rh, rtol=1e-9, atol=1e-11)


def test_nonnegative_and_shapes(rng):
    x = rng.random((30, 20))
    w, h = nndsvd(x, 6)
    assert w.shape == (30, 6) and h.shape == (6, 20)
    assert float(np.min(np.asarray(w))) >= 0.0
    assert float(np.min(np.asarray(h))) >= 0.0


def test_rank_defaults_to_n(rng):
    x = rng.random((12, 8))
    w, h = nndsvd(x)
    assert w.shape == (12, 8) and h.shape == (8, 8)


def test_random_variant_fills_zeros(rng):
    import jax

    x = rng.random((25, 18))
    w, h = nndsvd(x, 5, variant="random", key=jax.random.PRNGKey(3))
    # no exact zeros remain and everything stays non-negative
    assert float(np.min(np.asarray(w))) > 0.0
    assert float(np.min(np.asarray(h))) > 0.0


def test_randomized_svd_accuracy(rng):
    import jax

    # low-rank matrix: rSVD should nail the spectrum
    a = rng.random((120, 30))
    b = rng.random((30, 90))
    x = a @ b
    u, s, vt = randomized_svd(x, 30, key=jax.random.PRNGKey(0), power_iters=3)
    ref_s = np.linalg.svd(x, compute_uv=False)[:30]
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(u * s) @ np.asarray(vt), x, rtol=1e-6, atol=1e-8
    )


def test_nndsvd_randomized_close_to_exact(rng):
    a = rng.random((80, 10))
    b = rng.random((10, 60))
    x = a @ b
    w_e, h_e = nndsvd(x, 8, method="exact")
    w_r, h_r = nndsvd(x, 8, method="randomized", power_iters=4)
    # same subspace => same nndsvd output up to numerical noise
    np.testing.assert_allclose(np.asarray(w_r), np.asarray(w_e), rtol=1e-4, atol=1e-6)


def test_randomized_svd_sharded_input(rng):
    """rSVD's large ops are GEMMs, so it runs on a column-sharded matrix
    (the recommender-scale init path) and matches the unsharded result."""
    import jax

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 devices")
    import jax.numpy as jnp

    from tpunmf.parallel import build_mesh, nmf_shardings

    a = rng.random((96, 12))
    b = rng.random((12, 64))
    x = a @ b
    key = jax.random.PRNGKey(0)
    u0, s0, vt0 = randomized_svd(jnp.asarray(x), 10, key=key, power_iters=3)

    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    xs = jax.device_put(jnp.asarray(x), nmf_shardings(mesh)["h"])  # P(None,'cols')
    u1, s1, vt1 = randomized_svd(xs, 10, key=key, power_iters=3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(u1 * s1) @ np.asarray(vt1),
        np.asarray(u0 * s0) @ np.asarray(vt0), rtol=1e-8,
    )
