"""Fused Pallas kernels vs their jnp fallbacks (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.ops import fused


@pytest.fixture
def f32_problem(rng):
    m, n, k = 64, 128, 16
    x = jnp.asarray(rng.random((m, n)), dtype=jnp.float32)
    w = jnp.asarray(rng.random((m, k)), dtype=jnp.float32)
    h = jnp.asarray(rng.random((k, n)), dtype=jnp.float32)
    return x, w, h


def test_tileable_picks_blocks():
    x = jnp.zeros((256, 512), jnp.float32)
    w = jnp.zeros((256, 16), jnp.float32)
    h = jnp.zeros((16, 512), jnp.float32)
    assert fused._tileable(x, w, h) is not None
    # f64 -> no pallas tiling
    assert fused._tileable(x.astype(jnp.float64), w, h) is None


def test_eu_obj_kernel_matches_fallback(f32_problem):
    x, w, h = f32_problem
    ref = fused.eu_residual_obj(x, w, h, use_pallas=False)
    tile = fused._tileable(x, w, h)
    assert tile is not None
    out = fused._eu_obj_pallas(x, w, h, *tile, interpret=True)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_kl_ratio_kernel_matches_fallback(f32_problem):
    x, w, h = f32_problem
    ref = fused.kl_ratio(x, w, h, use_pallas=False)
    tile = fused._tileable(x, w, h)
    out = fused._kl_ratio_pallas(x, w, h, 1e-9, *tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_kl_ratio_obj_kernel_matches_fallback(rng):
    m, n, k = 64, 128, 8
    x = np.asarray(rng.random((m, n)), dtype=np.float32)
    x[x < 0.1] = 0.0  # exercise the NaN-masking path
    w = jnp.asarray(rng.random((m, k)), dtype=jnp.float32)
    h = jnp.asarray(rng.random((k, n)), dtype=jnp.float32)
    x = jnp.asarray(x)
    r_ref, obj_ref = fused.kl_ratio_and_obj(x, w, h, use_pallas=False)
    tile = fused._tileable(x, w, h)
    r, obj = fused._kl_ratio_obj_pallas(x, w, h, 1e-9, *tile, interpret=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=1e-5)
    np.testing.assert_allclose(float(obj), float(obj_ref), rtol=1e-4)
