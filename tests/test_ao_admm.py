"""Golden-parity tests for AO-ADMM (reference: nmf/ao_admm.py:201-311)."""
import contextlib
import io

import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.solvers import ao_admm

from conftest import requires_reference


def _run_reference(x, k, **kw):
    """Run the reference AO-ADMM.

    Its local prox copy crashes on modern numpy for 'l2n'
    (nmf/ao_admm.py:128 builds a ragged np.array without dtype=object,
    unlike the fixed nmf/admm.py:143), so we substitute the functionally
    identical prox from nmf/admm.py.
    """
    from nmf import admm as ref_admm
    from nmf import ao_admm as ref

    orig = ref.prox
    ref.prox = ref_admm.prox
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            return ref.ao_admm(x.copy(), k, **kw)
    finally:
        ref.prox = orig


@requires_reference
@pytest.mark.parametrize(
    "reg_w,reg_h",
    [
        ((0, "nn"), (0, "l2n")),    # reference defaults
        ((0, "nn"), (0.1, "l1n")),
    ],
)
def test_parity_eu(lowrank_data, reg_w, reg_h):
    kw = dict(distance_type="eu", reg_w=reg_w, reg_h=reg_h, min_iter=10,
              max_iter=40, admm_iter=10, tol1=1e-10, tol2=1e-10,
              nndsvd_init=(True, "zero"))
    ref = _run_reference(lowrank_data, 5, **kw)
    ours = ao_admm(lowrank_data, 5, **kw)
    assert ours.i == ref.i
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-7
    )
    np.testing.assert_allclose(ours.w, ref.w, rtol=1e-5, atol=1e-8)


@requires_reference
def test_parity_kl(lowrank_data):
    kw = dict(distance_type="kl", reg_w=(0, "nn"), reg_h=(0, "nn"),
              min_iter=10, max_iter=30, admm_iter=10, tol1=1e-10, tol2=1e-10,
              nndsvd_init=(True, "zero"))
    ref = _run_reference(lowrank_data, 5, **kw)
    ours = ao_admm(lowrank_data, 5, **kw)
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-6
    )


def test_mixed_regularizers_converge(lowrank_data):
    """The BASELINE config[4] family: KL + mixed W/H regularizers."""
    res = ao_admm(lowrank_data, 5, distance_type="kl",
                  reg_w=(0.05, "l1n"), reg_h=(0.05, "l2n"),
                  min_iter=10, max_iter=60, tol1=1e-6, tol2=1e-6)
    assert res.obj_history[-1] < res.obj_history[0]
    assert res.w.min() >= 0 and res.h.min() >= 0


def test_cg_spd_solver_matches_chol(lowrank_data):
    kw = dict(distance_type="eu", reg_h=(0, "l2n"), min_iter=5, max_iter=25,
              admm_iter=10, tol1=1e-10, tol2=1e-10, nndsvd_init=(True, "zero"))
    a = ao_admm(lowrank_data, 5, spd_solver="chol", **kw)
    b = ao_admm(lowrank_data, 5, spd_solver="cg", **kw)
    assert a.i == b.i
    np.testing.assert_allclose(np.array(b.obj_history),
                               np.array(a.obj_history), rtol=1e-7)


class TestInnerLoopStyles:
    """fori_masked must produce the exact iterates of the while loop
    (frozen-once-done == early-exit) across all five inner-ADMM loops."""

    def _problem(self, seed=3, m=40, n=30, k=5):
        rng = np.random.default_rng(seed)
        v = rng.random((m, n)) + 0.05
        w = rng.random((m, k)) + 0.1
        h = rng.random((k, n)) + 0.1
        return map(jnp.asarray, (v, w, h))

    def test_ls_update_styles_match(self):
        from tpunmf.solvers.ao_admm import _admm_ls_update

        v, w, h = self._problem()
        dual = jnp.zeros_like(h)
        # tiny tol forces early termination within admm_iter for 'while'
        a = _admm_ls_update(v, w, h, dual, 5, "nn", 30, 0.1,
                            loop_style="while")
        b = _admm_ls_update(v, w, h, dual, 5, "nn", 30, 0.1,
                            loop_style="fori_masked")
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   rtol=1e-12, atol=1e-12)

    def test_kl_update_styles_match(self):
        from tpunmf.solvers.ao_admm import _admm_kl_update

        v, w, h = self._problem()
        v_aux, dual_v = w @ h, jnp.zeros_like(v)
        dual_h = jnp.zeros_like(h)
        a = _admm_kl_update(v, v_aux, dual_v, w, h, dual_h, 5, "nn", 30,
                            0.0, loop_style="while")
        b = _admm_kl_update(v, v_aux, dual_v, w, h, dual_h, 5, "nn", 30,
                            0.0, loop_style="fori_masked")
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-12, atol=1e-12)

    def test_adaptive_and_local_styles_match(self):
        from tpunmf.solvers.ao_admm_local import (
            admm_kl_update_adaptive,
            admm_local_sparsity_update,
            admm_ls_update_adaptive,
        )

        v, w, h = self._problem()
        tau = jnp.asarray(2.0)
        eta = jnp.asarray(10.0)
        dual = jnp.zeros_like(h)
        a = admm_ls_update_adaptive(v, w, h, dual, 5, "nn", 25, 0.1,
                                    "chol", tau, eta, loop_style="while")
        b = admm_ls_update_adaptive(v, w, h, dual, 5, "nn", 25, 0.1,
                                    "chol", tau, eta,
                                    loop_style="fori_masked")
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-12, atol=1e-12)

        v_aux, dual_v = w @ h, jnp.zeros_like(v)
        a = admm_kl_update_adaptive(v, v_aux, dual_v, w, h,
                                    jnp.zeros_like(h), 5, "nn", 25, 0.0,
                                    "chol", tau, eta, loop_style="while")
        b = admm_kl_update_adaptive(v, v_aux, dual_v, w, h,
                                    jnp.zeros_like(h), 5, "nn", 25, 0.0,
                                    "chol", tau, eta,
                                    loop_style="fori_masked")
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-12, atol=1e-12)

        a = admm_local_sparsity_update(v, w, w, jnp.zeros_like(w), h, 5,
                                       25, 0.2, 1.0, True, tau, eta,
                                       "chol", loop_style="while")
        b = admm_local_sparsity_update(v, w, w, jnp.zeros_like(w), h, 5,
                                       25, 0.2, 1.0, True, tau, eta,
                                       "chol", loop_style="fori_masked")
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-12, atol=1e-12)

    def test_solver_end_to_end_unchanged_on_cpu(self):
        """CPU keeps the while style: full solver output is identical to
        an explicit loop_style override through the block."""
        from tpunmf.solvers import ao_admm

        rng = np.random.default_rng(9)
        v = rng.random((30, 24)) + 0.05
        w0 = rng.random((30, 4)) + 0.1
        h0 = rng.random((4, 24)) + 0.1
        res = ao_admm(v, 4, w_init=w0, h_init=h0, min_iter=5, max_iter=5,
                      tol1=0.0, tol2=0.0)
        assert np.all(np.isfinite(res.obj_history))
