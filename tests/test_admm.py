"""Golden-parity tests for full-splitting ADMM (reference: nmf/admm.py:233-345)."""
import contextlib
import io

import numpy as np
import pytest

from tpunmf.solvers import admm

from conftest import requires_reference


def _run_reference_admm(x, k, **kw):
    from nmf import admm as ref_admm

    with contextlib.redirect_stdout(io.StringIO()):
        return ref_admm.admm(x.copy(), k, **kw)


@requires_reference
@pytest.mark.parametrize(
    "reg_w,reg_h",
    [
        ((0, "nn"), (0, "l2n")),     # reference defaults
        ((0, "nn"), (0.1, "l1n")),   # the BASELINE 'L1 reg on H' config family
        ((0.05, "l2n"), (0, "nn")),
    ],
)
def test_parity_eu(lowrank_data, reg_w, reg_h):
    kw = dict(rho=1.0, distance_type="eu", reg_w=reg_w, reg_h=reg_h,
              min_iter=10, max_iter=80, tol1=1e-10, tol2=1e-10,
              nndsvd_init=(True, "zero"))
    ref = _run_reference_admm(lowrank_data, 5, **kw)
    ours = admm(lowrank_data, 5, **kw)
    assert ours.i == ref.i
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-7
    )
    np.testing.assert_allclose(ours.w, ref.w, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ours.h, ref.h, rtol=1e-5, atol=1e-8)


@requires_reference
def test_parity_kl(lowrank_data):
    kw = dict(rho=1.0, distance_type="kl", reg_w=(0, "nn"), reg_h=(0, "nn"),
              min_iter=10, max_iter=60, tol1=1e-10, tol2=1e-10,
              nndsvd_init=(True, "zero"))
    ref = _run_reference_admm(lowrank_data, 5, **kw)
    ours = admm(lowrank_data, 5, **kw)
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-6
    )


@requires_reference
def test_parity_rho(lowrank_data):
    """Non-default rho exercises the dampening path."""
    kw = dict(rho=5.0, distance_type="eu", reg_w=(0, "nn"), reg_h=(0, "nn"),
              min_iter=10, max_iter=50, tol1=1e-10, tol2=1e-10,
              nndsvd_init=(True, "zero"))
    ref = _run_reference_admm(lowrank_data, 5, **kw)
    ours = admm(lowrank_data, 5, **kw)
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-7
    )


def test_convergence_and_nonnegativity(lowrank_data):
    res = admm(lowrank_data, 5, min_iter=10, max_iter=200, tol1=1e-6, tol2=1e-6)
    assert res.obj_history[-1] < res.obj_history[0]
    assert res.w.min() >= 0 and res.h.min() >= 0


def test_adaptive_rho_converges_faster_or_equal(lowrank_data):
    """Residual-balancing rho damping (the BASELINE 'rho-damped' config)
    must remain convergent and track the fixed-rho solution quality."""
    kw = dict(distance_type="eu", reg_w=(0, "nn"), reg_h=(0.05, "l1n"),
              min_iter=10, max_iter=150, tol1=1e-10, tol2=1e-10,
              nndsvd_init=(True, "zero"))
    fixed = admm(lowrank_data, 5, rho=10.0, **kw)          # badly chosen rho
    damped = admm(lowrank_data, 5, rho=10.0, rho_mode="adaptive", **kw)
    assert damped.obj_history[-1] <= fixed.obj_history[-1] * 1.05
    assert damped.w.min() >= 0 and damped.h.min() >= 0


def test_adaptive_rho_checkpoint_roundtrip(tmp_path, lowrank_data):
    """rho lives in the carried state: resume must restore it."""
    kw = dict(distance_type="eu", rho=1.0, rho_mode="adaptive",
              min_iter=5, max_iter=30, tol1=1e-12, tol2=1e-12,
              nndsvd_init=(True, "zero"))
    full = admm(lowrank_data, 5, **kw)
    ck = str(tmp_path / "ck")

    class Stop(Exception):
        pass

    calls = []

    def cb(c):
        calls.append(1)
        if len(calls) == 2:
            raise Stop

    try:
        admm(lowrank_data, 5, **kw, checkpoint_path=ck, checkpoint_every=7,
             on_block_end=cb)
    except Stop:
        pass
    resumed = admm(lowrank_data, 5, **kw, checkpoint_path=ck,
                   checkpoint_every=7, resume=True)
    np.testing.assert_allclose(
        np.array(resumed.obj_history), np.array(full.obj_history), rtol=1e-10
    )


@requires_reference
def test_parity_l1inf_on_h(lowrank_data):
    """The l1,inf 'local sparsity' prox in the live solver loop
    (nmf/admm.py:158-183) — the water-filling arithmetic must match inside
    full ADMM, not just in isolation."""
    kw = dict(rho=1.5, distance_type="eu", reg_w=(0, "nn"),
              reg_h=(0.2, "l1inf"), min_iter=5, max_iter=25, tol1=1e-10,
              tol2=1e-10, nndsvd_init=(True, "zero"))
    ref = _run_reference_admm(lowrank_data, 4, **kw)
    ours = admm(lowrank_data, 4, **kw)
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-6
    )


@requires_reference
def test_parity_kl_with_l2n(lowrank_data):
    kw = dict(rho=1.0, distance_type="kl", reg_w=(0, "nn"),
              reg_h=(0.05, "l2n"), min_iter=5, max_iter=40, tol1=1e-10,
              tol2=1e-10, nndsvd_init=(True, "zero"))
    ref = _run_reference_admm(lowrank_data, 5, **kw)
    ours = admm(lowrank_data, 5, **kw)
    np.testing.assert_allclose(
        np.array(ours.obj_history), np.array(ref.obj_history), rtol=1e-6
    )


def test_bad_rho_mode_raises(lowrank_data):
    import pytest

    with pytest.raises(ValueError, match="rho_mode"):
        admm(lowrank_data, 4, rho_mode="bogus")


def test_cg_spd_solver_matches_chol(lowrank_data):
    """GEMM-shaped CG aux solves reproduce the Cholesky trajectory."""
    kw = dict(distance_type="eu", reg_h=(0.05, "l1n"), min_iter=5,
              max_iter=40, tol1=1e-10, tol2=1e-10, nndsvd_init=(True, "zero"))
    a = admm(lowrank_data, 5, spd_solver="chol", **kw)
    b = admm(lowrank_data, 5, spd_solver="cg", **kw)
    assert a.i == b.i
    np.testing.assert_allclose(np.array(b.obj_history),
                               np.array(a.obj_history), rtol=1e-8)
