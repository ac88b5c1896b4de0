"""Golden-parity tests for AO-ADMM (reference: nmf/ao_admm.py:201-311)."""
import contextlib
import io

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
