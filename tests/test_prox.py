"""Proximal operators vs the reference implementations
(reference: nmf/admm.py:117-213, nmf/ao_admm.py:104-198)."""
import numpy as np
import pytest

from tpunmf.prox import prox

from conftest import requires_reference


@pytest.fixture
def mats(rng):
    mat_aux = rng.standard_normal((8, 30))
    dual = 0.3 * rng.standard_normal((8, 30))
    return mat_aux, dual


@requires_reference
@pytest.mark.parametrize("ptype", ["nn", "l1n", "l2n"])
def test_simple_prox_parity(mats, ptype):
    from nmf.admm import prox as ref_prox

    mat_aux, dual = mats
    ref = ref_prox(ptype, mat_aux, dual, rho=2.0, lambda_=0.4)
    ours = np.asarray(prox(ptype, mat_aux, dual, rho=2.0, lambda_=0.4))
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


@requires_reference
def test_l1inf_parity(rng):
    """Water-filling branch must reproduce the reference arithmetic exactly
    (incl. its sign conventions and inclusive cumsum, nmf/admm.py:158-183)."""
    from nmf.admm import prox as ref_prox

    # large positive entries so most rows exceed the l1 budget
    mat_aux = 2.0 * rng.random((12, 25)) + 0.5
    dual = 0.2 * rng.standard_normal((12, 25))
    ref = ref_prox("l1inf", mat_aux, dual, rho=1.5, lambda_=0.3, upper_bound=1)
    ours = np.asarray(
        prox("l1inf", mat_aux, dual, rho=1.5, lambda_=0.3, upper_bound=1.0)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


@requires_reference
def test_l1inf_easy_rows_pass_through(rng):
    """Rows already inside the budget are returned as their shifted positive
    part."""
    from nmf.admm import prox as ref_prox

    mat_aux = 0.01 * rng.random((6, 10))
    dual = np.zeros((6, 10))
    ref = ref_prox("l1inf", mat_aux, dual, rho=1.0, lambda_=0.1, upper_bound=1)
    ours = np.asarray(prox("l1inf", mat_aux, dual, rho=1.0, lambda_=0.1))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_l1inf_transpose_column_budget(rng):
    """Column variant: every output column lands inside (close to) the l1
    ball; uses the fixed per-column dual (deviation from the reference's
    dual[:,1] bug, documented in prox/operators.py)."""
    mat_aux = 2.0 * rng.random((20, 9)) + 0.5
    dual = 0.1 * rng.standard_normal((20, 9))
    out = np.asarray(
        prox("l1inf_transpose", mat_aux, dual, rho=1.0, lambda_=0.2)
    )
    assert out.min() >= 0
    # water-filled columns should approximately satisfy the budget
    sums = out.sum(axis=0)
    assert np.all(sums <= 1.0 + 0.35)


def test_unknown_prox_raises(mats):
    with pytest.raises(TypeError):
        prox("bogus", *mats)
