"""Unit tests for objective functions, incl. KL edge-case masking semantics
(reference: nmf/utils.py:18-33)."""
import numpy as np
import pytest

from tpunmf.core import distance, eu_objective_gram

from conftest import requires_reference


def test_eu_matches_formula(rng):
    x = rng.random((20, 15))
    wh = rng.random((20, 15))
    assert np.isclose(float(distance(x, wh, "eu")), 0.5 * np.sum((x - wh) ** 2))


def test_unknown_distance_raises(rng):
    with pytest.raises(KeyError):
        distance(rng.random((3, 3)), rng.random((3, 3)), "nope")


@requires_reference
@pytest.mark.parametrize("distance_type", ["eu", "kl"])
def test_matches_reference_dense(rng, distance_type):
    from nmf import utils as ref_utils

    x = rng.random((30, 25)) + 0.1
    wh = rng.random((30, 25)) + 0.1
    ref = ref_utils.distance(x, wh, distance_type)
    ours = float(distance(x, wh, distance_type))
    assert np.isclose(ours, ref, rtol=1e-12)


@requires_reference
def test_kl_masking_edge_cases(rng):
    """x==0 cells (NaN from 0*log(0)) and wh==0 cells (+inf) are zeroed
    before the -x+wh correction — exactly like nmf/utils.py:23-26."""
    from nmf import utils as ref_utils

    x = rng.random((10, 10))
    wh = rng.random((10, 10))
    x[0, :3] = 0.0       # 0 * log(0/wh) -> nan -> masked
    wh[1, :3] = 0.0      # x * log(x/0) -> +inf -> masked
    x[2, 4] = 0.0
    wh[2, 4] = 0.0       # 0 * log(0/0) -> nan -> masked
    with np.errstate(all="ignore"):
        ref = ref_utils.distance(x, wh, "kl")
    ours = float(distance(x, wh, "kl"))
    assert np.isfinite(ours)
    assert np.isclose(ours, ref, rtol=1e-12)


def test_eu_gram_objective_matches_exact(rng):
    x = rng.random((40, 30))
    w = rng.random((40, 6))
    h = rng.random((6, 30))
    exact = 0.5 * np.sum((x - w @ h) ** 2)
    gram = float(
        eu_objective_gram(np.sum(x * x), w.T @ x, w.T @ w, h)
    )
    assert np.isclose(gram, exact, rtol=1e-12)
