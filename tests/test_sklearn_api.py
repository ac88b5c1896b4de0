"""sklearn-compatible estimator facade."""
import numpy as np
import pytest

from tpunmf.sklearn_api import NMF


@pytest.fixture
def data(rng):
    return (rng.random((50, 5)) @ rng.random((5, 30)) + 0.01)


def test_fit_transform_shapes_and_attrs(data):
    est = NMF(n_components=5, solver="hals", max_iter=100, tol=1e-9)
    w = est.fit_transform(data)
    assert w.shape == (50, 5)
    assert est.components_.shape == (5, 30)
    assert est.n_iter_ >= 1
    assert est.reconstruction_err_ >= 0
    # decent reconstruction on exactly rank-5 data
    rel = np.linalg.norm(data - w @ est.components_) / np.linalg.norm(data)
    assert rel < 0.05


def test_transform_new_samples(data):
    est = NMF(n_components=5, solver="hals", max_iter=150, tol=1e-10)
    est.fit(data)
    w_new = est.transform(data[:7])
    assert w_new.shape == (7, 5)
    rel = np.linalg.norm(data[:7] - w_new @ est.components_) / \
        np.linalg.norm(data[:7])
    assert rel < 0.1
    back = est.inverse_transform(w_new)
    assert back.shape == (7, 30)


def test_solver_aliases_and_losses(data):
    for solver, loss in (("mu", "kullback-leibler"), ("cd", "frobenius"),
                         ("mur", "itakura-saito")):
        est = NMF(n_components=3, solver=solver, beta_loss=loss,
                  max_iter=30)
        est.fit(data + 0.05)
        assert est.components_ is not None


def test_nndsvd_init_names(data):
    for name in ("nndsvd", "nndsvda", "nndsvdar"):
        est = NMF(n_components=3, solver="mur", init=name, max_iter=20)
        est.fit(data)
        assert np.isfinite(est.reconstruction_err_)


def test_validation(data):
    with pytest.raises(ValueError):
        NMF(n_components=3, solver="nope")
    with pytest.raises(ValueError):
        NMF(n_components=3, init="bogus").fit(data)
    with pytest.raises(ValueError):
        NMF(n_components=3, solver="anls",
            beta_loss="kullback-leibler").fit(data)
    with pytest.raises(RuntimeError):
        NMF(n_components=3).transform(data)
