"""Facade + persistence: reference-compatible save-name grammar and .npz
layout (reference: nmf/nmf.py:83-135, nmf/utils.py:96-105)."""
import contextlib
import io
import os

import numpy as np

from tpunmf import NMF
from tpunmf.io.npz import load_results

from conftest import requires_reference


def _factorize_small(data, k=4, **kw):
    model = NMF(data, k)
    params = dict(distance_type="eu", min_iter=5, max_iter=40, tol1=1e-12,
                  tol2=1e-12, nndsvd_init=(True, "zero"))
    params.update(kw)
    with contextlib.redirect_stdout(io.StringIO()):
        model.factorize(method="mur", **params)
    return model


def test_w_h_properties(lowrank_data):
    model = _factorize_small(lowrank_data)
    assert model.w is not None and model.h is not None
    assert model.w.shape == (60, 4) and model.h.shape == (4, 48)


def test_save_load_roundtrip(tmp_path, lowrank_data):
    model = _factorize_small(lowrank_data)
    with contextlib.redirect_stdout(io.StringIO()):
        path = model.save_factorization(save_dir=str(tmp_path))
    assert os.path.exists(path)
    payload = load_results(path)
    np.testing.assert_allclose(payload["w"], model.w)
    np.testing.assert_allclose(payload["h"], model.h)
    assert payload["i"] == model.results.i
    assert payload["experiment"]["method"] == "mur"

    restored = NMF.load_factorization(path)
    np.testing.assert_allclose(restored.w, model.w)


@requires_reference
def test_save_name_grammar_matches_reference(tmp_path, lowrank_data):
    """Feed OUR results through the REFERENCE's save_factorization and check
    both produce the same default file name."""
    import nmf as ref_pkg

    model = _factorize_small(lowrank_data)
    ours = model.default_save_name()

    ref_model = ref_pkg.NMF(data=None, factors=4)
    ref_model.results = model.results  # field-compatible namedtuple
    with contextlib.redirect_stdout(io.StringIO()):
        ref_model.save_factorization(save_dir=str(tmp_path))
    saved = os.listdir(tmp_path)
    assert len(saved) == 1
    assert saved[0] == ours + ".npz"


def test_unknown_method_raises(lowrank_data):
    model = NMF(lowrank_data, 3)
    try:
        model.factorize(method="nope")
        raised = False
    except Exception as e:
        raised = True
        # the error must list the REAL dispatch set (api._METHODS)
        for name in ("mur", "anls", "admm", "ao_admm", "hals", "semi_nmf",
                     "onmf"):
            assert name in str(e)
    assert raised


def test_methods_constant_matches_dispatch(lowrank_data):
    """Every name in _METHODS dispatches (no drift between the constant,
    the error message, and the real branch list); the CLI choices use the
    same constant."""
    from tpunmf.api import _METHODS

    assert set(_METHODS) == {"mur", "anls", "admm", "ao_admm", "hals",
                             "semi_nmf", "onmf", "ntf", "robust"}
    x = np.abs(lowrank_data)
    for method in _METHODS:
        model = NMF(x, 3)
        with contextlib.redirect_stdout(io.StringIO()):
            res = model.factorize(method=method, min_iter=2, max_iter=3,
                                  tol1=0.0, tol2=0.0)
        if method == "ntf":  # 2-way CP: mode-0 factor plays W's role
            assert res.factors[0].shape == (x.shape[0], 3)
        else:
            assert res.w.shape == (x.shape[0], 3)

    import tpunmf.__main__ as cli

    parser_actions = []
    import argparse

    p = argparse.ArgumentParser()
    cli._add_common(p)
    for action in p._actions:
        if "--method" in getattr(action, "option_strings", ()):
            parser_actions = list(action.choices)
    assert set(parser_actions) == set(_METHODS)


def test_facade_with_mesh(lowrank_data):
    """NMF(mesh=...) shards the data; result matches single-device."""
    import jax
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tpunmf.parallel import build_mesh

    mesh = build_mesh(shape=(2, 4), axis_names=("rows", "cols"))
    a = _factorize_small(lowrank_data)
    model = NMF(lowrank_data, 4, mesh=mesh)
    params = dict(distance_type="eu", min_iter=5, max_iter=40, tol1=1e-12,
                  tol2=1e-12, nndsvd_init=(True, "zero"))
    with contextlib.redirect_stdout(io.StringIO()):
        model.factorize(method="mur", **params)
    np.testing.assert_allclose(model.w, a.w, rtol=1e-8)


def test_loaded_model_can_resave(tmp_path, lowrank_data):
    """Review finding: save_factorization on a loaded model must work (the
    experiment dict is rebuilt as a namedtuple)."""
    model = _factorize_small(lowrank_data)
    with contextlib.redirect_stdout(io.StringIO()):
        path = model.save_factorization(save_dir=str(tmp_path / "a"))
        loaded = NMF.load_factorization(path)
        assert loaded.default_save_name() == model.default_save_name()
        path2 = loaded.save_factorization(save_dir=str(tmp_path / "b"))
    reloaded = NMF.load_factorization(path2)
    np.testing.assert_allclose(reloaded.w, model.w)


def test_half_specified_init_raises(lowrank_data):
    import pytest

    from tpunmf.solvers import mur

    with pytest.raises(ValueError, match="w_init and h_init"):
        mur(lowrank_data, 4, w_init=np.ones((60, 4)))


def test_fit_and_fit_transform(lowrank_data):
    from tpunmf import NMF

    model = NMF(lowrank_data, 4).fit(method="mur", distance_type="eu",
                                     min_iter=2, max_iter=10, tol1=0.0,
                                     tol2=0.0)
    assert model.w.shape == (lowrank_data.shape[0], 4)
    w = NMF(lowrank_data, 4).fit_transform(
        method="hals", min_iter=2, max_iter=10, tol1=0.0, tol2=0.0)
    import numpy as np

    assert np.asarray(w).shape == (lowrank_data.shape[0], 4)


def test_sklearn_aliases(lowrank_data):
    model = _factorize_small(lowrank_data)
    np.testing.assert_allclose(model.components_, model.h)
    assert model.reconstruction_err_ == float(model.results.obj_history[-1])
    empty = NMF(lowrank_data, 3)
    assert empty.components_ is None and empty.reconstruction_err_ is None
