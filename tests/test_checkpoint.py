"""Checkpoint/resume: a resumed run must continue the exact trajectory
(SURVEY §5 — the reference has no load/resume path at all)."""
import numpy as np

from tpunmf.io import checkpoint_exists, load_state, save_state
from tpunmf.solvers import admm, mur


def test_save_load_roundtrip_pytree(tmp_path, rng):
    carry = {"a": rng.random((4, 5)), "b": (rng.random(3), np.int32(7))}
    p = save_state(str(tmp_path / "ck"), carry)
    restored = load_state(p, carry)
    np.testing.assert_allclose(restored["a"], carry["a"])
    np.testing.assert_allclose(restored["b"][0], carry["b"][0])
    assert restored["b"][1] == 7


class _Interrupt(Exception):
    pass


def _interrupt_after(n_blocks):
    count = {"n": 0}

    def cb(carry):
        count["n"] += 1
        if count["n"] >= n_blocks:
            raise _Interrupt

    return cb


def test_mur_resume_matches_uninterrupted(tmp_path, lowrank_data):
    """Kill the run after 2 checkpoint blocks, resume, and reproduce the
    uninterrupted trajectory exactly."""
    kw = dict(distance_type="eu", min_iter=5, max_iter=60, tol1=1e-12,
              tol2=1e-12, nndsvd_init=(True, "zero"))
    full = mur(lowrank_data, 5, **kw)

    ck = str(tmp_path / "mur_ck")
    try:
        mur(lowrank_data, 5, **kw, checkpoint_path=ck, checkpoint_every=10,
            on_block_end=_interrupt_after(2))
    except _Interrupt:
        pass
    assert checkpoint_exists(ck)

    resumed = mur(lowrank_data, 5, **kw, checkpoint_path=ck,
                  checkpoint_every=10, resume=True)
    assert resumed.i == full.i
    np.testing.assert_allclose(
        np.array(resumed.obj_history), np.array(full.obj_history), rtol=1e-12
    )
    np.testing.assert_allclose(resumed.w, full.w, rtol=1e-12)


def test_admm_resume_restores_duals(tmp_path, lowrank_data):
    """ADMM state includes dual variables — resume must restore them, not
    just the factors."""
    kw = dict(distance_type="eu", reg_w=(0, "nn"), reg_h=(0.05, "l1n"),
              min_iter=5, max_iter=40, tol1=1e-12, tol2=1e-12,
              nndsvd_init=(True, "zero"))
    full = admm(lowrank_data, 5, **kw)

    ck = str(tmp_path / "admm_ck")
    try:
        admm(lowrank_data, 5, **kw, checkpoint_path=ck, checkpoint_every=5,
             on_block_end=_interrupt_after(3))
    except _Interrupt:
        pass
    resumed = admm(lowrank_data, 5, **kw, checkpoint_path=ck,
                   checkpoint_every=5, resume=True)
    np.testing.assert_allclose(
        np.array(resumed.obj_history), np.array(full.obj_history), rtol=1e-10
    )
    np.testing.assert_allclose(resumed.w, full.w, rtol=1e-10)


def test_mismatched_config_rejected(tmp_path, lowrank_data):
    """A checkpoint from a different configuration (different max_iter ->
    different state shapes) must be refused, not silently misloaded."""
    import pytest

    kw = dict(distance_type="eu", min_iter=2, tol1=1e-12, tol2=1e-12,
              nndsvd_init=(True, "zero"))
    ck = str(tmp_path / "ck")
    mur(lowrank_data, 5, max_iter=10, checkpoint_path=ck, checkpoint_every=5, **kw)
    with pytest.raises(ValueError, match="mismatch"):
        mur(lowrank_data, 5, max_iter=20, checkpoint_path=ck,
            checkpoint_every=5, resume=True, **kw)


def test_config_tag_rejects_different_regularization(tmp_path, lowrank_data):
    """Same shapes, different lambda: the checkpoint must be refused (the
    review finding — shape checks alone let a stale state masquerade as a
    fresh run)."""
    import pytest

    kw = dict(distance_type="eu", min_iter=2, max_iter=20, tol1=1e-12,
              tol2=1e-12, nndsvd_init=(True, "zero"))
    ck = str(tmp_path / "ck")
    mur(lowrank_data, 5, lambda_h=0.0, checkpoint_path=ck,
        checkpoint_every=5, **kw)
    with pytest.raises(ValueError, match="configuration mismatch"):
        mur(lowrank_data, 5, lambda_h=0.5, checkpoint_path=ck,
            checkpoint_every=5, resume=True, **kw)


def test_orbax_backend_roundtrip(tmp_path, lowrank_data):
    """The orbax backend restores the exact same carry as npz."""
    import numpy as np

    from tpunmf.io.checkpoint import (
        checkpoint_exists_orbax,
        load_state_orbax,
        save_state_orbax,
    )
    from tpunmf.solvers.common import init_carry

    import jax.numpy as jnp

    w = jnp.asarray(lowrank_data[:, :4])
    h = jnp.asarray(lowrank_data[:4, :])
    carry = init_carry(jnp.asarray(1.25), 20, (w, h))
    path = str(tmp_path / "state")
    assert not checkpoint_exists_orbax(path)
    save_state_orbax(path, carry, meta="cfg-1")
    assert checkpoint_exists_orbax(path)

    restored = load_state_orbax(path, carry, expected_meta="cfg-1")
    np.testing.assert_array_equal(np.asarray(restored.inner[0]), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(restored.obj_buf),
                                  np.asarray(carry.obj_buf))
    assert int(restored.i) == 0

    import pytest

    with pytest.raises(ValueError, match="mismatch"):
        load_state_orbax(path, carry, expected_meta="cfg-2")
