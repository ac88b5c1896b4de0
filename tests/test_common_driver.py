"""Edge cases of the shared while_block/drive machinery
(reference loop semantics: nmf/mur.py:119-143)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.solvers.common import (
    LoopCarry,
    drive,
    finalize_history,
    init_carry,
    while_block,
)


def _step_halver(inner, i):
    """Objective halves every iteration."""
    return inner, inner[0] * 0.5 ** (i + 1)


def _run(max_iter, min_iter, tol1, tol2, stop_i=None, obj0=1.0):
    carry = init_carry(jnp.asarray(obj0), max_iter, (jnp.asarray(obj0),))
    return while_block(
        _step_halver, carry, max_iter if stop_i is None else stop_i,
        tol1, tol2, min_iter=min_iter, max_iter=max_iter,
    )


def test_runs_to_max_iter_without_convergence():
    out = _run(max_iter=10, min_iter=0, tol1=0.0, tol2=0.0)
    assert int(out.i) == 10 and not bool(out.converged)
    i, hist = finalize_history(out)
    assert i == 9 and len(hist) == 11
    np.testing.assert_allclose(hist[0], 1.0)


def test_min_iter_strict_inequality():
    """Convergence is only checked when i > min_iter (nmf/mur.py:131):
    with tol1 huge, the loop still runs min_iter + 2 iterations."""
    out = _run(max_iter=50, min_iter=5, tol1=1e9, tol2=0.0)
    assert int(out.i) == 7  # iterations 0..6; check first passes at i=6
    assert bool(out.converged)


def test_tol2_insufficient_decrease():
    """new >= old - tol2 triggers convergence."""
    out = _run(max_iter=100, min_iter=0, tol1=0.0, tol2=0.4)
    # objective halves: decrease at iteration i is 2^-(i+1); converges when
    # decrease < 0.4 and i > 0 -> at i=2 (decrease 0.125 < 0.4... i=1 has
    # decrease 0.25 < 0.4, checked because 1 > 0)
    assert bool(out.converged)
    assert int(out.i) == 2


def test_stop_i_blocks_execution():
    partial = _run(max_iter=20, min_iter=0, tol1=0.0, tol2=0.0, stop_i=7)
    assert int(partial.i) == 7 and not bool(partial.converged)


def test_drive_resumes_blocks():
    carry = init_carry(jnp.asarray(1.0), 20, (jnp.asarray(1.0),))
    seen = []

    def run_block(c, stop):
        return while_block(_step_halver, c, stop, 0.0, 0.0, min_iter=0,
                           max_iter=20)

    out = drive(run_block, carry, max_iter=20, block_size=6,
                on_block_end=lambda c: seen.append(int(c.i)))
    assert int(out.i) == 20
    assert seen == [6, 12, 18, 20]


def test_max_iter_zero_edge():
    out = _run(max_iter=0, min_iter=0, tol1=0.0, tol2=0.0)
    assert int(out.i) == 0
