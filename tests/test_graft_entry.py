"""__graft_entry__ contract: entry() jits and runs; dryrun_multichip
executes the sharded training step on the emulated mesh."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    w, h, obj = jax.block_until_ready(out)
    assert w.shape == (1024, 128) and h.shape == (128, 1024)
    assert np.isfinite(float(obj))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    graft.dryrun_multichip(8)
