"""Test configuration.

Tests run on CPU with an emulated 8-device mesh (SURVEY §4.3: multi-host
without a cluster) and float64 enabled so golden-parity comparisons against
the float64 numpy reference are meaningful.  Set TPUNMF_TEST_TPU=1 to run
on real TPU hardware instead (sharding tests will use the real devices).

NOTE: this environment pre-imports jax at interpreter startup (an
axon-TPU sitecustomize hook on PYTHONPATH), so JAX_PLATFORMS env vars set
here are too late — we must switch platforms via jax.config, which works
until the first backend is initialized.
"""
import os
import sys

import jax

if not os.environ.get("TPUNMF_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PATH = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE_PATH, "nmf"))
if HAS_REFERENCE and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

requires_reference = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference package not available at /root/reference"
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def lowrank_data(rng):
    """Small dense non-negative matrix with exact low rank + noise floor."""
    w = rng.random((60, 5))
    h = rng.random((5, 48))
    return (w @ h + 0.01 * rng.random((60, 48))).astype(np.float64)
