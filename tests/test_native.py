"""Native C++ panelizer vs scipy oracle (and the scipy fallback path)."""
import numpy as np
import pytest

from tpunmf.data import PanelStream, densify
from tpunmf.data.synthetic import sparse_csr
from tpunmf.native import native_available


@pytest.fixture(scope="module")
def csr():
    return sparse_csr(777, 513, density=0.02, seed=9)


def test_densify_matches_scipy(csr):
    np.testing.assert_allclose(densify(csr), csr.toarray(), rtol=1e-6)


def test_panel_edges_zero_padded(csr):
    ps = PanelStream(csr, row_block=256, col_panel=256)
    rb, cb = ps.grid
    assert (rb, cb) == (4, 3)
    last = ps.panel(rb - 1, cb - 1)
    assert last.shape == (256, 256)
    rows = 777 - 3 * 256  # = 9
    cols = 513 - 2 * 256  # = 1
    assert np.all(last[rows:, :] == 0)
    assert np.all(last[:, cols:] == 0)
    np.testing.assert_allclose(
        last[:rows, :cols], csr[3 * 256:, 2 * 256:].toarray(), rtol=1e-6
    )


def test_panel_nnz(csr):
    ps = PanelStream(csr, row_block=300, col_panel=200)
    assert ps.panel_nnz(0, 1) == csr[:300, 200:400].nnz


def test_scipy_fallback_matches_native(csr, monkeypatch):
    ps_native = PanelStream(csr, row_block=256, col_panel=256)
    ps_fallback = PanelStream(csr, row_block=256, col_panel=256)
    ps_fallback._lib = None
    for ij in [(0, 0), (1, 2), (3, 1)]:
        np.testing.assert_allclose(
            ps_native.panel(*ij), ps_fallback.panel(*ij), rtol=1e-6
        )


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_compiled():
    assert native_available()
