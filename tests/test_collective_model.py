"""Pin benchmarks/collective_model.py's byte inventory to the REAL
compiled collectives (VERDICT r3 item 3).

The weak-scaling estimates are only as good as their byte counts, so
each schedule's modeled Collective list is checked against the operand
shapes of the all-reduce / all-gather / collective-permute ops that the
actual tpunmf.parallel building blocks compile to on the emulated
8-device mesh.  (Wire bytes per ring step are algorithm constants —
psum_bytes/all_gather_bytes — and are unit-checked directly; what needs
pinning to the implementation is WHICH operands cross the fabric.)
"""
import importlib.util
import os
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunmf.parallel import (
    build_mesh,
    gram_h,
    gram_w,
    wtx_psum,
    xht_psum,
)
from tpunmf.parallel.collectives import ring_xht_rotate_h

_spec = importlib.util.spec_from_file_location(
    "collective_model",
    os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                 "collective_model.py"))
cm = importlib.util.module_from_spec(_spec)
# dataclasses resolve string annotations through sys.modules[__module__]
sys.modules[_spec.name] = cm
_spec.loader.exec_module(cm)

needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (emulated) devices"
)

_COLL_RE = re.compile(
    r"=\s*(?:\(?)(\w+)\[([\d,]*)\][^ ]*\s+"
    r"(all-reduce|all-gather|collective-permute)(?:-start)?\(")


def _collective_shapes(fn, *args):
    """(op kind, element count) for every collective in compiled HLO."""
    txt = jax.jit(fn).lower(*args).compile().as_text()
    out = []
    for dtype, dims, kind in _COLL_RE.findall(txt):
        n = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
        out.append((kind, n))
    return out


def _elems(ops, kind):
    return sorted(n for k_, n in ops if k_ == kind)


@needs_8_devices
def test_tp_cols_bytes_match_compiled():
    """tp_cols: psum(m*k over cols) + psum(k*k over cols)."""
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    m, n, k = 64, 128, 8
    x = jax.device_put(jnp.ones((m, n)), jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "cols")))
    h = jax.device_put(jnp.ones((k, n)), jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "cols")))
    ops = (_collective_shapes(lambda a, b: xht_psum(mesh, a, b), x, h)
           + _collective_shapes(lambda b: gram_h(mesh, b), h))
    got = _elems(ops, "all-reduce")
    plan = cm.schedule_collectives("tp_cols", m, n, k, rows=1, cols=8,
                                   elem=4)
    want = sorted(int(c.operand_bytes // 4) for c in plan
                  if c.kind == "psum")
    assert got == want, (got, want)


@needs_8_devices
def test_mesh_2d_bytes_match_compiled():
    """mesh_2d adds the rows-axis psums: wtx (k x n_loc) + gram_w."""
    mesh = build_mesh(shape=(2, 4), axis_names=("rows", "cols"))
    m, n, k = 64, 128, 8
    P = jax.sharding.PartitionSpec
    x = jax.device_put(jnp.ones((m, n)),
                       jax.NamedSharding(mesh, P("rows", "cols")))
    w = jax.device_put(jnp.ones((m, k)),
                       jax.NamedSharding(mesh, P("rows", None)))
    h = jax.device_put(jnp.ones((k, n)),
                       jax.NamedSharding(mesh, P(None, "cols")))
    ops = (_collective_shapes(lambda a, b: xht_psum(mesh, a, b), x, h)
           + _collective_shapes(lambda b: gram_h(mesh, b), h)
           + _collective_shapes(lambda a, b: wtx_psum(mesh, a, b), w, x)
           + _collective_shapes(lambda a: gram_w(mesh, a), w))
    got = _elems(ops, "all-reduce")
    plan = cm.schedule_collectives("mesh_2d", m, n, k, rows=2, cols=4,
                                   elem=4)
    want = sorted(int(c.operand_bytes // 4) for c in plan
                  if c.kind == "psum")
    assert got == want, (got, want)


@needs_8_devices
def test_ring_rotation_panel_matches_compiled():
    """ring: the rotating H panel is a (k, n/cols) collective-permute."""
    mesh = build_mesh(shape=(8,), axis_names=("cols",))
    m, n, k = 64, 128, 8
    P = jax.sharding.PartitionSpec
    x = jax.device_put(jnp.ones((m, n)),
                       jax.NamedSharding(mesh, P("cols", None)))
    h = jax.device_put(jnp.ones((k, n)),
                       jax.NamedSharding(mesh, P(None, "cols")))
    ops = _collective_shapes(
        lambda a, b: ring_xht_rotate_h(mesh, a, b), x, h)
    perm = _elems(ops, "collective-permute")
    assert perm, "no collective-permute found in compiled ring schedule"
    plan = cm.schedule_collectives("ring", m, n, k, rows=1, cols=8, elem=4)
    [ring] = [c for c in plan if c.kind == "ppermute_ring"]
    # per-step payload is the (k, n/cols) panel
    assert perm == [int(ring.operand_bytes // 4)] * len(perm), (
        perm, ring.operand_bytes // 4)


def test_ring_step_formulas():
    """Wire-byte/step constants of the standard ring algorithms."""
    c = cm.Collective("psum", 1000, 8, "ici")
    assert c.steps == 14
    assert c.bytes_sent == pytest.approx(2 * 7 / 8 * 1000)
    g = cm.Collective("all_gather", 1000, 8, "ici")
    assert g.steps == 7
    assert g.bytes_sent == pytest.approx(7000)
    r1 = cm.Collective("psum", 1000, 1, "ici")
    assert r1.steps == 0 and r1.bytes_sent == 0.0


def test_overlap_exposure_bounds():
    """Exposed time: full when serial, only the excess when overlapped."""
    c = cm.Collective("ppermute_ring", 7000, 8, "ici", overlappable=True)
    # transfer far smaller than compute: fully hidden
    assert c.exposed_time(1e-6, 100e9, 1.0) == 0.0
    # no compute to hide under: exposes the full serial time
    assert c.exposed_time(1e-6, 100e9, 0.0) == pytest.approx(
        c.time(1e-6, 100e9))
    # non-overlappable always exposes serial time
    s = cm.Collective("psum", 7000, 8, "ici")
    assert s.exposed_time(1e-6, 100e9, 123.0) == pytest.approx(
        s.time(1e-6, 100e9))


def test_single_slice_beats_multislice():
    """The primary deployment (rows on ICI) must dominate DCN rows, and
    the configs [3]/[4] single-slice estimates clear the >=80% target.

    LinkParams are PINNED (not LinkParams.measured()): the measured
    default reads the mutable bw_probe_best.json ratchet, so a faster
    future probe would shrink t_comp and silently flip this assertion
    with no code change.  The pinned values are the 2026-08 v5e probe."""
    links = cm.LinkParams(hbm_gbps=798.4, mxu_tflops=217.4, ici_gbps=180.0,
                          ici_alpha_us=1.0, dcn_gbps=25.0, dcn_alpha_us=10.0,
                          source="pinned (2026-08 v5e probe)")
    for hosts in (2, 4, 8):
        for cfg in ("config3", "config4"):
            kw = dict(schedule="ring", hosts=hosts, chips_per_host=8,
                      coll_elem=2, densify_factor=4.0, links=links)
            if cfg == "config3":
                kw.update(m=25_000 * hosts, n=20_000, k=128,
                          nnz=50_000_000 * hosts, inner_compute_mult=1.2)
            else:
                kw.update(m=500_000 * hosts, n=100_000, k=256,
                          nnz=50_000_000 * hosts, inner_compute_mult=1.5)
            ici = cm.Scenario(name="a", row_fabric="ici", **kw).evaluate()
            dcn = cm.Scenario(name="b", row_fabric="dcn", **kw).evaluate()
            assert ici["efficiency"] >= dcn["efficiency"]
            assert ici["efficiency"] >= 0.80, (cfg, hosts, ici)
