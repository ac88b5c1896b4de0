"""Analytic per-iteration collective-bytes account for the sharded NMF
schedules, and the DCN weak-scaling efficiency model it implies.

BASELINE.json's north star asks for ">=80% weak-scaling efficiency to 2+
hosts on a 100M-nonzero matrix".  Real multi-host hardware is not
available in this environment (one tunneled chip), so this module gives
the machine-checkable paper model: exact psum/all_gather/ppermute byte
volumes per iteration for every schedule in tpunmf/parallel (the bytes
are a property of the algorithm + layout, not of hardware), plus a
roofline-style efficiency bound when those bytes ride ICI within a host
and DCN across hosts.

Collective cost conventions (standard ring algorithms):
  * psum (all-reduce) of an S-byte operand over d devices: each device
    sends 2*(d-1)/d * S bytes (reduce-scatter + all-gather halves).
  * all_gather of per-device S_loc bytes over d devices: each device
    sends (d-1) * S_loc bytes (ring), receives the same.
  * ppermute ring rotation of an S_loc panel over d steps: (d-1) * S_loc
    bytes sent per device per full rotation; each step overlaps the next
    panel's compute (tpunmf/parallel/collectives.py:169-206).

Schedules modeled (see tpunmf/parallel/{collectives,sharded_solvers}.py):
  tp_cols   X P(None,cols), H P(None,cols), W replicated.
            Per iter: psum_cols(XHt m*k) + psum_cols(HHt k*k).
  mesh_2d   X P(rows,cols), W P(rows,None), H P(None,cols).
            Per iter: psum_cols(XHt m_loc*k) + psum_rows(WtX k*n_loc)
            + psum(HHt k*k, cols) + psum(WtW k*k, rows).
  ring      X fixed P(rows,cols); H panels rotate with ppermute.
            Per iter: (d-1) ppermute sends of the k*(n/d) H panel for
            the W half (overlapped), + the mesh_2d rows-psum for WtX.
  ulysses   X flips layout with one hoisted all_to_all; per iter
            all_gather(W m_loc*k) + all_gather(H k*n_loc) over the axis.
  rank      W P(None,rank), H P(rank,None), X replicated/row-sharded.
            Per iter: psum(recon m*n_loc) for KL; EU works on Gram
            cross-terms: all_gather(k_loc*k grams) + psum(k*k).

Chip/link parameters default to TPU v5e: HBM 819 GB/s, bf16 MXU peak
197 TFLOP/s, ICI ~4x 186 GB/s effective per chip (conservative single
direction 400 GB/s aggregate), DCN ~= 25 GB/s per host (4x100GbE
managed-switch conservative; set dcn_gbps to your fabric).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, asdict

GB = 1e9


def psum_bytes(operand_bytes: float, d: int) -> float:
    """Per-device bytes sent by a ring all-reduce."""
    return 0.0 if d <= 1 else 2.0 * (d - 1) / d * operand_bytes


def all_gather_bytes(local_bytes: float, d: int) -> float:
    """Per-device bytes sent by a ring all-gather of local shards."""
    return 0.0 if d <= 1 else (d - 1) * local_bytes


def schedule_bytes(schedule: str, m: int, n: int, k: int,
                   rows: int = 1, cols: int = 1, elem: int = 4) -> dict:
    """Per-device collective bytes per MUR-EU iteration for a schedule.

    Returns {'ici': bytes on the cols axis, 'dcn': bytes on the rows
    axis, 'overlappable': bytes that the schedule already overlaps with
    compute by construction (ring ppermute steps)}.  The convention is
    the production mesh: 'cols' inside a host (ICI), 'rows' across
    hosts (DCN) — chosen because k*n_loc (rows-psum operand) is the
    small factor panel while m_loc*k stays on ICI.
    """
    d = rows * cols
    m_loc, n_loc = m // max(rows, 1), n // max(cols, 1)
    kk = k * k * elem
    if schedule == "tp_cols":
        # single-axis mesh: everything rides one fabric (report as ici)
        return {"ici": psum_bytes(m * k * elem, cols) + psum_bytes(kk, cols),
                "dcn": 0.0, "overlappable": 0.0}
    if schedule == "mesh_2d":
        return {
            "ici": psum_bytes(m_loc * k * elem, cols) + psum_bytes(kk, cols),
            "dcn": psum_bytes(k * n_loc * elem, rows) + psum_bytes(kk, rows),
            "overlappable": 0.0,
        }
    if schedule == "ring":
        # H panel rotation replaces the cols-psum of XHt; each of the
        # (cols-1) sends is a k x n/cols panel and overlaps the next
        # panel's GEMM (collectives.py:169-206 rotates H, X never moves)
        ring = all_gather_bytes(k * (n // max(cols, 1)) * elem, cols)
        return {
            "ici": psum_bytes(kk, cols),
            "dcn": psum_bytes(k * n_loc * elem, rows) + psum_bytes(kk, rows),
            "overlappable": ring,
        }
    if schedule == "ulysses":
        # per iteration: all_gather W shards + all_gather H blocks
        # (sharded_solvers.py:101-168); X's all_to_all is hoisted
        return {
            "ici": all_gather_bytes(m // max(cols, 1) * k * elem, cols)
            + all_gather_bytes(k * n_loc * elem, cols),
            "dcn": 0.0,
            "overlappable": 0.0,
        }
    if schedule == "rank":
        # EU rank-sharded: all_gather of k_loc x k Gram cross-terms +
        # two k x k psums (sharded_solvers.py:204-290 EU branch)
        k_loc = k // max(cols, 1)
        return {
            "ici": all_gather_bytes(k_loc * k * elem, cols)
            + 2 * psum_bytes(kk, cols),
            "dcn": 0.0,
            "overlappable": 0.0,
        }
    raise ValueError(f"unknown schedule {schedule!r}")


@dataclass
class Scenario:
    """One weak-scaling efficiency evaluation."""
    name: str
    schedule: str
    m: int
    n: int
    k: int
    hosts: int
    chips_per_host: int
    x_elem: int = 4            # X dtype bytes (2 = bf16 data/collectives)
    coll_elem: int = 4         # collective operand dtype bytes
    nnz: int | None = None     # sparse: total nonzeros (else dense)
    densify_factor: float = 4.0  # dense panel cells per nnz (streaming)
    inner_compute_mult: float = 1.0  # e.g. AO-ADMM admm_iter local work
    hbm_gbps: float = 819.0
    mxu_tflops: float = 197.0
    ici_gbps: float = 180.0    # per-chip ICI send bandwidth (conservative)
    dcn_gbps: float = 25.0     # per-HOST DCN send bandwidth

    def evaluate(self) -> dict:
        rows, cols = self.hosts, self.chips_per_host
        d = rows * cols
        m_loc = self.m // max(rows, 1)
        n_loc = self.n // max(cols, 1)
        # --- compute floor per chip: max(HBM roofline, MXU roofline)
        if self.nnz is None:
            cells = m_loc * n_loc           # dense local block
        else:
            cells = self.nnz / d * self.densify_factor
        flops = 4.0 * cells * self.k * self.inner_compute_mult
        x_bytes = cells * self.x_elem * self.inner_compute_mult
        fac_bytes = (4.0 * m_loc * self.k + 4.0 * self.k * n_loc) * 4
        t_comp = max((x_bytes + fac_bytes) / (self.hbm_gbps * GB),
                     flops / (self.mxu_tflops * 1e12))
        # --- communication time
        b = schedule_bytes(self.schedule, self.m, self.n, self.k,
                           rows=rows, cols=cols, elem=self.coll_elem)
        t_ici = (b["ici"] + b["overlappable"]) / (self.ici_gbps * GB)
        # host NIC is shared by all chips of the host
        t_dcn = b["dcn"] * cols / (self.dcn_gbps * GB)
        t_comm = t_ici + t_dcn
        # ring-overlappable bytes don't serialize when their per-step
        # transfer is shorter than the per-step GEMM; report both bounds
        t_ici_overlap = b["ici"] / (self.ici_gbps * GB)
        t_comm_overlap = t_ici_overlap + t_dcn
        eff_serial = t_comp / (t_comp + t_comm)
        return {
            **asdict(self),
            "bytes_per_iter_per_chip": {kk: round(v) for kk, v in b.items()},
            "t_compute_ms": round(t_comp * 1e3, 4),
            "t_ici_ms": round(t_ici * 1e3, 4),
            "t_dcn_ms": round(t_dcn * 1e3, 4),
            "efficiency_no_overlap": round(eff_serial, 3),
            "efficiency_with_overlap": round(
                min(1.0, t_comp / max(t_comp, t_comm_overlap)), 3),
        }


def baseline_scenarios() -> list[dict]:
    """The scenarios the BASELINE weak-scaling claim rests on.

    Weak scaling GROWS the matrix with the host count: per-chip block
    (and nnz/chip) stays constant, hosts extend the row axis (the mesh
    'rows' axis rides DCN, so the cross-host psum operand k*n_loc is a
    small factor panel and its bytes are CONSTANT in host count — the
    only growth is the ring all-reduce factor 2(H-1)/H -> 2).
    """
    out = []
    # (a) dense production unit: an HBM-filling bf16 per-chip block
    # (262144 x 8192, ~4.3 GB) at rank 128, bf16 collectives, ring
    # schedule (H-panel ppermute rotation overlaps per-step GEMMs;
    # collectives.py:169-206).  The serial bound (zero overlap credited)
    # already clears 80% at 2 hosts; the built-in ring overlap keeps
    # 4-8 hosts above it.
    for hosts in (1, 2, 4, 8):
        out.append(Scenario(
            name=f"dense_ring_bf16_262144rows_{hosts}host",
            schedule="ring", m=262_144 * hosts, n=8192 * 8, k=128,
            hosts=hosts, chips_per_host=8, x_elem=2,
            coll_elem=2).evaluate())
    # (b) BASELINE "100M-nonzero matrix" at config[4] shape: 1M x 100k
    # sparse (100M nnz = 0.1% dense), rank 256, growing rows/nnz with
    # hosts (500k rows + 50M nnz per host).  Streamed dense panels at
    # densify_factor 4 (measured round-2 panelizer regime), bf16
    # collectives, ring schedule.  This is the sparsest, least
    # compute-dense case the target names; the serial bound is below
    # 80% (per-chip work is only ~6M nnz) and the claim rests on the
    # ring/async overlap the schedule was built for.
    for hosts in (2, 4):
        out.append(Scenario(
            name=f"config4_mur_eu_sparse_{hosts}host", schedule="ring",
            m=500_000 * hosts, n=100_000, k=256, hosts=hosts,
            chips_per_host=8, nnz=50_000_000 * hosts,
            densify_factor=4.0, coll_elem=2).evaluate())
    # (c) the same without any overlap credit and f32 collectives —
    # the honest worst case, reported for transparency
    out.append(Scenario(
        name="config4_mur_eu_sparse_2host_serial_f32", schedule="mesh_2d",
        m=1_000_000, n=100_000, k=256, hosts=2, chips_per_host=8,
        nnz=100_000_000, densify_factor=4.0).evaluate())
    return out


def schedule_table(m=8192, n=8192, k=128) -> dict:
    """Collective bytes/iteration for every schedule at the headline
    shape on an 8-chip (1 host) and 2x8 (2 host) mesh."""
    table = {}
    for sched in ("tp_cols", "mesh_2d", "ring", "ulysses", "rank"):
        table[sched] = {
            "1host_8chip": {kk: round(v) for kk, v in schedule_bytes(
                sched, m, n, k, rows=1, cols=8).items()},
            "2host_16chip": {kk: round(v) for kk, v in schedule_bytes(
                sched, m, n, k, rows=2, cols=8).items()},
        }
    return table


if __name__ == "__main__":
    print(json.dumps({
        "schedule_bytes_8192x8192_r128": schedule_table(),
        "scenarios": baseline_scenarios(),
    }, indent=1))
