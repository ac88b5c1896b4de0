"""TPU-runtime workaround defaults, centralized and guard-tested.

Three pathologies of the current jax/libtpu runtime shape these defaults
(minimal repros: benchmarks/repro_nested.py; run `python
benchmarks/repro_nested.py` on a TPU host — each case executes in a
subprocess so a worker crash doesn't kill the harness):

  case A — a Pallas objective kernel inside a solver while_loop that
      also contains nested while_loops (the ANLS/AO-ADMM shape)
      crashed the TPU worker in round 1 ("kernel fault").  Round-2
      re-test: NO LONGER CRASHES — the repro and the real AO-ADMM (EU
      and KL) run correctly with fast compiles, so AO-ADMM's Pallas
      objective is re-enabled.  The ANLS-shaped program still compiles
      pathologically (503 s vs seconds without the Pallas objective), so
      ANLS stays on the XLA objective.
  case B — batched small Cholesky (vmapped cho_factor/cho_solve) in
      3-deep while nesting: compile/run stalls >420 s (re-confirmed
      round 2, 2026-08).
  case C — GEMM-shaped CG (fori_loop) inside 4-deep loop nesting (the
      AO-ADMM + CG shape): compile stalls >420 s (re-confirmed round 2).

The functions below are the single source of truth for which fast path
each solver may take per backend; tests/test_tpu_defaults.py pins them
so a future default flip is a deliberate, test-visible decision.
"""
from __future__ import annotations


def mur_use_pallas(backend: str) -> bool:
    """MUR's loop has no nested while — fused kernels are safe."""
    return backend == "tpu"


def hals_use_pallas(backend: str) -> bool:
    """HALS has the MUR loop shape (while_block + fori sweeps, no nested
    whiles), so the fused Pallas EU objective is safe on TPU."""
    return backend == "tpu"


def mur_single_pass_variant(backend: str) -> str:
    """'auto' = Mosaic-pipelined single-pass kernel (grid + BlockSpecs);
    'dma' = manual double-buffered strip DMA (mur_iteration_eu_dma).
    Measured on v5e (benchmarks/sweep_dma.py, 2026-08, delta timing,
    8192x8192 r128 bf16, both at bm=128): auto 4928 it/s vs dma 4493 —
    Mosaic's automatic pipeline wins once the strip height is right; the
    round-2 "0.64 roofline gap" was the bm=64 strip (half-utilized MXU),
    fixed by pre-casting H^T so bm=128 fits VMEM, not by manual DMA."""
    return "auto"


def hals_use_sweep_kernel(backend: str) -> bool:
    """The Gauss-Seidel sweep chain as one Pallas kernel (grid-parallel
    over the non-rank axis) instead of the latency-bound fori chain of
    XLA dispatches — the round-2 HALS headline-scale bottleneck."""
    return backend == "tpu"


def hals_single_pass(backend: str) -> bool:
    """Whole HALS W-half (strip GEMM + in-register sweeps + H-numerator)
    in ONE X pass (ops/hals_sweep.hals_iteration_eu) when it tiles —
    MUR-EU single-pass HBM traffic with HALS convergence.  MEASURED
    SLOWER on v5e (2026-08, 8192x8192 r128 f32): 190 it/s vs 1015 for
    the two-pass + sweep-kernel path — the unrolled in-register sweep
    inside every strip serializes against the strip GEMMs and starves
    the pipeline.  Stays opt-in (rate_probe hals_single_pass_headline
    re-tests it)."""
    return False


def anls_masked_solver(backend: str) -> str:
    """GEMM-shaped CG vs batched Cholesky for the masked NNLS solves.

    CG is both ~62x faster on TPU (docs/PERF.md) and avoids the case-B
    stall; exact Cholesky remains the CPU/parity default."""
    return "cg" if backend == "tpu" else "chol"


def anls_cg_iters(backend: str) -> int:
    """CG step count per masked NNLS solve (0 = exact bound l + 8).

    With k0 value warm starts (the previous ANLS iterate is a
    near-solution of the new normal equations), far fewer steps reach
    the same objective.  Measured on v5e (2048x1024 r64, 40 iters,
    benchmarks/sweep_anls_cg.py + anls_cg_sweep.json round 4): 16 steps
    at 913.7 it/s with final objective within 7e-5 relative of the
    exact-bound trajectory (and within 1e-7 under 'highest'-precision
    internals), vs 326.9 it/s for the exact bound — a 2.8x speedup at
    objective parity.  CPU keeps the exact bound (parity-grade tests
    live there)."""
    return 16 if backend == "tpu" else 0


def anls_nnls_precision(backend: str) -> str | None:
    """Matmul precision for the NNLS duals/CG internals.

    TPU's default 1-pass bf16 GEMM leaves ~1e-2 relative noise on the
    k-sized duals, making columns cycle on noise: the round-4 sweep
    measured the exact CG bound 1.5x FASTER at 'highest' (487 vs 327
    it/s) because cleaner duals mean fewer exchange trips — and final
    objectives agree to 5e-7 across all CG step counts.  The ops are
    rank-sized, so the 3x pass cost is negligible next to the X-sized
    products (which keep the session default)."""
    return "highest" if backend == "tpu" else None


def anls_device_loop(backend: str, masked_solver: str) -> bool:
    """Keep the whole ANLS loop on device unless batched Cholesky would
    sit in 3-deep nesting (case B)."""
    return backend != "tpu" or masked_solver == "cg"


def anls_use_pallas(backend: str) -> bool:
    """Pallas objective inside the NNLS-bearing loop no longer crashes
    (case A, round-2 re-test) but blows the compile up to ~8 minutes;
    the XLA objective is a minor cost next to the inner solves."""
    return False


def admm_spd_solver(backend: str) -> str:
    """Flat ADMM is 2-deep — CG is safe and faster on TPU."""
    return "cg" if backend == "tpu" else "chol"


def ao_admm_inner_loop(backend: str) -> str:
    """Inner-ADMM loop lowering (solvers/common.inner_loop).

    'fori_masked' on TPU: the fixed-trip masked loop produces identical
    iterates to the early-exit while loop but removes one data-dependent
    nesting level — the restructure that takes the AO-ADMM + CG shape
    out of the case-C stall zone."""
    return "fori_masked" if backend == "tpu" else "while"


def ao_admm_spd_solver(backend: str) -> str:
    """With the masked-fori inner loop the CG subproblem solve sits
    <=3-deep and COMPILES cleanly (case C restructured away — round-3
    hardware re-test: benchmarks/repro_nested.py case C2 OK).  But the
    v5e A/B (rate_probe, 2048x1024 r64, 2008 iters) measured CG at
    605 it/s with final objective 3339 vs Cholesky's 1874 it/s at
    objective 108.9: CG's inner-solve tolerance interacts badly with the
    ADMM dual updates (inexact subproblem solves stall the outer
    convergence), so it is both slower per iteration here AND worse per
    iteration.  Cholesky stays the default everywhere by MEASUREMENT,
    not by compile fence; `spd_solver='cg'` remains user-selectable."""
    return "chol"


def ao_admm_use_pallas(backend: str) -> bool:
    """Re-enabled after the round-2 case-A re-test: the Pallas
    objectives run correctly inside the inner-ADMM nest with normal
    compile times (validated EU + KL on hardware)."""
    return backend == "tpu"
