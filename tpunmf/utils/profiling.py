"""Profiling and debugging aids (SURVEY §5 'Tracing / profiling',
'Race detection / sanitizers' analogs).

- ``trace(dir)``: jax.profiler trace capture around a solver run; open the
  result in Perfetto/XProf to attribute time to the named update regions.
- ``named_scope``: re-export for annotating custom step functions.
- ``determinism_check``: same-seed bitwise reproducibility (the JAX analog
  of a race detector for our purposes — any nondeterministic reduction or
  layout flake shows up as a bit mismatch).
- ``debug_nans``: context manager enabling jax_debug_nans locally.
"""
from __future__ import annotations

import contextlib
from typing import Callable

import jax
import numpy as np

named_scope = jax.named_scope


def enable_compilation_cache(cache_dir: str = "/tmp/tpunmf-xla-cache") -> None:
    """Enable JAX's persistent compilation cache.

    Saves compiled executables across processes — on remote-compile TPU
    tunnels (30-90s per pallas kernel compile) this turns repeated solver
    runs from minutes of compile into milliseconds of cache hits.
    """
    import os

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed computation."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def determinism_check(fn: Callable[[], object], runs: int = 2) -> bool:
    """Run ``fn`` repeatedly and verify bitwise-identical outputs.

    Returns True when deterministic; raises AssertionError with the first
    mismatching leaf otherwise.
    """
    ref = jax.tree_util.tree_map(np.asarray, fn())
    for r in range(1, runs):
        out = jax.tree_util.tree_map(np.asarray, fn())
        leaves_a = jax.tree_util.tree_leaves(ref)
        leaves_b = jax.tree_util.tree_leaves(out)
        for i, (a, b) in enumerate(zip(leaves_a, leaves_b)):
            if not np.array_equal(a, b, equal_nan=True):
                raise AssertionError(
                    f"run {r} leaf {i} differs: max abs diff "
                    f"{np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))}"
                )
    return True
