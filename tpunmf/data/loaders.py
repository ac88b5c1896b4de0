"""Data loading utilities.

Covers the capability census of the reference's legacy CLI
(reference: nmf/nmf_old.py:28-42): .mat loading, MSOT-style 3-D stacks
flattened to 2-D in Fortran order, plus .npz/.npy/.csv — all returning a
dense non-negative float array ready for factorization.
"""
from __future__ import annotations

import os

import numpy as np


def flatten_stack(arr: np.ndarray) -> np.ndarray:
    """(x, y, frames) 3-D stack -> (x*y, frames) 2-D, Fortran order —
    the MSOT reshape from nmf/nmf_old.py:40-42."""
    if arr.ndim == 2:
        return arr
    if arr.ndim == 3:
        return arr.reshape(arr.shape[0] * arr.shape[1], arr.shape[2], order="F")
    raise ValueError(f"expected 2-D or 3-D data, got shape {arr.shape}")


def load_matrix(path: str, *, key: str | None = None,
                flatten: bool = True) -> np.ndarray:
    """Load a matrix from .npz / .npy / .mat / .csv.

    Args:
      path: file path; format inferred from extension.
      key: variable name inside .npz/.mat archives (default: the only or
        first array-valued entry).
      flatten: flatten 3-D stacks Fortran-style like the legacy CLI.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        arr = np.load(path)
    elif ext == ".npz":
        with np.load(path, allow_pickle=True) as f:
            names = [key] if key else list(f.files)
            arr = np.asarray(f[names[0]])
    elif ext == ".mat":
        from scipy import io as sio

        payload = sio.loadmat(path)
        if key is None:
            key = next(k for k in payload if not k.startswith("__"))
        arr = np.asarray(payload[key])
    elif ext in (".csv", ".txt"):
        arr = np.loadtxt(path, delimiter="," if ext == ".csv" else None)
    else:
        raise ValueError(f"unsupported data format: {ext}")

    arr = np.asarray(arr, dtype=np.float64 if arr.dtype == np.float64 else np.float32)
    return flatten_stack(arr) if flatten else arr
