"""ctypes loader/builder for the native panelizer.

Compiles panelize.cpp once per environment into this package directory
(``_panelize.so``); thread-safe, idempotent, and silently falls back to
scipy when compilation fails (the Python API in data/sparse_panels.py
behaves identically either way).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "panelize.cpp")
_SO = os.path.join(_HERE, "_panelize.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _SO + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        i64, i32p, f32p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        )
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.csr_panel_f32.argtypes = [i64p, i32p, f32p, i64, i64, i64, i64,
                                      f32p, ctypes.c_int]
        lib.csr_panel_f32.restype = None
        lib.csr_panel_f32_batch.argtypes = [i64p, i32p, f32p, i64, i64, i64,
                                            i64, i64, f32p, ctypes.c_int]
        lib.csr_panel_f32_batch.restype = None
        lib.csr_panel_nnz.argtypes = [i64p, i32p, i64, i64, i64, i64]
        lib.csr_panel_nnz.restype = ctypes.c_int64
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.csr_panel_bf16.argtypes = [i64p, i32p, f32p, i64, i64, i64, i64,
                                       u16p, ctypes.c_int]
        lib.csr_panel_bf16.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def get_panelizer():
    """Return the loaded ctypes library, or None when unavailable."""
    return _load()
