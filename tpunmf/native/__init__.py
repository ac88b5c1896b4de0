"""Native (C++) host-side components.

Build happens lazily on first use (g++ -O3 -shared); a pure-scipy fallback
keeps everything working where no toolchain exists.  See panelize.cpp for
the rationale.
"""
from .loader import get_panelizer, native_available

__all__ = ["get_panelizer", "native_available"]
