"""Native (C++) runtime components, built lazily with the system toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rasterizer.cpp")
_SO = os.path.join(_DIR, "librasterizer.so")


def rasterizer_library():
    """Return the ctypes library, building it on first use; None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED:
            return None
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                     "-o", _SO],
                    check=True, capture_output=True, text=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.rasterize_soup.restype = None
            lib.rasterize_soup.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _LIB = lib
            return _LIB
        except Exception as error:  # toolchain missing / build error -> numpy fallback
            print(f"native rasterizer unavailable ({error}); using numpy fallback")
            _BUILD_FAILED = True
            return None
