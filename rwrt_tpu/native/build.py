"""Build + load the native C++ polynomial solver (lazy, cached, gated).

Mirrors the reference's optional-native pattern (bs.py:19-29: try to import
the f2py .so, set a module flag, fall back to numpy with a warning). Here the
shared object is compiled on first use with g++ and cached next to the
source; absence of a working toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cpolyroots.cpp")
_SO = os.path.join(_DIR, "libcpolyroots.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Return the loaded library, building if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        lib.cpoly_roots_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, dp, dp, dp, dp,
            ctypes.c_int, ctypes.c_double,
        ]
        lib.cpoly_roots_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None
