"""On-demand build + ctypes binding for the native trajectory IO library.

No pybind11 in this image; g++ -shared + ctypes is the binding path. The
build is cached next to the source (trajio.so) and triggered lazily on first
use; every consumer has a pure-numpy fallback so a missing compiler is never
fatal.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "trajio.cpp")
_SO = os.path.join(_DIR, "trajio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile(src: str, so: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _build() -> bool:
    return _compile(_SRC, _SO)


def load():
    """Return the ctypes library, building it if needed, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.trajio_write_rows.restype = ctypes.c_int
        lib.trajio_write_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.trajio_read_values.restype = ctypes.c_int64
        lib.trajio_read_values.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        _lib = lib
        return _lib

