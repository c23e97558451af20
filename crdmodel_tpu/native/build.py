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


# ---------------------------------------------------------------------------
# refrhs.so: serial transcription of the reference's four f() routines —
# the whole-RHS parity oracle (see refrhs.cpp for sources).
# ---------------------------------------------------------------------------

_REFRHS_SRC = os.path.join(_DIR, "refrhs.cpp")
_REFRHS_SO = os.path.join(_DIR, "refrhs.so")
_refrhs_lib = None
_refrhs_tried = False


def load_refrhs():
    """ctypes handle to the reference-RHS oracle, building on demand;
    None when g++ is unavailable (tests skip)."""
    global _refrhs_lib, _refrhs_tried
    with _lock:
        if _refrhs_lib is not None:
            return _refrhs_lib
        if _refrhs_tried:
            return None
        _refrhs_tried = True
        if not os.path.exists(_REFRHS_SO) or (
                os.path.getmtime(_REFRHS_SO) < os.path.getmtime(_REFRHS_SRC)):
            if not _compile(_REFRHS_SRC, _REFRHS_SO):
                return None
        try:
            lib = ctypes.CDLL(_REFRHS_SO)
        except OSError:
            return None
        lib.ref_rhs.restype = ctypes.c_int
        lib.ref_rhs.argtypes = [
            ctypes.c_int, ctypes.c_int,            # model, surface
            ctypes.c_int64, ctypes.c_int64,        # nx, ny
            ctypes.c_double,                       # t
            ctypes.POINTER(ctypes.c_double),       # y
            ctypes.POINTER(ctypes.c_double),       # ydot
            ctypes.c_double, ctypes.c_double,      # diffusion, beta
            ctypes.c_double, ctypes.c_double,      # surface_width, length
            ctypes.c_double, ctypes.c_int,         # t_boundary, vary_beta
            ctypes.c_double, ctypes.c_double,      # beta_min, beta_max
            ctypes.c_int,                          # just_diffusion
        ]
        _refrhs_lib = lib
        return _refrhs_lib


def reference_rhs(cfg, t, state):
    """Evaluate the transcribed reference RHS on a (2, ny, nx) f64 state.

    Returns (2, ny, nx) f64 ydot, or None when the oracle can't build.
    cfg: a SimConfig for model fhn|goldbeter.
    """
    import numpy as np
    lib = load_refrhs()
    if lib is None:
        return None
    model_id = {"fhn": 0, "goldbeter": 1}[cfg.model]
    surface_id = {"flat": 0, "torus": 1}[cfg.surface]
    state = np.asarray(state, dtype=np.float64)
    nvars, ny, nx = state.shape
    assert nvars == 2
    # (var, j, i) -> interleaved IDX layout: y[2*(i + j*nx) + var]
    y = np.ascontiguousarray(np.moveaxis(state, 0, -1).reshape(-1))
    ydot = np.zeros_like(y)
    rc = lib.ref_rhs(
        model_id, surface_id, nx, ny, float(t),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ydot.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(cfg.diffusion), float(cfg.beta),
        float(cfg.surface_width), float(cfg.surface_length),
        float(cfg.t_boundary), int(cfg.vary_beta),
        float(cfg.beta_min), float(cfg.beta_max), int(cfg.just_diffusion))
    if rc != 0:
        raise RuntimeError(f"ref_rhs failed with rc={rc}")
    return np.moveaxis(ydot.reshape(ny, nx, nvars), -1, 0)
