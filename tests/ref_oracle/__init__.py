"""Reference-RHS parity oracle (TEST-ONLY).

refrhs.cpp is a deliberate serial transcription of the four reference f()
routines (src/FHNmodel_{torus,flat}.cpp, src/GoldbeterModel_{torus,flat}.cpp)
kept at expression-level fidelity so f64 doubles match the reference
bit-for-bit. It lives under tests/ — NOT in the product package — because its
only consumer is tests/test_reference_rhs.py (VERDICT round-2 adjudication:
unavoidable similarity, conditioned on relocation out of the product tree).
Built on demand with g++ + ctypes; tests skip when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import threading

from crdmodel_tpu.native.build import _compile

_DIR = os.path.dirname(os.path.abspath(__file__))
_REFRHS_SRC = os.path.join(_DIR, "refrhs.cpp")
_REFRHS_SO = os.path.join(_DIR, "refrhs.so")

_lock = threading.Lock()
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
