"""Structured time-dependent forcing: stimulation protocols as data.

The generic forcing door (`build_problem(cfg, forcing=fn)`, core/problem.py)
accepts any fn(t, state, params) and runs on the XLA path, which evaluates
it at true stage times. This module adds the STRUCTURED form the fused
kernels can consume — `SeparableForcing`, a sum of stimuli

    F_i(t, x, y) = waveform_i(t) * row_i(y) * col_i(x)     on variable var_i

(an electrode patch, a Gaussian stimulation site, a global pacing drive are
all rank-1 in space). Separability is what makes in-kernel evaluation
cheap: the per-stage amplitudes waveform_i(t + c_s h) are scalars computed
OUTSIDE the kernel (the kernels stay autonomous in the sense of the
models/base.py AUTONOMY CONTRACT — time enters only through per-dispatch
scalar inputs), and the spatial profiles stream like the beta field. A
stimulus with a full 2-D `spatial` field is still accepted — it just
declines the fused path (XLA evaluates it as-is).

S1-S2 pacing (the standard restitution / vulnerability protocol in cardiac
excitable media — the reference has no stimulation machinery at all, its
only time dependence is the t<tBoundary freeze src/FHNmodel_torus.cpp:
643-653) is `s1s2_protocol` below.

SeparableForcing implements the generic forcing(t, state, params) contract,
so every driver that handles forcing handles it: single device, sharded
(parallel/sharded.py registers the profiles as sharded params so local
blocks see local slices), streaming, checkpointed. The freeze masks it
like every other RHS term.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Stimulus:
    """One forcing term: waveform(t) [jittable scalar->scalar] times a
    spatial profile, added to variable `var`'s RHS.

    Spatial form, one of:
      * row/col: rank-1 profiles ((ny,) / (nx,) numpy arrays, either may
        be None = uniform) — fused-kernel eligible;
      * spatial: a full (ny, nx) field — XLA path only.

    zprof: optional (nz,) depth profile for 3-D box problems (None =
    uniform through the slab) — composes with row/col as a rank-1
    separable volume profile; the z leg rides the box kernels' plane
    schedule (round 5). Box surfaces only.
    """
    waveform: Callable
    var: int = 0
    row: Optional[object] = None
    col: Optional[object] = None
    spatial: Optional[object] = None
    zprof: Optional[object] = None

    @property
    def separable(self) -> bool:
        return self.spatial is None


class SeparableForcing:
    """forcing(t, state, params) built from Stimulus terms.

    Under shard_map the spatial profiles must be LOCAL slices — the
    sharded drivers register them in params (parallel/sharded.py::
    sharded_params: "_stim_row_{i}" (nyl, 1), "_stim_col_{i}" (1, nxl),
    or "_stim_{i}" (nyl, nxl) for full fields), and __call__ prefers
    those over the closure arrays.
    """

    def __init__(self, *stimuli: Stimulus):
        if not stimuli:
            raise ValueError("SeparableForcing needs at least one Stimulus")
        self.stimuli = tuple(stimuli)

    @property
    def separable(self) -> bool:
        return all(s.separable for s in self.stimuli)

    @property
    def breakpoints(self) -> tuple:
        """Known discontinuity times of the waveforms (e.g. pulse edges)."""
        pts = set()
        for s in self.stimuli:
            pts.update(getattr(s.waveform, "breakpoints", ()))
        return tuple(sorted(pts))

    def _profile(self, i, s, state, params):
        dtype = state.dtype
        if isinstance(params, dict):
            if f"_stim_{i}" in params:
                return params[f"_stim_{i}"].astype(dtype)
            if f"_stim_row_{i}" in params:
                pr = params[f"_stim_row_{i}"].astype(dtype)
                pc = params[f"_stim_col_{i}"].astype(dtype)
                return pr * pc
        if s.spatial is not None:
            return jnp.asarray(np.broadcast_to(
                np.asarray(s.spatial), state.shape[-2:]), dtype)
        pr = (jnp.asarray(np.asarray(s.row).reshape(-1, 1), dtype)
              if s.row is not None else None)
        pc = (jnp.asarray(np.asarray(s.col).reshape(1, -1), dtype)
              if s.col is not None else None)
        if pr is None and pc is None:
            prof = jnp.ones((), dtype)
        elif pr is None:
            prof = pc
        elif pc is None:
            prof = pr
        else:
            prof = pr * pc
        return prof

    def _apply_z(self, i, s, prof, dtype):
        """Multiply in the optional (nz,) depth profile (3-D box states:
        prof broadcasts (ny, nx)-like over z, zprof rides axis -3)."""
        if s.zprof is None:
            return prof
        z = jnp.asarray(np.asarray(s.zprof, np.float64).reshape(-1, 1, 1),
                        dtype)
        return z * prof

    def __call__(self, t, state, params):
        nvars = state.shape[0]
        seg = params.get("_seg_end") if isinstance(params, dict) else None
        per_var = {}
        for i, s in enumerate(self.stimuli):
            if seg is not None and getattr(s.waveform, "segment_gated",
                                           False):
                amp = jnp.asarray(s.waveform(t, seg_end=seg), state.dtype)
            else:
                amp = jnp.asarray(s.waveform(t), state.dtype)
            contrib = amp * self._apply_z(
                i, s, self._profile(i, s, state, params), state.dtype)
            per_var[s.var] = (contrib if s.var not in per_var
                              else per_var[s.var] + contrib)
        zero = jnp.zeros_like(state[0])
        return jnp.stack([zero + per_var[v] if v in per_var else zero
                          for v in range(nvars)])


def pulse_train(t_starts: Sequence[float], duration: float,
                amplitude: float = 1.0):
    """waveform(t, seg_end=None): `amplitude` inside any [t0, t0+duration)
    window, else 0 — square stimulation pulses (jittable; static list).

    SEGMENT GATING (the freeze trick, core/problem.py): the edges are
    registered as integrator breakpoints, so segments never straddle
    them — and when the caller supplies the segment end (drivers thread
    params["_seg_end"]), the pulse is ON iff the WHOLE segment lies
    inside a window (seg_end in (t0, t0+dur]). Without it, a stage
    evaluated exactly AT a left edge (the final stage of the pre-pulse
    segment lands on t0 with stage node c=1) would see the jump, blow
    the error estimate, and reject the controller into dt-underflow
    (measured: the 256^2 S1-S2 example). With the gate, the amplitude is
    constant per segment, the stage times become irrelevant to on/off,
    and the pulse's integral over every segment is exact."""
    starts = tuple(float(t0) for t0 in t_starts)
    dur = float(duration)
    amp = float(amplitude)

    def waveform(t, seg_end=None):
        ref = t if seg_end is None else seg_end
        on = jnp.zeros((), jnp.result_type(ref, jnp.float32))
        for t0 in starts:
            if seg_end is None:
                hit = (ref >= t0) & (ref < t0 + dur)
            else:
                hit = (ref > t0) & (ref <= t0 + dur)
            on = on + jnp.where(hit, 1.0, 0.0)
        return amp * jnp.minimum(on, 1.0)

    # pulse edges are RHS discontinuities in t: drivers register them as
    # integrator breakpoints (core/problem.py::solver_breakpoints) so the
    # adaptive controller steps exactly TO each edge instead of hammering
    # it with rejections (same machinery as the tBoundary freeze)
    waveform.breakpoints = tuple(sorted(
        {t0 for t0 in starts} | {t0 + dur for t0 in starts}))
    waveform.segment_gated = True
    return waveform


def rect_profile(n: int, lo: int, hi: int) -> np.ndarray:
    """0/1 profile over [lo, hi) of an n-point axis."""
    p = np.zeros(n)
    p[lo:hi] = 1.0
    return p


def gaussian_profile(n: int, center: float, sigma: float) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return np.exp(-0.5 * ((i - center) / sigma) ** 2)


def s1s2_protocol(cfg, amplitude: float, s1_times: Sequence[float],
                  s2_time: float, duration: float,
                  s1_rows=None, s2_cols=None, var: int = 0
                  ) -> SeparableForcing:
    """The standard S1-S2 cross-field stimulation protocol:

      S1: pacing pulses at `s1_times` applied to a row band (default the
          bottom eighth of the domain — a line electrode);
      S2: one premature pulse at `s2_time` applied to a column band
          (default the left half) — the cross-gradient that elicits a
          spiral when timed into the vulnerable window.
    """
    ny, nx = cfg.ny, cfg.nx
    s1_rows = s1_rows if s1_rows is not None else (0, max(1, ny // 8))
    s2_cols = s2_cols if s2_cols is not None else (0, max(1, nx // 2))
    s1 = Stimulus(waveform=pulse_train(s1_times, duration, amplitude),
                  var=var, row=rect_profile(ny, *s1_rows))
    s2 = Stimulus(waveform=pulse_train([s2_time], duration, amplitude),
                  var=var, col=rect_profile(nx, *s2_cols))
    return SeparableForcing(s1, s2)
