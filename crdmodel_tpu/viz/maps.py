"""Wavefront-analysis maps: activation times, action-potential duration,
conduction velocity, dominant frequency.

Beyond-reference analysis toolkit (companion to viz/tips.py): the
reference's post-processing stops at movies and torus maps (SURVEY.md
P1-P8), but the standard quantitative readouts for every excitable-media
family this framework runs — cardiac mapping's activation/APD/CV maps
(Aliev-Panfilov, FHN, Barkley) and the dominant-frequency maps of
fibrillation analysis — are missing there. All maps are plain numpy over
reassembled (nt, ny, nx) snapshot stacks (the viz-layer convention,
viz/plots.py) with sub-frame accuracy from linear interpolation between
snapshots.

Conduction velocity is metric-aware: gradients of the activation map are
taken in PHYSICAL arc length via per-column spacings (hx, hy) derived
from the geometry (flat: (dx, dy); torus: (r dx, (R + r cos th) dy);
surfaces of revolution: (sqrt(E) dx, rho dy) — core/grid.py), so a wave
travelling at speed c reads c on any surface.

Conventions:
- activation = first upward crossing of the threshold (cells already
  above threshold at the first snapshot activate AT the first snapshot
  time; cells that never cross are NaN),
- APD_f (apd_map(frac=f), e.g. APD90 with f=0.9) uses the per-cell level
  peak - f*(peak - rest) crossed upward then downward around the first
  action potential, the clinical convention,
- dominant frequency = argmax of the one-sided power spectrum over
  non-DC bins of the mean-removed uniform snapshot series.
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------------
# Metric-aware grid spacings


def physical_spacings(geometry):
    """Per-column physical arc-length spacings (hx, hy), each (nx,) f64:
    the surface distance between x-neighbours / y-neighbours in column i
    (core/grid.py metric conventions; reference torus metric
    src/FHNmodel_torus.cpp:527-541)."""
    g = geometry.grid
    kind = getattr(geometry, "kind", "flat")
    if kind == "flat":
        hx = np.full(g.nx, np.float64(g.dx))
        hy = np.full(g.nx, np.float64(g.dy))
    elif kind == "torus":
        th = g.xmin + np.arange(g.nx, dtype=np.float64) * g.dx
        hx = np.full(g.nx, np.float64(geometry.r * g.dx))
        hy = (geometry.R + geometry.r * np.cos(th)) * np.float64(g.dy)
    elif kind == "revolution":
        hx = np.asarray(geometry.se_p, dtype=np.float64) * np.float64(g.dx)
        hy = np.asarray(geometry.rho_p, dtype=np.float64) * np.float64(g.dy)
    else:  # pragma: no cover - future geometries
        raise ValueError(f"unknown geometry kind {kind!r}")
    return hx, hy


# ----------------------------------------------------------------------
# Activation times


def _first_crossing(u, times, level, direction="up"):
    """(t_cross (ny, nx), found (ny, nx)) of the first sub-frame-linear
    crossing of `level` (scalar or (ny, nx)) in the given direction.
    Cells already past the level at frame 0 are NOT counted (callers
    decide how to treat them)."""
    u = np.asarray(u, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    level = np.asarray(level, dtype=np.float64)
    if direction == "up":
        hit = (u[:-1] < level) & (u[1:] >= level)
    else:
        hit = (u[:-1] >= level) & (u[1:] < level)
    found = hit.any(axis=0)
    k = hit.argmax(axis=0)                      # first True (0 if none)
    u0 = np.take_along_axis(u, k[None], axis=0)[0]
    u1 = np.take_along_axis(u, k[None] + 1, axis=0)[0]
    denom = np.where(u1 == u0, 1.0, u1 - u0)
    frac = np.where(u1 == u0, 0.0, (level - u0) / denom)
    t_cross = times[k] + frac * (times[k + 1] - times[k])
    return t_cross, found


def activation_times(u, times, threshold=None):
    """(ny, nx) first-activation map: the time of the first upward
    crossing of `threshold` (default: the global midrange of u), linearly
    interpolated between snapshots. Cells above threshold at the first
    snapshot activate at times[0]; cells that never activate are NaN."""
    u = np.asarray(u, dtype=np.float64)
    if threshold is None:
        threshold = 0.5 * (float(u.min()) + float(u.max()))
    t_cross, found = _first_crossing(u, times, threshold, "up")
    act = np.where(found, t_cross, np.nan)
    act = np.where(u[0] >= threshold, np.asarray(times, np.float64)[0], act)
    return act


# ----------------------------------------------------------------------
# Action-potential duration


def apd_map(u, times, frac=0.9, min_amplitude_frac=0.1):
    """(ny, nx) APD_frac map around each cell's FIRST action potential:
    time between the upward and the following downward crossing of the
    per-cell repolarisation level  peak - frac*(peak - rest)  (rest/peak =
    per-cell min/max over the series; APD90 <-> frac=0.9). Cells whose
    excursion is below min_amplitude_frac of the largest cell excursion
    (quiescent cells) and cells with no complete AP inside the series are
    NaN."""
    u = np.asarray(u, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    rest = u.min(axis=0)
    peak = u.max(axis=0)
    amp = peak - rest
    level = peak - frac * amp

    up = (u[:-1] < level) & (u[1:] >= level)
    dn = (u[:-1] >= level) & (u[1:] < level)
    nt1 = up.shape[0]
    has_up = up.any(axis=0)
    k_up = up.argmax(axis=0)
    # first down-crossing strictly AFTER the upstroke frame
    idx = np.arange(nt1).reshape((nt1,) + (1,) * (u.ndim - 1))
    dn_after = dn & (idx > k_up)
    has_dn = dn_after.any(axis=0)
    k_dn = dn_after.argmax(axis=0)

    def _interp(k):
        u0 = np.take_along_axis(u, k[None], axis=0)[0]
        u1 = np.take_along_axis(u, k[None] + 1, axis=0)[0]
        denom = np.where(u1 == u0, 1.0, u1 - u0)
        fr = np.where(u1 == u0, 0.0, (level - u0) / denom)
        return times[k] + fr * (times[k + 1] - times[k])

    t_up = _interp(k_up)
    t_dn = _interp(k_dn)
    apd = t_dn - t_up
    ok = has_up & has_dn & (amp > min_amplitude_frac * float(amp.max()))
    return np.where(ok, apd, np.nan)


# ----------------------------------------------------------------------
# Conduction velocity


def conduction_velocity(act, geometry, vmax=None):
    """Conduction-velocity maps from an activation-time map.

    The activation-time gradient is the slowness vector (s = grad T,
    |s| = 1/speed); it is taken with metric-aware central differences in
    physical arc length (physical_spacings — so the answer is a true
    surface speed on the torus/sphere, not an index speed) and one-sided
    differences at the array edges. Activation maps are NOT periodic
    functions even on periodic surfaces (the wave's arrival time jumps
    where first arrivals collide and at the wrap seam of the map), so no
    wraparound differencing is attempted; cells adjacent to NaN
    activation or to an arrival-time ridge remain NaN/unreliable there.

    Returns (speed, sx, sy): speed (ny, nx) in surface-distance/time
    (inf where the front arrives simultaneously, NaN where undefined),
    and the slowness components. vmax (optional) caps reported speeds:
    entries above it (collision ridges, breakthrough sites) become NaN.
    """
    act = np.asarray(act, dtype=np.float64)
    hx, hy = physical_spacings(geometry)

    def _grad1(a, axis, h):
        g = np.empty_like(a)
        if axis == -1:
            g[:, 1:-1] = (a[:, 2:] - a[:, :-2]) / (2.0 * h[1:-1])
            g[:, 0] = (a[:, 1] - a[:, 0]) / h[0]
            g[:, -1] = (a[:, -1] - a[:, -2]) / h[-1]
        else:
            g[1:-1, :] = (a[2:, :] - a[:-2, :]) / (2.0 * h[None, :])
            g[0, :] = (a[1, :] - a[0, :]) / h
            g[-1, :] = (a[-1, :] - a[-2, :]) / h
        return g

    sx = _grad1(act, -1, hx)
    sy = _grad1(act, -2, hy)
    slowness = np.hypot(sx, sy)
    with np.errstate(divide="ignore", invalid="ignore"):
        speed = 1.0 / slowness
    # a never-activated cell has no front speed, even when its finite
    # neighbours give its difference stencil a value
    speed = np.where(np.isnan(act), np.nan, speed)
    if vmax is not None:
        speed = np.where(speed > vmax, np.nan, speed)
    return speed, sx, sy


# ----------------------------------------------------------------------
# Dominant frequency


def dominant_frequency_map(u, times):
    """(freq (ny, nx), power_fraction (ny, nx)): the dominant (non-DC)
    frequency of each cell's mean-removed snapshot series via the real
    FFT, and the fraction of total (non-DC) spectral power in that bin —
    the fibrillation-analysis DF map. Snapshots must be uniform in time
    (asserted); frequency resolution is 1/(nt*dt)."""
    u = np.asarray(u, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    dts = np.diff(times)
    if not np.allclose(dts, dts[0], rtol=1e-6, atol=0.0):
        raise ValueError("dominant_frequency_map needs uniform snapshot "
                         "times (got non-uniform spacing)")
    nt = u.shape[0]
    spec = np.fft.rfft(u - u.mean(axis=0), axis=0)
    power = np.abs(spec) ** 2
    power[0] = 0.0
    k = power.argmax(axis=0)
    freqs = np.fft.rfftfreq(nt, d=float(dts[0]))
    total = power.sum(axis=0)
    frac = np.take_along_axis(power, k[None], axis=0)[0] / np.where(
        total == 0.0, 1.0, total)
    return freqs[k], np.where(total == 0.0, 0.0, frac)


# ----------------------------------------------------------------------
# Export


def maps_to_npz(path, cfg=None, **arrays):
    """Save named maps (+ optional config echo) to an npz file; returns
    the path."""
    meta = {}
    if cfg is not None:
        meta["program_name"] = np.asarray(cfg.program_name)
        meta["t_final"] = np.asarray(cfg.t_final)
    np.savez_compressed(path, **arrays, **meta)
    return path


def summarize(name, arr):
    """One human line per map: finite fraction + range (CLI output)."""
    finite = np.isfinite(arr)
    if not finite.any():
        return f"{name}: no finite values"
    vals = np.asarray(arr)[finite]
    return (f"{name}: {finite.mean():.0%} finite, "
            f"range [{vals.min():.6g}, {vals.max():.6g}], "
            f"median {np.median(vals):.6g}")
