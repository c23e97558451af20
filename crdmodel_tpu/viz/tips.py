"""Spiral-tip (phase-singularity) detection and tracking.

Beyond-reference analysis toolkit: the reference's post-processing stops at
movies and torus maps (SURVEY.md P1-P8); quantifying rotor dynamics — tip
count, trajectories, meander — is the standard analysis for every
excitable-media family the framework runs (FHN, Barkley, Oregonator,
Aliev–Panfilov cardiac rotors).

Method: the Iyer–Gray phase-winding detector (Iyer & Gray, Ann. Biomed.
Eng. 2001; Gray, Pertsov & Jalife, Nature 1998). Define the state phase

    theta(x) = atan2(v(x) - cv, u(x) - cu)

around a phase origin (cu, cv) chosen inside the excitation loop in the
(u, v) plane. A spiral tip is a phase singularity: the winding number

    q = (1/2pi) * closed-loop sum of wrapped(d theta)

around an elementary grid plaquette is +-1 at the tip and 0 elsewhere.
Wrapping each edge difference into (-pi, pi] makes q an exact integer
count, so detection is threshold-free. Periodic grid dimensions (the
default — the framework's surfaces are a flat periodic rectangle and a
torus, core/grid.py) wrap plaquettes across the seams so tips sitting on
the seam are found; for no-flux bounded domains (cfg.boundary, round 3)
pass periodic=(False, False) (or periodic_axes(cfg)) so the wrap
plaquettes — which straddle physically disconnected edges and produce
spurious charges — are excluded, and the tracking metric stops wrapping.

Tracking: greedy nearest-neighbour frame-to-frame linking with periodic
metric, same-charge constraint, and a max-jump gate; unmatched tips open
new tracks. Returns per-frame detections and linked tracks for meander /
lifetime statistics.

Everything here is plain numpy on reassembled (nt, ny, nx) arrays (the
viz-layer convention, viz/plots.py): detection is O(nt*ny*nx) elementwise.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _wrap(dtheta):
    """Wrap phase differences into (-pi, pi]."""
    return (dtheta + np.pi) % (2.0 * np.pi) - np.pi


def default_phase_origin(u, v):
    """Data-midrange origin (cu, cv): the centroid of the bounding box of
    the (u, v) cloud. For a rotating spiral the trajectory loops around
    this point, which is all the winding detector needs. Pass an explicit
    origin for marginal data (e.g. nearly-quiescent fields)."""
    u = np.asarray(u)
    v = np.asarray(v)
    return (0.5 * (float(u.min()) + float(u.max())),
            0.5 * (float(v.min()) + float(v.max())))


def phase_field(u, v, origin):
    """theta = atan2(v - cv, u - cu), same shape as u."""
    cu, cv = origin
    return np.arctan2(np.asarray(v) - cv, np.asarray(u) - cu)


def winding_numbers(u, v, origin, periodic=(True, True)):
    """Integer winding number q for every grid plaquette, shape (ny, nx).

    Plaquette (j, i) has corners (j,i) -> (j,i+1) -> (j+1,i+1) -> (j+1,i)
    with periodic wrap in both dimensions; q[j, i] is the charge of the
    plaquette whose lower-left corner is (j, i). periodic = (wrap_y,
    wrap_x): a non-periodic axis zeroes its seam plaquettes (last row /
    column), whose loops would otherwise straddle a no-flux wall."""
    th = phase_field(u, v, origin)
    d_right = _wrap(np.roll(th, -1, axis=1) - th)            # (j,i)->(j,i+1)
    d_up = _wrap(np.roll(th, -1, axis=0) - th)               # (j,i)->(j+1,i)
    # loop: right edge at j, up edge at i+1, -right edge at j+1, -up at i
    circ = (d_right + np.roll(d_up, -1, axis=1)
            - np.roll(d_right, -1, axis=0) - d_up)
    q = np.rint(circ / (2.0 * np.pi)).astype(np.int8)
    if not periodic[0]:
        q[-1, :] = 0
    if not periodic[1]:
        q[:, -1] = 0
    return q


def periodic_axes(cfg):
    """(wrap_y, wrap_x) for a SimConfig: which grid axes are physically
    periodic given cfg.boundary (config.py round-3 no-flux boundaries)."""
    b = getattr(cfg, "boundary", "periodic")
    return (b not in ("noflux", "noflux_y"),
            b not in ("noflux", "noflux_x"))


@dataclasses.dataclass
class TipSet:
    """Detections in one frame: positions (k, 2) as fractional (row, col)
    grid coordinates (plaquette centres, i.e. corner + 0.5), charges (k,)."""
    positions: np.ndarray
    charges: np.ndarray

    def __len__(self):
        return len(self.charges)


def find_tips(u, v, origin=None, periodic=(True, True)) -> TipSet:
    """Detect phase singularities in a single (ny, nx) snapshot pair."""
    if origin is None:
        origin = default_phase_origin(u, v)
    q = winding_numbers(u, v, origin, periodic=periodic)
    jj, ii = np.nonzero(q)
    pos = np.stack([jj + 0.5, ii + 0.5], axis=1) if len(jj) else \
        np.zeros((0, 2))
    return TipSet(positions=pos, charges=q[jj, ii].astype(int))


def find_tips_trajectory(traj_u, traj_v, origin=None,
                         periodic=(True, True)):
    """Detect tips in every frame of (nt, ny, nx) trajectories.

    origin defaults to the midrange over the WHOLE trajectory so all
    frames share one phase origin (per-frame origins would make charges
    incomparable across frames)."""
    traj_u = np.asarray(traj_u)
    traj_v = np.asarray(traj_v)
    if origin is None:
        origin = default_phase_origin(traj_u, traj_v)
    return [find_tips(traj_u[k], traj_v[k], origin, periodic=periodic)
            for k in range(traj_u.shape[0])], origin


def _periodic_dist(a, b, shape, periodic=(True, True)):
    """Pairwise distance matrix between (m,2) and (n,2) points with
    periodic wrap on the periodic axes of a (ny, nx) grid."""
    d = np.abs(a[:, None, :] - b[None, :, :])        # (m, n, 2)
    period = np.asarray(shape, dtype=np.float64)
    wrapped = np.minimum(d, period - d)
    keep = np.asarray(periodic, dtype=bool)
    d = np.where(keep[None, None, :], wrapped, d)
    return np.sqrt((d * d).sum(axis=2))


@dataclasses.dataclass
class TipTrack:
    """One linked tip trajectory: frame indices, (row, col) positions."""
    frames: list
    positions: list
    charge: int

    @property
    def lifetime(self) -> int:
        return len(self.frames)

    def as_array(self):
        return np.asarray(self.frames), np.asarray(self.positions)


def link_tips(tipsets, shape, max_jump=None,
              periodic=(True, True)) -> list:
    """Greedy nearest-neighbour linking of per-frame TipSets into
    TipTracks. Matches are same-charge, nearest-first, within max_jump
    grid cells (default: 10% of the smaller grid dimension — a tip moving
    further than that in one output interval is treated as a new rotor).
    """
    if max_jump is None:
        max_jump = 0.1 * min(shape)
    tracks, open_tracks = [], []   # open: (track, last_pos)
    for k, ts in enumerate(tipsets):
        used_new = np.zeros(len(ts), dtype=bool)
        next_open = []
        if open_tracks and len(ts):
            last = np.asarray([p for _, p in open_tracks])
            dist = _periodic_dist(last, ts.positions, shape,
                                  periodic=periodic)
            charges_old = np.asarray([tr.charge for tr, _ in open_tracks])
            same = charges_old[:, None] == ts.charges[None, :]
            dist = np.where(same, dist, np.inf)
            order = np.argsort(dist, axis=None)
            used_old = np.zeros(len(open_tracks), dtype=bool)
            for flat in order:
                a, b = np.unravel_index(flat, dist.shape)
                if dist[a, b] > max_jump or not np.isfinite(dist[a, b]):
                    break
                if used_old[a] or used_new[b]:
                    continue
                used_old[a] = used_new[b] = True
                tr, _ = open_tracks[a]
                tr.frames.append(k)
                tr.positions.append(ts.positions[b])
                next_open.append((tr, ts.positions[b]))
        for b in range(len(ts)):
            if not used_new[b]:
                tr = TipTrack(frames=[k], positions=[ts.positions[b]],
                              charge=int(ts.charges[b]))
                tracks.append(tr)
                next_open.append((tr, ts.positions[b]))
        open_tracks = next_open
    return tracks


def track_spiral_tips(traj_u, traj_v, origin=None, max_jump=None,
                      periodic=(True, True)):
    """End-to-end: detect + link. Returns (tipsets, tracks, origin).
    periodic = (wrap_y, wrap_x); pass periodic_axes(cfg) for bounded
    (no-flux) domains."""
    tipsets, origin = find_tips_trajectory(traj_u, traj_v, origin,
                                           periodic=periodic)
    shape = np.asarray(traj_u).shape[1:]
    tracks = link_tips(tipsets, shape, max_jump=max_jump,
                       periodic=periodic)
    return tipsets, tracks, origin


def tips_to_csv(tipsets, touts, path, cfg=None):
    """Write detections as CSV: frame, t, row, col, y, x, charge. Physical
    (y, x) coordinates use the grid spacing/origin when cfg is given."""
    with open(path, "w") as f:
        f.write("frame,t,row,col,y,x,charge\n")
        for k, ts in enumerate(tipsets):
            t = touts[k] if touts is not None else k
            for p, q in zip(ts.positions, ts.charges):
                if cfg is not None:
                    y = cfg.ymin + p[0] * cfg.dy
                    x = cfg.xmin + p[1] * cfg.dx
                else:
                    y, x = p[0], p[1]
                f.write(f"{k},{t:.8g},{p[0]:.2f},{p[1]:.2f},"
                        f"{y:.8g},{x:.8g},{int(q)}\n")
    return path
