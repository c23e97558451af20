"""Scroll-wave filament detection and tracking in 3-D volumes.

Beyond-reference analysis toolkit (the reference is strictly 2-D,
src/FHNmodel_flat.cpp:489-566): in a 3-D excitable volume
(surface="box") a rotating scroll wave organises around a FILAMENT — a
curve of phase singularity that is the 3-D extension of the 2-D spiral
tip. Filament number, length, and meander are the standard observables
of cardiac scroll-wave dynamics (Fenton & Karma, Chaos 1998; Clayton &
Holden, Phys. Med. Biol. 2002); filament instability and multiplication
is the leading model of the ventricular-fibrillation transition.

Method: the viz/tips.py Iyer-Gray phase-winding detector applied to
plaquettes of the volume. A filament pierces an elementary grid
plaquette when the phase theta = atan2(v - cv, u - cu) winds by +-2pi
around it; wrapping each edge difference into (-pi, pi] makes the
winding an exact integer, so detection is threshold-free (the 2-D
argument, viz/tips.py module docstring). By default every xy-plaquette
of every z-plane is tested (planes="z" — transmural filaments, the
ventricular-wall observable); planes="all" adds the xz and yz plaquette
families so filament segments running PARALLEL to the xy-plane are found
too (a piercing is only detected by plaquettes the filament crosses
transversally).

Pierced-plaquette centres are clustered into filaments by single-linkage
over a voxel-scale radius (union-find, periodic-aware on the periodic
axes), each filament's length is estimated by its Euclidean minimum
spanning tree (exact for polyline samples of a curve, robust to the
unordered detection set), and filaments are linked frame-to-frame by
greedy nearest-centroid matching with the same periodic metric as 2-D
tip tracking.

Everything is plain numpy on reassembled (nt, nz, ny, nx) arrays — the
viz-layer convention (viz/volume.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from crdmodel_tpu.viz.tips import (_periodic_dist, default_phase_origin,
                                   winding_numbers)


def periodic_axes3(cfg):
    """(wrap_z, wrap_y, wrap_x) for a box SimConfig given cfg.boundary."""
    b = getattr(cfg, "boundary", "periodic")
    return (b not in ("noflux", "noflux_z"),
            b not in ("noflux", "noflux_y"),
            b not in ("noflux", "noflux_x"))


def find_filament_points(u3, v3, origin=None,
                         periodic=(True, True, True), planes="z"):
    """Pierced-plaquette centres in one (nz, ny, nx) snapshot pair.

    Returns (points (k, 3) fractional (z, y, x) coordinates, charges (k,)).
    planes="z": xy-plaquettes of every z-plane (centre (z, j+.5, i+.5));
    planes="all": adds the xz plaquettes of every y-plane and the yz
    plaquettes of every x-plane. The charge sign of a piercing is only
    meaningful relative to its plaquette family's orientation; within
    one family opposite signs are opposite filament directions (a scroll
    ring pierces a z-plane twice with opposite charges)."""
    u3 = np.asarray(u3)
    v3 = np.asarray(v3)
    if origin is None:
        origin = default_phase_origin(u3, v3)
    pz, py, px = periodic
    pts = []
    chg = []

    def family(uu, vv, per2, to_xyz):
        for k in range(uu.shape[0]):
            q = winding_numbers(uu[k], vv[k], origin, periodic=per2)
            jj, ii = np.nonzero(q)
            if len(jj):
                pts.extend(to_xyz(k, jj + 0.5, ii + 0.5))
                chg.extend(q[jj, ii].astype(int))

    # z-family: planes u3[k] are (ny, nx)
    family(u3, v3, (py, px),
           lambda k, a, b: np.stack(
               [np.full_like(a, float(k)), a, b], axis=1))
    if planes == "all":
        # y-family: planes (nz, nx), plaquette centre (k+.5, j, i+.5)
        uy = np.transpose(u3, (1, 0, 2))
        vy = np.transpose(v3, (1, 0, 2))
        family(uy, vy, (pz, px),
               lambda j, a, b: np.stack(
                   [a, np.full_like(a, float(j)), b], axis=1))
        # x-family: planes (nz, ny), plaquette centre (k+.5, j+.5, i)
        ux = np.transpose(u3, (2, 0, 1))
        vx = np.transpose(v3, (2, 0, 1))
        family(ux, vx, (pz, py),
               lambda i, a, b: np.stack(
                   [a, b, np.full_like(a, float(i))], axis=1))
    if not pts:
        return np.zeros((0, 3)), np.zeros((0,), dtype=int)
    return np.asarray(pts, dtype=np.float64), np.asarray(chg, dtype=int)


@dataclasses.dataclass
class Filament:
    """One filament in one frame: unordered sample points (k, 3) in
    fractional (z, y, x) grid coordinates, per-point charges, and the
    MST length estimate in grid units."""
    points: np.ndarray
    charges: np.ndarray
    length: float

    def __len__(self):
        return len(self.charges)

    @property
    def centroid(self):
        """Plain arithmetic mean — seam-naive: for a cluster straddling
        a periodic wrap it lands mid-domain. Frame-to-frame linking uses
        periodic_centroid instead (ADVICE r3)."""
        return self.points.mean(axis=0)

    def periodic_centroid(self, shape, periodic=(True, True, True)):
        """Seam-robust centroid: on wrap axes, the circular mean (angle
        of the mean phasor), which stays on the filament when the cluster
        straddles the periodic seam."""
        c = np.empty(3)
        for ax in range(3):
            x = self.points[:, ax]
            n = float(shape[ax])
            if periodic[ax] and len(x):
                ang = x * (2.0 * np.pi / n)
                m = np.arctan2(np.mean(np.sin(ang)), np.mean(np.cos(ang)))
                c[ax] = (m * n / (2.0 * np.pi)) % n
            else:
                c[ax] = x.mean()
        return c


def _mst_length(points, shape, periodic):
    """Euclidean minimum-spanning-tree length of a small point set
    (Prim's algorithm on the O(n^2) periodic distance matrix)."""
    n = len(points)
    if n < 2:
        return 0.0
    d = _periodic_dist(points, points, shape, periodic=periodic)
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    best = d[0].copy()
    total = 0.0
    for _ in range(n - 1):
        best[in_tree] = np.inf
        j = int(np.argmin(best))
        total += float(best[j])
        in_tree[j] = True
        best = np.minimum(best, d[j])
    return total


def cluster_filaments(points, charges, shape,
                      periodic=(True, True, True), link_radius=1.6):
    """Single-linkage clustering of pierced plaquettes into filaments.

    link_radius (grid units) spans the largest gap between consecutive
    piercings of a transversally-crossing curve (diagonal neighbours of
    the z-family sit sqrt(1 + .5^2 + .5^2) ~ 1.22 apart; 1.6 adds slack
    for oblique segments while staying below typical filament spacing)."""
    n = len(points)
    if n == 0:
        return []
    d = _periodic_dist(points, points, shape, periodic=periodic)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ii, jj = np.nonzero(d <= link_radius)
    for a, b in zip(ii, jj):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = np.array([find(a) for a in range(n)])
    out = []
    for r in np.unique(roots):
        sel = roots == r
        p = points[sel]
        order = np.argsort(p[:, 0], kind="stable")
        out.append(Filament(points=p[order], charges=charges[sel][order],
                            length=_mst_length(p, shape, periodic)))
    out.sort(key=lambda f: -f.length)
    return out


def find_filaments(u3, v3, origin=None, periodic=(True, True, True),
                   planes="z", link_radius=1.6):
    """Detect filaments in a single (nz, ny, nx) snapshot pair."""
    u3 = np.asarray(u3)
    pts, chg = find_filament_points(u3, v3, origin, periodic, planes)
    return cluster_filaments(pts, chg, u3.shape, periodic, link_radius)


def filaments_trajectory(traj_u, traj_v, origin=None,
                         periodic=(True, True, True), planes="z",
                         link_radius=1.6):
    """Detect filaments in every frame of (nt, nz, ny, nx) trajectories.

    origin defaults to the midrange over the WHOLE trajectory so all
    frames share one phase origin (the tips.py convention). Returns
    (list of per-frame filament lists, origin)."""
    traj_u = np.asarray(traj_u)
    traj_v = np.asarray(traj_v)
    if origin is None:
        origin = default_phase_origin(traj_u, traj_v)
    return [find_filaments(traj_u[k], traj_v[k], origin, periodic,
                           planes, link_radius)
            for k in range(traj_u.shape[0])], origin


@dataclasses.dataclass
class FilamentTrack:
    """One filament followed across frames (by nearest centroid)."""
    frames: list
    centroids: list
    lengths: list

    @property
    def lifetime(self) -> int:
        return len(self.frames)


def track_filaments(framesets, shape, periodic=(True, True, True),
                    max_jump=None):
    """Greedy nearest-centroid frame-to-frame linking (the link_tips
    pattern); max_jump defaults to 1/4 of the smallest IN-PLANE extent
    (ny, nx) — filaments drift in-plane, and keying the default on a thin
    slab's z extent would break tracks at ordinary drift speeds."""
    if max_jump is None:
        max_jump = min(shape[-2:]) / 4.0
    tracks = []
    open_tracks = []
    for k, fils in enumerate(framesets):
        cents = (np.asarray([f.periodic_centroid(shape, periodic)
                             for f in fils])
                 if fils else np.zeros((0, 3)))
        used = np.zeros(len(fils), dtype=bool)
        still_open = []
        if open_tracks and len(fils):
            prev = np.asarray([t.centroids[-1] for t in open_tracks])
            d = _periodic_dist(prev, cents, shape, periodic=periodic)
            order = np.argsort(d, axis=None)
            matched_t = np.zeros(len(open_tracks), dtype=bool)
            for flat in order:
                ti, fi = np.unravel_index(flat, d.shape)
                if matched_t[ti] or used[fi] or d[ti, fi] > max_jump:
                    continue
                t = open_tracks[ti]
                t.frames.append(k)
                t.centroids.append(cents[fi])
                t.lengths.append(fils[fi].length)
                matched_t[ti] = True
                used[fi] = True
            still_open = [t for t, m in zip(open_tracks, matched_t) if m]
        for fi, f in enumerate(fils):
            if not used[fi]:
                t = FilamentTrack(frames=[k], centroids=[cents[fi]],
                                  lengths=[f.length])
                tracks.append(t)
                still_open.append(t)
        open_tracks = still_open
    return tracks


def filament_stats(framesets):
    """Per-frame (count, total length) arrays for a framesets list."""
    counts = np.array([len(fs) for fs in framesets])
    lengths = np.array([sum(f.length for f in fs) for fs in framesets])
    return counts, lengths
