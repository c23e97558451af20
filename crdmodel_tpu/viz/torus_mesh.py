"""Parametric torus surface mesh (replaces util/GenTorus.py P5/P6).

The reference builds the torus indirectly through vtkSuperquadricSource with
deliberately swapped theta/phi resolutions, SetSize(R+r), SetThickness(r/R),
triangulation and a point-merging cleanup pass (util/GenTorus.py:29-52).
We generate the exact parametric torus directly:

    x = (R + r cos th) cos ph
    y = (R + r cos th) sin ph
    z = r sin th

with th (minor/tube angle) on nx nodes and ph (major angle) on ny nodes,
periodic in both (no duplicated seam points, no cleanup needed). Cell (i, j)
spans [th_i, th_{i+1}] x [ph_j, ph_{j+1}]; its centre maps to grid indices by
construction, so field attachment (map_output.py) is exact instead of the
reference's nearest-neighbour XYZtoRC search
(util/FHNmodel/MapOutputToTorus.py:16-35).

Axis convention: z is the torus axis (the reference's vtk source uses y —
cosmetic; ParaView renders either).
"""

from __future__ import annotations

import numpy as np

from crdmodel_tpu.viz.vtp import write_vtp


def torus_mesh(R: float, r: float, nx: int, ny: int):
    """Returns (points (nx*ny,3), triangles (2*nx*ny,3), cell_rc (2*nx*ny,2)).

    cell_rc[c] = (row=j, col=i) of the grid sample associated with cell c
    (both triangles of a quad share it, matching the reference's per-cell
    nearest-sample attachment).
    """
    th = 2 * np.pi * np.arange(nx) / nx
    ph = 2 * np.pi * np.arange(ny) / ny
    TH, PH = np.meshgrid(th, ph)              # (ny, nx)
    ring = R + r * np.cos(TH)
    pts = np.stack([ring * np.cos(PH), ring * np.sin(PH),
                    r * np.sin(TH)], axis=-1).reshape(-1, 3)

    def pid(i, j):
        return (j % ny) * nx + (i % nx)

    tris = []
    cell_rc = []
    for j in range(ny):
        for i in range(nx):
            p00, p10 = pid(i, j), pid(i + 1, j)
            p01, p11 = pid(i, j + 1), pid(i + 1, j + 1)
            tris.append((p00, p10, p11))
            tris.append((p00, p11, p01))
            cell_rc.append((j, i))
            cell_rc.append((j, i))
    return (pts, np.asarray(tris, dtype=np.int64),
            np.asarray(cell_rc, dtype=np.int64))


def xyz_to_angles(xyz, R: float, r: float):
    """(x,y,z) -> (phi, theta) on our parametric torus — the equivalent of
    the reference's XYZtoRC/XYZtoPT converters
    (util/GenCurvatureCoupling.py:12-27), z-axis convention."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    phi = np.arctan2(y, x) % (2 * np.pi)
    rho = np.sqrt(x * x + y * y) - R
    theta = np.arctan2(z, rho) % (2 * np.pi)
    return phi, theta


def revolution_mesh(geometry, mesh_nx: int = None, mesh_ny: int = None):
    """Parametric mesh for a generic surface of revolution
    (core/grid.py::RevolutionGeometry) — the torus_mesh construction with
    the profile as data. Returns (points, triangles, cell_rc) with the same
    cell -> (row, col) grid-sample association.

    Closed surfaces: node rings at v = 2 pi k / nx, periodic (exactly
    torus_mesh for the torus profile). Capped surfaces: node rings at the
    FACE positions v = pi k / nx, k = 0..nx — the end rings sit exactly on
    the caps (rho -> 0 poles collapse each end ring to a coincident apex;
    the resulting zero-area triangles are harmless to ParaView), and cell
    (i, j) spans rings i..i+1 so every grid cell gets a quad.
    """
    g = geometry.grid
    nx = mesh_nx or g.nx
    ny = mesh_ny or g.ny
    if geometry.rho_fn is None or geometry.z_fn is None:
        raise ValueError("revolution_mesh needs the geometry's profile "
                         "callables (RevolutionGeometry.from_profile)")
    if geometry.capped:
        v = np.pi * np.arange(nx + 1) / nx       # faces incl. both caps
        n_rings, wrap_v = nx + 1, False
    else:
        v = 2 * np.pi * np.arange(nx) / nx
        n_rings, wrap_v = nx, True
    ph = 2 * np.pi * np.arange(ny) / ny
    rho = np.asarray(geometry.rho_fn(v), np.float64) + np.zeros_like(v)
    z = np.asarray(geometry.z_fn(v), np.float64) + np.zeros_like(v)
    V, PH = np.meshgrid(np.arange(n_rings), ph)   # (ny, n_rings)
    RHO = rho[V]
    pts = np.stack([RHO * np.cos(PH), RHO * np.sin(PH),
                    z[V]], axis=-1).reshape(-1, 3)

    def pid(i, j):
        return (j % ny) * n_rings + (i % n_rings if wrap_v else i)

    tris = []
    cell_rc = []
    for j in range(ny):
        for i in range(nx):
            p00, p10 = pid(i, j), pid(i + 1, j)
            p01, p11 = pid(i, j + 1), pid(i + 1, j + 1)
            tris.append((p00, p10, p11))
            tris.append((p00, p11, p01))
            cell_rc.append((j, i))
            cell_rc.append((j, i))
    return (pts, np.asarray(tris, dtype=np.int64),
            np.asarray(cell_rc, dtype=np.int64))


def generate_revolution_vtp(geometry, cfg, outdir: str = ".") -> str:
    """P5 analogue for the beyond-reference surfaces: writes
    <surface>_mesh<nx>.vtp for a sphere / generic revolution run."""
    import os
    pts, tris, _ = revolution_mesh(geometry)
    name = f"{cfg.surface}_mesh{cfg.nx}.vtp"
    os.makedirs(outdir, exist_ok=True)
    return write_vtp(os.path.join(outdir, name), pts, tris)


def generate_torus_vtp(cfg, outdir: str = ".", manual: bool = False) -> str:
    """P5 equivalent: writes torus_R<L>_r<W>_mesh<nx>.vtp (same naming as
    util/GenTorus.py:54). manual=True reproduces P6's hardcoded
    R=80/2pi, r=20/2pi, mesh 200 -> torus_manual.vtp."""
    import os
    if manual:
        R, r = 80 / (2 * np.pi), 20 / (2 * np.pi)
        nx = 200
        ny = int(nx * R / r)
        name = "torus_manual.vtp"
    else:
        R, r = cfg.major_radius, cfg.minor_radius
        nx, ny = cfg.nx, cfg.ny
        name = (f"torus_R{cfg.surface_length:g}_r{cfg.surface_width:g}"
                f"_mesh{cfg.nx}.vtp")
    pts, tris, _ = torus_mesh(R, r, nx, ny)
    os.makedirs(outdir, exist_ok=True)
    return write_vtp(os.path.join(outdir, name), pts, tris)
