"""Example: transmural fiber rotation in a 3-D ventricular-wall slab.

In the real ventricular wall the myofiber direction rotates ~120 degrees
from epicardium to endocardium, and conduction is several-fold faster
along the fibers. This example runs the Aliev-Panfilov model on a 3-D
box with the full 3x3 anisotropic tensor D(z) = R(theta_f(z))
diag(D_par, D_perp, D_trans) R^T, theta_f rotating linearly across the
wall depth (build_problem(cfg, diffusion_tensor=(Dxx, Dyy, Dzz, Dxy,
Dxz, Dyz)) — the conservative 19-point operator of
ops/stencil.py::anisotropic_laplacian3). No reference counterpart: the
reference is 2-D isotropic-only (src/FHNmodel_flat.cpp:489-566).

A point stimulus at mid-wall spreads as an ellipse in every z-plane
whose long axis FOLLOWS the local fiber angle — the classic rotating
"bow-tie" activation pattern. The script prints the measured in-plane
long-axis angle at the bottom, middle and top planes against the
prescribed fiber angles.

    python examples/fiber_rotation_3d.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput


def transmural_tensor(cfg, d_par=1.0, d_perp=0.25, d_trans=0.02,
                      angle0=-np.pi / 3, angle1=np.pi / 3):
    # d_trans is kept well below d_perp so the rotating in-plane pattern
    # stays visible: at wall-thickness transmural coupling the planes
    # z-homogenize and every ellipse averages toward the MEAN fiber
    # angle (physical smoothing, but a dull demo)
    """Full 3x3 tensor with the fiber in the (x, y) plane rotating
    linearly in z from angle0 to angle1; cross-fiber in-plane
    diffusivity d_perp, transmural d_trans."""
    th = np.linspace(angle0, angle1, cfg.nz).reshape(-1, 1, 1)
    c, s = np.cos(th), np.sin(th)
    shape = (cfg.nz, cfg.ny, cfg.nx)
    dxx = np.broadcast_to(d_par * c * c + d_perp * s * s, shape)
    dyy = np.broadcast_to(d_par * s * s + d_perp * c * c, shape)
    dzz = np.full(shape, d_trans)
    dxy = np.broadcast_to((d_par - d_perp) * c * s, shape)
    dxz = np.zeros(shape)
    dyz = np.zeros(shape)
    return (dxx, dyy, dzz, dxy, dxz, dyz), np.ravel(th)


def plane_axis_angle(u, grid):
    """In-plane long-axis angle (deg) of the excited region in one
    z-plane, from the covariance of u above threshold."""
    w = np.clip(u - 0.5, 0.0, None)
    if w.sum() <= 0:
        return float("nan")
    ny, nx = u.shape
    jc, ic = np.unravel_index(np.argmax(w), w.shape)
    w = np.roll(np.roll(w, ny // 2 - jc, 0), nx // 2 - ic, 1)
    w = w / w.sum()
    X, Y = np.meshgrid(np.arange(nx) * grid.dx, np.arange(ny) * grid.dy)
    mx, my = (w * X).sum(), (w * Y).sum()
    cxx = (w * (X - mx) ** 2).sum()
    cyy = (w * (Y - my) ** 2).sum()
    cxy = (w * (X - mx) * (Y - my)).sum()
    _, evecs = np.linalg.eigh([[cxx, cxy], [cxy, cyy]])
    return np.degrees(np.arctan2(evecs[1, 1], evecs[0, 1])) % 180.0


def main(outdir: str = "fiber3d_out"):
    cfg = SimConfig(
        model="aliev_panfilov", surface="box", x_mesh=96, y_mesh=96,
        z_mesh=12, surface_width=40, surface_length=40, surface_depth=5,
        diffusion=1.0, beta=0.05, wave_length=0.06, wave_width=0.06,
        t_final=10.0, output_timestep=5,
        # closed transmural walls (the physical slab), which is also what
        # lets the fused 19-point tensor kernel engage (ops/pallas_box3d
        # tensor mode needs the z-streaming clamp's closed walls)
        boundary="noflux_z",
        dtype="float32", rtol=1e-4, atol=1e-7,
    )
    tensor, th = transmural_tensor(cfg)
    problem = build_problem(cfg, diffusion_tensor=tensor)
    res = simulate(cfg, problem=problem)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")

    u = np.asarray(res.trajectory[-1, 0])   # (nz, ny, nx)
    g = problem.grid
    print("in-plane long-axis angle vs prescribed fiber angle:")
    for k in (0, cfg.nz // 2, cfg.nz - 1):
        got = plane_axis_angle(u[k], g)
        want = np.degrees(th[k]) % 180.0
        print(f"  z-plane {k:2d}: measured {got:6.1f} deg, "
              f"fiber {want:6.1f} deg")

    os.makedirs(outdir, exist_ok=True)
    np.savez_compressed(os.path.join(outdir, "fiber3d.npz"),
                        u=u, touts=np.asarray(res.touts))
    print(f"wrote final volume to {outdir}/fiber3d.npz")
    return res


if __name__ == "__main__":
    main(*sys.argv[1:])
