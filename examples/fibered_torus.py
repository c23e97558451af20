"""Example: helical fiber anisotropy on the torus metric (round 5).

Cardiac-style fiber fields live on CURVED surfaces; round 5 unifies the
framework's two flagship axes — the metric machinery (torus
Laplace–Beltrami) and the anisotropic tensor operator — into one
conservative self-adjoint operator in the ring row weight
(grid.py::TorusGeometry.tensor_coeffs64). The reference's curvature
tooling (util/GenCurvatureCoupling.py:45-111) gestures at metric-coupled
conduction but never integrates anisotropy; the flat tensor (round 3)
could not see the metric. Here a HELICAL fiber field winds around the
torus — fiber angle alpha(theta) rotating with the poloidal angle,
conduction 6x faster along fibers — and a point stimulus spreads as a
metric-and-fiber-shaped ellipse whose axis visibly follows the local
fiber direction.

    python examples/fibered_torus.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput


def helical_fiber_tensor(cfg, d_par=1.2, d_perp=0.2, turns=1.0):
    """SPD tensor in the physical (e_theta, e_phi) frame: fiber angle
    alpha = turns * theta (the fiber winds helically around the tube)."""
    th = cfg.xmin + np.arange(cfg.nx, dtype=np.float64) * cfg.dx
    alpha = turns * th[None, :]
    c, s = np.cos(alpha), np.sin(alpha)
    dxx = d_par * c * c + d_perp * s * s
    dyy = d_par * s * s + d_perp * c * c
    dxy = (d_par - d_perp) * c * s
    shape = (cfg.ny, cfg.nx)
    return (np.broadcast_to(dxx, shape), np.broadcast_to(dyy, shape),
            np.broadcast_to(dxy, shape))


def main(outdir: str = "fibered_torus_out"):
    cfg = SimConfig(
        model="aliev_panfilov", surface="torus", x_mesh=192,
        surface_width=20.0, surface_length=60.0, diffusion=1.0,
        beta=0.075, wave_length=0.08, wave_width=0.08, wave_inside=1,
        t_final=8.0, output_timestep=8,
        dtype="float32", rtol=1e-4, atol=1e-6, method="rkc2",
    )
    tensor = helical_fiber_tensor(cfg, turns=1.0)
    problem = build_problem(cfg, diffusion_tensor=tensor)
    res = simulate(cfg, problem=problem)
    print(res.describe())
    print(f"throughput {throughput(res):.3e} pts*steps/s")
    assert res.ok

    # fiber-dominated conduction: the wavefront speed along the fiber
    # (theta at the stimulus site, where alpha = pi) exceeds cross-fiber
    # (phi) by ~sqrt(d_par/d_perp) ~ 2.4. Measure the PHYSICAL extent
    # growth of the excited region along both axes between the first two
    # frames (theta arc = r dx, phi arc = ring(pi) dy ~ (R - r) dy).
    geo = problem.geometry
    r_minor, R_major = geo.r, geo.R
    dx_phys = r_minor * cfg.dx
    dy_phys = (R_major - r_minor) * cfg.dy

    def extents(u):
        exc = u > 0.5
        cols = np.flatnonzero(exc.any(axis=0))
        rows = np.flatnonzero(exc.any(axis=1))
        if len(cols) == 0:
            return 0.0, 0.0
        return ((cols.max() - cols.min() + 1) * dx_phys,
                (rows.max() - rows.min() + 1) * dy_phys)

    x1, y1 = extents(np.asarray(res.trajectory[1, 0]))
    x2, y2 = extents(np.asarray(res.trajectory[2, 0]))
    vx, vy = (x2 - x1), (y2 - y1)
    print(f"wavefront growth t[1]->t[2]: along-fiber (theta) {vx:.2f}, "
          f"cross-fiber (phi) {vy:.2f}, ratio {vx / max(vy, 1e-9):.2f} "
          f"(sqrt(d_par/d_perp) = {np.sqrt(1.2 / 0.2):.2f})")

    os.makedirs(outdir, exist_ok=True)
    np.savez_compressed(os.path.join(outdir, "final_state.npz"),
                        u=np.asarray(res.trajectory[-1, 0]),
                        touts=np.asarray(res.touts))
    print(f"wrote {outdir}/final_state.npz")
    return res


if __name__ == "__main__":
    main(*sys.argv[1:2])
