"""Example: spiral-wave pair on a sphere.

The reference hardcodes two surfaces (flat / torus); the framework's
surfaces-of-revolution geometry (core/grid.py::RevolutionGeometry) adds the
sphere — a classic setting for excitable-media spirals (e.g. cardiac
arrhythmia models on closed surfaces), where the index theorem forces
rotor charges to sum to zero (the hairy-ball constraint): a single broken
front on the sphere must develop counter-rotating tips.

Runs the Barkley model seeded with a broken excitation band straddling the
equator, tracks the phase-singularity charges (viz/tips.py — the detector
is charge-signed), confirms the net topological charge is 0, and writes
the ParaView pipeline (sphere mesh + per-step vtps) for 3-D rendering.

    python examples/sphere_spirals.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput
from crdmodel_tpu.viz import (generate_revolution_vtp, map_output_to_surface,
                              plot_movie, tips)


def main(outdir: str = "sphere_out"):
    cfg = SimConfig(
        model="barkley", surface="sphere", x_mesh=144,
        surface_length=80.0,          # equator circumference -> R = 80/2pi
        diffusion=1.0, beta=0.05,     # barkley's b parameter
        wave_length=0.08, wave_width=0.35,
        t_final=40.0, output_timestep=40,
        dtype="float32", rtol=1e-4, atol=1e-7,
        include_all_vars=1,
        # pole cells set the diffusion CFL (the phi-spacing rho*dphi -> 0
        # at the poles, inflating the stencil spectral radius ~nx^4):
        # explicit ERK steps underflow f32 time there, while rkc2's
        # s ~ sqrt(h*rho) Chebyshev stages absorb it (grid.py pole note)
        method="rkc2",
    )
    res = simulate(cfg)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")

    u, v = res.field(0), res.field(1)
    # the phi axis (rows) wraps; the v axis (cols) is capped at the poles
    tipsets, tracks, _ = tips.track_spiral_tips(u, v,
                                                periodic=(True, False))
    for k in (len(tipsets) // 2, len(tipsets) - 1):
        ts = tipsets[k]
        net = int(ts.charges.sum()) if len(ts.charges) else 0
        print(f"t={res.touts[k]:6.1f}: {len(ts.charges):2d} tips, "
              f"net charge {net:+d}")
        assert net == 0, "net topological charge on a sphere must vanish"

    os.makedirs(outdir, exist_ok=True)
    out = plot_movie(res, cfg, outdir)
    print(f"wrote {len(out['frames'])} frames to {outdir}/png")
    generate_revolution_vtp(res.problem.geometry, cfg, outdir)
    pvd = map_output_to_surface(res, outdir)
    print(f"wrote {pvd} (open in ParaView)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
