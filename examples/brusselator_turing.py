"""Example: Brusselator Turing patterns — diffusion-driven instability.

In the window b_T < b < 1 + A^2 the homogeneous state is stable to uniform
perturbations but unstable to finite-wavenumber ones (possible only with
the inhibitor diffusing faster, D_v = 8 D_u): a seeded bump grows into
stationary stripes/spots at the Turing wavelength.

    python examples/brusselator_turing.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput
from crdmodel_tpu.viz import plot_movie


def main(outdir: str = "brusselator_out"):
    cfg = SimConfig(
        model="brusselator", surface="flat", x_mesh=128,
        surface_width=40, surface_length=40, diffusion=0.2,
        beta=1.95,                      # Turing window: (1.83, 2.0)
        wave_length=0.2, wave_width=0.3,
        t_final=300.0, output_timestep=30,
        dtype="float32", rtol=1e-4, atol=1e-7,
    )
    res = simulate(cfg)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")
    u = res.field(0)
    print(f"pattern amplitude: {u[0].std():.4f} -> {u[-1].std():.4f}")
    out = plot_movie(res, cfg, outdir)
    print(f"{len(out['frames'])} frames in {outdir}/png/"
          + (f", movie {out['movie']}" if out["movie"] else " (no movie encoder)"))


if __name__ == "__main__":
    main(*sys.argv[1:])
