"""Example: Barkley spiral waves — a model family beyond the reference.

The broken-wave initial condition curls into a rotating spiral; frames are
rendered with the same movie machinery the reference models use.

    python examples/barkley_spiral.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput
from crdmodel_tpu.viz import plot_movie


def main(outdir: str = "barkley_out"):
    cfg = SimConfig(
        model="barkley", surface="flat", x_mesh=128,
        surface_width=40, surface_length=40, diffusion=1.0,
        beta=0.05,                      # excitability threshold b
        wave_length=0.25, wave_width=0.5,
        t_final=30.0, output_timestep=30,
        dtype="float32", rtol=1e-4, atol=1e-7,
    )
    res = simulate(cfg)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")
    out = plot_movie(res, cfg, outdir)
    print(f"{len(out['frames'])} frames in {outdir}/png/"
          + (f", movie {out['movie']}" if out["movie"] else " (no movie encoder)"))


if __name__ == "__main__":
    main(*sys.argv[1:])
