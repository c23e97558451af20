"""Example: bounded cardiac tissue with an obstacle-pinned rotor.

The standard cardiac-sheet setup the reference cannot express (its flat
programs wrap both axes, src/FHNmodel_flat.cpp:489-566): a no-flux square
of Aliev-Panfilov tissue (cfg boundary="noflux") containing a circular
inexcitable scar (build_problem(cfg, obstacle_mask=...)). The cross-field
broken front curls into a rotor whose tip anchors to the scar — the
classic mechanism by which structural heterogeneity stabilises a
re-entrant arrhythmia. Both features ride the conservative divergence
operator's face coefficients (core/grid.py::face_openness), so walls are
exactly zero-flux.

Prints the tip-to-scar distance over time (pinning = it stays within a
couple of core radii) and renders the movie frames.

    python examples/bounded_tissue.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput
from crdmodel_tpu.viz import plot_movie, tips


def main(outdir: str = "bounded_out"):
    cfg = SimConfig(
        model="aliev_panfilov", surface="flat", x_mesh=128,
        surface_width=40, surface_length=40, diffusion=1.0,
        beta=0.10, wave_length=0.25, wave_width=0.5,
        t_final=60.0, output_timestep=60,
        dtype="float32", rtol=1e-4, atol=1e-7,
        boundary="noflux",
    )
    ny, nx = cfg.ny, cfg.nx
    # circular scar placed at the free rotor's core (measured by running
    # the same config without the obstacle and averaging the tip track)
    cy, cx, rad = 22.0, 28.0, nx * 0.09
    jj, ii = np.mgrid[0:ny, 0:nx]
    scar = (jj - cy) ** 2 + (ii - cx) ** 2 <= rad ** 2
    problem = build_problem(cfg, obstacle_mask=~scar)
    res = simulate(cfg, problem=problem)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")

    u, v = res.field(0), res.field(1)
    tipsets, tracks, _ = tips.track_spiral_tips(
        u, v, periodic=tips.periodic_axes(cfg))

    def rim_distance(ts):
        d = np.hypot(ts.positions[:, 0] - cy, ts.positions[:, 1] - cx)
        return float(d.min() - rad)

    dists = []
    for k, ts in enumerate(tipsets):
        if len(ts):
            dists.append(rim_distance(ts))
            if k % 10 == 0:
                print(f"frame {k:3d}: {len(ts)} tip(s), nearest "
                      f"{dists[-1]:+6.1f} cells from the scar rim")
    n_with = sum(len(ts) > 0 for ts in tipsets)
    mean_d = float(np.mean(dists)) if dists else np.inf
    print(f"rotor present in {n_with}/{len(tipsets)} frames; mean "
          f"tip-to-rim distance {mean_d:+.1f} cells "
          f"({'PINNED to the scar' if mean_d < 0.5 * rad else 'free'})"
          + ("" if len(tipsets[-1]) else
             " — re-entry self-terminated on the bounded domain"))

    os.makedirs(outdir, exist_ok=True)
    out = plot_movie(res, cfg, outdir)
    print(f"{len(out['frames'])} frames in {outdir}/png/"
          + (f", movie {out['movie']}" if out["movie"] else " (no movie encoder)"))


if __name__ == "__main__":
    main(*sys.argv[1:])
