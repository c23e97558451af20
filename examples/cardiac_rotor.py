"""Example: Aliev–Panfilov cardiac rotor + spiral-tip tracking.

The cross-field (S1-S2-like) broken-front seed curls into a re-entrant
rotor — the canonical model of cardiac arrhythmia — and the phase-winding
tip tracker (viz/tips.py) quantifies the rotor core: tip count per frame,
the linked tip trajectory (meander path), and its CSV export. Both the
model family and the rotor analysis are beyond the reference.

    python examples/cardiac_rotor.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput
from crdmodel_tpu.viz import plot_movie, tips


def main(outdir: str = "cardiac_out"):
    cfg = SimConfig(
        model="aliev_panfilov", surface="flat", x_mesh=128,
        surface_width=40, surface_length=40, diffusion=1.0,
        beta=0.10,                      # excitation threshold a (meander)
        wave_length=0.25, wave_width=0.5,
        t_final=60.0, output_timestep=60,
        dtype="float32", rtol=1e-4, atol=1e-7,
    )
    res = simulate(cfg)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")

    u, v = res.field(0), res.field(1)
    tipsets, tracks, origin = tips.track_spiral_tips(u, v)
    counts = [len(ts) for ts in tipsets]
    print(f"phase origin (cu, cv) = ({origin[0]:.3f}, {origin[1]:.3f})")
    print(f"tips per frame: {counts}")
    longest = max(tracks, key=lambda tr: tr.lifetime)
    frames, pos = longest.as_array()
    drift = np.linalg.norm(pos[-1] - pos[0])
    print(f"longest track: {longest.lifetime} frames, charge "
          f"{longest.charge}, core drift {drift:.1f} cells")
    os.makedirs(outdir, exist_ok=True)
    csv = tips.tips_to_csv(tipsets, np.asarray(res.touts),
                           os.path.join(outdir, "rotor_tips.csv"), cfg=cfg)
    print(f"tip CSV: {csv}")

    out = plot_movie(res, cfg, outdir)
    print(f"{len(out['frames'])} frames in {outdir}/png/"
          + (f", movie {out['movie']}" if out["movie"] else " (no movie encoder)"))


if __name__ == "__main__":
    main(*sys.argv[1:])
