"""Example: S1-S2 cross-field stimulation in a 3-D slab — a paced scroll.

The volumetric version of examples/s1s2_pacing.py (round 5 — the 3-D box
kernels now evaluate structured forcing IN-KERNEL: per-stage/per-eval
amplitudes at true stage times, rank-1 row/col electrode profiles, and
the new Stimulus.zprof depth profile riding the z-plane schedule). An S1
line electrode paces the quiescent slab from one face, then a premature
cross-field S2 lands in the waveback's vulnerable window — the broken
front curls into a SCROLL wave whose filament threads the wall
(viz/filaments.py detects and tracks it).

The reference has no stimulation machinery and is strictly 2-D
(src/FHNmodel_torus.cpp:643-653 is its only time dependence;
src/FHNmodel_flat.cpp:489-566); both axes of this example are
beyond-reference capabilities. This domain is diffusion-CFL-bound at
dx ~ 0.1, so the example uses rkc2 per the method ground rules — the
S1-S2 pulse train is segment-gated, so the paced run rides the fused
z-streaming box RKC kernel end to end.

    python examples/scroll_pacing_3d.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                       gaussian_profile, pulse_train,
                                       rect_profile)
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput


def slab_s1s2(cfg, amplitude, s1_times, s2_time, duration):
    """S1: line electrode on the y=0 wall, full depth; S2: premature
    half-domain cross-field pulse, strongest at the bottom of the wall
    (a transmural gradient via zprof)."""
    s1 = Stimulus(waveform=pulse_train(s1_times, duration, amplitude),
                  row=rect_profile(cfg.ny, 0, max(1, cfg.ny // 8)))
    s2 = Stimulus(waveform=pulse_train([s2_time], duration, amplitude),
                  col=rect_profile(cfg.nx, 0, cfg.nx // 2),
                  zprof=gaussian_profile(cfg.nz, 0.0, cfg.nz / 2.0))
    return SeparableForcing(s1, s2)


def main(outdir: str = "scroll_pacing_out"):
    cfg = SimConfig(
        model="aliev_panfilov", surface="box", x_mesh=192,
        surface_width=19.2, surface_length=19.2, y_mesh=192,
        surface_depth=1.0, z_mesh=10, diffusion=1.0,
        beta=0.075, wave_length=0.0, wave_width=0.0,   # quiescent slab:
        t_final=90.0, output_timestep=18,              # stimuli do the work
        boundary="noflux", method="rkc2",
        dtype="float32", rtol=1e-4, atol=1e-6,
    )
    frc = slab_s1s2(cfg, amplitude=3.0, s1_times=[1.0], s2_time=60.0,
                    duration=2.0)
    problem = build_problem(cfg, forcing=frc)
    res = simulate(cfg, problem=problem)
    print(res.describe())
    print(f"throughput {throughput(res):.3e} pts*steps/s")
    assert res.ok

    # scroll filament: phase-singularity points per z-plane, linked
    # across planes (viz/filaments.py)
    from crdmodel_tpu.viz.filaments import find_filaments
    u = np.asarray(res.trajectory[-1, 0])
    v = np.asarray(res.trajectory[-1, 1])
    fils = find_filaments(u, v, periodic=(False, False, False))
    n_pts = sum(len(f) for f in fils)
    print(f"filaments at t={cfg.t_final}: {len(fils)} "
          f"({n_pts} singularity points across {cfg.nz} planes)")

    os.makedirs(outdir, exist_ok=True)
    np.savez_compressed(os.path.join(outdir, "final_state.npz"),
                        u=u, v=v, touts=np.asarray(res.touts))
    print(f"wrote {outdir}/final_state.npz")
    return res, fils


if __name__ == "__main__":
    main(*sys.argv[1:2])
