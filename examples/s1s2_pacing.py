"""Example: S1-S2 cross-field stimulation elicits a spiral (fused path).

The standard vulnerability protocol in cardiac excitable media: a line
electrode paces the tissue (S1), then one premature cross-field pulse
(S2) lands in the waveback's vulnerable window — the broken front curls
into a figure-of-eight / spiral pair. The reference has no stimulation
machinery at all (its only time dependence is the t<tBoundary freeze,
src/FHNmodel_torus.cpp:643-653); here the protocol is DATA
(core/forcing.py::s1s2_protocol): the pulse edges register as
integrator breakpoints so the adaptive controller steps exactly to each
discontinuity, and separable protocols run IN-KERNEL on the fused ERK /
divergence-form kernels (measured 6.8x the XLA forcing path at 10.2M
points — scripts/bench_round4.py forcing). This domain is
diffusion-CFL-bound at 256^2, so the example follows the method ground
rules and uses rkc2 (which takes ~20x fewer steps here); gated pulse
trains like this protocol run IN-KERNEL on the fused RKC/divform paths
too (segment-gating makes the amplitude constant per step), and only
non-jittable waveforms fall back to XLA rkc2.

    python examples/s1s2_pacing.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.forcing import s1s2_protocol
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.utils import throughput
from crdmodel_tpu.viz.tips import find_tips


def main(outdir: str = "s1s2_out"):
    cfg = SimConfig(
        model="aliev_panfilov", surface="flat", x_mesh=256,
        surface_width=25.0, surface_length=25.0, diffusion=1.0,
        beta=0.075, wave_length=0.0, wave_width=0.0,   # quiescent tissue:
        t_final=120.0, output_timestep=24,             # stimuli do the work
        boundary="noflux",
        # diffusion CFL binds at this resolution (D=1, dx~0.1): rkc2 is
        # the ground-rules method choice; explicit bs32 rides its f32
        # stability boundary into dt-underflow here (measured)
        method="rkc2",
        dtype="float32", rtol=1e-4, atol=1e-6,
    )
    # S1 at t=1 from the bottom electrode; an S2 at t=60 over the left
    # half lands in the vulnerable window (measured scan at 256^2:
    # s2<=56 is blocked by refractory tissue and dies with the S1 wave
    # by t~70; s2=60 breaks, curls, and sustains through t=120;
    # s2=64 finds recovered tissue, propagates as a plane wave and exits)
    frc = s1s2_protocol(cfg, amplitude=3.0, s1_times=[1.0], s2_time=60.0,
                        duration=1.0)
    problem = build_problem(cfg, forcing=frc)
    res = simulate(cfg, problem=problem)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")

    u_end = np.asarray(res.trajectory[-1, 0])
    # re-entry oracle: one transit of the domain takes ~25 time units, so
    # ANY activity at t_final = s2 + 59 with all stimuli long off means
    # the S2 wavebreak curled into a re-entrant rotor (an unbroken plane
    # wave exits the no-flux domain and dies — the s2=64 scan case)
    print(f"activity at t={res.touts[-1]:g} (stimuli off since t=61): "
          f"max u = {u_end.max():.3f} -> "
          f"{'RE-ENTRANT' if u_end.max() > 0.4 else 'quiescent'}")
    tips = find_tips(u_end, np.asarray(res.trajectory[-1, 1]),
                     periodic=(False, False))
    print(f"phase singularities detected: {len(tips.positions)}")

    os.makedirs(outdir, exist_ok=True)
    np.savez_compressed(os.path.join(outdir, "s1s2.npz"),
                        u=np.asarray(res.trajectory[:, 0]),
                        touts=np.asarray(res.touts))
    print(f"wrote activation frames to {outdir}/s1s2.npz")
    return res


if __name__ == "__main__":
    main(*sys.argv[1:])
