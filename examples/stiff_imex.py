"""Example: the IMEX integrator on reaction-stiff Goldbeter kinetics.

The reference integrates everything explicitly (ARKodeInit with fi=NULL,
src/FHNmodel_torus.cpp:362), so the stiff Hill-function reaction pins the
step size even where the solution is smooth. `method="ark324"` treats the
POINTWISE reaction implicitly — each stage solve is nx*ny independent 2x2
Newton solves, no halo traffic — and the step count drops ~1.5x at the
reference tolerances (more in stiffer regimes; see docs/PERF_NOTES.md for
the honest cost table: per-step cost is ~2x, so bs32 remains the default
for the shipped kinetics).

Also shows a two-axis sweep (beta x diffusion) running through the same
IMEX stepper in one compiled program.

    python examples/stiff_imex.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.sweep import sweep_configs


def main():
    base = dict(model="goldbeter", surface="torus", x_mesh=100,
                surface_width=20, surface_length=80,
                t_final=4.0, output_timestep=5, beta=0.4,
                wave_length=0.2, wave_width=0.5, wave_inside=1,
                dtype="float32", rtol=1e-5, atol=1e-8)

    for method in ("bs32", "ark324"):
        res = simulate(SimConfig(**base, method=method))
        print(f"{method:7s}: {res.describe()}")

    cfg = SimConfig(**{**base, "t_final": 1.0, "output_timestep": 2},
                    method="ark324")
    members = [{"beta": b, "diffusion": d}
               for b in (0.3, 0.5) for d in (0.06, 0.12)]
    sw = sweep_configs(cfg, members)
    print(f"swept {len(members)} (beta, D) members through the IMEX stepper "
          f"in {sw.wall_time:.2f}s ({'ok' if sw.ok() else 'FAILED'})")
    for m, steps in zip(sw.members, np.asarray(sw.stats.steps).sum(axis=1)):
        print(f"  {m}: {int(steps)} steps")


if __name__ == "__main__":
    main()
