"""Example: vmapped parameter sweep across the Goldbeter oscillatory window.

The reference can only sweep beta by editing the ini and re-running mpirun
per value (README.md:29-34); here 16 simulations share one compiled program.
Plots the final-state mean cytosolic calcium vs beta, showing the onset of
oscillation across the window (0.289, 0.774).

    python examples/beta_sweep.py
"""

import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sweep import sweep_beta


def main():
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=50,
                    surface_width=20, surface_length=80,
                    t_final=8.0, output_timestep=8,
                    wave_length=0.1, wave_width=0.5, dtype="float32",
                    rtol=1e-5, atol=1e-8)
    betas = np.linspace(0.1, 1.0, 16)
    res = sweep_beta(cfg, betas)
    print(f"swept {len(betas)} members in {res.wall_time:.2f}s "
          f"({'ok' if res.ok() else 'FAILED'})")

    z_final = np.asarray(res.trajectories)[:, -1, 0]       # (n, ny, nx)
    z_range = z_final.max(axis=(1, 2)) - z_final.min(axis=(1, 2))
    for b, r in zip(betas, z_range):
        osc = 0.28895 < b < 0.77427
        bar = "#" * int(min(r, 2.0) * 25)
        print(f"beta={b:0.3f} {'osc ' if osc else '    '} dZ={r:7.4f} {bar}")


if __name__ == "__main__":
    main()
