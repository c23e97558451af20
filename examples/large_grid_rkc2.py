"""Production large-grid run: fused RKC2 + streaming dispatches.

At fine grids any explicit RK is diffusion-CFL-bound; RKC2 restores
accuracy-limited stepping and the fused kernel (ops/pallas_rkc.py) executes
every Chebyshev stage in one pass over HBM. Streaming keeps each device
dispatch bounded (one per output interval) — the right shape for
multi-minute production runs.

Measured on one TPU v5e: 6400x1600 grid (10.2M points), Tf=10 in ~17 s.

    python examples/large_grid_rkc2.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdmodel_tpu import SimConfig
from crdmodel_tpu.sim import print_banner, simulate_streaming
from crdmodel_tpu.core.problem import build_problem


def main():
    cfg = SimConfig(
        model="fhn", surface="torus",
        x_mesh=1600,                     # 6400x1600 grid
        surface_width=20.0, surface_length=80.0,
        t_final=10.0, output_timestep=10,
        vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=5.0,
        dtype="float32", rtol=1e-5, atol=1e-10,
        method="rkc2",                   # stabilized Chebyshev stepping
    )
    problem = build_problem(cfg)
    print_banner(cfg, problem)
    res = simulate_streaming(cfg, problem=problem, progress=True)
    print(res.describe())
    u = res.field(0)
    print(f"final activator range: [{u[-1].min():.3f}, {u[-1].max():.3f}]")
    assert res.ok and np.isfinite(u).all()


if __name__ == "__main__":
    main()
