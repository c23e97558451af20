"""Sharded-step cost: fused shard kernel vs XLA per-stage path on a 1x1 mesh.

Measures the per-step cost of the adaptive integrator under shard_map at the
large-grid regime where XLA's whole-body fusion collapses (the multi-chip
hot path; docs/PERF_NOTES.md). Run on the real TPU:

    python scripts/bench_shard_step.py [ny nx]
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.parallel.mesh import make_mesh
from crdmodel_tpu.parallel.sharded import (
    make_sharded_simulation_fn, maybe_fused_shard_step, sharded_params,
)
from crdmodel_tpu.utils.profiling import device_sync


def bench(cfg, mesh, label):
    problem = build_problem(cfg)
    fused = maybe_fused_shard_step(problem, mesh)
    params, _ = sharded_params(problem)
    run, _ = make_sharded_simulation_fn(problem, mesh)
    traj, stats = run(problem.y0, params)          # compile + warm
    device_sync(traj)
    t0 = time.perf_counter()
    traj, stats = run(problem.y0, params)
    device_sync(traj)
    wall = time.perf_counter() - t0
    steps = int(np.sum(np.asarray(stats.steps)))
    print(f"{label:28s} kernel={'fused' if fused else 'xla  '} "
          f"steps={steps:6d} wall={wall:7.3f}s "
          f"us/step={1e6 * wall / steps:8.1f} "
          f"pts*steps/s={cfg.ny * cfg.nx * steps / wall:.3e}")
    return wall, steps


def main():
    x_mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    aspect = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=x_mesh,
                    surface_width=20.0, surface_length=20.0 * aspect,
                    t_final=1.0, output_timestep=2,
                    vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.5,
                    dtype="float32", rtol=1e-5, atol=1e-10)
    print(f"grid {cfg.ny}x{cfg.nx}, method={cfg.method}, Tf={cfg.t_final}")
    mesh = make_mesh(shape=(1, 1))
    bench(dataclasses.replace(cfg, use_pallas=False), mesh, "sharded XLA per-stage")
    bench(dataclasses.replace(cfg, use_pallas=True), mesh, "sharded fused kernel")


if __name__ == "__main__":
    main()
