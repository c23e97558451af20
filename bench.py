"""Benchmark: the BASELINE.json north-star metric on real TPU hardware.

Runs the canonical FHN torus problem (400x1600 grid, varyBeta ramp,
tBoundary=38, Tf=50 — data/FHNmodelArgs.ini) with the adaptive BS3(2)
integrator in float32 and reports grid-points x internal-steps / second on
one chip.

Baseline: the MPI+SUNDIALS reference cannot be built in this image (no
mpicxx/SUNDIALS/boost), so the recorded baseline is the CPU proxy measured by
scripts/measure_baseline.py — identical method-of-lines numerics (vectorised
f64 numpy stencil + BS3(2) WRMS adaptive control) on the host CPU:
5.3688e6 grid-points*steps/sec (this machine, 2026-08-16). Vectorised numpy
flatters the reference's scalar per-point loops, so vs_baseline is, if
anything, understated.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

BASELINE_RATE = 5.3688e6  # scripts/measure_baseline.py, this host, 2026-08-16

# Measured compute roofline for this exact config (fused bs32 step, 400x1600
# f32): 49.2 us/step, VPU-bound — docs/PERF_NOTES.md "compute roofline"
# section (2026-08-16).  roofline_fraction below is roofline/measured, i.e.
# 1.0 means the whole run (step + adaptive control + output machinery)
# sustains the bare-step roofline.
ROOFLINE_US_PER_STEP = 49.2


def main():
    import jax
    import jax.numpy as jnp
    from crdmodel_tpu.config import config_from_ini
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import make_simulation_fn

    from crdmodel_tpu.sim import _pallas_eligible

    cfg = config_from_ini("/root/reference/data/FHNmodelArgs.ini",
                          model="fhn", surface="torus")
    problem = build_problem(cfg)
    run, _ = make_simulation_fn(problem)
    fused = _pallas_eligible(problem)

    # compile + warm-up (note: on the axon backend block_until_ready is a
    # no-op — only a device->host transfer synchronises, so timing brackets
    # a scalar pull)
    traj, stats = run(problem.y0, problem.params)
    assert np.all(np.asarray(stats.status) == 0), np.asarray(stats.status)
    float(jnp.sum(traj[-1]))

    # best-of-3: the axon backend charges a one-time ~2.6 s cost to the
    # SECOND execution of a fresh executable (program upload; measured
    # 2026-08-19, docs/PERF_NOTES.md "fused rkc2 driver anomaly resolved"),
    # so a single warm+time pair over-reads. Steady state starts at call 3.
    wall = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        traj, stats = run(problem.y0, problem.params)
        float(jnp.sum(traj[-1]))  # sync
        wall = min(wall, time.perf_counter() - t0)

    steps = int(np.sum(np.asarray(stats.steps)))
    rate = cfg.nx * cfg.ny * steps / wall
    us_per_step = wall / steps * 1e6
    print(json.dumps({
        "metric": "grid-points*steps/sec/chip (FHN torus 400x1600 f32 adaptive, Tf=50)",
        "value": rate,
        "unit": "points*steps/s",
        "vs_baseline": rate / BASELINE_RATE,
        "us_per_step": round(us_per_step, 2),
        "steps": steps,
        "method": f"{cfg.method}+fused-pallas" if fused else cfg.method,
        "roofline_fraction": round(ROOFLINE_US_PER_STEP / us_per_step, 3),
    }))


if __name__ == "__main__":
    main()
