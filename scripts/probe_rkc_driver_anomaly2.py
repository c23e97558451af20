"""Bisect the fused-rkc2 full-driver anomaly (probe 1 narrowed it to
integrate_to_outputs composition: bare integrate_interval runs 0.52 ms/step,
the full driver 10.8, at ny=1600 nx=400 AP flat).

RESOLVED 2026-08-19: a timing artifact — the axon backend charges ~2.6 s
one-time to the SECOND execution of a fresh executable, so every variant
timed as warm-once/time-once reads ~10 ms/step and the same program re-run
reads 0.37 (fused) / 0.45 (XLA). Run e.g. `V3 V0 V3` in one process to see
it. docs/PERF_NOTES.md "fused rkc2 driver anomaly resolved".

Variants (all jitted, warm, scalar-pull synced):
  V0 replicate    : exact make_run_fn wiring (expect ~10.8 ms/step)
  V1 no h_limit   : drop h_limit_fn
  V2 one interval : touts=[Tf] (scan length 1)
  V3 xla stepper  : method=rkc2 XLA path (expect ~1.2 ms/step)
  V4 const cap    : h_limit_fn returns a baked constant (no rho re-eval)

Run ONE variant per process (each compile is slow and the axon tunnel
punishes timeouts): python scripts/probe_rkc_driver_anomaly2.py V0
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rho_bound
from crdmodel_tpu.integrate import rkc
from crdmodel_tpu.integrate.erk import integrate_to_outputs
from crdmodel_tpu.ops import pallas_rkc


def main():
    cfg = SimConfig(model="aliev_panfilov", surface="flat", x_mesh=400,
                    surface_width=20, surface_length=80, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=8.0, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-7, method="rkc2")
    problem = build_problem(cfg)
    dtype = jnp.float32
    rho_fn = make_rho_bound(cfg, problem.model, problem.geometry, dtype)
    frkc = pallas_rkc.build_fused_rkc_step(problem, dtype, rho_fn=rho_fn)
    params = problem.params
    y0 = problem.y0.astype(dtype)
    touts2 = np.asarray([4.0, 8.0])
    touts1 = np.asarray([8.0])
    cap_const = float(frkc.h_limit(0.0, frkc.pad(y0), params))

    def bench(name, fn, *args):
        traj, stats = fn(*args)
        steps = int(np.sum(np.asarray(stats.steps)))
        t0 = time.perf_counter()
        traj, stats = fn(*args)
        float(jnp.sum(traj[-1]))
        wall = time.perf_counter() - t0
        print(f"{name:16s}: {wall / max(steps,1) * 1e3:8.3f} ms/step "
              f"(steps={steps} acc={int(np.sum(np.asarray(stats.accepted)))} "
              f"rej={int(np.sum(np.asarray(stats.rejected)))} wall={wall:.3f}s)")

    def make(touts, use_fused=True, h_limit="rho"):
        kw = {}
        if use_fused:
            hl = (frkc.h_limit if h_limit == "rho"
                  else (lambda t, y, p: jnp.asarray(cap_const, dtype))
                  if h_limit == "const" else None)
            kw = dict(step_err=frkc.step_err, y_loop0=frkc.pad(y0),
                      capture=frkc.unpad, err_order=rkc.ERR_ORDER,
                      h_limit_fn=hl)
        return jax.jit(lambda y, p: integrate_to_outputs(
            problem.rhs, y, p, 0.0, touts,
            rtol=cfg.rtol, atol=cfg.atol, method="rkc2",
            max_steps=cfg.max_steps, rho_fn=rho_fn, **kw))

    variants = {
        "V0": ("V0 replicate", lambda: make(touts2)),
        "V1": ("V1 no h_limit", lambda: make(touts2, h_limit=None)),
        "V2": ("V2 one interval", lambda: make(touts1)),
        "V3": ("V3 xla stepper", lambda: make(touts2, use_fused=False)),
        "V4": ("V4 const cap", lambda: make(touts2, h_limit="const")),
    }
    for key in sys.argv[1:] or ["V0"]:
        name, maker = variants[key]
        bench(name, maker(), y0, params)


if __name__ == "__main__":
    main()
