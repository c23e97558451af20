"""Decompose the fused-rkc2 full-driver anomaly at the tall-narrow 640K
shape (ny=1600, nx=400 — docs/PERF_NOTES.md "fused rkc2 driver anomaly").

Measured layers, innermost out (all warm, scalar-pull synced):
  A. raw kernel: fixed (h, s) branch call in a fori_loop
  B. step_err:   the FusedRKCStep.step_err (rho + stage tables + switch)
                 in a fori_loop at fixed h
  C. interval:   integrate_interval while_loop (adaptive control)
  D. driver:     the full simulate() path via make_simulation_fn

Run: python scripts/probe_rkc_driver_anomaly.py [ny nx]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rho_bound
from crdmodel_tpu.integrate import rkc
from crdmodel_tpu.integrate.erk import integrate_interval
from crdmodel_tpu.ops import pallas_rkc


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, reps=3):
    fn(*args)  # warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out[0] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    x_mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cfg = SimConfig(model="aliev_panfilov", surface="flat", x_mesh=x_mesh,
                    surface_width=20, surface_length=80, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=8.0, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-7, method="rkc2")
    problem = build_problem(cfg)
    ny, nx = cfg.ny, cfg.nx
    dtype = jnp.float32
    assert pallas_rkc.is_rkc_supported(problem, dtype)
    frkc = pallas_rkc.build_fused_rkc_step(problem, dtype)
    plan = pallas_rkc.variant_plan(cfg.ny, cfg.nx, problem.model.nvars)
    print(f"shape ny={ny} nx={nx}  plan={plan}  nxp={frkc.nxp}")

    params = problem.params
    yp = frkc.pad(problem.y0.astype(dtype))
    rho_fn = make_rho_bound(cfg, problem.model, problem.geometry, dtype)
    rho0 = float(rho_fn(0.0, problem.y0, params))
    h_fix = float(frkc.h_limit(0.0, yp, params)) * 0.5
    s_fix = int(rkc.choose_stages(jnp.asarray(h_fix), jnp.asarray(rho0)))
    print(f"rho={rho0:.3g}  h_fix={h_fix:.3g}  s_fix={s_fix}")

    N = 100

    # B: step_err in a fori loop at fixed h
    @jax.jit
    def loop_step_err(yp):
        def body(_, yp):
            ynew, ss, _ = frkc.step_err(jnp.asarray(0.0, dtype), yp,
                                        jnp.asarray(h_fix, dtype), params)
            return ynew
        return jax.lax.fori_loop(0, N, body, yp)

    tB = timeit(loop_step_err, yp) / N
    print(f"B step_err fori      : {tB * 1e3:8.3f} ms/step")

    # C: integrate_interval while_loop
    n_interior = cfg.nx * cfg.ny * problem.model.nvars

    @jax.jit
    def interval(yp):
        t, y, h, ep, stats = integrate_interval(
            frkc.step_err, 0.0, yp, jnp.asarray(h_fix, dtype), 1.0,
            jnp.asarray(0.05, dtype), params,
            err_order=rkc.ERR_ORDER, max_steps=200000,
            global_size=n_interior,
            h_limit_fn=frkc.h_limit)
        return y, stats

    y, stats = interval(yp)
    nstep = int(stats[0])
    t0 = time.perf_counter()
    y, stats = interval(yp)
    sync(y)
    tC = (time.perf_counter() - t0) / max(int(stats[0]), 1)
    print(f"C interval while_loop: {tC * 1e3:8.3f} ms/step "
          f"(nstep={int(stats[0])} nacc={int(stats[1])} nrej={int(stats[2])})")

    # D: full driver
    from crdmodel_tpu.sim import make_simulation_fn
    run, _ = make_simulation_fn(problem)
    traj, st = run(problem.y0, params)
    steps = int(np.sum(np.asarray(st.steps)))
    t0 = time.perf_counter()
    traj, st = run(problem.y0, params)
    sync(traj[-1])
    tD = (time.perf_counter() - t0) / max(steps, 1)
    print(f"D full driver        : {tD * 1e3:8.3f} ms/step "
          f"(steps={steps}, acc={int(np.sum(np.asarray(st.accepted)))}, "
          f"rej={int(np.sum(np.asarray(st.rejected)))})")


if __name__ == "__main__":
    main()
