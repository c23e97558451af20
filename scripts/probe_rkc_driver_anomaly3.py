"""Bisect probe 3: probe 2 showed the slowness (10.4 ms/step at the
tall-narrow 640K AP shape) lives in the integrate_to_outputs composition
and hits the XLA stepper too (V3), while the bare integrate_interval
(probe 1 layer C) runs ~0.5 ms/step. Add one driver ingredient at a time
onto the fast bare-interval setup:

  W0  bare interval, constant tout=8, h0=0.5*cap          (expect fast)
  W1  W0 + params carries a traced _seg_end scalar
  W2  W1 + tout passed traced (jit arg)
  W3  W2 + first_interval as a traced bool
  W4  W3 + h0 from _initial_step (tiny h0 start)
  W5  W4 wrapped in a lax.scan of length 1 (V2 equivalent)

Run: python scripts/probe_rkc_driver_anomaly3.py W0 W1 ...
(each variant is its own jit; 2-3 per process keeps compile time sane)

RESOLVED 2026-08-19: every W variant runs 0.36-0.37 ms/step steady state;
the 10 ms/step readings were the axon backend's one-time ~2.6 s cost on the
second execution of each fresh executable, attributed to single-shot timed
calls. docs/PERF_NOTES.md "fused rkc2 driver anomaly resolved".
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rho_bound
from crdmodel_tpu.integrate import rkc
from crdmodel_tpu.integrate.erk import integrate_interval, _initial_step
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
    yp0 = frkc.pad(y0)
    n_interior = cfg.nx * cfg.ny * problem.model.nvars
    h_fix = float(frkc.h_limit(0.0, yp0, params)) * 0.5
    common = dict(err_order=rkc.ERR_ORDER, max_steps=200000,
                  global_size=n_interior, h_limit_fn=frkc.h_limit)

    def bench(name, fn, *args):
        y, stats = fn(*args)
        nstep = int(stats[0])
        t0 = time.perf_counter()
        y, stats = fn(*args)
        float(jnp.sum(y))
        wall = time.perf_counter() - t0
        print(f"{name:6s}: {wall / max(nstep, 1) * 1e3:8.3f} ms/step "
              f"(nstep={nstep} acc={int(stats[1])} rej={int(stats[2])} "
              f"wall={wall:.3f}s)")

    def run_W0(yp):
        t, y, h, ep, stats = integrate_interval(
            frkc.step_err, 0.0, yp, jnp.asarray(h_fix, dtype), 1.0,
            8.0, params, **common)
        return y, stats

    def run_W1(yp, tout):
        p = {**params, "_seg_end": tout}
        t, y, h, ep, stats = integrate_interval(
            frkc.step_err, 0.0, yp, jnp.asarray(h_fix, dtype), 1.0,
            8.0, p, **common)
        return y, stats

    def run_W2(yp, tout):
        p = {**params, "_seg_end": tout}
        t, y, h, ep, stats = integrate_interval(
            frkc.step_err, 0.0, yp, jnp.asarray(h_fix, dtype), 1.0,
            tout, p, **common)
        return y, stats

    def run_W3(yp, tout):
        p = {**params, "_seg_end": tout}
        first = jnp.asarray(True)
        t, y, h, ep, stats = integrate_interval(
            frkc.step_err, 0.0, yp, jnp.asarray(h_fix, dtype), 1.0,
            tout, p, first_interval=first, **common)
        return y, stats

    def run_W4(yp, tout):
        p = {**params, "_seg_end": tout}
        first = jnp.asarray(True)
        f0 = problem.rhs(jnp.asarray(0.0, dtype), y0, p)
        h0 = _initial_step(problem.rhs, jnp.asarray(0.0, dtype), y0, f0, p,
                           tout, cfg.rtol, cfg.atol, rkc.ERR_ORDER,
                           jnp.sum, n_interior)
        h0 = jnp.minimum(h0, frkc.h_limit(jnp.asarray(0.0, dtype), yp, p))
        t, y, h, ep, stats = integrate_interval(
            frkc.step_err, 0.0, yp, h0, 1.0,
            tout, p, first_interval=first, **common)
        return y, stats

    def run_W5(yp, tout):
        def body(carry, inp):
            yp, = carry
            y, stats = run_W4(yp, inp)
            return (y,), stats
        (y,), stats = jax.lax.scan(body, (yp,), jnp.asarray([tout], dtype))
        return y, tuple(s[0] for s in stats)

    def run_W6(yp, tout, p_in):
        p = {**p_in, "_seg_end": tout}
        t, y, h, ep, stats = integrate_interval(
            frkc.step_err, 0.0, yp, jnp.asarray(h_fix, dtype), 1.0,
            tout, p, **common)
        return y, stats

    variants = {
        "W0": (run_W0, (yp0,)),
        "W6": (run_W6, (yp0, jnp.asarray(8.0, dtype), params)),
        "W1": (run_W1, (yp0, jnp.asarray(8.0, dtype))),
        "W2": (run_W2, (yp0, jnp.asarray(8.0, dtype))),
        "W3": (run_W3, (yp0, jnp.asarray(8.0, dtype))),
        "W4": (run_W4, (yp0, jnp.asarray(8.0, dtype))),
        "W5": (run_W5, (yp0, jnp.asarray(8.0, dtype))),
    }
    for key in sys.argv[1:] or ["W0"]:
        fn, args = variants[key]
        bench(key, jax.jit(fn), *args)


if __name__ == "__main__":
    main()
