"""Parameter-sweep driver: vmapped batches of simulations.

The reference can only sweep parameters by launching separate `mpirun`
processes per ini file (README.md:29-34). Here a sweep is one compiled
program: `jax.vmap` over the batch axis of (initial states, per-member
parameters), sharing the adaptive integrator. Listed as the north-star
"vmapped parameter-sweep driver over ini-style configs" in BASELINE.json.

Adaptive stepping under vmap runs members in lockstep: each member keeps its
own step size and accept/reject decisions, and the batched while_loop runs
until every member reaches the output time (JAX masks the finished ones) —
semantics identical to running members separately, at batched throughput.

Sweepable per-member parameters: beta (feeds the kinetics AND the initial
condition through the steady state). Grid geometry and diffusion change the
compiled stencil, so they sweep at the Python level (one compile per value).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.integrate.erk import SolveStats, integrate_to_outputs
from crdmodel_tpu.sim import output_times


@dataclasses.dataclass
class SweepResult:
    cfg: SimConfig
    betas: np.ndarray
    trajectories: jnp.ndarray   # (n_members, Nt+1, nvars, ny, nx)
    touts: np.ndarray
    stats: SolveStats           # batched: arrays (n_members, Nt)
    wall_time: float

    def ok(self) -> bool:
        return bool(np.all(np.asarray(self.stats.status) == 0))


def sweep_beta(cfg: SimConfig, betas: Sequence[float],
               mesh=None) -> SweepResult:
    """Run one simulation per beta value in a single vmapped program.

    cfg.vary_beta must be 0 (a spatial ramp already encodes a beta *range*;
    sweeping sweeps the constant). ICs are rebuilt per member because the
    background steady state depends on beta (src/FHNmodel_torus.cpp:240-244,
    src/GoldbeterModel_torus.cpp:253-261).

    mesh: optional jax.sharding.Mesh — the pod-scale combination from
    BASELINE.json: each sweep member's grid is spatially sharded over the
    ('py','px') device mesh (ppermute halos, psum'd error control) while
    vmap batches the members; per-member adaptive step control is preserved
    (the batched while_loop runs members in masked lockstep).
    """
    if cfg.vary_beta:
        raise ValueError("sweep_beta needs vary_beta=0 (constant-beta runs)")
    betas = np.asarray(list(betas), dtype=np.float64)
    problems = [build_problem(dataclasses.replace(cfg, beta=float(b)))
                for b in betas]
    base = problems[0]
    y0s = jnp.stack([p.y0 for p in problems])
    b_batch = jnp.stack([jnp.asarray(p.params["b"], y0s.dtype)
                         for p in problems])
    touts = output_times(cfg)

    if mesh is not None:
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, sharded_params)
        # force the XLA stepper: vmap of the fused kernels is UNSUPPORTED —
        # the Pallas TPU batching rule rejects the HBM-resident (ANY memory
        # space) state input (measured 2026-08-16: "only blocks having the
        # same block shape as the array shape"); sweeps batch the whole
        # sharded program on the XLA path instead
        base_xla = build_problem(dataclasses.replace(
            cfg, beta=float(betas[0]), use_pallas=False))
        run_sharded, _ = make_sharded_simulation_fn(base_xla, mesh)
        params0, _ = sharded_params(base_xla)

        def run_one(y0, b):
            return run_sharded(y0, {**params0, "b": b})
    else:
        breakpoints = ()
        if 0.0 < cfg.t_boundary < cfg.t_final and not cfg.just_diffusion:
            breakpoints = (cfg.t_boundary,)

        def run_one(y0, b):
            return integrate_to_outputs(
                base.rhs, y0, {"b": b}, 0.0, touts,
                rtol=cfg.rtol, atol=cfg.atol, method=cfg.method,
                max_steps=cfg.max_steps, breakpoints=breakpoints)

    run = jax.jit(jax.vmap(run_one))
    t0 = time.perf_counter()
    traj, stats = run(y0s, b_batch)
    traj = jax.block_until_ready(traj)
    wall = time.perf_counter() - t0
    full = jnp.concatenate([y0s[:, None], traj], axis=1)
    return SweepResult(cfg=cfg, betas=betas, trajectories=full,
                       touts=np.concatenate([[0.0], touts]), stats=stats,
                       wall_time=wall)
