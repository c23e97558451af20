"""High-level single-host simulation driver (the `main()` equivalent).

One `simulate(cfg)` replaces the four reference monolith mains (SURVEY.md
§3.1): config -> ICs -> jitted adaptive integration over Nt output intervals
-> device-resident trajectory shaped exactly like the plot scripts'
reassembled (nt, ny, nx) array (util/FHNmodel/plot_FHNmodel_flat.py:60-86),
with the IC as row 0 (the reference writes the IC row first,
src/FHNmodel_torus.cpp:392-405).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import Problem, build_problem
from crdmodel_tpu.integrate.erk import integrate_to_outputs, SolveStats

STATUS_NAMES = {0: "ok", 1: "max-steps-exceeded", 2: "dt-underflow"}


@dataclasses.dataclass
class SimResult:
    cfg: SimConfig
    problem: Problem
    trajectory: jnp.ndarray   # (Nt+1, nvars, ny, nx), IC first
    touts: np.ndarray         # (Nt+1,), starting at T0
    stats: SolveStats
    wall_time: float

    @property
    def ok(self) -> bool:
        return bool(np.all(np.asarray(self.stats.status) == 0))

    def field(self, var: int = 0) -> np.ndarray:
        """(nt, ny, nx) array of one variable — the plot scripts' `results`."""
        return np.asarray(self.trajectory[:, var])

    def total_steps(self) -> int:
        return int(np.sum(np.asarray(self.stats.steps)))

    def describe(self) -> str:
        s = self.stats
        return (f"{self.cfg.program_name}: grid {self.cfg.ny}x{self.cfg.nx}, "
                f"Tf={self.cfg.t_final}, steps={int(np.sum(np.asarray(s.steps)))} "
                f"(acc {int(np.sum(np.asarray(s.accepted)))}, "
                f"rej {int(np.sum(np.asarray(s.rejected)))}), "
                f"status={'ok' if self.ok else 'FAILED'}, "
                f"wall={self.wall_time:.3f}s")


def output_times(cfg: SimConfig) -> np.ndarray:
    """The Nt output times T0+dTout..Tf, dTout=(Tf-T0)/Nt, clamped to Tf
    (reference src/FHNmodel_torus.cpp:416-429)."""
    nt = cfg.output_timestep
    dtout = cfg.t_final / nt
    touts = np.minimum((1 + np.arange(nt, dtype=np.float64)) * dtout, cfg.t_final)
    return touts


def make_simulation_fn(problem: Problem):
    """Build the jitted end-to-end integration fn(y0, params) -> (traj, stats)."""
    cfg = problem.cfg
    touts = output_times(cfg)

    # the absorbing-boundary turn-off is a known RHS discontinuity in t;
    # integrate piecewise-smooth segments (see integrate_to_outputs docs)
    breakpoints = ()
    if 0.0 < cfg.t_boundary < cfg.t_final and not cfg.just_diffusion:
        breakpoints = (cfg.t_boundary,)

    def run(y0, params):
        return integrate_to_outputs(
            problem.rhs, y0, params, 0.0, touts,
            rtol=cfg.rtol, atol=cfg.atol, method=cfg.method,
            max_steps=cfg.max_steps, breakpoints=breakpoints)

    return jax.jit(run), touts


def simulate(cfg: SimConfig, problem: Optional[Problem] = None,
             block: bool = True) -> SimResult:
    problem = problem if problem is not None else build_problem(cfg)
    run, touts = make_simulation_fn(problem)
    t_start = time.perf_counter()
    traj, stats = run(problem.y0, problem.params)
    if block:
        traj = jax.block_until_ready(traj)
    wall = time.perf_counter() - t_start
    full_traj = jnp.concatenate([problem.y0[None], traj], axis=0)
    return SimResult(
        cfg=cfg, problem=problem, trajectory=full_traj,
        touts=np.concatenate([[0.0], touts]), stats=stats, wall_time=wall)
