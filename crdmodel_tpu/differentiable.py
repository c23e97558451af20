"""Differentiable simulation: gradients THROUGH the PDE solve.

A capability with no reference counterpart and no possible C++/MPI analogue:
because the whole solver is a pure JAX function, `jax.grad` can
differentiate an objective of the final field with respect to physical
parameters — the kinetics parameter b (scalar or the full (ny,1) ramp) and
the diffusion coefficient (via the linear `dscale`, see
core/problem.py::make_rhs) — enabling parameter fitting, sensitivity
analysis, and optimal-control studies on the same TPU-compiled forward
model (examples/fit_beta.py).

Reverse-mode AD cannot cross the adaptive driver's `lax.while_loop`
(unbounded trip count), so the differentiable path uses FIXED-step
integration under `lax.scan` with any explicit tableau (erk.make_erk_step).
Memory: reverse-mode through a scan stores one state per step; the standard
sqrt-checkpoint schedule bounds this — steps are grouped into blocks of
`block_size`, the outer scan stores only block-boundary states, and each
block is rematerialized (`jax.checkpoint`) during the backward pass, i.e.
peak memory O(n/K + K) states for O(2x) extra forward FLOPs. This is the
"jax.checkpoint / rematerialisation to trade FLOPs for memory" recipe
applied to a physics solver.

Choosing n_steps: the fixed step must satisfy the explicit stability limit
h < ~2.5/rho (use core/problem.py::make_rho_bound to size it); the
`validate_steps` helper compares the fixed-step forward run against the
adaptive solver at the same physics.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import Problem, build_problem
from crdmodel_tpu.integrate.erk import TABLEAUS, make_erk_step


def make_forward_fn(problem: Problem, n_steps: int,
                    block_size: Optional[int] = None,
                    t_final: Optional[float] = None) -> Callable:
    """Build a differentiable forward solve: fn(params, y0) -> y_final.

    params is the problem's params pytree ({"b": ...} plus optionally
    "dscale"); every leaf is a differentiable input. Fixed step
    h = t_final/n_steps with the config's tableau (method must be an
    explicit tableau; rkc2/ark324 drivers are adaptive-only).

    block_size: sqrt-checkpoint block length (default ~sqrt(n_steps)).
    n_steps is rounded up to a whole number of blocks.
    """
    cfg = problem.cfg
    if cfg.method not in TABLEAUS:
        raise ValueError(f"differentiable path needs an explicit tableau "
                         f"method, got {cfg.method!r}")
    tf = float(cfg.t_final if t_final is None else t_final)
    if block_size is None:
        block_size = max(1, int(np.sqrt(n_steps)))
    n_blocks = -(-n_steps // block_size)        # ceil
    n_total = n_blocks * block_size
    dtype = jnp.dtype(cfg.dtype)
    h = tf / n_total
    step = make_erk_step(TABLEAUS[cfg.method], problem.rhs)

    def forward(params, y0):
        hh = jnp.asarray(h, dtype)

        @jax.checkpoint
        def block(carry, k):
            t0, y = carry
            def body(c, j):
                t, y = c
                y_new, _ = step(t, y, hh, params)
                return (t + hh, y_new), None
            (t1, y1), _ = jax.lax.scan(body, (t0, y),
                                       jnp.arange(block_size))
            return (t1, y1), None

        t0 = jnp.asarray(0.0, dtype)
        (_, y_final), _ = jax.lax.scan(block, (t0, y0),
                                       jnp.arange(n_blocks))
        return y_final

    return forward


@dataclasses.dataclass
class DifferentiableSim:
    """Forward solve + gradient in one bundle (built by make_differentiable).

    forward(params, y0) -> y_final          (jitted)
    value_and_grad(params, y0) -> (loss, dloss/dparams)   (jitted)
    """
    problem: Problem
    forward: Callable
    value_and_grad: Callable
    n_steps: int


def make_differentiable(cfg: SimConfig, n_steps: int,
                        loss_fn: Callable,
                        block_size: Optional[int] = None,
                        problem: Optional[Problem] = None
                        ) -> DifferentiableSim:
    """loss_fn(y_final) -> scalar; gradients flow to every params leaf.

    Add "dscale" to the params you pass at call time to differentiate with
    respect to the diffusion coefficient (D = dscale * cfg.diffusion):

        sim = make_differentiable(cfg, 512, loss)
        params = {**sim.problem.params, "dscale": jnp.asarray(1.0)}
        loss, g = sim.value_and_grad(params, sim.problem.y0)
        g["dscale"]        # dloss/ddscale
        g["b"]             # dloss/db (scalar or full ramp field)
    """
    problem = problem if problem is not None else build_problem(cfg)
    forward = make_forward_fn(problem, n_steps, block_size)

    def objective(params, y0):
        return loss_fn(forward(params, y0))

    return DifferentiableSim(
        problem=problem,
        forward=jax.jit(forward),
        value_and_grad=jax.jit(jax.value_and_grad(objective)),
        n_steps=n_steps)


def validate_steps(cfg: SimConfig, n_steps: int, atol: float,
                   problem: Optional[Problem] = None) -> float:
    """Max |fixed-step final field - adaptive final field|; raises if above
    atol (i.e. n_steps too small for the physics)."""
    from crdmodel_tpu.sim import simulate
    problem = problem if problem is not None else build_problem(cfg)
    forward = jax.jit(make_forward_fn(problem, n_steps))
    y_fix = forward(problem.params, problem.y0)
    ref = simulate(cfg, problem=problem)
    if not ref.ok:
        raise RuntimeError(f"adaptive reference failed: {ref.describe()}")
    err = float(jnp.max(jnp.abs(y_fix - ref.trajectory[-1])))
    if err > atol:
        raise ValueError(f"fixed-step error {err:.3e} > {atol:.3e}; "
                         f"increase n_steps (stability/accuracy)")
    return err
