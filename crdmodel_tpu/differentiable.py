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


def record_adaptive_steps(cfg: SimConfig, n_max: int = 4096,
                          problem: Optional[Problem] = None):
    """Run the PRODUCTION adaptive solver 0 -> t_final once and record the
    accepted step-size sequence, by threading a recording buffer through
    the stepper's cross-step carry: the while_loop's reject path reverts
    the carry, so exactly the ACCEPTED attempts' h values (as clamped and
    actually taken) survive — zero changes to the adaptive loop itself.

    Returns (h_seq (n_max,), n_accepted) with zeros past n_accepted.
    Raises if the run fails or exceeds n_max accepted steps.
    """
    from crdmodel_tpu.integrate.erk import (
        TABLEAUS, _initial_step, integrate_interval, make_default_step_err)
    problem = problem if problem is not None else build_problem(cfg)
    if cfg.method not in TABLEAUS:
        raise ValueError("adaptive-replay gradients need an explicit "
                         f"tableau method, got {cfg.method!r}")
    if 0.0 < cfg.t_boundary < cfg.t_final and not cfg.just_diffusion:
        raise ValueError("adaptive-replay gradients need t_boundary == 0 "
                         "(the replay has no segment bookkeeping)")
    dtype = jnp.dtype(cfg.dtype)
    tableau = TABLEAUS[cfg.method]
    step_err, init_carry = make_default_step_err(tableau, problem.rhs,
                                                 cfg.rtol, cfg.atol)

    def rec_step(t, y, h, params, carry):
        c, buf, k = carry
        y_new, ss, c2 = step_err(t, y, h, params, c)
        buf = buf.at[k].set(h)
        return y_new, ss, (c2, buf, k + 1)

    @jax.jit
    def run(y0, params):
        t0 = jnp.asarray(0.0, dtype)
        tout = jnp.asarray(cfg.t_final, dtype)
        f0 = problem.rhs(t0, y0, params)
        h0 = _initial_step(problem.rhs, t0, y0, f0, params, tout,
                           cfg.rtol, cfg.atol, tableau.err_order,
                           jnp.sum, y0.size)
        carry0 = (init_carry(t0, y0, params),
                  jnp.zeros((n_max,), dtype), jnp.asarray(0, jnp.int32))
        t, y, h, ep, stats, fc = integrate_interval(
            rec_step, t0, y0, h0, jnp.asarray(1.0, dtype), tout, params,
            err_order=tableau.err_order, max_steps=cfg.max_steps,
            global_size=y0.size, carry0=carry0, first_interval=True,
            return_carry=True)
        _, buf, k = fc
        return y, buf, k, stats[-1]

    y_final, h_seq, n_acc, status = run(problem.y0, problem.params)
    if int(status) != 0:
        raise RuntimeError(f"adaptive recording run failed (status "
                           f"{int(status)})")
    if int(n_acc) > n_max:
        raise ValueError(f"run took {int(n_acc)} accepted steps > "
                         f"n_max={n_max}; raise n_max")
    return y_final, h_seq, int(n_acc)


def make_replay_fn(cfg: SimConfig, h_seq, block_size: Optional[int] = None,
                   problem: Optional[Problem] = None) -> Callable:
    """Differentiable replay of a recorded adaptive run: fn(params, y0) ->
    y_final, scanning the FIXED h sequence with the same FSAL stepper the
    adaptive loop used, so the forward values reproduce the adaptive
    trajectory exactly (rejected attempts never changed (t, y, carry);
    zero-padded h entries are exact no-ops for any ERK step). Gradients are
    therefore consistent with the PRODUCTION solution — the fixed-step
    make_forward_fn differentiates a different (uniform-step) trajectory.

    sqrt-checkpointed like make_forward_fn. h_seq is treated as a constant
    (stop_gradient): the exact sensitivity would include dh/dparams terms
    through the controller, which vanish at convergence order anyway.
    """
    from crdmodel_tpu.integrate.erk import TABLEAUS, make_default_step_err
    problem = problem if problem is not None else build_problem(cfg)
    dtype = jnp.dtype(cfg.dtype)
    tableau = TABLEAUS[cfg.method]
    n = int(np.asarray(h_seq).shape[0])
    if block_size is None:
        block_size = max(1, int(np.sqrt(n)))
    n_blocks = -(-n // block_size)
    pad = n_blocks * block_size - n
    h_blocks = jnp.reshape(
        jnp.concatenate([jax.lax.stop_gradient(jnp.asarray(h_seq, dtype)),
                         jnp.zeros((pad,), dtype)]),
        (n_blocks, block_size))
    step_err, init_carry = make_default_step_err(tableau, problem.rhs,
                                                 cfg.rtol, cfg.atol)

    def replay(params, y0):
        t0 = jnp.asarray(0.0, dtype)
        fc0 = init_carry(t0, y0, params)

        @jax.checkpoint
        def block(carry, hs):
            def body(c, h):
                t, y, fc = c
                y_new, _, fc2 = step_err(t, y, h, params, fc)
                return (t + h, y_new, fc2), None
            c2, _ = jax.lax.scan(body, carry, hs)
            return c2, None

        (_, y_final, _), _ = jax.lax.scan(block, (t0, y0, fc0), h_blocks)
        return y_final

    return replay


def adaptive_value_and_grad(cfg: SimConfig, loss_fn: Callable,
                            n_max: int = 4096,
                            problem: Optional[Problem] = None):
    """Gradients consistent with the ADAPTIVE production solve: record the
    accepted h sequence once, then differentiate its exact replay.

    Returns (value_and_grad_fn, y_final_adaptive): the jitted fn maps
    (params, y0) -> (loss, dloss/dparams) along the recorded step sequence;
    y_final_adaptive is the recording run's final state (the replay at the
    recorded params reproduces it exactly — asserted in tests).
    """
    problem = problem if problem is not None else build_problem(cfg)
    y_final, h_seq, n_acc = record_adaptive_steps(cfg, n_max, problem)
    replay = make_replay_fn(cfg, h_seq, problem=problem)

    def objective(params, y0):
        return loss_fn(replay(params, y0))

    return jax.jit(jax.value_and_grad(objective)), y_final


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
