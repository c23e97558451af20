"""Oregonator — Belousov–Zhabotinsky reaction kinetics (beyond-reference).

Two-variable Tyson–Fife reduction of the Field–Körös–Noyes mechanism:

    u' = (1/eps) * ( u (1 - u) - f v (u - q)/(u + q) )
    v' = u - v

the standard model for BZ target/spiral waves in excitable chemistry
(Tyson & Fife, J. Chem. Phys. 1980; Jahnke & Winfree 1991 for the
(eps, q, f) excitable window). Fifth registered model family: ~40 lines
make every subsystem — both surfaces, all integrators including the fused
kernels, sharding, sweeps, IO, movies, torus mapping, golden fixtures —
work unchanged (the reference hardcodes exactly two models into four
binaries).

The framework's sweepable/rampable parameter `b` maps to the
stoichiometric factor f (the standard bifurcation knob: the medium is
excitable around f ~ 1-3, oscillatory below). Only u (HBrO2, the
activator) diffuses, like the reference models.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

EPS = 0.04
Q = 0.002


def kinetics(state, b):
    u, v = state[0], state[1]
    du = (1.0 / EPS) * (u * (1.0 - u) - b * v * (u - Q) / (u + Q))
    dv = u - v
    return jnp.stack([du, dv])


def steady_state(beta: float):
    """Nontrivial rest state: v = u and u(1-u)(u+q) = f u (u-q) gives
    u^2 + (f+q-1) u - q(1+f) = 0; the positive root is the excitable
    background (the trivial u=0 state is unstable for q>0)."""
    f = float(beta)
    bcoef = f + Q - 1.0
    us = 0.5 * (-bcoef + math.sqrt(bcoef * bcoef + 4.0 * Q * (1.0 + f)))
    return (us, us)


def jac_bound(state, b):
    """Gershgorin bound on the kinetics Jacobian:
      J11 = (1/eps) (1 - 2u - f v * 2q/(u+q)^2)
      J12 = -(1/eps) f (u-q)/(u+q);  row 2: |1| + |-1| = 2.
    """
    u, v = state[0], state[1]
    upq = u + Q
    j11 = (1.0 / EPS) * (1.0 - 2.0 * u - b * v * 2.0 * Q / (upq * upq))
    j12 = (1.0 / EPS) * b * jnp.abs(u - Q) / jnp.abs(upq)
    row1 = jnp.abs(j11) + j12
    return jnp.maximum(row1, 2.0)


MODEL = register_model(
    ReactionModel(
        name="oregonator",
        nvars=2,
        var_names=("u", "v"),
        kinetics=kinetics,
        steady_state=steady_state,
        jac_bound=jac_bound,
    )
)
