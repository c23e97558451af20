"""Spatial SIR epidemic — 3-variable family with a non-zero diffusing var.

Kermack–McKendrick kinetics with diffusing infecteds (Noble, Nature 1974 —
the classic model of plague front propagation):

    S' = -b S I
    I' =  b S I - g I  + D lap(I)
    R' =  g I

The framework's sweepable/rampable parameter `b` is the transmission rate;
the recovery rate g is a model constant. An epidemic front invades the
susceptible background iff R0 = b S0 / g > 1 (S0 = 1 here, so b > g).

Beyond breadth, this family pins two framework axes no other model
exercises: nvars = 3 (every other family is 2-variable) and
diffusive_vars = (1,) — the diffusing variable is NOT variable 0 (the
reference hardwires var-0-only diffusion, SURVEY.md C5/C6; the fused
kernels' per-variable diffusion loop must handle an offset species).
Kinetics conserve S+I+R pointwise and periodic diffusion conserves the
integral, so total mass is an exact invariant — a strong whole-pipeline
oracle (tests/test_sir.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

G_RECOVERY = 0.5


def kinetics(state, b):
    s, i = state[0], state[1]
    inf = b * s * i
    rec = G_RECOVERY * i
    return jnp.stack([-inf, inf - rec, rec])


def steady_state(beta: float):
    """Disease-free equilibrium (S, I, R) = (1, 0, 0)."""
    return (1.0, 0.0, 0.0)


def jac_bound(state, b):
    """Gershgorin bound on
    J = [[-bI, -bS, 0], [bI, bS - g, 0], [0, g, 0]]."""
    s, i = state[0], state[1]
    bi = jnp.abs(b * i)
    bs = jnp.abs(b * s)
    row1 = bi + bs
    row2 = bi + jnp.abs(bs - G_RECOVERY) + G_RECOVERY
    return jnp.maximum(row1, row2)


MODEL = register_model(
    ReactionModel(
        name="sir",
        nvars=3,
        var_names=("S", "I", "R"),
        kinetics=kinetics,
        steady_state=steady_state,
        diffusive_vars=(1,),
        diffusion_ratios=(1.0,),
        jac_bound=jac_bound,
    )
)
