"""Brusselator — the classic Turing-pattern benchmark (beyond-reference).

Prigogine–Lefever autocatalytic scheme (two variables, constant feed A):

    u' = A - (b + 1) u + u^2 v
    v' = b u - u^2 v

The framework's sweepable/rampable bifurcation parameter `b` maps to the
control parameter B (the standard knob): homogeneous steady state
(u, v) = (A, b/A) is stable for b < 1 + A^2, Hopf-oscillatory above; with
the inhibitor v diffusing faster than the activator u the Turing
instability sets in at b_T = (1 + A*sqrt(D_u/D_v))^2 < 1 + A^2, the
textbook diffusion-driven pattern onset (Prigogine & Lefever, J. Chem.
Phys. 1968; Turing 1952).

Sixth registered model family; like Gray–Scott it diffuses BOTH species
(D_v = 8 D_u here, comfortably past the Turing threshold), exercising the
fused kernels' per-variable diffusion path on a second model. The
reference hardcodes exactly two models into four binaries
(src/FHNmodel_torus.cpp:618-664, src/GoldbeterModel_torus.cpp:661-721);
here a new family is this one file plus an IC branch.
"""

from __future__ import annotations

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

A_FEED = 1.0
D_RATIO_V = 8.0   # D_v / D_u; Turing threshold (1 + A/sqrt(8))^2 ~ 1.83


def kinetics(state, b):
    u, v = state[0], state[1]
    uuv = u * u * v
    du = A_FEED - (b + 1.0) * u + uuv
    dv = b * u - uuv
    return jnp.stack([du, dv])


def steady_state(beta: float):
    """Unique homogeneous fixed point (A, b/A)."""
    return (A_FEED, float(beta) / A_FEED)


def jac_bound(state, b):
    """Gershgorin bound on J = [[2uv - (b+1), u^2], [b - 2uv, -u^2]]."""
    u, v = state[0], state[1]
    uv2 = 2.0 * jnp.abs(u * v)
    uu = u * u
    row1 = jnp.abs(uv2 - (b + 1.0)) + uu
    row2 = jnp.abs(b - uv2) + uu
    return jnp.maximum(row1, row2)


MODEL = register_model(
    ReactionModel(
        name="brusselator",
        nvars=2,
        var_names=("u", "v"),
        kinetics=kinetics,
        steady_state=steady_state,
        diffusive_vars=(0, 1),
        diffusion_ratios=(1.0, D_RATIO_V),
        jac_bound=jac_bound,
    )
)
