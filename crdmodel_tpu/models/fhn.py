"""FitzHugh–Nagumo kinetics.

    u' = 3u - u^3 - v
    v' = eps (u + b),   eps = 0.36

matching the reference *code* (src/FHNmodel_torus.cpp:656-660) — note the
reference's header comment says `v' = eps(u - beta)` (src/FHNmodel_torus.cpp:6)
but the code uses `u + b` and the analytic steady state Us = -beta is
consistent with the code (src/FHNmodel_torus.cpp:242-244). Code wins.
"""

from __future__ import annotations

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

EPSILON = 0.36


def kinetics(state, b):
    """state: (2, ...) array [u, v]; b: scalar or field broadcastable to u."""
    u, v = state[0], state[1]
    du = 3.0 * u - u * u * u - v
    dv = EPSILON * (u + b)
    return jnp.stack([du, dv])


def steady_state(beta: float):
    """Analytic fixed point: Us = -beta, Vs = beta^3 - 3 beta
    (reference src/FHNmodel_torus.cpp:242-244)."""
    return (-beta, beta ** 3 - 3.0 * beta)


def jac_bound(state, b):
    """Gershgorin bound on the kinetics Jacobian
    J = [[3-3u^2, -1], [eps, 0]] over the grid."""
    u = state[0]
    row1 = jnp.abs(3.0 - 3.0 * u * u) + 1.0
    return jnp.maximum(row1, EPSILON)


MODEL = register_model(
    ReactionModel(
        name="fhn",
        nvars=2,
        var_names=("u", "v"),
        kinetics=kinetics,
        steady_state=steady_state,
        jac_bound=jac_bound,
    )
)
