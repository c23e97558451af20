"""Barkley model — fast excitable-media kinetics (beyond-reference model).

    u' = (1/eps) u (1-u) (u - (v + b)/a)
    v' = u - v

The classic spiral-wave system (Barkley, Physica D 1991). Included as a
third model family to demonstrate that the framework's solver core is
model-agnostic: registering these ~30 lines makes every subsystem — flat and
torus surfaces, the adaptive/RKC integrators, sharding, sweeps, IO, movies,
torus mapping — work for a model the reference never had. Like FHN and
Goldbeter, only variable 0 (the activator u) diffuses.

The framework's sweepable/rampable bifurcation parameter `b` maps to
Barkley's excitability threshold b (the standard bifurcation knob): small b
-> spiral/turbulent regimes, large b -> no excitation.
"""

from __future__ import annotations

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

A = 0.75
EPS = 0.02


def kinetics(state, b):
    u, v = state[0], state[1]
    du = (1.0 / EPS) * u * (1.0 - u) * (u - (v + b) / A)
    dv = u - v
    return jnp.stack([du, dv])


def steady_state(beta: float):
    """The rest state (0, 0) is the globally attracting background for
    b > 0 (excitable regime)."""
    return (0.0, 0.0)


def jac_bound(state, b):
    """Gershgorin bound on J = [[g_u, g_v], [1, -1]] with
    g = (1/eps) u(1-u)(u - (v+b)/a):
      g_u = (1/eps) [ (1-2u)(u-(v+b)/a) + u(1-u) ]
      g_v = -(1/eps) u(1-u)/a
    """
    u, v = state[0], state[1]
    thr = (v + b) / A
    g_u = (1.0 / EPS) * ((1.0 - 2.0 * u) * (u - thr) + u * (1.0 - u))
    g_v = (1.0 / EPS) * u * (1.0 - u) / A
    row1 = jnp.abs(g_u) + jnp.abs(g_v)
    return jnp.maximum(row1, 2.0)


MODEL = register_model(
    ReactionModel(
        name="barkley",
        nvars=2,
        var_names=("u", "v"),
        kinetics=kinetics,
        steady_state=steady_state,
        jac_bound=jac_bound,
    )
)
