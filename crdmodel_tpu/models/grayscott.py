"""Gray–Scott model — two-species diffusion (beyond-reference model).

    u' = -u v^2 + F (1 - u)      (substrate; D_u = cfg.diffusion)
    v' =  u v^2 - (F + k) v      (activator; D_v = D_u / 2)

The classic pattern-formation system (Pearson, Science 1993): spots,
stripes, mitosis, depending on (F, k). Unlike the reference's models —
where only variable 0 diffuses — BOTH species diffuse, exercising the
framework's per-variable diffusion ratios.

Framework parameter mapping: the sweepable/rampable bifurcation parameter
`b` is the feed rate F; the removal rate k is a model constant (0.062 —
with F ~ 0.03 the self-replicating-spot/soliton corridor).
"""

from __future__ import annotations

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

K_REMOVAL = 0.062


def kinetics(state, b):
    u, v = state[0], state[1]
    uvv = u * v * v
    du = -uvv + b * (1.0 - u)
    dv = uvv - (b + K_REMOVAL) * v
    return jnp.stack([du, dv])


def steady_state(beta: float):
    """The trivial state (u, v) = (1, 0) — globally stable without a finite
    perturbation; patterns grow from seeded spots."""
    return (1.0, 0.0)


def jac_bound(state, b):
    """Gershgorin bound on J = [[-v^2 - F, -2uv], [v^2, 2uv - (F+k)]]."""
    u, v = state[0], state[1]
    v2 = v * v
    uv2 = 2.0 * jnp.abs(u * v)
    row1 = v2 + b + uv2
    row2 = v2 + uv2 + b + K_REMOVAL
    return jnp.maximum(row1, row2)


MODEL = register_model(
    ReactionModel(
        name="grayscott",
        nvars=2,
        var_names=("u", "v"),
        kinetics=kinetics,
        steady_state=steady_state,
        diffusive_vars=(0, 1),
        diffusion_ratios=(1.0, 0.5),
        jac_bound=jac_bound,
    )
)
