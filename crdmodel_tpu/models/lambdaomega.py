"""Lambda–omega system — real Ginzburg–Landau kinetics (beyond-reference).

    u' = (1 - r^2) u + b r^2 v + D lap(u)         r^2 = u^2 + v^2
    v' = -b r^2 u + (1 - r^2) v + D lap(v)

Equivalently W = u + iv solves the lambda-omega reaction-diffusion system
W' = W - (1 + ib)|W|^2 W + D lap(W) (Kopell & Howard 1973) — the normal
form of an oscillatory medium near a Hopf bifurcation and the canonical
source of rotating spiral waves. The framework's sweepable/rampable
parameter `b` is the frequency twist omega'(r); b = 0 gives untwisted
phase waves, |b| > 0 twists the spiral arms.

Second equal-coefficient two-species-diffusion family, and the only family
with an EXACT nonlinear solution on the flat periodic surface:

    W(x, t) = A exp(i(kx - Omega t)),  A^2 = 1 - D k^2,  Omega = b A^2

for any admissible wavenumber k = 2*pi*m/Lx — the strongest analytic
oracle in the test suite (tests/test_lambdaomega.py pins the full
nonlinear evolution against it, amplitude AND phase).
"""

from __future__ import annotations

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model


def kinetics(state, b):
    u, v = state[0], state[1]
    r2 = u * u + v * v
    du = (1.0 - r2) * u + b * r2 * v
    dv = -b * r2 * u + (1.0 - r2) * v
    return jnp.stack([du, dv])


def steady_state(beta: float):
    """(1, 0): a point on the homogeneous limit cycle r = 1 (the background
    rotates at frequency -b; the trivial fixed point (0,0) is unstable)."""
    return (1.0, 0.0)


def jac_bound(state, b):
    """Gershgorin row bound on the kinetics Jacobian.

    J = (1 - r^2) I + b r^2 [[0,1],[-1,0]] - 2 [u-bv; bu+v] (u, v)
    (the nonlinear part is rank-1). Max abs row sum <= |1 - r^2| + |b| r^2
    + 2 max_i |c_i| (|u|+|v|) with c = (u-bv, bu+v); bounding
    |c_i| <= sqrt(1+b^2) r, |u|+|v| <= sqrt(2) r and tightening the
    rank-1 term's angular sup gives the dominating coefficient
    2(1+|b|) + sqrt(2+2b^2) — numerically verified to bound the exact
    max row sum for all (b, r, angle) sampled over |b|<=5, r<=4, with
    <=4% overshoot. (The previous 1 + 3(1+|b|) r^2 under-bounded for
    b != 1, e.g. b=0 needs 2+sqrt(2) ~ 3.41.)"""
    u, v = state[0], state[1]
    r2 = u * u + v * v
    coef = 2.0 * (1.0 + jnp.abs(b)) + jnp.sqrt(2.0 + 2.0 * b * b)
    return 1.0 + coef * r2


MODEL = register_model(
    ReactionModel(
        name="lambdaomega",
        nvars=2,
        var_names=("u", "v"),
        kinetics=kinetics,
        steady_state=steady_state,
        diffusive_vars=(0, 1),
        diffusion_ratios=(1.0, 1.0),
        jac_bound=jac_bound,
    )
)
