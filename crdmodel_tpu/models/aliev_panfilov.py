"""Aliev–Panfilov — cardiac action-potential kinetics (beyond-reference).

Two-variable phenomenological model of cardiac excitation
(Aliev & Panfilov, Chaos Solitons Fractals 1996):

    u' = k u (1 - u) (u - a) - u v
    v' = eps(u, v) * ( -v - k u (u - a - 1) )
    eps(u, v) = eps0 + mu1 * v / (u + mu2)

with the paper's parameters k=8, eps0=0.002, mu1=0.2, mu2=0.3. `u` is the
dimensionless transmembrane potential (resting 0, peak ~1; physical units
E = 100u - 80 mV, t_phys ~ 12.9 t ms), `v` the recovery current. The
standard model for cardiac spiral waves (rotors) and their breakup into
fibrillation-like turbulence. Ninth registered model family — the cardiac
vertical rides the same registry the reference hardcodes two models into
four binaries for (SURVEY.md C7/C8): both surfaces, all integrators
including the fused Pallas kernels, sharding, sweeps, IO, movies, torus
mapping and the spiral-tip tracker (viz/tips.py) work unchanged.

The framework's sweepable/rampable parameter `b` maps to the excitation
threshold `a` (the paper's bifurcation knob: a ~ 0.05 rigid rotation,
a ~ 0.10-0.15 meander/breakup window; canonical a = 0.15). Only u
diffuses, like the reference models (D = 1 in the paper's units).
"""

from __future__ import annotations

import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

K = 8.0
EPS0 = 0.002
MU1 = 0.2
MU2 = 0.3


def kinetics(state, b):
    u, v = state[0], state[1]
    eps = EPS0 + MU1 * v / (u + MU2)
    du = K * u * (1.0 - u) * (u - b) - u * v
    dv = eps * (-v - K * u * (u - b - 1.0))
    return jnp.stack([du, dv])


def steady_state(beta: float):
    """The rest state (0, 0) is the globally attracting background for
    0 < a < 1 (excitable regime; eps(0,0) = eps0 > 0 damps v, and u = 0
    kills every u' term)."""
    return (0.0, 0.0)


def jac_bound(state, b):
    """Pointwise Gershgorin bound on the kinetics Jacobian.

    f = k u(1-u)(u-a) - u v, g = eps(u,v) * w with w = -v - k u(u-a-1):
      f_u = k [ (1-u)(u-a) + u((1-u) - (u-a)) ] - v
      f_v = -u
      g_u = eps * (-k (2u - a - 1)) + eps_u * w,  eps_u = -mu1 v/(u+mu2)^2
      g_v = -eps + eps_v * w,                     eps_v =  mu1/(u+mu2)
    The denominator u + mu2 is floored away from 0 (u < -0.2 only in
    unphysical transients; the floor only ever *grows* the bound there).
    """
    u, v = state[0], state[1]
    d = jnp.maximum(jnp.abs(u + MU2), 0.05)
    eps = EPS0 + MU1 * v / d
    w = -v - K * u * (u - b - 1.0)
    f_u = K * ((1.0 - u) * (u - b) + u * ((1.0 - u) - (u - b))) - v
    f_v = u
    g_u = eps * (-K) * (2.0 * u - b - 1.0) - (MU1 * v / (d * d)) * w
    g_v = -eps + (MU1 / d) * w
    row1 = jnp.abs(f_u) + jnp.abs(f_v)
    row2 = jnp.abs(g_u) + jnp.abs(g_v)
    return jnp.maximum(row1, row2)


MODEL = register_model(
    ReactionModel(
        name="aliev_panfilov",
        nvars=2,
        var_names=("u", "v"),
        kinetics=kinetics,
        steady_state=steady_state,
        jac_bound=jac_bound,
    )
)
