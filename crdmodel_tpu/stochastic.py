"""Stochastic reaction-diffusion: fixed-step SDE drivers (beyond-reference).

    dY = rhs(t, Y) dt + Sigma dW

with additive lattice noise (per-variable amplitudes, i.i.d. N(0, dt) per
cell per step). Noise-sustained structures, coherence resonance and
noise-induced wave nucleation are standard excitable-media experiments the
deterministic reference cannot express at all; this module adds them on
top of the existing Problem assembly, so every model family, surface,
beta ramp, freeze, variable-coefficient diffusion and forcing composes.

Two drivers (both whole-run jitted, PRNG-keyed, bitwise reproducible):

- method="em"     : Euler–Maruyama, strong order 1/2. Stability-limited to
                    h < 2/rho — diffusion-CFL all over again on fine grids.
- method="srock1" : stabilized stochastic Runge–Kutta–Chebyshev
                    (S-ROCK, Abdulle & Cirilli SIAM J.Sci.Comput. 2008):
                    s damped first-order Chebyshev stages extend the
                    deterministic stability interval to ~(2 - 4/3*eta)s^2,
                    then the noise increment enters at the final stage.
                    Same weak order 1 / strong 1/2 as EM, but the step
                    size is the USER'S (noise-resolution) choice instead
                    of the CFL's — the SDE analogue of method="rkc2".

The stage count s is chosen ONCE per run from the spectral-radius bound at
the initial state times a safety margin (fixed-step SDE loops must be
shape-static; the bound is state-dependent only through the kinetics term,
and `margin` covers noise-driven excursions — raise it for strongly
excitable regimes).

NOISE SEMANTICS (documented, deliberate): sigma is the amplitude on the
DISCRETE lattice system (each cell an independent Wiener increment). For
the SPDE "space-time white noise" convention pass sigma/sqrt(dx*dy)
yourself; 2D space-time white noise is otherwise not renormalizable and
every published lattice study makes this same choice explicitly.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import Problem, build_problem, make_rho_bound


@dataclasses.dataclass
class SDEResult:
    cfg: SimConfig
    problem: Problem
    trajectory: np.ndarray      # (nt+1, nvars, ny, nx), IC first
    touts: np.ndarray           # (nt+1,), 0.0 first
    dt: float                   # the realized (interval-dividing) step
    stages: int                 # s per step (1 for EM)
    seed: int
    wall_time: float

    def field(self, var: int = 0) -> np.ndarray:
        return self.trajectory[:, var]


def _chebyshev_stage_coeffs(s: int, eta: float = 0.05):
    """Damped RKC1 stage coefficients (mu, nu, kappa per stage j=2..s and
    mu1), f64 numpy. Recurrence (Abdulle & Cirilli 2008, eq. 2.4):
      Y_1 = Y_0 + h*(w1/w0)*f(Y_0)
      Y_j = 2*w1*T_{j-1}/T_j * h*f(Y_{j-1})
            + 2*w0*T_{j-1}/T_j * Y_{j-1} - T_{j-2}/T_j * Y_{j-2}
    with w0 = 1 + eta/s^2, w1 = T_s(w0)/T'_s(w0). Also returns the stage
    times c_j (consistency recurrence) for non-autonomous forcing."""
    w0 = 1.0 + eta / (s * s)
    T = np.zeros(s + 1)
    dT = np.zeros(s + 1)
    T[0], T[1] = 1.0, w0
    dT[1] = 1.0
    for j in range(2, s + 1):
        T[j] = 2 * w0 * T[j - 1] - T[j - 2]
        dT[j] = 2 * w0 * dT[j - 1] - dT[j - 2] + 2 * T[j - 1]
    w1 = T[s] / dT[s]
    mu1 = w1 / w0
    mu = np.zeros(s + 1)
    nu = np.zeros(s + 1)
    kappa = np.zeros(s + 1)
    c = np.zeros(s + 1)
    c[1] = mu1
    for j in range(2, s + 1):
        mu[j] = 2 * w1 * T[j - 1] / T[j]
        nu[j] = 2 * w0 * T[j - 1] / T[j]
        kappa[j] = -T[j - 2] / T[j]
        c[j] = nu[j] * c[j - 1] + kappa[j] * c[j - 2] + mu[j]
    return mu1, mu, nu, kappa, c


def srock1_stages_for(h: float, rho: float, eta: float = 0.05) -> int:
    """Smallest s whose damped-Chebyshev stability interval covers h*rho."""
    beta = 2.0 - 4.0 / 3.0 * eta     # interval ~ beta * s^2
    return max(2, int(np.ceil(np.sqrt(max(h * rho, 0.0) / beta + 1.0))))


def simulate_sde(cfg: SimConfig, sigma, dt: float, *, seed: int = 0,
                 method: str = "srock1", problem: Optional[Problem] = None,
                 margin: float = 1.25) -> SDEResult:
    """Fixed-step SDE integration to cfg's output times.

    sigma: scalar or per-variable sequence of additive noise amplitudes
    (lattice convention, module docstring). dt: requested step; realized
    as dTout/ceil(dTout/dt) so steps tile each output interval exactly.
    """
    cfg = cfg.validate()
    if problem is None:
        problem = build_problem(cfg)
    dtype = jnp.dtype(cfg.dtype)
    nvars = problem.model.nvars
    sig = np.broadcast_to(np.asarray(sigma, np.float64).ravel(), (nvars,)) \
        if np.ndim(sigma) else np.full((nvars,), float(sigma))
    sig = jnp.asarray(sig.reshape(nvars, 1, 1), dtype)

    from crdmodel_tpu.sim import output_times
    touts = output_times(cfg)
    d_tout = float(touts[0]) if len(touts) else float(cfg.t_final)
    n_sub = max(1, int(np.ceil(d_tout / float(dt))))
    h = d_tout / n_sub
    rhs = problem.rhs
    params = problem.params

    if method == "srock1":
        rho_fn = make_rho_bound(cfg, problem.model, problem.geometry,
                                jnp.float64,
                                diffusion_field=problem.diffusion_field,
                                diffusion_tensor=getattr(
                                    problem, "diffusion_tensor", None),
                                face_mask=getattr(problem, "face_mask",
                                                  None))
        rho0 = float(rho_fn(0.0, problem.y0.astype(jnp.float64), params))
        s = srock1_stages_for(h, margin * rho0)
        mu1, mu, nu, kappa, c = _chebyshev_stage_coeffs(s)

        def det_step(t, y):
            # python-float coefficients: numpy f64 scalars would promote
            # the f32 state under enable_x64
            y1 = y + float(h * mu1) * rhs(t, y, params)
            yjm1, yjm2 = y1, y
            for j in range(2, s + 1):       # static unroll: s is fixed
                fy = rhs(t + float(c[j - 1] * h), yjm1, params)
                yj = (float(nu[j]) * yjm1 + float(kappa[j]) * yjm2
                      + float(h * mu[j]) * fy)
                yjm1, yjm2 = yj, yjm1
            return yjm1
    elif method == "em":
        s = 1

        def det_step(t, y):
            return y + h * rhs(t, y, params)
    else:
        raise ValueError(f"unknown SDE method {method!r}; em | srock1")

    sqrt_h = float(np.sqrt(h))
    base_key = jax.random.PRNGKey(seed)
    shape = problem.y0.shape

    def sub_step(carry, _):
        t, y, k = carry
        yd = det_step(t, y)
        key = jax.random.fold_in(base_key, k)
        dw = jax.random.normal(key, shape, dtype)
        y_new = yd + (sqrt_h * sig) * dw
        return (t + h, y_new, k + 1), None

    def interval(carry, tout):
        (t, y, k), _ = jax.lax.scan(sub_step, carry, None, length=n_sub)
        # land exactly on the output time (h tiles the interval; kill the
        # accumulated float drift so output rows carry exact times)
        return (tout.astype(dtype), y, k), y

    run = jax.jit(lambda y0: jax.lax.scan(
        interval, (jnp.asarray(0.0, dtype), y0, jnp.asarray(0, jnp.int32)),
        jnp.asarray(touts, dtype)))
    snaps = run(problem.y0)[1]
    snaps.block_until_ready()
    t0 = time.perf_counter()
    snaps = run(problem.y0)[1]
    traj = np.asarray(snaps)
    wall = time.perf_counter() - t0

    return SDEResult(cfg=cfg, problem=problem,
                     trajectory=np.concatenate(
                         [np.asarray(problem.y0)[None], traj], axis=0),
                     touts=np.concatenate([[0.0], np.asarray(touts)]),
                     dt=h, stages=s, seed=seed, wall_time=wall)
