"""Stochastic SDE drivers (stochastic.py): exact-statistics oracles.

The grid is the ensemble: with D=0 (or a uniform field) every cell is an
independent realization, so nx*ny samples pin means/variances to ~1%
without Monte-Carlo loops."""

import numpy as np
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.stochastic import (simulate_sde, srock1_stages_for,
                                     _chebyshev_stage_coeffs)


def _cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=64,
                surface_width=20, surface_length=20, beta=1.25,
                diffusion=0.12, t_boundary=0.0, vary_beta=0,
                t_final=1.0, output_timestep=4, dtype="float64",
                just_diffusion=1)
    base.update(kw)
    return SimConfig(**base)


def test_random_walk_variance():
    """justDiffusion with D=0: rhs == 0, so each cell is a pure Wiener
    process — Var[y_t] = sigma^2 t exactly."""
    sigma = 0.3
    res = simulate_sde(_cfg(diffusion=0.0), sigma, dt=0.01, seed=7,
                       method="em")
    for k, t in enumerate(res.touts):
        if t == 0.0:
            continue
        dev = res.trajectory[k, 0] - res.trajectory[0, 0]
        var = float(np.var(dev))
        assert abs(var - sigma ** 2 * t) < 0.08 * sigma ** 2 * t


def test_ou_stationary_statistics():
    """Mean-reverting forcing -k*y with D=0 makes every cell an OU
    process: Var[y_t] = sigma^2/(2k) (1 - e^{-2kt}), mean decays e^{-kt}.
    Both drivers must reproduce it (srock1 at the same dt)."""
    kk, sigma = 4.0, 0.5
    cfg = _cfg(diffusion=0.0, t_final=2.0, output_timestep=2)
    prob = build_problem(cfg, forcing=lambda t, y, p: -kk * y)
    # start from 1.0 everywhere to see the mean decay
    prob = __import__("dataclasses").replace(
        prob, y0=jnp.ones_like(prob.y0), cache={})
    for method in ("em", "srock1"):
        res = simulate_sde(cfg, sigma, dt=0.01, seed=3, problem=prob,
                           method=method)
        t = res.touts[-1]
        y = res.trajectory[-1, 0]
        var_want = sigma ** 2 / (2 * kk) * (1 - np.exp(-2 * kk * t))
        assert abs(float(np.mean(y)) - np.exp(-kk * t)) < 0.01, method
        assert abs(float(np.var(y)) - var_want) < 0.05 * var_want, method


def test_srock1_deterministic_limit_matches_adaptive():
    """sigma=0 reduces srock1 to damped RKC1: a smooth diffusion decay
    must match the adaptive reference driver to fixed-step accuracy."""
    cfg = _cfg(x_mesh=32, diffusion=0.12, t_final=1.0, output_timestep=1,
               rtol=1e-9, atol=1e-12)
    det = simulate(cfg)
    assert det.ok
    errs = []
    for dt in (0.02, 0.005):
        res = simulate_sde(cfg, 0.0, dt=dt, seed=0, method="srock1")
        errs.append(np.max(np.abs(res.trajectory[-1]
                                  - np.asarray(det.trajectory)[-1])))
    assert errs[0] < 5e-3                       # measured 2.8e-3 at dt=0.02
    assert 3.0 < errs[0] / errs[1] < 5.5        # first order: ratio ~ 4


def test_srock1_stable_where_em_blows_up():
    """The capability claim: at h >> 2/rho the Euler-Maruyama drift
    explodes while the Chebyshev stages keep srock1 bounded (sigma=0,
    stiff diffusion: rho ~ 3000 at this grid, h = 0.05)."""
    cfg = _cfg(x_mesh=64, diffusion=1.0, t_final=0.5, output_timestep=1)
    em = simulate_sde(cfg, 0.0, dt=0.05, seed=0, method="em")
    sr = simulate_sde(cfg, 0.0, dt=0.05, seed=0, method="srock1")
    y0max = float(np.abs(em.trajectory[0]).max())
    assert (not np.isfinite(em.trajectory[-1]).all()
            or float(np.abs(em.trajectory[-1]).max()) > 10 * y0max)
    assert np.isfinite(sr.trajectory[-1]).all()
    assert float(np.abs(sr.trajectory[-1]).max()) <= 1.01 * y0max


def test_reproducible_and_seed_sensitive():
    cfg = _cfg(diffusion=0.0, t_final=0.2, output_timestep=1)
    a = simulate_sde(cfg, 0.2, dt=0.01, seed=11)
    b = simulate_sde(cfg, 0.2, dt=0.01, seed=11)
    c = simulate_sde(cfg, 0.2, dt=0.01, seed=12)
    np.testing.assert_array_equal(a.trajectory, b.trajectory)
    assert np.abs(a.trajectory[-1] - c.trajectory[-1]).max() > 1e-3


def test_per_variable_sigma():
    """sigma=(s0, 0): the second variable stays deterministic."""
    cfg = _cfg(diffusion=0.0, t_final=0.2, output_timestep=1)
    res = simulate_sde(cfg, (0.3, 0.0), dt=0.01, seed=5)
    assert np.var(res.trajectory[-1, 0]) > 1e-4
    # nu_j + kappa_j == 1 only analytically: the zero-drift variable picks
    # up f64 recurrence rounding (~1e-15), nothing stochastic
    np.testing.assert_allclose(res.trajectory[-1, 1],
                               res.trajectory[0, 1], rtol=0, atol=1e-12)


def test_stage_coeff_consistency():
    """The stage-time recurrence must end at c_s ~ 1 (first-order
    consistency of the damped RKC1 chain) and the stability estimate must
    cover the requested interval."""
    for s in (3, 7, 20):
        mu1, mu, nu, kappa, c = _chebyshev_stage_coeffs(s)
        assert abs(c[s] - 1.0) < 0.08
    assert srock1_stages_for(0.05, 3000.0) >= 8


def test_noise_with_kinetics_runs():
    """Full FHN kinetics + diffusion + noise on the activator only: the
    excitable field stays bounded and actually fluctuates."""
    cfg = _cfg(just_diffusion=0, x_mesh=32, diffusion=0.12,
               t_final=1.0, output_timestep=1, dtype="float32")
    res = simulate_sde(cfg, (0.05, 0.0), dt=0.005, seed=1,
                       method="srock1")
    assert np.isfinite(res.trajectory).all()
    assert np.abs(res.trajectory[-1, 0]).max() < 5.0
    assert np.std(res.trajectory[-1, 0]) > 1e-3
