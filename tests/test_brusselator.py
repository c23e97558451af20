"""Brusselator model (beyond-reference sixth family) — the textbook Turing
system; second model exercising multi-species diffusion ratios."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.models import get_model
from crdmodel_tpu.sim import simulate


def _cfg(**kw):
    base = dict(model="brusselator", surface="flat", x_mesh=24,
                surface_width=20, surface_length=40, beta=1.9, diffusion=0.2,
                wave_length=0.1, wave_width=0.5,
                t_final=2.0, output_timestep=2, dtype="float64",
                rtol=1e-6, atol=1e-9)
    base.update(kw)
    return SimConfig(**base)


def test_steady_state_is_equilibrium():
    m = get_model("brusselator")
    us, vs = m.steady_state(1.9)
    s = jnp.zeros((2, 1, 1), jnp.float64).at[0].set(us).at[1].set(vs)
    np.testing.assert_allclose(np.asarray(m.kinetics(s, 1.9)), 0.0,
                               atol=1e-12)


def test_subcritical_perturbation_decays():
    """Below the Turing threshold b_T = (1 + A/sqrt(8))^2 ~ 1.83 (and the
    Hopf at 1 + A^2 = 2) the seeded bump relaxes back to (A, b/A)."""
    cfg = _cfg(beta=1.5, t_final=20.0)
    res = simulate(cfg)
    assert res.ok
    u = res.field(0)
    us = 1.0
    dev0 = np.abs(u[0] - us).max()
    dev1 = np.abs(u[-1] - us).max()
    assert dev1 < 0.2 * dev0


def test_turing_instability_grows():
    """In the Turing window b_T < b < 1 + A^2 the homogeneous state is
    stable to uniform perturbations but unstable to finite-wavenumber ones:
    the seeded bump must GROW into spatial structure (diffusion-driven
    instability — impossible in the reference's single-diffusing-species
    models)."""
    cfg = _cfg(beta=1.95, t_final=60.0, output_timestep=3)
    res = simulate(cfg)
    assert res.ok
    u = res.field(0)
    us = 1.0
    dev0 = np.abs(u[0] - us).max()
    dev1 = np.abs(u[-1] - us).max()
    assert dev1 > 2.0 * dev0
    # structure, not blow-up
    assert np.isfinite(u).all() and u.max() < 10.0


def test_hopf_oscillation():
    """Above b = 1 + A^2 = 2 the well-mixed system oscillates: the spatial
    mean of u must keep crossing the fixed point."""
    cfg = _cfg(beta=3.0, diffusion=5.0, t_final=20.0, output_timestep=40)
    res = simulate(cfg)
    assert res.ok
    mean_u = res.field(0).mean(axis=(1, 2))
    crossings = np.sum(np.diff(np.sign(mean_u - 1.0)) != 0)
    assert crossings >= 3


def test_e2e_vs_scipy():
    cfg = _cfg(x_mesh=16, t_final=0.5, output_timestep=1)
    res = simulate(cfg)
    assert res.ok
    p = res.problem

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(t, y, p.params)).ravel()

    sol = solve_ivp(rhs_flat, (0.0, cfg.t_final),
                    np.asarray(p.y0, np.float64).ravel(),
                    method="RK45", rtol=1e-9, atol=1e-12)
    want = sol.y[:, -1].reshape(p.y0.shape)
    np.testing.assert_allclose(np.asarray(res.trajectory[-1]), want,
                               rtol=1e-4, atol=1e-6)


def test_rkc2_matches_erk():
    """Multi-species diffusion through the RKC2 stabilized path."""
    cfg = _cfg(t_final=1.0, output_timestep=1)
    res_a = simulate(cfg)
    import dataclasses
    res_b = simulate(dataclasses.replace(cfg, method="rkc2"))
    assert res_a.ok and res_b.ok
    np.testing.assert_allclose(np.asarray(res_b.trajectory),
                               np.asarray(res_a.trajectory),
                               rtol=1e-4, atol=1e-5)
