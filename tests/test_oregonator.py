"""Oregonator model (beyond-reference fifth model family) — BZ excitable
chemistry through the same registry; every subsystem works unchanged."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.models import get_model
from crdmodel_tpu.sim import simulate


def _cfg(**kw):
    base = dict(model="oregonator", surface="flat", x_mesh=24,
                surface_width=20, surface_length=40, beta=1.5, diffusion=1.0,
                wave_length=0.1, wave_width=0.5,
                t_final=2.0, output_timestep=2, dtype="float64",
                rtol=1e-6, atol=1e-9)
    base.update(kw)
    return SimConfig(**base)


def test_rest_state_is_equilibrium():
    m = get_model("oregonator")
    us, vs = m.steady_state(1.5)
    s = jnp.full((2, 1, 1), 0.0, jnp.float64).at[0].set(us).at[1].set(vs)
    np.testing.assert_allclose(np.asarray(m.kinetics(s, 1.5)), 0.0,
                               atol=1e-12)


def test_excitation_propagates():
    """The excited segment spreads through the excitable medium."""
    res = simulate(_cfg())
    assert res.ok
    u = res.field(0)
    # excited area (u above half the excited branch) must grow
    frac0 = (u[0] > 0.4).mean()
    frac1 = (u[-1] > 0.4).mean()
    assert frac1 > frac0
    assert np.isfinite(u).all() and u.max() < 1.5


def test_high_f_decays():
    """Large stoichiometric factor f: sub-excitable, the seed dies back to
    the rest state (f=4 still carries a wave; f=6 does not)."""
    res = simulate(_cfg(beta=6.0, t_final=4.0))
    assert res.ok
    u = res.field(0)
    assert u[-1].max() < 0.05


def test_e2e_vs_scipy():
    cfg = _cfg(x_mesh=16, t_final=0.5, output_timestep=1)
    res = simulate(cfg)
    assert res.ok
    p = res.problem

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(jnp.asarray(t), y, p.params),
                          dtype=np.float64).ravel()

    sol = solve_ivp(rhs_flat, (0.0, 0.5),
                    np.asarray(p.y0, dtype=np.float64).ravel(),
                    method="LSODA", t_eval=[0.5], rtol=1e-9, atol=1e-12)
    want = sol.y[:, -1].reshape(p.y0.shape)
    np.testing.assert_allclose(np.asarray(res.trajectory[-1]), want,
                               atol=5e-5)


def test_torus_and_rkc_work():
    res = simulate(_cfg(surface="torus", method="rkc2", x_mesh=16,
                        t_final=0.5, output_timestep=1))
    assert res.ok


def test_io_and_viz_work(tmp_path):
    from crdmodel_tpu.io.trajectory import (read_reference_files,
                                            write_reference_files)
    res = simulate(_cfg(include_all_vars=1, x_mesh=12, t_final=0.5,
                        output_timestep=1))
    write_reference_files(res, str(tmp_path))
    arr, meta = read_reference_files(str(tmp_path), "OregonatorModel_flat",
                                     "u")
    np.testing.assert_array_equal(arr, res.field(0))
