"""Spatial SIR model (seventh family): nvars=3 and a non-zero diffusing
variable — axes no other family exercises — plus an exact mass invariant."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.models import get_model
from crdmodel_tpu.sim import simulate


def _cfg(**kw):
    base = dict(model="sir", surface="flat", x_mesh=24,
                surface_width=20, surface_length=40, beta=1.5, diffusion=1.0,
                wave_length=0.1, wave_width=0.5,
                t_final=5.0, output_timestep=2, dtype="float64",
                rtol=1e-6, atol=1e-9)
    base.update(kw)
    return SimConfig(**base)


def test_disease_free_equilibrium():
    m = get_model("sir")
    s = jnp.zeros((3, 1, 1), jnp.float64).at[0].set(1.0)
    np.testing.assert_allclose(np.asarray(m.kinetics(s, 1.5)), 0.0,
                               atol=1e-15)


def test_mass_conservation():
    """S+I+R is pointwise-conserved by the kinetics and integrally by
    periodic diffusion: total mass must be invariant through the whole
    pipeline (stencil + integrator + freeze-free path)."""
    res = simulate(_cfg(t_final=10.0))
    assert res.ok
    traj = np.asarray(res.trajectory, np.float64)  # (nt, 3, ny, nx)
    total = traj.sum(axis=(1, 2, 3))
    np.testing.assert_allclose(total, total[0], rtol=1e-9)


def test_epidemic_wave_invades():
    """R0 = b/g = 3 > 1: the infected patch must grow and leave recovered
    mass behind."""
    res = simulate(_cfg())
    assert res.ok
    i_frac0 = (res.field(1)[0] > 1e-3).mean()
    i_frac1 = (res.field(1)[-1] > 1e-3).mean()
    assert i_frac1 > 2.0 * i_frac0
    assert res.field(2)[-1].max() > 0.1  # recovered wake


def test_subcritical_dies_out():
    """R0 = b/g < 1: infection decays everywhere, S stays ~1."""
    res = simulate(_cfg(beta=0.25, t_final=20.0))
    assert res.ok
    assert res.field(1)[-1].max() < 1e-3
    # only the seeded patch's susceptibles are (partially) consumed
    assert res.field(0)[-1].min() > 0.8
    assert res.field(0)[-1].mean() > 0.98


def test_e2e_vs_scipy():
    cfg = _cfg(x_mesh=16, t_final=1.0, output_timestep=1)
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
    cfg = _cfg(t_final=2.0, output_timestep=1)
    res_a = simulate(cfg)
    res_b = simulate(dataclasses.replace(cfg, method="rkc2"))
    assert res_a.ok and res_b.ok
    np.testing.assert_allclose(np.asarray(res_b.trajectory),
                               np.asarray(res_a.trajectory),
                               rtol=1e-4, atol=1e-5)


def test_reference_files_roundtrip(tmp_path):
    """3-variable output through the reference-format writer/reader."""
    from crdmodel_tpu.io.trajectory import read_reference_files, \
        write_reference_files
    res = simulate(_cfg(x_mesh=16, t_final=1.0))
    assert res.ok
    write_reference_files(res, str(tmp_path), nprocs=4,
                          include_all_vars=True)
    arr, touts = read_reference_files(str(tmp_path),
                                      res.cfg.program_name, var="I")
    np.testing.assert_allclose(arr, np.asarray(res.trajectory)[:, 1],
                               rtol=0, atol=1e-15)
