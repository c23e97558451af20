"""End-to-end parity vs an independent scipy oracle.

The reference binaries cannot be built here (no MPI/SUNDIALS toolchain in the
image), so the golden oracle is scipy.solve_ivp at tight tolerance on the
*same semi-discrete system* (method of lines over our verified stencils —
which tests in test_stencil.py pin to the reference discretisation
point-by-point). This is the §4(e) strategy from SURVEY.md adapted to the
environment.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate, output_times


def scipy_oracle(problem, touts, rtol=1e-9, atol=1e-12):
    shape = problem.y0.shape

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(shape))
        return np.asarray(problem.rhs(jnp.asarray(t), y, problem.params),
                          dtype=np.float64).ravel()

    sol = solve_ivp(rhs_flat, (0.0, float(touts[-1])),
                    np.asarray(problem.y0, dtype=np.float64).ravel(),
                    method="RK45", t_eval=touts, rtol=rtol, atol=atol)
    assert sol.success
    return sol.y.T.reshape((len(touts),) + shape)


@pytest.mark.parametrize("surface", ["flat", "torus"])
def test_fhn_e2e_vs_scipy(surface):
    cfg = SimConfig(model="fhn", surface=surface, x_mesh=20,
                    surface_width=20, surface_length=40,
                    t_final=3.0, output_timestep=3, t_boundary=1.0,
                    beta=1.25, wave_inside=1, dtype="float64",
                    rtol=1e-7, atol=1e-10)
    res = simulate(cfg)
    assert res.ok
    touts = output_times(cfg)
    want = scipy_oracle(res.problem, touts)
    got = np.asarray(res.trajectory[1:])
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_goldbeter_flat_e2e_vs_scipy():
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=12,
                    surface_width=20, surface_length=40,
                    t_final=1.0, output_timestep=2, beta=0.85,
                    wave_length=0.1, wave_width=0.5, dtype="float64",
                    rtol=1e-7, atol=1e-10)
    res = simulate(cfg)
    assert res.ok
    touts = output_times(cfg)
    want = scipy_oracle(res.problem, touts)
    got = np.asarray(res.trajectory[1:])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_just_diffusion_heat_decay():
    """justDiffusion=1 reduces to the heat equation (the reference's own
    known-solution mode, src/GoldbeterModel_torus.cpp:668): total mass of
    the diffusing variable is conserved and spatial variance decays."""
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=16,
                    surface_width=20, surface_length=40,
                    t_final=5.0, output_timestep=5, just_diffusion=1,
                    beta=0.85, dtype="float64", rtol=1e-8, atol=1e-12)
    res = simulate(cfg)
    assert res.ok
    z = res.field(0)
    mass = z.sum(axis=(1, 2))
    # 5-point periodic stencil conserves the discrete sum exactly (up to
    # integrator tolerance) on the flat surface
    np.testing.assert_allclose(mass, mass[0], rtol=1e-8)
    var = z.var(axis=(1, 2))
    assert var[-1] < var[0] * 0.9
    # second variable must never move
    y1 = res.field(1)
    np.testing.assert_allclose(y1, np.broadcast_to(y1[0], y1.shape), atol=1e-14)


@pytest.mark.parametrize("model,surface,beta", [
    ("fhn", "flat", 1.25), ("fhn", "torus", 1.25),
    ("goldbeter", "flat", 0.85), ("goldbeter", "torus", 0.85),
])
def test_fixed_point_preservation(model, surface, beta):
    """A constant field at the model's steady state must stay put
    (SURVEY.md §4(b))."""
    cfg = SimConfig(model=model, surface=surface, x_mesh=12,
                    surface_width=20, surface_length=40, beta=beta,
                    t_final=2.0, output_timestep=2, dtype="float64",
                    rtol=1e-7, atol=1e-12)
    p = build_problem(cfg)
    steady = np.asarray(p.steady_state, dtype=np.float64)
    y0 = jnp.asarray(np.broadcast_to(steady[:, None, None],
                                     p.y0.shape).copy())
    p = p.__class__(**{**p.__dict__, "y0": y0})
    res = simulate(cfg, problem=p)
    assert res.ok
    final = np.asarray(res.trajectory[-1])
    np.testing.assert_allclose(final, np.asarray(y0), atol=1e-7)


def test_absorbing_boundary_keeps_rows_fixed():
    """While t < tBoundary the global north/south rows hold their ICs
    (frozen Dirichlet trick, src/FHNmodel_torus.cpp:643-653)."""
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=16,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.0, output_timestep=2, t_boundary=10.0,
                    dtype="float64", rtol=1e-7, atol=1e-10)
    res = simulate(cfg)
    assert res.ok
    u = res.field(0)
    np.testing.assert_allclose(u[:, 0, :],
                               np.broadcast_to(u[0, 0, :], u[:, 0, :].shape),
                               atol=1e-12)
    np.testing.assert_allclose(u[:, -1, :],
                               np.broadcast_to(u[0, -1, :], u[:, -1, :].shape),
                               atol=1e-12)
