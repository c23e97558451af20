"""RKC2 stabilized integrator tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rho_bound
from crdmodel_tpu.integrate.erk import integrate_to_outputs
from crdmodel_tpu.integrate.rkc import choose_stages, make_rkc2_step_err
from crdmodel_tpu.sim import simulate


def test_stage_selection():
    # h*rho = 0 -> minimum stages; large h*rho -> s ~ sqrt(h rho / 0.65)
    assert int(choose_stages(jnp.asarray(1e-6), jnp.asarray(1.0))) >= 2
    s = int(choose_stages(jnp.asarray(1.0), jnp.asarray(1000.0)))
    assert 38 <= s <= 45  # sqrt(1000/0.65) ~ 39.2


def test_rkc_prothero_robinson():
    """Stiff relaxation to a smooth manifold (non-autonomous: exercises the
    RKC stage times): accuracy within tolerance, no blow-up."""
    lam = 2000.0
    rhs = lambda t, y, p: -lam * (y - jnp.cos(t)) - jnp.sin(t)
    rho = lambda t, y, p: jnp.asarray(lam, y.dtype)
    y0 = jnp.zeros((4,), jnp.float64)
    touts = np.array([1.0, 2.0])
    traj, stats = integrate_to_outputs(
        rhs, y0, {}, 0.0, touts, rtol=1e-5, atol=1e-8, method="rkc2",
        rho_fn=rho)
    assert int(np.asarray(stats.status).max()) == 0
    assert abs(float(traj[-1, 0]) - np.cos(2.0)) < 1e-4
    assert int(np.sum(np.asarray(stats.steps))) < 4000


def test_rkc_heat_equation_vs_bs32_stability_limited():
    """justDiffusion heat mode on a fine grid at production tolerance: the
    explicit method is diffusion-CFL limited while rkc2 steps at accuracy —
    measured 29 vs 154 steps at these settings."""
    base = dict(model="goldbeter", surface="flat", x_mesh=400,
                surface_width=20, surface_length=40, just_diffusion=1,
                t_final=1.0, output_timestep=1, dtype="float64",
                rtol=1e-4, atol=1e-7)
    r_bs = simulate(SimConfig(**base, method="bs32"))
    r_rkc = simulate(SimConfig(**base, method="rkc2"))
    assert r_bs.ok and r_rkc.ok
    np.testing.assert_allclose(np.asarray(r_rkc.trajectory),
                               np.asarray(r_bs.trajectory),
                               rtol=5e-3, atol=5e-3)
    assert r_rkc.total_steps() < 0.4 * r_bs.total_steps(), (
        r_rkc.total_steps(), r_bs.total_steps())


def test_rkc_fhn_reaction_diffusion_vs_scipy():
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=20,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.5, output_timestep=2, method="rkc2",
                    dtype="float64", rtol=1e-6, atol=1e-10)
    res = simulate(cfg)
    assert res.ok
    p = res.problem

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(jnp.asarray(t), y, p.params),
                          dtype=np.float64).ravel()

    sol = solve_ivp(rhs_flat, (0.0, 1.5),
                    np.asarray(p.y0, dtype=np.float64).ravel(),
                    method="RK45", t_eval=res.touts[1:], rtol=1e-9,
                    atol=1e-12)
    want = sol.y.T.reshape((2,) + p.y0.shape)
    np.testing.assert_allclose(np.asarray(res.trajectory[1:]), want,
                               atol=2e-4)


def test_rho_bound_dominates_numeric_jacobian():
    """The analytic Gershgorin bound must exceed the true spectral radius of
    the full RHS Jacobian (sampled numerically on a tiny grid)."""
    cfg = SimConfig(model="goldbeter", surface="torus", x_mesh=8,
                    surface_width=20, surface_length=40, beta=0.4,
                    dtype="float64")
    p = build_problem(cfg)
    rho_fn = make_rho_bound(cfg, p.model, p.geometry, jnp.float64)
    rng = np.random.default_rng(0)
    y = jnp.asarray(0.2 + rng.random(p.y0.shape))
    rho = float(rho_fn(jnp.asarray(0.0), y, p.params))

    f = lambda yf: np.asarray(
        p.rhs(jnp.asarray(0.0), jnp.asarray(yf.reshape(p.y0.shape)),
              p.params)).ravel()
    y0 = np.asarray(y).ravel()
    n = y0.size
    J = np.zeros((n, n))
    f0 = f(y0)
    eps = 1e-7
    for i in range(n):
        dy = y0.copy()
        dy[i] += eps
        J[:, i] = (f(dy) - f0) / eps
    lam_max = np.max(np.abs(np.linalg.eigvals(J)))
    assert rho >= 0.95 * lam_max, (rho, lam_max)


def test_rkc_streaming():
    from crdmodel_tpu.sim import simulate_streaming
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=16,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.0, output_timestep=2, method="rkc2",
                    dtype="float64", rtol=1e-6, atol=1e-10)
    res = simulate_streaming(cfg)
    assert res.ok


def test_fused_rkc_rejects_shallow_strips():
    """Multi-strip wrapped-row DMAs need strip depth >= halo P=24; grids
    whose largest admissible strip divisor is shallower must fall back to
    the XLA path instead of silently loading wrong halo rows (review
    finding: ny=1616 picks S=16 < 24 with 101 strips)."""
    import jax.numpy as jnp
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.ops import pallas_rkc
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=404,
                    surface_width=20, surface_length=80,
                    beta=1.25, dtype="float32", rtol=1e-5, atol=1e-8,
                    method="rkc2")
    p = build_problem(cfg)
    assert cfg.ny == 1616
    assert not pallas_rkc.is_rkc_supported(p, jnp.float32)
    # a clean power-of-two grid still qualifies
    cfg2 = SimConfig(model="fhn", surface="torus", x_mesh=256,
                     surface_width=20, surface_length=80,
                     beta=1.25, dtype="float32", rtol=1e-5, atol=1e-8,
                     method="rkc2")
    assert pallas_rkc.is_rkc_supported(build_problem(cfg2), jnp.float32)
