"""Gray–Scott model: multi-species diffusion generalisation."""

import numpy as np
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.models import get_model
from crdmodel_tpu.models.grayscott import K_REMOVAL
from crdmodel_tpu.sim import simulate


def _cfg(**kw):
    base = dict(model="grayscott", surface="flat", x_mesh=64,
                surface_width=2.5, surface_length=2.5, diffusion=2e-5,
                beta=0.03, wave_length=0.15, wave_width=0.25,
                t_final=100.0, output_timestep=2, dtype="float64",
                rtol=1e-5, atol=1e-9)
    base.update(kw)
    return SimConfig(**base)


def test_trivial_state_is_equilibrium():
    m = get_model("grayscott")
    s = jnp.stack([jnp.ones((1, 1)), jnp.zeros((1, 1))])
    np.testing.assert_allclose(np.asarray(m.kinetics(s, 0.03)), 0.0)


def test_both_species_diffuse_with_ratios():
    """v (ratio 0.5) must diffuse at half u's rate: for equal gaussian-ish
    bumps the RHS diffusion parts scale accordingly."""
    from crdmodel_tpu.core.problem import build_problem
    cfg = _cfg(just_diffusion=1)
    p = build_problem(cfg)
    rng = np.random.default_rng(0)
    bump = rng.standard_normal((cfg.ny, cfg.nx))
    y = jnp.stack([jnp.asarray(bump), jnp.asarray(bump)])
    dot = np.asarray(p.rhs(jnp.asarray(0.0), y, p.params))
    assert np.abs(dot[0]).max() > 0
    np.testing.assert_allclose(dot[1], 0.5 * dot[0], rtol=1e-12)


def test_e2e_vs_scipy():
    cfg = _cfg(t_final=50.0, output_timestep=1, x_mesh=24)
    res = simulate(cfg)
    assert res.ok
    p = res.problem

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(jnp.asarray(t), y, p.params),
                          dtype=np.float64).ravel()

    sol = solve_ivp(rhs_flat, (0.0, 50.0),
                    np.asarray(p.y0, dtype=np.float64).ravel(),
                    method="RK45", t_eval=[50.0], rtol=1e-9, atol=1e-12)
    want = sol.y[:, -1].reshape(p.y0.shape)
    # rtol=1e-5 per step accumulates over ~t=50 of slow dynamics
    np.testing.assert_allclose(np.asarray(res.trajectory[-1]), want,
                               atol=1e-4)


def test_pattern_persists():
    """In the soliton corridor (F=0.03, k=0.062) the seeded patch must
    neither die out nor take over: v stays bounded away from 0 and 1."""
    res = simulate(_cfg(t_final=600.0, output_timestep=3))
    assert res.ok
    v = res.field(1)
    assert v[-1].max() > 0.1
    assert v[-1].max() < 0.9
    # u depleted where v is active
    u = res.field(0)
    assert u[-1].min() < 0.6


def test_rkc_and_sweep_work():
    res = simulate(_cfg(method="rkc2", t_final=20.0, output_timestep=1))
    assert res.ok
    from crdmodel_tpu.sweep import sweep_beta
    sw = sweep_beta(_cfg(t_final=10.0, output_timestep=1), [0.03, 0.04])
    assert sw.ok()
