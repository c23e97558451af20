"""Aliev–Panfilov model (beyond-reference ninth family) — cardiac
action-potential kinetics through the same registry; every subsystem works
unchanged."""

import numpy as np
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.models import get_model
from crdmodel_tpu.sim import simulate


def _cfg(**kw):
    base = dict(model="aliev_panfilov", surface="flat", x_mesh=24,
                surface_width=20, surface_length=40, beta=0.15, diffusion=1.0,
                wave_length=0.1, wave_width=0.5,
                t_final=10.0, output_timestep=2, dtype="float64",
                rtol=1e-6, atol=1e-9)
    base.update(kw)
    return SimConfig(**base)


def test_rest_state_is_equilibrium():
    m = get_model("aliev_panfilov")
    us, vs = m.steady_state(0.15)
    s = jnp.zeros((2, 1, 1), jnp.float64).at[0].set(us).at[1].set(vs)
    np.testing.assert_allclose(np.asarray(m.kinetics(s, 0.15)), 0.0,
                               atol=1e-14)


def test_action_potential_shape_0d():
    """Suprathreshold 0-D kinetics fire a full action potential (upstroke
    to u ~ 1, then recovery toward rest); subthreshold decays monotonically
    (Aliev & Panfilov 1996, Fig. 1 behaviour)."""
    m = get_model("aliev_panfilov")

    def rhs(t, y):
        return np.asarray(m.kinetics(jnp.asarray(y)[:, None, None], 0.15),
                          np.float64).ravel()

    fire = solve_ivp(rhs, (0, 200.0), [0.3, 0.0], rtol=1e-9, atol=1e-12,
                     dense_output=True)
    u = fire.sol(np.linspace(0, 200, 2001))[0]
    assert u.max() > 0.95
    assert abs(u[-1]) < 1e-3

    sub = solve_ivp(rhs, (0, 50.0), [0.1, 0.0], rtol=1e-9, atol=1e-12,
                    dense_output=True)
    assert sub.sol(np.linspace(0, 50, 501))[0].max() <= 0.1 + 1e-9


def test_excitation_propagates():
    """The depolarised segment spreads through the excitable tissue."""
    res = simulate(_cfg())
    assert res.ok
    u = res.field(0)
    frac0 = (u[0] > 0.5).mean()
    frac1 = (u[-1] > 0.5).mean()
    assert frac1 > frac0
    assert np.isfinite(u).all() and u.max() < 1.2


def test_high_threshold_front_retreats():
    """a > 0.5 flips the cubic front speed sign (~ sqrt(2kD)(1/2 - a)):
    the seeded region shrinks instead of invading."""
    res = simulate(_cfg(beta=0.6))
    assert res.ok
    u = res.field(0)
    assert (u[-1] > 0.5).mean() < (u[0] > 0.5).mean()


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
    arr, meta = read_reference_files(str(tmp_path),
                                     "Aliev_panfilovModel_flat", "u")
    np.testing.assert_array_equal(arr, res.field(0))
