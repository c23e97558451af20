"""Lambda-omega / real Ginzburg-Landau model (beyond-reference eighth
family) — the only family with an EXACT nonlinear PDE solution, used here
as a full-pipeline oracle: amplitude AND phase of the evolved field must
match the travelling-wave formula, not just a discretised reference."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.models import get_model
from crdmodel_tpu.sim import output_times, simulate


def _cfg(**kw):
    base = dict(model="lambdaomega", surface="flat", x_mesh=32,
                surface_width=20, surface_length=40, beta=0.5, diffusion=0.5,
                wave_length=0.1, wave_width=0.5,
                t_final=2.0, output_timestep=2, dtype="float64",
                rtol=1e-8, atol=1e-11)
    base.update(kw)
    return SimConfig(**base)


def test_limit_cycle_rotation_exact():
    """Homogeneous background: W rotates on the unit circle at frequency
    -b exactly (spatial terms vanish on a constant field)."""
    cfg = _cfg(t_final=3.0, output_timestep=3)
    p = build_problem(cfg)
    y0 = jnp.ones_like(p.y0) * jnp.asarray([1.0, 0.0])[:, None, None]
    p = dataclasses.replace(p, y0=y0)
    res = simulate(cfg, problem=p)
    assert res.ok
    b = cfg.beta
    for k, t in enumerate(res.touts):
        want_u, want_v = np.cos(-b * t), np.sin(-b * t)
        np.testing.assert_allclose(res.trajectory[k, 0], want_u, atol=1e-6)
        np.testing.assert_allclose(res.trajectory[k, 1], want_v, atol=1e-6)


def test_travelling_wave_exact_solution():
    """W = A e^{i(kx - Omega t)} with A^2 = 1 - D k^2, Omega = b A^2 is an
    exact solution of the CONTINUOUS system. Integrating it numerically must
    reproduce amplitude and dispersion to the spatial-discretisation error
    (the semi-discrete wave speed uses the discrete Laplacian's symbol:
    D_h k^2 -> (2 - 2 cos(k dx)) D / dx^2, used below for the exact
    discrete comparison, which the integrator then matches at rtol)."""
    cfg = _cfg(x_mesh=48, t_final=1.0, output_timestep=2)
    p = build_problem(cfg)
    g = p.geometry.grid
    m = 2                                     # wavenumber index
    # the discrete wrap identifies x_{nx} with x_0, so the index-period is
    # nx*dx — one dx MORE than xmax-xmin (the reference's duplicated seam
    # point, src/FHNmodel_torus.cpp:233-234); admissible k quantises on it
    k = 2.0 * np.pi * m / (cfg.nx * g.dx)
    # discrete symbol of the 5-point Laplacian for e^{ikx} (x-direction)
    dx = g.dx
    k2_h = (2.0 - 2.0 * np.cos(k * dx)) / (dx * dx)
    D = cfg.diffusion
    A = np.sqrt(1.0 - D * k2_h)               # discrete-exact amplitude
    omega = cfg.beta * A * A
    x = np.asarray(g.x_coords(jnp.float64))[None, :]
    y0 = jnp.asarray(np.stack([A * np.cos(k * x) * np.ones((cfg.ny, 1)),
                               A * np.sin(k * x) * np.ones((cfg.ny, 1))]))
    p = dataclasses.replace(p, y0=y0)
    res = simulate(cfg, problem=p)
    assert res.ok
    for kk, t in enumerate(res.touts):
        want_u = A * np.cos(k * x - omega * t) * np.ones((cfg.ny, 1))
        want_v = A * np.sin(k * x - omega * t) * np.ones((cfg.ny, 1))
        np.testing.assert_allclose(res.trajectory[kk, 0], want_u, atol=2e-6)
        np.testing.assert_allclose(res.trajectory[kk, 1], want_v, atol=2e-6)


def test_amplitude_saturates_from_seed():
    """Any non-degenerate IC relaxes to |W| = 1 away from phase defects."""
    res = simulate(_cfg(t_final=10.0, output_timestep=2))
    assert res.ok
    u, v = res.trajectory[-1, 0], res.trajectory[-1, 1]
    r = np.sqrt(np.asarray(u) ** 2 + np.asarray(v) ** 2)
    assert np.median(r) > 0.95
    assert r.max() < 1.05


def test_jac_bound_dominates_true_jacobian():
    m = get_model("lambdaomega")
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.uniform(-1.5, 1.5, (2, 8, 8)))
    b = 0.7
    bound = float(jnp.max(m.jac_bound(s, b)))
    import jax
    for i in range(8):
        for j in range(8):
            pt = s[:, i, j][:, None, None]
            J = jax.jacfwd(lambda y: m.kinetics(y, b))(pt)
            Jm = np.asarray(J).reshape(2, 2)
            assert np.abs(np.linalg.eigvals(Jm)).max() <= bound + 1e-9


def test_rkc2_and_ark324_agree():
    base = _cfg(t_final=2.0, rtol=1e-6, atol=1e-9)
    r1 = simulate(base)
    for method in ("rkc2", "ark324"):
        r2 = simulate(dataclasses.replace(base, method=method))
        assert r2.ok
        np.testing.assert_allclose(np.asarray(r2.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=0, atol=2e-4)
