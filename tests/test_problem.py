"""Problem assembly tests: ICs, beta ramp, boundary freeze, justDiffusion."""

import numpy as np
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import beta_field, build_problem


def _cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=16, surface_width=20,
                surface_length=40, dtype="float64")
    base.update(kw)
    return SimConfig(**base)


def test_fhn_flat_ic_segment():
    cfg = _cfg(beta=1.25, wave_width=0.5, wave_length=0.1, vary_beta=0)
    p = build_problem(cfg)
    u = np.asarray(p.y0[0])
    us, vs = p.steady_state
    # background at steady state
    assert np.isclose(u[0, 0], us)
    # segment: x in [W/2 - ww/2, W/2 + ww/2] = [5,15], y in [4,8]
    x = cfg.xmin + np.arange(cfg.nx) * cfg.dx
    y = cfg.ymin + np.arange(cfg.ny) * cfg.dy
    seg = ((x[None, :] >= 5) & (x[None, :] <= 15)
           & (y[:, None] >= 4) & (y[:, None] <= 8))
    np.testing.assert_allclose(u, np.where(seg, us + 2, us))
    np.testing.assert_allclose(np.asarray(p.y0[1]),
                               np.where(seg, vs + 1.5, vs))


def test_fhn_torus_ic_wave_outside_wraps_seam():
    """waveInside=0: the segment straddles theta=0 via the OR condition
    (src/FHNmodel_torus.cpp:333)."""
    cfg = _cfg(surface="torus", wave_inside=0, wave_width=0.25,
               wave_length=0.1, surface_width=20, surface_length=80, x_mesh=32)
    p = build_problem(cfg)
    u = np.asarray(p.y0[0])
    us, _ = p.steady_state
    y = cfg.ymin + np.arange(cfg.ny) * cfg.dy
    j_in = np.where((y >= 0.1 * 2 * np.pi) & (y <= 0.2 * 2 * np.pi))[0][0]
    # theta=0 column (i=0) is inside the wrapped segment
    assert u[j_in, 0] == us + 2
    # theta=pi column is outside
    i_pi = cfg.nx // 2
    assert u[j_in, i_pi] == us


def test_fhn_torus_ic_wave_inside():
    cfg = _cfg(surface="torus", wave_inside=1, wave_width=0.25,
               wave_length=0.1, x_mesh=33, surface_length=80)
    p = build_problem(cfg)
    u = np.asarray(p.y0[0])
    us, _ = p.steady_state
    y = cfg.ymin + np.arange(cfg.ny) * cfg.dy
    j_in = np.where((y >= 0.1 * 2 * np.pi) & (y <= 0.2 * 2 * np.pi))[0][0]
    x = cfg.xmin + np.arange(cfg.nx) * cfg.dx
    i_pi = int(np.argmin(np.abs(x - np.pi)))
    assert u[j_in, i_pi] == us + 2
    assert u[j_in, 0] == us


def test_fhn_varybeta_ic_all_ones():
    cfg = _cfg(vary_beta=1, beta_min=0.7, beta_max=1.7)
    p = build_problem(cfg)
    np.testing.assert_allclose(np.asarray(p.y0), 1.0)


def test_goldbeter_ic_types():
    base = dict(model="goldbeter", surface="flat", x_mesh=12,
                surface_width=20, surface_length=40, beta=0.4,
                vary_beta=1, beta_min=0.0, beta_max=1.0, dtype="float64")
    p0 = build_problem(SimConfig(**base, ic_type=0))
    np.testing.assert_allclose(np.asarray(p0.y0[0]), 0.4)
    np.testing.assert_allclose(np.asarray(p0.y0[1]), 1.6)

    p1 = build_problem(SimConfig(**base, ic_type=1, wave_width=0.5,
                                 wave_length=0.1))
    u = np.asarray(p1.y0[0])
    vals = np.unique(u)
    assert len(vals) == 2
    np.testing.assert_allclose(vals, [0.4, 1.4], rtol=1e-12)

    p2 = build_problem(SimConfig(**base, ic_type=2, rng_seed=7))
    u2 = np.asarray(p2.y0)
    assert u2.min() >= 0.0 and u2.max() <= 1.4
    # reproducible with the same seed, different with another
    p2b = build_problem(SimConfig(**base, ic_type=2, rng_seed=7))
    np.testing.assert_array_equal(u2, np.asarray(p2b.y0))
    p2c = build_problem(SimConfig(**base, ic_type=2, rng_seed=8))
    assert not np.array_equal(u2, np.asarray(p2c.y0))


def test_goldbeter_flat_segment_rows():
    """flat varyBeta=0 segment sits in y in [2wl, 3wl]
    (src/GoldbeterModel_flat.cpp:328) while torus uses [wl, 2wl]."""
    cfgf = SimConfig(model="goldbeter", surface="flat", x_mesh=16,
                     surface_width=20, surface_length=40, beta=0.85,
                     wave_length=0.1, wave_width=0.5, dtype="float64")
    pf = build_problem(cfgf)
    zf = np.asarray(pf.y0[0])
    zs, _ = pf.steady_state
    rows = np.where((zf > zs + 0.5).any(axis=1))[0]
    y = cfgf.ymin + rows * cfgf.dy
    assert y.min() >= 2 * 0.1 * 40 - cfgf.dy
    assert y.max() <= 3 * 0.1 * 40 + cfgf.dy


def test_beta_ramp_field():
    cfg = _cfg(vary_beta=1, beta_min=0.7, beta_max=1.7)
    b = np.asarray(beta_field(cfg, jnp.float64))
    assert b.shape == (cfg.ny, 1)
    assert np.isclose(b[0, 0], 0.7)
    y_last = (cfg.ny - 1) * cfg.dy
    assert np.isclose(b[-1, 0], 0.7 + y_last * 1.0 / cfg.ymax)


def test_boundary_freeze():
    cfg = _cfg(t_boundary=5.0, beta=1.25)
    p = build_problem(cfg)
    # perturb so rhs is nonzero everywhere
    y = p.y0 + 0.3
    dot_before = np.asarray(p.rhs(jnp.asarray(1.0), y, p.params))
    dot_after = np.asarray(p.rhs(jnp.asarray(6.0), y, p.params))
    # frozen rows (global 0 and ny-1) before tBoundary, live after
    assert np.all(dot_before[:, 0, :] == 0)
    assert np.all(dot_before[:, -1, :] == 0)
    assert np.any(dot_before[:, 1, :] != 0)
    assert np.any(dot_after[:, 0, :] != 0)
    assert np.any(dot_after[:, -1, :] != 0)


def test_just_diffusion_rhs():
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=12,
                    surface_width=20, surface_length=40, just_diffusion=1,
                    t_boundary=5.0, dtype="float64")
    p = build_problem(cfg)
    # random field so the Laplacian is nonzero on every row (y0's background
    # is spatially constant away from the wave segment)
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.standard_normal(p.y0.shape))
    dot = np.asarray(p.rhs(jnp.asarray(1.0), y, p.params))
    # variable 1 must be identically zero (no reaction, no diffusion on var 1)
    np.testing.assert_allclose(dot[1], 0.0)
    # freeze must NOT apply (reaction block skipped entirely,
    # src/GoldbeterModel_torus.cpp:668): rows 0/ny-1 follow diffusion
    assert np.any(dot[0, 0, :] != 0)


def test_diffusion_only_on_var0():
    """Variable 1 receives no diffusion term: a state where u is constant but
    v varies spatially must give spatially-constant dv (reaction only)."""
    cfg = _cfg(beta=1.25, t_boundary=0.0)
    p = build_problem(cfg)
    u = jnp.full((cfg.ny, cfg.nx), 0.5, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((cfg.ny, cfg.nx)))
    y = jnp.stack([u, v])
    dot = np.asarray(p.rhs(jnp.asarray(0.0), y, p.params))
    # du = 3u-u^3-v + 0 (u constant -> zero Laplacian)
    np.testing.assert_allclose(dot[0], 3 * 0.5 - 0.5**3 - np.asarray(v),
                               atol=1e-12)
    # dv = eps(u+b) is spatially constant (u, b constant)
    assert np.ptp(dot[1]) < 1e-12
