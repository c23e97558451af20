"""Anisotropic tensor diffusion on the CURVED torus metric (round 5 —
VERDICT r4 item 7, beyond-reference): the conservative self-adjoint
tensor operator in the ring row weight (grid.py::TorusGeometry.
tensor_coeffs64 — physical orthonormal-frame components, metric-weighted
face fluxes, (nx,) mixed-weight profile 1/(4 dx dy r ring)).

Oracles: exact ring-weighted conservation + self-adjointness for random
SPD fields, bitwise reduction to the scalar divergence operator, the
R -> infinity flat limit, and single-vs-sharded equivalence at f64.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import make_geometry
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.ops.stencil import anisotropic_laplacian
from crdmodel_tpu.sim import simulate


def _cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=24, surface_width=20,
                surface_length=60, beta=1.25, t_final=0.5,
                output_timestep=1, dtype="float64", rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def _random_spd(shape, rng, margin=0.8):
    dxx = 0.1 + rng.random(shape)
    dyy = 0.1 + rng.random(shape)
    dxy = margin * np.sqrt(dxx * dyy) * (2 * rng.random(shape) - 1)
    return dxx, dyy, dxy


def _op(geo, tensor):
    faces, dxy_f, inv4 = geo.tensor_coeffs64(*tensor)
    fj = tuple(jnp.asarray(a) for a in faces)
    return lambda u: np.asarray(anisotropic_laplacian(
        jnp.asarray(u), fj, jnp.asarray(dxy_f), jnp.asarray(inv4)))


def test_ring_weighted_conservation_and_self_adjointness():
    cfg = _cfg()
    geo = make_geometry(cfg)
    rng = np.random.default_rng(0)
    L = _op(geo, _random_spd((cfg.ny, cfg.nx), rng))
    ring = geo.row_weights()
    u = rng.standard_normal((cfg.ny, cfg.nx))
    v = rng.standard_normal((cfg.ny, cfg.nx))
    scale = np.abs(ring * L(u)).max()
    assert abs((ring * L(u)).sum()) < 1e-11 * scale * u.size ** 0.5
    lhs = (ring * v * L(u)).sum()
    rhs = (ring * u * L(v)).sum()
    assert abs(lhs - rhs) < 1e-11 * max(abs(lhs), 1.0)


def test_scalar_reduction_bitwise():
    """Dxx == Dyy == D (constant), Dxy == 0: the face coefficients equal
    the scalar divergence_coeffs64 faces BITWISE, and the mixed term
    multiplies an exactly-zero field."""
    cfg = _cfg()
    geo = make_geometry(cfg)
    D = 0.37
    faces_t, dxy_f, _ = geo.tensor_coeffs64(D, D, 0.0)
    faces_d = geo.divergence_coeffs64(np.float64(D))
    for a, b in zip(faces_d, faces_t):
        np.testing.assert_array_equal(
            np.broadcast_to(a, (cfg.ny, cfg.nx)),
            np.broadcast_to(b, (cfg.ny, cfg.nx)))
    assert np.all(dxy_f == 0.0)


def test_flat_limit():
    """R/r -> infinity: ring -> R, and the torus tensor operator matches
    the flat tensor operator on the grid with spacings (r dx, R dy)."""
    cfg = _cfg(surface_width=20, surface_length=20000 * np.pi)
    geo = make_geometry(cfg)
    assert geo.R / geo.r > 1e3
    rng = np.random.default_rng(5)
    tensor = _random_spd((cfg.ny, cfg.nx), rng)
    Lt = _op(geo, tensor)
    # flat comparison operator with physical spacings dx' = r dx, dy' = R dy
    from crdmodel_tpu.core.grid import FlatGeometry, Grid
    g = geo.grid
    gf = Grid(nx=g.nx, ny=g.ny, xmin=0.0,
              xmax=geo.r * g.dx * (g.nx - 1.0),
              ymin=0.0, ymax=geo.R * g.dy * (g.ny - 1.0))
    Lf = _op(FlatGeometry(grid=gf, diffusion=cfg.diffusion), tensor)
    u = rng.standard_normal((cfg.ny, cfg.nx))
    tu, fu = Lt(u), Lf(u)
    np.testing.assert_allclose(tu, fu, rtol=0,
                               atol=5e-3 * np.abs(fu).max())


def test_sharded_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded
    cfg = _cfg()
    rng = np.random.default_rng(3)
    tensor = _random_spd((cfg.ny, cfg.nx), rng)
    p1 = build_problem(cfg, diffusion_tensor=tensor)
    r1 = simulate(cfg, problem=p1)
    p8 = build_problem(cfg, diffusion_tensor=tensor)
    r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)), problem=p8)
    assert r1.ok and r8.ok
    np.testing.assert_allclose(np.asarray(r8.trajectory),
                               np.asarray(r1.trajectory),
                               rtol=0, atol=1e-12)
    assert np.array_equal(np.asarray(r8.stats.steps),
                          np.asarray(r1.stats.steps))


@pytest.mark.parametrize("method", ["rkc2", "ark324"])
def test_stiff_methods_curved_tensor(method):
    cfg = _cfg(method=method)
    tensor = (0.3, 0.06, 0.08)
    res = simulate(cfg, problem=build_problem(cfg, diffusion_tensor=tensor))
    assert res.ok
    ref = simulate(cfg_b := dataclasses.replace(cfg, method="bs32"),
                   problem=build_problem(cfg_b, diffusion_tensor=tensor))
    np.testing.assert_allclose(np.asarray(res.trajectory[-1]),
                               np.asarray(ref.trajectory[-1]),
                               rtol=2e-3, atol=2e-4)


def test_validation():
    cfg = _cfg()
    with pytest.raises(ValueError, match="SPD"):
        build_problem(cfg, diffusion_tensor=(0.1, 0.1, 0.2))
    geo = make_geometry(cfg)
    with pytest.raises(ValueError, match="closed"):
        geo.tensor_coeffs64(0.1, 0.1, 0.0, boundary="noflux")
    # pole coarsening assumes ring-constant phi coefficients: tensors
    # reject loudly
    cfg_s = SimConfig(model="fhn", surface="sphere", x_mesh=48,
                      dtype="float64", diffusion=0.12, surface_length=80.0,
                      t_final=0.3, output_timestep=1, pole_coarsen=1)
    with pytest.raises(ValueError, match="pole_coarsen"):
        build_problem(cfg_s, diffusion_tensor=(0.1, 0.1, 0.0))


def test_fused_shard_aniso_curved_matches_xla():
    """Round 5: the curved torus tensor runs FUSED on the windowed-
    coefficient shard kernel — the (nx,) mixed-weight profile streams as
    a lane input applied OUTSIDE the centred differences (folding it
    into the Dxy field would be wrong for a varying weight)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_aniso,
        sharded_params, simulate_sharded)
    cfg = _cfg(x_mesh=64, surface_width=20, surface_length=40,
               t_final=0.5, dtype="float32", rtol=1e-4, atol=1e-6,
               use_pallas=True)
    rng = np.random.default_rng(7)
    tensor = _random_spd((cfg.ny, cfg.nx), rng, margin=0.7)
    mesh = make_mesh(shape=(2, 2))
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    assert maybe_fused_shard_aniso(p_k, mesh, interpret=True) is not None
    params, _ = sharded_params(p_k)
    run_k, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tk, sk = run_k(p_k.y0, params)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
    tx = np.asarray(r_x.trajectory)[1:]
    assert np.all(np.asarray(sk.status) == 0)
    assert np.array_equal(np.asarray(sk.steps),
                          np.asarray(r_x.stats.steps))
    np.testing.assert_allclose(np.asarray(tk), tx, rtol=0, atol=2e-5)


# ---------------------------------------------------------------------------
# Generic surfaces of revolution (late round 5): the same construction on
# the SAMPLED metric profiles (RevolutionGeometry.tensor_coeffs64) — the
# torus profile reproduces TorusGeometry bitwise-to-metric-accuracy, and
# the capped sphere gets fiber tensors with the noflux_x-style cap layers.
# ---------------------------------------------------------------------------


def _sphere_cfg(**kw):
    base = dict(model="fhn", surface="sphere", x_mesh=48, dtype="float64",
                diffusion=0.12, surface_length=80.0, t_final=0.3,
                output_timestep=1, rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def test_revolution_torus_profile_matches_torus_geometry():
    """RevolutionGeometry with the torus profile + analytic derivatives
    reproduces TorusGeometry.tensor_coeffs64 to rounding."""
    from crdmodel_tpu.core.grid import RevolutionGeometry
    cfg = _cfg(t_final=0.3)
    geot = make_geometry(cfg)
    R, r = geot.R, geot.r
    geor = RevolutionGeometry.from_profile(
        geot.grid, cfg.diffusion,
        rho=lambda v: R + r * np.cos(v), z=lambda v: r * np.sin(v),
        derivs=(lambda v: -r * np.sin(v), lambda v: r * np.cos(v)))
    rng = np.random.default_rng(3)
    tensor = _random_spd((cfg.ny, cfg.nx), rng)
    ft, mt, it_ = geot.tensor_coeffs64(*tensor)
    fr, mr, ir_ = geor.tensor_coeffs64(*tensor)
    for a, b in zip(ft, fr):
        np.testing.assert_allclose(b, a, rtol=1e-13)
    np.testing.assert_allclose(ir_, it_, rtol=1e-13)
    np.testing.assert_array_equal(mr, mt)


def test_sphere_tensor_structure_and_equivalence():
    """Capped sphere: w-weighted conservation + self-adjointness of the
    fiber-tensor operator, cap layers zeroing the mixed field, and
    single-vs-sharded equivalence with equal step counts."""
    cfg = _sphere_cfg()
    geo = make_geometry(cfg)
    rng = np.random.default_rng(11)
    tensor = _random_spd((cfg.ny, cfg.nx), rng, margin=0.6)
    faces, dxy_f, inv4 = geo.tensor_coeffs64(*tensor)
    assert np.all(dxy_f[..., 0] == 0.0) and np.all(dxy_f[..., -1] == 0.0)
    fj = tuple(jnp.asarray(a) for a in faces)
    L = lambda u: np.asarray(anisotropic_laplacian(
        jnp.asarray(u), fj, jnp.asarray(dxy_f), jnp.asarray(inv4)))
    w = geo.row_weights()
    u = rng.standard_normal((cfg.ny, cfg.nx))
    v = rng.standard_normal((cfg.ny, cfg.nx))
    scale = np.abs(w * L(u)).max()
    assert abs((w * L(u)).sum()) < 1e-11 * scale * u.size ** 0.5
    lhs = (w * v * L(u)).sum()
    rhs = (w * u * L(v)).sum()
    assert abs(lhs - rhs) < 1e-11 * max(abs(lhs), 1.0)

    if len(jax.devices()) >= 4:
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        p1 = build_problem(cfg, diffusion_tensor=tensor)
        r1 = simulate(cfg, problem=p1)
        p4 = build_problem(cfg, diffusion_tensor=tensor)
        r4 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 2)),
                              problem=p4)
        assert r1.ok and r4.ok
        np.testing.assert_allclose(np.asarray(r4.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=0, atol=1e-12)
        assert np.array_equal(np.asarray(r4.stats.steps),
                              np.asarray(r1.stats.steps))


def test_fused_shard_aniso_sphere_matches_xla():
    """The sphere fiber tensor runs FUSED on the shard aniso kernel (the
    streamed inv4 profile is geometry-agnostic)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_aniso,
        sharded_params, simulate_sharded)
    cfg = _sphere_cfg(x_mesh=64, dtype="float32", rtol=1e-4, atol=1e-6,
                      t_final=0.2, use_pallas=True)
    rng = np.random.default_rng(9)
    tensor = _random_spd((cfg.ny, cfg.nx), rng, margin=0.6)
    mesh = make_mesh(shape=(2, 2))
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    assert maybe_fused_shard_aniso(p_k, mesh, interpret=True) is not None
    params, _ = sharded_params(p_k)
    run_k, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tk, sk = run_k(p_k.y0, params)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
    assert np.all(np.asarray(sk.status) == 0)
    assert np.array_equal(np.asarray(sk.steps),
                          np.asarray(r_x.stats.steps))
    np.testing.assert_allclose(np.asarray(tk),
                               np.asarray(r_x.trajectory)[1:],
                               rtol=0, atol=2e-5)
