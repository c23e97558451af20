"""3-D anisotropic tensor diffusion div(D grad u) on the periodic box,
D the full SPD 3x3 field (Dxx, Dyy, Dzz, Dxy, Dxz, Dyz).

Beyond-reference capability (the reference is 2-D isotropic-only,
src/FHNmodel_flat.cpp:489-566): volumetric fiber anisotropy — the
cardiac-tissue configuration where conduction along the myofiber axis
exceeds cross-fiber conduction severalfold and the fiber direction
rotates transmurally — via the conservative 19-point operator
(grid.py::BoxGeometry.tensor_coeffs64 +
ops/stencil.py::anisotropic_laplacian3).

Oracles mirror the 2-D suite (tests/test_anisotropic.py):
  * exact discrete symbol on plane waves (constant tensor)
  * conservation (1^T L u = 0) and self-adjointness (<v,Lu> = <Lv,u>)
    to rounding for ARBITRARY SPD tensor fields
  * second-moment growth: under pure diffusion d/dt Cov = 2 D exactly —
    all SIX entries, including the signs of the three mixed ones
  * rotated-isotropic tensor reduces to the scalar 7-point operator
  * sharded (2x2 ppermute-halo, z mesh-local) == single device — the xy
    mixed pair reads CORNER halo cells, the xz/yz pairs mix face halos
    with local z rolls
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import make_geometry
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.ops.stencil import (anisotropic_laplacian3,
                                      divergence_laplacian3)
from crdmodel_tpu.sim import simulate

CONST6 = (0.20, 0.10, 0.05, 0.04, 0.03, 0.02)   # SPD (det ~ 8e-4)


def _cfg(**kw):
    base = dict(model="fhn", surface="box", x_mesh=24, y_mesh=24, z_mesh=8,
                surface_width=20, surface_length=20, surface_depth=8,
                t_final=1.0, output_timestep=2, beta=1.25, dtype="float64",
                rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def _op(cfg, tensor):
    geo = make_geometry(cfg)
    face, mixed, invs = geo.tensor_coeffs64(*tensor)
    face = tuple(jnp.asarray(a) for a in face)
    mixed = tuple(jnp.asarray(a) for a in mixed)
    return lambda u: np.asarray(
        anisotropic_laplacian3(jnp.asarray(u), face, mixed, invs)), geo


def _random_spd3(shape, rng):
    """Pointwise-SPD 3x3 tensor field via D = A A^T + 0.05 I."""
    A = rng.standard_normal(shape + (3, 3)) * 0.3
    D = np.einsum("...ik,...jk->...ij", A, A)
    D[..., 0, 0] += 0.05
    D[..., 1, 1] += 0.05
    D[..., 2, 2] += 0.05
    return (D[..., 0, 0], D[..., 1, 1], D[..., 2, 2],
            D[..., 0, 1], D[..., 0, 2], D[..., 1, 2])


def test_conservation_and_symmetry_random_field():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    shape = (cfg.nz, cfg.ny, cfg.nx)
    L, _ = _op(cfg, _random_spd3(shape, rng))
    u = rng.standard_normal(shape)
    v = rng.standard_normal(shape)
    Lu, Lv = L(u), L(v)
    scale = np.abs(Lu).max()
    assert abs(Lu.sum()) < 1e-11 * scale * u.size ** 0.5
    assert np.isclose(np.vdot(v, Lu), np.vdot(u, Lv),
                      rtol=1e-12, atol=1e-9 * scale)


def test_plane_wave_symbol_constant_tensor():
    cfg = _cfg()
    dxx, dyy, dzz, dxy, dxz, dyz = CONST6
    L, geo = _op(cfg, CONST6)
    g = geo.grid
    mx, my, mz = 3, 2, 1
    kx = 2 * np.pi * mx / (g.nx * g.dx)
    ky = 2 * np.pi * my / (g.ny * g.dy)
    kz = 2 * np.pi * mz / (g.nz * g.dz)
    x = np.arange(g.nx) * g.dx
    y = np.arange(g.ny) * g.dy
    z = np.arange(g.nz) * g.dz
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    lam = -(4 * dxx * np.sin(kx * g.dx / 2) ** 2 / g.dx ** 2
            + 4 * dyy * np.sin(ky * g.dy / 2) ** 2 / g.dy ** 2
            + 4 * dzz * np.sin(kz * g.dz / 2) ** 2 / g.dz ** 2
            + 2 * dxy * np.sin(kx * g.dx) * np.sin(ky * g.dy)
            / (g.dx * g.dy)
            + 2 * dxz * np.sin(kx * g.dx) * np.sin(kz * g.dz)
            / (g.dx * g.dz)
            + 2 * dyz * np.sin(ky * g.dy) * np.sin(kz * g.dz)
            / (g.dy * g.dz))
    ph = kx * X + ky * Y + kz * Z
    for u in (np.cos(ph), np.sin(ph)):
        np.testing.assert_allclose(L(u), lam * u, rtol=0,
                                   atol=1e-12 * abs(lam))


def test_rotated_isotropic_reduces_to_scalar():
    # R diag(d,d,d) R^T == d*I for any rotation: the 19-point operator
    # with zero mixed entries must equal the constant-D 7-point form
    cfg = _cfg()
    d = 0.17
    L, geo = _op(cfg, (d, d, d, 0.0, 0.0, 0.0))
    rng = np.random.default_rng(1)
    u = rng.standard_normal((cfg.nz, cfg.ny, cfg.nx))
    faces = geo.divergence_coeffs64(np.float64(d))
    ref7 = np.asarray(divergence_laplacian3(
        jnp.asarray(u), tuple(jnp.asarray(a) for a in faces)))
    np.testing.assert_allclose(L(u), ref7, rtol=0, atol=1e-12)


def test_second_moment_growth_all_six_entries():
    # pure diffusion of a 3-D Gaussian blob: d/dt Cov = 2 D exactly —
    # the one oracle that pins every tensor entry INCLUDING the three
    # mixed signs through the full adaptive driver
    dxx, dyy, dzz, dxy, dxz, dyz = CONST6
    cfg = _cfg(just_diffusion=1, t_final=2.0, output_timestep=2,
               x_mesh=32, y_mesh=32, z_mesh=32, surface_depth=20)
    problem = build_problem(cfg, diffusion_tensor=CONST6)
    g = problem.grid
    x = np.arange(g.nx) * g.dx
    y = np.arange(g.ny) * g.dy
    z = np.arange(g.nz) * g.dz
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    xc = x[g.nx // 2]
    yc = y[g.ny // 2]
    zc = z[g.nz // 2]
    blob = np.exp(-((X - xc) ** 2 + (Y - yc) ** 2 + (Z - zc) ** 2)
                  / (2 * 1.5 ** 2))
    bg = float(problem.steady_state[0])
    y0 = np.asarray(problem.y0).copy()
    y0[0] = bg + blob
    problem = dataclasses.replace(problem, y0=jnp.asarray(y0))
    res = simulate(cfg, problem=problem)
    assert res.ok

    def cov(u):
        w = np.asarray(u, np.float64) - bg
        kc, jc, ic = np.unravel_index(np.argmax(w), w.shape)
        w = np.roll(w, cfg.nz // 2 - kc, axis=0)
        w = np.roll(w, cfg.ny // 2 - jc, axis=1)
        w = np.roll(w, cfg.nx // 2 - ic, axis=2)
        w = w / w.sum()
        mx_ = (w * X).sum()
        my_ = (w * Y).sum()
        mz_ = (w * Z).sum()
        dX, dY, dZ = X - mx_, Y - my_, Z - mz_
        return np.array([(w * dX * dX).sum(), (w * dY * dY).sum(),
                         (w * dZ * dZ).sum(), (w * dX * dY).sum(),
                         (w * dX * dZ).sum(), (w * dY * dZ).sum()])

    u1 = np.asarray(res.trajectory[1, 0])
    u2 = np.asarray(res.trajectory[2, 0])
    dt = float(res.touts[2] - res.touts[1])
    got = (cov(u2) - cov(u1)) / dt
    want = 2.0 * np.array(CONST6)
    np.testing.assert_allclose(got, want, rtol=0.05)


def test_sharded_matches_single_device_full_tensor_field():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded

    cfg = _cfg(t_final=0.5)
    rng = np.random.default_rng(2)
    tensor = _random_spd3((cfg.nz, cfg.ny, cfg.nx), rng)
    problem = build_problem(cfg, diffusion_tensor=tensor)
    ref = simulate(cfg, problem=problem)
    res = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 2)),
                           problem=problem)
    assert ref.ok and res.ok
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(ref.trajectory),
                               rtol=0, atol=1e-12)
    assert np.array_equal(np.asarray(res.stats.steps),
                          np.asarray(ref.stats.steps))


def test_sharded_fused_kernels_decline_tensor():
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (maybe_fused_shard_box3d,
                                               maybe_fused_shard_rkc)

    mesh = make_mesh(shape=(2, 2))
    cfg = _cfg(dtype="float32", use_pallas=True, x_mesh=32, y_mesh=64,
               z_mesh=8)
    p = build_problem(cfg, diffusion_tensor=CONST6)
    assert maybe_fused_shard_box3d(p, mesh, interpret=True) is None
    cfg_r = dataclasses.replace(cfg, method="rkc2")
    p_r = build_problem(cfg_r, diffusion_tensor=CONST6)
    assert maybe_fused_shard_rkc(p_r, mesh, None, interpret=True) is None


@pytest.mark.parametrize("method", ["rkc2", "ark324"])
def test_stiff_methods_with_tensor(method):
    cfg = _cfg(method=method, t_final=0.5)
    problem = build_problem(cfg, diffusion_tensor=CONST6)
    res = simulate(cfg, problem=problem)
    assert res.ok
    ref = simulate(cfg_b := dataclasses.replace(cfg, method="bs32"),
                   problem=build_problem(cfg_b, diffusion_tensor=CONST6))
    np.testing.assert_allclose(np.asarray(res.trajectory[-1]),
                               np.asarray(ref.trajectory[-1]),
                               rtol=2e-3, atol=2e-4)


def test_validation_errors():
    cfg = _cfg()
    # not SPD: Dxy^2 > Dxx*Dyy violates the second Sylvester minor
    with pytest.raises(ValueError, match="SPD"):
        build_problem(cfg, diffusion_tensor=(0.1, 0.1, 0.1,
                                             0.2, 0.0, 0.0))
    with pytest.raises(ValueError, match="Dxx, Dyy, Dzz"):
        build_problem(cfg, diffusion_tensor=(0.1, 0.1, 0.0))
    flat = SimConfig(model="fhn", surface="flat", x_mesh=24,
                     surface_width=20, surface_length=20, t_final=1.0,
                     output_timestep=2, beta=1.25, dtype="float64")
    with pytest.raises(ValueError, match="Dxx, Dyy, Dxy"):
        build_problem(flat, diffusion_tensor=CONST6)
    with pytest.raises(ValueError, match="unsupported"):
        build_problem(_cfg(boundary="noflux"), diffusion_tensor=CONST6)
