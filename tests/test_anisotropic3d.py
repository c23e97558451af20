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
    # round 4: no-flux DOMAIN boundaries now compose with the tensor
    # (grid.py::tensor_coeffs64 boundary masking); obstacles still don't
    p = build_problem(_cfg(boundary="noflux"), diffusion_tensor=CONST6)
    assert p.diffusion_tensor is not None
    with pytest.raises(ValueError, match="obstacle_mask is unsupported"):
        mask = np.ones((_cfg().nz, _cfg().ny, _cfg().nx), bool)
        mask[1, 2, 3] = False
        build_problem(_cfg(), diffusion_tensor=CONST6, obstacle_mask=mask)


# ---------------------------------------------------------------------------
# No-flux walls for the tensor operator (round 4): grid.py::tensor_coeffs64
# boundary masking — zero diagonal faces at closed walls, mixed fields
# zeroed on the wall-adjacent layers of each closed axis. Structural
# guarantees (conservation + self-adjointness) must survive the masking.
# ---------------------------------------------------------------------------

def _op_b(cfg, tensor, boundary):
    geo = make_geometry(cfg)
    face, mixed, invs = geo.tensor_coeffs64(*tensor, boundary=boundary)
    face = tuple(jnp.asarray(a) for a in face)
    mixed = tuple(jnp.asarray(a) for a in mixed)
    return lambda u: np.asarray(
        anisotropic_laplacian3(jnp.asarray(u), face, mixed, invs))


@pytest.mark.parametrize("boundary", ["noflux_z", "noflux"])
def test_noflux_tensor_conservative_and_self_adjoint(boundary):
    cfg = _cfg()
    rng = np.random.default_rng(8)
    tensor = _random_spd3((cfg.nz, cfg.ny, cfg.nx), rng)
    L = _op_b(cfg, tensor, boundary)
    u = rng.standard_normal((cfg.nz, cfg.ny, cfg.nx))
    v = rng.standard_normal((cfg.nz, cfg.ny, cfg.nx))
    scale = np.abs(L(u)).max() * u.size
    assert abs(L(u).sum()) < 1e-12 * scale
    assert abs(np.vdot(v, L(u)) - np.vdot(L(v), u)) < 1e-12 * scale


def test_noflux_z_tensor_no_wall_leakage():
    """With closed z, mass stays exactly conserved and nothing couples
    through the wall: a field living only at z=0 must not pick up any
    contribution at z=nz-1 through the wrap (compare against periodic,
    which does wrap)."""
    cfg = _cfg()
    rng = np.random.default_rng(9)
    tensor = _random_spd3((cfg.nz, cfg.ny, cfg.nx), rng)
    u = np.zeros((cfg.nz, cfg.ny, cfg.nx))
    u[0] = rng.standard_normal((cfg.ny, cfg.nx))
    closed = _op_b(cfg, tensor, "noflux_z")(u)
    periodic = _op_b(cfg, tensor, "periodic")(u)
    assert np.all(closed[-1] == 0.0)       # no coupling through the wall
    assert np.abs(periodic[-1]).max() > 0  # periodic does couple


def _transmural_tensor(cfg, with_z_coupling=True):
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    z = np.linspace(0, 1, nz)[:, None, None] * np.ones((nz, ny, nx))
    th = (z - 0.5) * np.pi / 3
    dpar, dperp, dtrans = 0.3, 0.08, 0.02
    c, s_ = np.cos(th), np.sin(th)
    dxz = dyz = np.zeros_like(c)
    if with_z_coupling:
        dxz = np.where((z > 0.2) & (z < 0.8), 0.01, 0.0)
        dyz = np.where((z > 0.2) & (z < 0.8), -0.008, 0.0)
    return (dpar * c * c + dperp * s_ * s_, dpar * s_ * s_ + dperp * c * c,
            np.full_like(c, dtrans), (dpar - dperp) * c * s_, dxz, dyz)


def _tensor_cfg(**kw):
    base = dict(model="aliev_panfilov", surface="box", x_mesh=24,
                surface_width=10.0, surface_length=12.0, y_mesh=32,
                surface_depth=3.0, z_mesh=8, t_final=0.5, output_timestep=1,
                beta=0.05, dtype="float32", rtol=1e-4, atol=1e-7,
                boundary="noflux_z", use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


# ---------------------------------------------------------------------------
# Fused 19-point tensor kernels (VERDICT r3 #2): the z-streaming box kernels'
# tensor mode — six streamed coefficient fields (3 faces + 3 mixed), mixed
# pairs in exactly the XLA association. Interpreter-mode equivalence.
# ---------------------------------------------------------------------------

class TestFusedTensorKernels:
    @pytest.mark.parametrize("method", ["bs32", "rkc2"])
    def test_single_chip_matches_xla(self, method):
        from crdmodel_tpu.sim import make_run_fn
        cfg = _tensor_cfg(method=method)
        tensor = _transmural_tensor(cfg)
        p_k = build_problem(cfg, diffusion_tensor=tensor)
        from crdmodel_tpu.ops import pallas_box3d, pallas_box3d_rkc
        if method == "bs32":
            from crdmodel_tpu.integrate.erk import TABLEAUS
            assert pallas_box3d._box_mode(p_k)[0] == "tensor"
            assert pallas_box3d.is_box3d_supported(p_k, TABLEAUS["bs32"],
                                                   jnp.float32)
        else:
            assert pallas_box3d_rkc.is_box3d_rkc_supported(p_k, jnp.float32)
        run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
        tk, sk = run_k(p_k.y0, p_k.params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, diffusion_tensor=tensor)
        run_x = jax.jit(make_run_fn(p_x)[0])
        tx, sx = run_x(p_x.y0, p_x.params)
        assert np.array_equal(np.asarray(sk.steps), np.asarray(sx.steps))
        assert np.all(np.asarray(sk.status) == 0)
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=2e-5)

    def test_periodic_z_declines(self):
        """Open z walls: the z-streaming clamp would be wrong — XLA path."""
        from crdmodel_tpu.ops import pallas_box3d
        cfg = _tensor_cfg(boundary="periodic")
        p = build_problem(cfg, diffusion_tensor=_transmural_tensor(cfg))
        assert pallas_box3d._box_mode(p)[0] is None

    @pytest.mark.parametrize("method", ["bs32", "rkc2"])
    def test_sharded_matches_xla(self, method):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_box3d,
            sharded_params)
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = _tensor_cfg(method=method, x_mesh=32, surface_length=10.0,
                          y_mesh=32)
        tensor = _transmural_tensor(cfg)
        mesh = make_mesh(shape=(2, 2))
        p_k = build_problem(cfg, diffusion_tensor=tensor)
        if method == "bs32":
            assert maybe_fused_shard_box3d(p_k, mesh,
                                           interpret=True) is not None
        params, _ = sharded_params(p_k)
        run_f, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tf, sf = run_f(p_k.y0, params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, diffusion_tensor=tensor)
        run_x, _ = make_sharded_simulation_fn(p_x, mesh)
        tx, sx = run_x(p_x.y0, sharded_params(p_x)[0])
        assert np.array_equal(np.asarray(sf.steps), np.asarray(sx.steps))
        # a nonzero difference proves the fused path actually ran (an
        # XLA-vs-XLA pair would be bitwise identical)
        d = np.abs(np.asarray(tf) - np.asarray(tx)).max()
        assert 0 < d < 2e-5
