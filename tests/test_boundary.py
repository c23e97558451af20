"""No-flux (reflecting/Neumann) boundaries and internal obstacle walls.

Beyond-reference capability (the reference is periodic-only — its flat
programs wrap both axes, src/FHNmodel_flat.cpp:489-566 with MPI
periods={1,1}): cfg.boundary closes domain edges and
build_problem(obstacle_mask=...) carves inert walls, both implemented as
zeroed divergence-form face coefficients (core/grid.py::face_openness) —
exactly conservative, self-adjoint, and shard-transparent (halo/wrap
values at closed faces are multiplied by zero, so no halo changes exist
to get wrong).

Oracles:
  * exact discrete eigenfunctions: the zero-flux finite-volume operator's
    x-eigenvectors are cos(k*pi*(i+1/2)/nx) with eigenvalue
    -(4D/dx^2) sin^2(k*pi/(2nx)) (DCT-II basis) — pinned to rounding
  * exact conservation on random fields, per-region for obstacle-isolated
    subdomains, ring-weighted on the torus
  * end-to-end decay of an eigenmode through the adaptive driver against
    the exact exponential
  * sharded == single-device bitwise step sequences (even + uneven grids)
  * obstacle cells hold their IC exactly through a full run
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import face_openness, make_geometry
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate


def flat_cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=16, surface_width=20.0,
                surface_length=40.0, t_final=1.0, output_timestep=2,
                beta=1.25, dtype="float64", rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def rhs_diff(problem, u):
    """Apply the problem RHS to (u, 0) in justDiffusion-style isolation."""
    state = jnp.stack([jnp.asarray(u)]
                      + [jnp.zeros_like(jnp.asarray(u))]
                      * (problem.model.nvars - 1))
    return np.asarray(problem.rhs(0.0, state, problem.params))[0]


class TestValidation:
    def test_bad_boundary_string(self):
        with pytest.raises(ValueError, match="boundary"):
            flat_cfg(boundary="dirichlet").validate()

    def test_noflux_needs_flat(self):
        cfg = dataclasses.replace(flat_cfg(boundary="noflux"),
                                  surface="torus")
        with pytest.raises(ValueError, match="closed"):
            cfg.validate()

    def test_all_false_obstacle(self):
        cfg = flat_cfg()
        with pytest.raises(ValueError, match="no tissue"):
            build_problem(cfg, obstacle_mask=np.zeros(
                (cfg.ny, cfg.nx), bool))

    def test_obstacle_shape_mismatch(self):
        cfg = flat_cfg()
        with pytest.raises(ValueError, match="broadcast"):
            build_problem(cfg, obstacle_mask=np.ones((3, 5), bool))

    def test_tensor_boundary_composes(self):
        # round 4: no-flux DOMAIN walls compose with the tensor operator
        # (grid.py::tensor_coeffs64 boundary masking); obstacles still
        # reject (tests/test_anisotropic3d.py::test_validation_errors)
        cfg = flat_cfg(boundary="noflux")
        p = build_problem(cfg, diffusion_tensor=(0.1, 0.05, 0.0))
        assert p.diffusion_tensor is not None

    def test_fingerprint_covers_boundary(self):
        from crdmodel_tpu.io.checkpoint import config_fingerprint
        assert (config_fingerprint(flat_cfg())
                != config_fingerprint(flat_cfg(boundary="noflux")))


class TestFaceOpenness:
    def test_periodic_no_tissue_is_none(self):
        assert face_openness(8, 8) is None

    def test_mask_consistency(self):
        # oW = roll_x(oE), oS = roll_y(oN): both sides of a shared face
        # close together (conservation depends on it)
        rng = np.random.default_rng(1)
        tissue = rng.random((12, 10)) > 0.3
        tissue[0, 0] = True
        oE, oW, oN, oS = face_openness(12, 10, "noflux", tissue)
        np.testing.assert_array_equal(np.roll(oE, 1, axis=-1)[:, 1:],
                                      oW[:, 1:])
        np.testing.assert_array_equal(np.roll(oN, 1, axis=-2)[1:, :],
                                      oS[1:, :])

    def test_edge_shapes_minimal(self):
        oE, oW, oN, oS = face_openness(12, 10, "noflux_x")
        assert oE.shape == (10,) and oN.shape == (12, 1)
        assert oE[-1] == 0 and oW[0] == 0 and oN.all() and oS.all()
        oE, oW, oN, oS = face_openness(12, 10, "noflux_y")
        assert oE.all() and oW.all()
        assert oN[-1, 0] == 0 and oS[0, 0] == 0


class TestOperatorExact:
    def test_dct_eigenfunction_x(self):
        cfg = flat_cfg(boundary="noflux", just_diffusion=1)
        p = build_problem(cfg)
        ny, nx, dx = cfg.ny, cfg.nx, cfg.dx
        for k in (1, 3, nx - 1):
            vec = np.cos(k * np.pi * (np.arange(nx) + 0.5) / nx)
            lam = -4 * cfg.diffusion / dx**2 * np.sin(
                k * np.pi / (2 * nx))**2
            u = np.broadcast_to(vec, (ny, nx))
            got = rhs_diff(p, u)
            np.testing.assert_allclose(got, lam * u, rtol=0, atol=1e-13)

    def test_dct_eigenfunction_y(self):
        cfg = flat_cfg(boundary="noflux", just_diffusion=1)
        p = build_problem(cfg)
        ny, nx, dy = cfg.ny, cfg.nx, cfg.dy
        k = 5
        vec = np.cos(k * np.pi * (np.arange(ny) + 0.5) / ny)
        lam = -4 * cfg.diffusion / dy**2 * np.sin(k * np.pi / (2 * ny))**2
        u = np.broadcast_to(vec[:, None], (ny, nx))
        got = rhs_diff(p, u)
        np.testing.assert_allclose(got, lam * u, rtol=0, atol=1e-13)

    def test_conservation_random(self):
        cfg = flat_cfg(boundary="noflux", just_diffusion=1)
        p = build_problem(cfg)
        u = np.random.default_rng(0).standard_normal((cfg.ny, cfg.nx))
        assert abs(rhs_diff(p, u).sum()) < 1e-12

    def test_noflux_x_vs_y_differ(self):
        u = np.random.default_rng(1).standard_normal((32, 16))
        px = build_problem(flat_cfg(boundary="noflux_x", just_diffusion=1))
        py = build_problem(flat_cfg(boundary="noflux_y", just_diffusion=1))
        # periodic oracle built on the SAME divergence-form operator (the
        # 5-point roll stencil differs in rounding), so interior equality
        # is exact
        cfgp = flat_cfg(just_diffusion=1)
        pp = build_problem(cfgp, diffusion_field=cfgp.diffusion)
        dx_ = rhs_diff(px, u)
        dy_ = rhs_diff(py, u)
        dp = rhs_diff(pp, u)
        # interior agrees with periodic; the closed edges differ
        np.testing.assert_array_equal(dx_[:, 1:-1], dp[:, 1:-1])
        np.testing.assert_array_equal(dy_[1:-1, :], dp[1:-1, :])
        assert np.max(np.abs(dx_[:, 0] - dp[:, 0])) > 1e-3
        assert np.max(np.abs(dy_[0, :] - dp[0, :])) > 1e-3

    def test_obstacle_isolates_regions(self):
        # a full-height wall + no-flux edges: left/right regions conserve
        # mass independently; obstacle cells get exactly zero dynamics
        cfg = flat_cfg(boundary="noflux", just_diffusion=1)
        ny, nx = cfg.ny, cfg.nx
        mask = np.ones((ny, nx), bool)
        mask[:, nx // 2] = False
        p = build_problem(cfg, obstacle_mask=mask)
        u = np.random.default_rng(2).standard_normal((ny, nx))
        d = rhs_diff(p, u)
        assert np.all(d[:, nx // 2] == 0.0)
        assert abs(d[:, :nx // 2].sum()) < 1e-12
        assert abs(d[:, nx // 2 + 1:].sum()) < 1e-12

    def test_torus_obstacle_ring_conservation(self):
        # obstacles compose with the torus metric: conservation holds in
        # the ring = R + r cos(theta) row weight (grid.py::row_weights)
        cfg = SimConfig(model="fhn", surface="torus", x_mesh=24,
                        surface_width=20.0, surface_length=80.0,
                        t_final=0.5, output_timestep=2, dtype="float64",
                        just_diffusion=1)
        geom = make_geometry(cfg)
        ny, nx = cfg.ny, cfg.nx
        mask = np.ones((ny, nx), bool)
        mask[10:20, 5:12] = False
        p = build_problem(cfg, obstacle_mask=mask)
        u = np.random.default_rng(3).standard_normal((ny, nx))
        d = rhs_diff(p, u)
        ring = geom.row_weights()
        assert np.all(d[~mask] == 0.0)
        assert abs((ring[None, :] * d).sum()) < 1e-11


class TestEndToEnd:
    def test_eigenmode_decay(self):
        cfg = flat_cfg(boundary="noflux", just_diffusion=1, t_final=2.0,
                       rtol=1e-8, atol=1e-12)
        ny, nx, dx = cfg.ny, cfg.nx, cfg.dx
        k = 3
        vec = np.cos(k * np.pi * (np.arange(nx) + 0.5) / nx)
        lam = -4 * cfg.diffusion / dx**2 * np.sin(k * np.pi / (2 * nx))**2
        p = build_problem(cfg)
        u0 = 1.0 + 0.5 * np.broadcast_to(vec, (ny, nx))
        y0 = jnp.stack([jnp.asarray(u0), jnp.zeros((ny, nx))])
        p = dataclasses.replace(p, y0=y0)
        res = simulate(cfg, problem=p)
        assert res.ok
        exact = 1.0 + 0.5 * np.exp(lam * cfg.t_final) * vec
        np.testing.assert_allclose(np.asarray(res.trajectory[-1][0]),
                                   np.broadcast_to(exact, (ny, nx)),
                                   rtol=0, atol=1e-7)

    def test_obstacle_cells_hold_ic(self):
        cfg = flat_cfg(boundary="noflux", t_boundary=0.4)
        ny, nx = cfg.ny, cfg.nx
        mask = np.ones((ny, nx), bool)
        mask[ny // 3:ny // 3 + 4, nx // 3:nx // 3 + 5] = False
        p = build_problem(cfg, obstacle_mask=mask)
        res = simulate(cfg, problem=p)
        assert res.ok
        ic = np.asarray(p.y0)[:, ~mask]
        for k in range(len(res.trajectory)):
            np.testing.assert_array_equal(
                np.asarray(res.trajectory[k])[:, ~mask], ic)

    def test_methods_agree(self):
        cfg = flat_cfg(boundary="noflux", rtol=1e-7, atol=1e-11)
        ref = simulate(cfg)
        assert ref.ok
        for m in ("rkc2", "ark324"):
            r = simulate(dataclasses.replace(cfg, method=m))
            assert r.ok
            np.testing.assert_allclose(np.asarray(r.trajectory),
                                       np.asarray(ref.trajectory),
                                       rtol=0, atol=1e-4)

    def test_streaming_matches_batch(self):
        from crdmodel_tpu.sim import simulate_streaming
        cfg = flat_cfg(boundary="noflux")
        ny, nx = cfg.ny, cfg.nx
        mask = np.ones((ny, nx), bool)
        mask[5:9, 3:7] = False
        pb = build_problem(cfg, obstacle_mask=mask)
        ref = simulate(cfg, problem=pb)
        ps = build_problem(cfg, obstacle_mask=mask)
        res = simulate_streaming(cfg, problem=ps)
        np.testing.assert_array_equal(np.asarray(res.trajectory),
                                      np.asarray(ref.trajectory))
        assert np.array_equal(np.asarray(res.stats.steps),
                              np.asarray(ref.stats.steps))


class TestSharded:
    @pytest.mark.parametrize("x_mesh,length", [(16, 40.0), (13, 35.0)])
    def test_sharded_matches_single(self, x_mesh, length):
        import jax
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, mesh_pad_spec, sharded_params)
        cfg = flat_cfg(x_mesh=x_mesh, surface_length=length,
                       boundary="noflux", t_boundary=0.4)
        ny, nx = cfg.ny, cfg.nx
        mask = np.ones((ny, nx), bool)
        mask[ny // 3:ny // 3 + 3, nx // 3:nx // 3 + 4] = False
        prob = build_problem(cfg, obstacle_mask=mask)
        res1 = simulate(cfg, problem=prob)
        assert res1.ok
        ref_traj = np.asarray(res1.trajectory)[1:]   # drop the IC row
        mesh = make_mesh(shape=(2, 2))
        run, _ = make_sharded_simulation_fn(prob, mesh)
        ps = mesh_pad_spec(cfg, mesh)
        params0, _ = sharded_params(prob, ps)
        y0 = prob.y0 if ps is None else ps.pad_field(prob.y0)
        traj, stats = run(y0, params0)
        traj = np.asarray(traj)
        if ps is not None:
            traj = traj[..., :ny, :nx]
        np.testing.assert_allclose(traj, ref_traj, rtol=0, atol=1e-12)
        assert np.array_equal(np.asarray(stats.steps),
                              np.asarray(res1.stats.steps))


def test_cli_set_boundary(tmp_path):
    from crdmodel_tpu.cli import main
    ini = tmp_path / "b.ini"
    ini.write_text("[Parameters]\ndiffusion = 0.12\nbeta = 1.25\n"
                   "surfaceWidth = 20\nsurfaceLength = 40\n"
                   "waveLength = 0.1\nwaveWidth = 0.5\nwaveInside = 1\n"
                   "outputTimestep = 2\ntBoundary = 0\ntFinal = 0.5\n"
                   "xMesh = 10\n[System]\nvaryBeta = 0\n")
    out = tmp_path / "out"
    rc = main(["run", str(ini), "--model", "fhn", "--surface", "flat",
               "--dtype", "float64", "--set", "boundary=noflux",
               "--outdir", str(out)])
    assert rc == 0
