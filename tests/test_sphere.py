"""Surfaces of revolution (sphere + generic profiles) — beyond-reference
geometry capability (core/grid.py::RevolutionGeometry).

The reference hardcodes exactly two surfaces (flat periodic rectangle and
torus, SURVEY.md §2.1 C5/C6); the framework's "geometry as data" design
generalises the torus's metric machinery to any surface of revolution.
Oracles:
  - conservation + self-adjointness of the finite-volume operator in the
    area weight w = sqrt(E) rho (exact by construction, any profile)
  - the torus profile reproduces TorusGeometry's divergence coefficients
    (with analytic derivatives, to rounding)
  - spherical harmonics: L Y_l^m = -l(l+1)/R^2 Y_l^m with second-order
    convergence; e2e heat decay exp(-l(l+1) D t / R^2) through the
    adaptive driver
  - pole closure is exact (end faces carry zero flux; the array wrap in x
    leaks nothing)
  - sharded (even + uneven pad-and-mask) == single-device; fused kernels
    (interpreter) == XLA
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import (RevolutionGeometry, TorusGeometry,
                                    make_geometry, make_grid)
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_run_fn, simulate


def _L(u, coeffs):
    aE, aW, aN, aS = coeffs
    uE = np.roll(u, -1, -1)
    uW = np.roll(u, 1, -1)
    uN = np.roll(u, -1, -2)
    uS = np.roll(u, 1, -2)
    return aE * (uE - u) + aW * (uW - u) + aN * (uN - u) + aS * (uS - u)


def _sphere_cfg(**kw):
    base = dict(model="fhn", surface="sphere", x_mesh=48, dtype="float64",
                t_final=0.5, output_timestep=1)
    base.update(kw)
    return SimConfig(**base)


class TestConfig:
    def test_sphere_conventions(self):
        cfg = _sphere_cfg(x_mesh=64)
        assert cfg.ny == 128                       # equator/meridian = 2
        assert np.isclose(cfg.dx, np.pi / 64)      # cell-centred stagger
        assert np.isclose(cfg.xmin, cfg.dx / 2)
        assert np.isclose(cfg.xmax, np.pi - cfg.dx / 2)
        assert np.isclose(cfg.ymax, 2 * np.pi)
        assert cfg.capped

    def test_y_mesh_override(self):
        cfg = _sphere_cfg(x_mesh=32, y_mesh=100)
        assert cfg.ny == 100
        # flat/torus too
        assert SimConfig(surface="flat", x_mesh=32, y_mesh=77).ny == 77

    def test_revolution_needs_y_mesh(self):
        with pytest.raises(ValueError, match="yMesh"):
            SimConfig(surface="revolution", x_mesh=32).validate()

    def test_revolution_needs_profile(self):
        cfg = SimConfig(surface="revolution", x_mesh=32, y_mesh=64)
        with pytest.raises(ValueError, match="profile"):
            build_problem(cfg)

    def test_profile_rejected_for_sphere(self):
        with pytest.raises(ValueError, match="only meaningful"):
            build_problem(_sphere_cfg(),
                          profile=(np.sin, np.cos))

    def test_ini_y_mesh_key(self, tmp_path):
        from crdmodel_tpu.config import config_from_ini
        ini = tmp_path / "a.ini"
        ini.write_text("[Parameters]\nxMesh = 16\nyMesh = 48\n"
                       "tFinal = 1.0\noutputTimestep = 2\n")
        cfg = config_from_ini(str(ini), model="fhn", surface="sphere")
        assert cfg.nx == 16 and cfg.ny == 48


class TestOperator:
    def test_conservation_and_self_adjoint(self):
        cfg = _sphere_cfg()
        g = build_problem(cfg).geometry
        coeffs = g.divergence_coeffs64(0.12)
        w = g.row_weights()
        rng = np.random.default_rng(0)
        u = rng.standard_normal((cfg.ny, cfg.nx))
        v = rng.standard_normal((cfg.ny, cfg.nx))
        scale = np.abs(w * u).sum()
        assert abs(np.sum(w * _L(u, coeffs))) < 1e-13 * scale
        a = np.sum(w * v * _L(u, coeffs))
        b = np.sum(w * u * _L(v, coeffs))
        assert abs(a - b) < 1e-12 * max(1.0, abs(a))

    def test_pole_closure_exact(self):
        g = build_problem(_sphere_cfg()).geometry
        aE, aW, aN, aS = g.divergence_coeffs64(0.12)
        assert aW[0] == 0.0 and aE[-1] == 0.0

    def test_torus_profile_matches_torus_geometry(self):
        """Closed revolution with the torus profile == TorusGeometry's
        conservative coefficients (analytic derivatives -> rounding)."""
        cfg_t = SimConfig(model="fhn", surface="torus", x_mesh=40,
                          dtype="float64")
        gt = make_geometry(cfg_t)
        assert isinstance(gt, TorusGeometry)
        cfg_r = SimConfig(model="fhn", surface="revolution", x_mesh=40,
                          y_mesh=cfg_t.ny, dtype="float64")
        R, r = cfg_t.major_radius, cfg_t.minor_radius
        gr = RevolutionGeometry.from_profile(
            make_grid(cfg_r), cfg_t.diffusion,
            rho=lambda v: R + r * np.cos(v), z=lambda v: r * np.sin(v),
            capped=False,
            derivs=(lambda v: -r * np.sin(v), lambda v: r * np.cos(v)))
        for a, b in zip(gt.divergence_coeffs64(0.12),
                        gr.divergence_coeffs64(0.12)):
            np.testing.assert_allclose(np.broadcast_to(b, np.shape(a)), a,
                                       rtol=1e-13)
        # FD-derivative fallback stays within ~1e-9 of analytic
        gr_fd = RevolutionGeometry.from_profile(
            make_grid(cfg_r), cfg_t.diffusion,
            rho=lambda v: R + r * np.cos(v), z=lambda v: r * np.sin(v))
        for a, b in zip(gt.divergence_coeffs64(0.12),
                        gr_fd.divergence_coeffs64(0.12)):
            np.testing.assert_allclose(np.broadcast_to(b, np.shape(a)), a,
                                       rtol=1e-8)

    def test_spherical_harmonic_eigenvalue_convergence(self):
        """Axisymmetric Y_2^0: L Y -> -l(l+1) D / R^2 Y pointwise at second
        order in dx (m=0 modes see no pole-cell order reduction)."""
        D = 0.12
        errs = {}
        for nx in (48, 96):
            cfg = _sphere_cfg(x_mesh=nx)
            g = build_problem(cfg).geometry
            R = cfg.major_radius
            th = cfg.xmin + np.arange(cfg.nx) * cfg.dx
            Y = np.broadcast_to(0.5 * (3 * np.cos(th) ** 2 - 1),
                                (cfg.ny, cfg.nx))
            lam = -6.0 * D / R ** 2
            Ly = _L(Y, g.divergence_coeffs64(D))
            errs[nx] = np.abs(Ly - lam * Y).max() / np.abs(lam * Y).max()
        order = np.log2(errs[48] / errs[96])
        assert errs[96] < 1e-3
        assert order > 1.7, (errs, order)

    def test_nonaxisymmetric_harmonic_solution_convergence(self):
        """Y_2^1 (m=1): pole cells reduce the LOCAL truncation order for
        non-axisymmetric modes (standard latitude-longitude finite-volume
        behaviour — O(1) truncation on the O(dx)-measure pole region), but
        the SOLUTION converges: evolving Y_2^1 under justDiffusion decays
        at exp(-6 D t / R^2) with error halving under refinement."""
        D = 0.12
        errs = {}
        for nx in (48, 96):
            cfg = _sphere_cfg(x_mesh=nx, just_diffusion=1, t_final=2.0,
                              output_timestep=1, diffusion=D,
                              surface_length=80.0, rtol=1e-9, atol=1e-12)
            p = build_problem(cfg)
            R = cfg.major_radius
            th = cfg.xmin + np.arange(cfg.nx) * cfg.dx
            ph = np.arange(cfg.ny) * cfg.dy
            Y = (np.sin(th) * np.cos(th))[None, :] * np.cos(ph)[:, None]
            p = dataclasses.replace(
                p, y0=p.y0.at[0].set(jnp.asarray(Y)).at[1].set(0.0))
            res = simulate(cfg, problem=p)
            assert res.ok
            pred = np.exp(-6.0 * D / R ** 2 * cfg.t_final)
            errs[nx] = np.abs(
                np.asarray(res.trajectory)[-1, 0] - pred * Y).max()
        assert errs[96] < 1e-3
        assert errs[96] < 0.65 * errs[48], errs

    def test_sphere_curvature(self):
        cfg = _sphere_cfg()
        g = build_problem(cfg).geometry
        K = np.asarray(g.gaussian_curvature(jnp.float64))
        R = cfg.major_radius
        np.testing.assert_allclose(K, 1.0 / R ** 2, rtol=1e-12)

    def test_torus_profile_curvature(self):
        """The generic K formula reproduces the reference's torus formula
        (util/GenCurvatureCoupling.py:87)."""
        cfg = SimConfig(model="fhn", surface="torus", x_mesh=40,
                        dtype="float64")
        R, r = cfg.major_radius, cfg.minor_radius
        gr = RevolutionGeometry.from_profile(
            make_grid(cfg), cfg.diffusion,
            rho=lambda v: R + r * np.cos(v), z=lambda v: r * np.sin(v),
            capped=False,
            derivs=(lambda v: -r * np.sin(v), lambda v: r * np.cos(v)),
            d2=(lambda v: -r * np.cos(v), lambda v: -r * np.sin(v)))
        th = np.arange(cfg.nx) * cfg.dx
        want = np.cos(th) / (r * (R + r * np.cos(th)))
        np.testing.assert_allclose(np.asarray(gr.gaussian_curvature(
            jnp.float64)), want, rtol=1e-10, atol=1e-12)

    def test_capped_tube_matches_flat_noflux(self):
        """A capped unit-speed cylinder (rho=a, z=v) is isometric to a flat
        strip with no-flux x-walls wrapped in y: same operator up to the
        coordinate scaling, checked against FlatGeometry + face_openness."""
        from crdmodel_tpu.core.grid import FlatGeometry, Grid, face_openness
        a = 20.0 / (2 * np.pi)
        nx, ny = 24, 32
        cfg = SimConfig(model="fhn", surface="revolution_capped",
                        x_mesh=nx, y_mesh=ny, dtype="float64")
        gr = RevolutionGeometry.from_profile(
            make_grid(cfg), 0.12,
            rho=lambda v: a + 0.0 * v, z=lambda v: v, capped=True,
            derivs=(lambda v: 0.0 * v, lambda v: 1.0 + 0.0 * v))
        # flat grid with matching spacings: dx_flat = dv, dy_flat = a dphi
        gf = FlatGeometry(
            grid=Grid(nx=nx, ny=ny, xmin=0.0, xmax=(nx - 1) * cfg.dx,
                      ymin=0.0, ymax=(ny - 1) * (a * cfg.dy)),
            diffusion=0.12)
        mask = face_openness(ny, nx, boundary="noflux_x")
        cr = gr.divergence_coeffs64(0.12)
        cf = gf.divergence_coeffs64(0.12, face_mask=mask)
        for b, a_ in zip(cr, cf):
            np.testing.assert_allclose(np.broadcast_to(b, (ny, nx)),
                                       np.broadcast_to(a_, (ny, nx)),
                                       rtol=1e-12)


class TestEndToEnd:
    def test_heat_decay_matches_sphere_eigenvalue(self):
        """justDiffusion heat decay of Y_2^0 through the adaptive driver
        matches exp(-6 D t / R^2) to discretisation error."""
        cfg = _sphere_cfg(x_mesh=96, just_diffusion=1, t_final=2.0,
                          output_timestep=2, diffusion=0.12,
                          surface_length=80.0)
        p = build_problem(cfg)
        R = cfg.major_radius
        th = cfg.xmin + np.arange(cfg.nx) * cfg.dx
        P2 = 0.5 * (3 * np.cos(th) ** 2 - 1)
        y0 = p.y0.at[0].set(jnp.asarray(
            np.broadcast_to(P2, (cfg.ny, cfg.nx)))).at[1].set(0.0)
        p = dataclasses.replace(p, y0=y0)
        res = simulate(cfg, problem=p)
        assert res.ok
        traj = np.asarray(res.trajectory)
        lam = -6.0 * 0.12 / R ** 2
        for k, t in enumerate(np.asarray(res.touts)):
            amp = np.median(traj[k, 0] / P2[None, :])
            assert abs(amp - np.exp(lam * t)) < 2e-5, (k, t, amp)

    def test_fhn_sphere_runs(self):
        cfg = _sphere_cfg(model="fhn", dtype="float32", t_final=2.0,
                          output_timestep=2)
        res = simulate(cfg)
        assert res.ok
        tr = np.asarray(res.trajectory)
        assert np.isfinite(tr).all()
        # the wave segment actually evolved something
        assert np.abs(tr[-1] - tr[0]).max() > 1e-3

    def test_closed_revolution_runs(self):
        """Generic closed profile (a 'wobbly torus') end-to-end."""
        cfg = SimConfig(model="fhn", surface="revolution", x_mesh=32,
                        y_mesh=64, dtype="float64", t_final=0.5,
                        output_timestep=1)
        R, r = 2.0, 0.7
        res = simulate(cfg, problem=build_problem(cfg, profile=(
            lambda v: R + r * np.cos(v) + 0.1 * np.cos(2 * v),
            lambda v: r * np.sin(v))))
        assert res.ok and np.isfinite(np.asarray(res.trajectory)).all()

    def test_rkc2_on_sphere(self):
        cfg = _sphere_cfg(method="rkc2", t_final=0.5)
        res = simulate(cfg)
        assert res.ok and np.isfinite(np.asarray(res.trajectory)).all()

    def test_sweep_on_sphere(self):
        from crdmodel_tpu.sweep import sweep_configs
        cfg = _sphere_cfg(x_mesh=24, t_final=0.3)
        out = sweep_configs(cfg, [{"beta": 1.1}, {"beta": 1.3}])
        assert out.ok()
        assert out.trajectories.shape[0] == 2
        # per-member results differ (beta actually fed through)
        assert np.abs(np.asarray(out.trajectories[0])
                      - np.asarray(out.trajectories[1])).max() > 1e-6

    def test_checkpoint_resume_on_sphere(self, tmp_path):
        from crdmodel_tpu.io.checkpoint import resume_streaming
        from crdmodel_tpu.sim import simulate_streaming
        cfg = _sphere_cfg(x_mesh=24, t_final=1.0, output_timestep=4)
        full = simulate_streaming(cfg)
        ck = str(tmp_path / "ck.npz")
        simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck)
        resumed = resume_streaming(cfg, ck)
        np.testing.assert_allclose(
            np.asarray(resumed.trajectory), np.asarray(full.trajectory),
            rtol=1e-12, atol=1e-12)

    def test_fingerprint_distinguishes_y_mesh(self):
        from crdmodel_tpu.io.checkpoint import config_fingerprint
        a = config_fingerprint(_sphere_cfg())
        b = config_fingerprint(_sphere_cfg(y_mesh=50))
        assert a != b


class TestParallel:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
    def test_sharded_matches_single_device(self, mesh_shape):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        cfg = _sphere_cfg(x_mesh=64, t_final=1.0, output_timestep=2)
        r1 = simulate(cfg)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=mesh_shape))
        assert r1.total_steps() == r8.total_steps()
        np.testing.assert_allclose(np.asarray(r8.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=0, atol=5e-14)

    def test_sharded_uneven_grid(self):
        """63x126 does not divide 2x4: pad-and-mask path on the sphere."""
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        cfg = _sphere_cfg(x_mesh=63, t_final=0.5, output_timestep=1)
        r1 = simulate(cfg)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)))
        assert r1.total_steps() == r8.total_steps()
        np.testing.assert_allclose(np.asarray(r8.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=0, atol=5e-14)


class TestFusedKernels:
    @pytest.mark.parametrize("method", ["bs32", "rkc2", "ark324"])
    def test_fused_interpreter_matches_xla(self, method):
        """The x-profile remap (kernel_common.coeff_kind docstring) runs the
        sphere on every fused kernel; f32 agreement at the documented
        fused-vs-XLA drift level."""
        kw = dict(x_mesh=48, dtype="float32", t_final=0.5,
                  output_timestep=1, method=method)
        px = build_problem(_sphere_cfg(use_pallas=False, **kw))
        pk = build_problem(_sphere_cfg(use_pallas=True, **kw))
        tx, sx = jax.jit(make_run_fn(px)[0])(px.y0, px.params)
        tk, sk = jax.jit(make_run_fn(pk, interpret=True)[0])(pk.y0, pk.params)
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=5e-5)

    def test_fused_shard_step_interpreter(self):
        """Sharded fused step kernel == XLA sharded path on the sphere."""
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (maybe_fused_shard_step,
                                                   simulate_sharded)
        cfg = _sphere_cfg(x_mesh=64, dtype="float32", t_final=0.25,
                          output_timestep=1, use_pallas=True)
        mesh = make_mesh(shape=(2, 2))
        assert maybe_fused_shard_step(
            build_problem(cfg), mesh, interpret=True) is not None
        rk = simulate_sharded(cfg, mesh=mesh)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        rx = simulate_sharded(cfg_x, mesh=mesh)
        assert rk.total_steps() == rx.total_steps()
        np.testing.assert_allclose(np.asarray(rk.trajectory),
                                   np.asarray(rx.trajectory),
                                   rtol=0, atol=5e-5)


class TestPoleRhoGate:
    def test_fused_rkc_declines_on_sphere(self):
        """The sphere's pole-inflated spectral radius (phi coefficient
        ~nx^4 at the poles) would shrink the fused RKC kernel's h-cap
        ~120x below the XLA path's S_MAX=256 coverage — the kernel must
        decline (ops/pallas_rkc.py::pole_inflated_rho)."""
        from crdmodel_tpu.ops.pallas_rkc import (is_rkc_supported,
                                                 pole_inflated_rho)
        p = build_problem(_sphere_cfg(x_mesh=64, dtype="float32",
                                      method="rkc2"))
        assert pole_inflated_rho(p)
        assert not is_rkc_supported(p, jnp.float32)

    def test_capped_tube_not_inflated(self):
        """rho bounded away from 0 (a capped cylinder): no inflation, the
        kernels stay eligible."""
        from crdmodel_tpu.ops.pallas_rkc import pole_inflated_rho
        a = 3.0
        cfg = SimConfig(model="fhn", surface="revolution_capped",
                        x_mesh=32, y_mesh=64, dtype="float32")
        p = build_problem(cfg, profile=(
            lambda v: a + 0.0 * v, lambda v: v,
            (lambda v: 0.0 * v, lambda v: 1.0 + 0.0 * v)))
        assert not pole_inflated_rho(p)

    def test_torus_not_inflated(self):
        from crdmodel_tpu.ops.pallas_rkc import pole_inflated_rho
        cfg = SimConfig(model="fhn", surface="torus", x_mesh=32,
                        dtype="float32", coupling="curvature")
        assert not pole_inflated_rho(build_problem(cfg))


class TestPoleCoarsen:
    """Reduced (pole-coarsened) grid: cfg.pole_coarsen=1 merges phi cells
    near the poles into power-of-2 blocks (Galerkin block operator), so
    the diffusion spectral radius stays at the equatorial scale instead
    of the polar ~nx^4 (docs/PERF_NOTES.md "Sphere pole CFL anatomy")."""

    def _cfg(self, **kw):
        base = dict(model="fhn", surface="sphere", x_mesh=96,
                    dtype="float64", diffusion=0.12, surface_length=80.0,
                    t_final=1.0, output_timestep=1, pole_coarsen=1)
        base.update(kw)
        return SimConfig(**base)

    def test_group_sizes(self):
        g = build_problem(self._cfg()).geometry.pole_group_sizes()
        ny = self._cfg().ny
        assert g[0] > 1 and g[-1] > 1            # poles coarsened
        assert (g[g.size // 2 - 2:g.size // 2 + 2] == 1).all()  # equator
        assert all(ny % int(x) == 0 for x in g)   # blocks tile the ring
        assert np.array_equal(g, g[::-1])         # symmetric
        assert set(np.unique(g)) <= {2 ** k for k in range(16)}

    def test_conservation_and_self_adjoint_coarse(self):
        cfg = self._cfg(just_diffusion=1)
        p = build_problem(cfg)
        w = p.geometry.row_weights()[None, :]
        rng = np.random.default_rng(3)
        u = rng.standard_normal((cfg.ny, cfg.nx))
        v = rng.standard_normal((cfg.ny, cfg.nx))
        z = jnp.zeros((2, cfg.ny, cfg.nx))
        Lu = np.asarray(p.rhs(0.0, z.at[0].set(u), p.params))[0]
        Lv = np.asarray(p.rhs(0.0, z.at[0].set(v), p.params))[0]
        assert abs(np.sum(w * Lu)) < 1e-13 * np.abs(w * u).sum()
        a, b = np.sum(w * v * Lu), np.sum(w * u * Lv)
        assert abs(a - b) < 1e-12 * abs(a)

    def test_rho_bound_drops_to_equatorial_scale(self):
        from crdmodel_tpu.core.problem import make_rho_bound
        cfg = self._cfg(just_diffusion=1)
        p = build_problem(cfg)
        cfg0 = dataclasses.replace(cfg, pole_coarsen=0)
        p0 = build_problem(cfg0)
        z = jnp.zeros((2, cfg.ny, cfg.nx))
        rc = float(make_rho_bound(cfg, p.model, p.geometry, jnp.float64,
                                  diffusion_field=p.diffusion_field)(
                                      0.0, z, p.params))
        rf = float(make_rho_bound(cfg0, p0.model, p0.geometry, jnp.float64,
                                  diffusion_field=p0.diffusion_field)(
                                      0.0, z, p0.params))
        assert rf / rc > 100.0, (rc, rf)

    def test_heat_decay_unaffected(self):
        """Axisymmetric Y_2^0 decay through the driver is unchanged by
        coarsening (block means of an axisymmetric field are exact)."""
        cfg = self._cfg(just_diffusion=1, t_final=2.0)
        p = build_problem(cfg)
        R = cfg.major_radius
        th = cfg.xmin + np.arange(cfg.nx) * cfg.dx
        P2 = 0.5 * (3 * np.cos(th) ** 2 - 1)
        p = dataclasses.replace(p, y0=p.y0.at[0].set(jnp.asarray(
            np.broadcast_to(P2, (cfg.ny, cfg.nx)))).at[1].set(0.0))
        res = simulate(cfg, problem=p)
        assert res.ok
        amp = np.median(np.asarray(res.trajectory)[-1, 0] / P2[None, :])
        assert abs(amp - np.exp(-6 * 0.12 / R ** 2 * 2.0)) < 2e-5

    def test_wave_dynamics_match_fine_grid_away_from_poles(self):
        """An equatorial FHN wave is insensitive to pole coarsening: the
        coarse and fine runs agree except in the coarsened rings."""
        cfg = self._cfg(x_mesh=64, t_final=1.0)
        r_c = simulate(cfg)
        r_f = simulate(dataclasses.replace(cfg, pole_coarsen=0))
        g = build_problem(cfg).geometry.pole_group_sizes()
        fine_cols = np.nonzero(g == 1)[0]
        d = np.abs(np.asarray(r_c.trajectory)[-1][:, :, fine_cols]
                   - np.asarray(r_f.trajectory)[-1][:, :, fine_cols])
        assert d.max() < 1e-4, d.max()

    def test_refusals_and_gates(self):
        # non-capped surfaces refuse the flag
        with pytest.raises(ValueError, match="pole_coarsen"):
            SimConfig(model="fhn", surface="torus",
                      pole_coarsen=1).validate()
        # round 4: sharded drivers ACCEPT pole coarsening (see
        # TestShardedPoleCoarsen); only incompatible meshes refuse
        # (pole groups must divide nyl — checked there)
        # fused kernels decline
        from crdmodel_tpu.sim import _pallas_eligible
        p = build_problem(self._cfg(x_mesh=64, dtype="float32",
                                    use_pallas=True))
        assert not _pallas_eligible(p, interpret=True)

    def test_fingerprint_includes_pole_coarsen(self):
        from crdmodel_tpu.io.checkpoint import config_fingerprint
        assert config_fingerprint(self._cfg()) != \
            config_fingerprint(self._cfg(pole_coarsen=0))

    def test_checkpoint_resume_coarse(self, tmp_path):
        from crdmodel_tpu.io.checkpoint import resume_streaming
        from crdmodel_tpu.sim import simulate_streaming
        cfg = self._cfg(x_mesh=48, output_timestep=4)
        full = simulate_streaming(cfg)
        ck = str(tmp_path / "ck.npz")
        simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck)
        resumed = resume_streaming(cfg, ck)
        np.testing.assert_allclose(
            np.asarray(resumed.trajectory), np.asarray(full.trajectory),
            rtol=1e-12, atol=1e-12)


class TestViz:
    def test_revolution_mesh_on_sphere(self):
        cfg = _sphere_cfg(x_mesh=24, dtype="float32")
        g = build_problem(cfg).geometry
        from crdmodel_tpu.viz import revolution_mesh
        pts, tris, rc = revolution_mesh(g)
        R = cfg.major_radius
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), R,
                                   rtol=1e-12)
        assert rc[:, 0].max() == cfg.ny - 1
        assert rc[:, 1].max() == cfg.nx - 1
        assert tris.max() < len(pts)

    def test_map_output_to_surface(self, tmp_path):
        import os
        cfg = _sphere_cfg(x_mesh=16, dtype="float32", t_final=0.2,
                          output_timestep=1)
        res = simulate(cfg)
        from crdmodel_tpu.viz import (generate_revolution_vtp,
                                      map_output_to_surface)
        generate_revolution_vtp(res.problem.geometry, cfg, str(tmp_path))
        pvd = map_output_to_surface(res, str(tmp_path))
        assert os.path.exists(pvd)
        assert os.path.exists(str(tmp_path / "FHNstep" / "FHNstep_000.vtp"))

    def test_map_output_to_surface_torus_dispatch(self, tmp_path):
        import os
        cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                        dtype="float32", t_final=0.2, output_timestep=1)
        res = simulate(cfg)
        from crdmodel_tpu.viz import map_output_to_surface
        pvd = map_output_to_surface(res, str(tmp_path))
        assert os.path.exists(pvd)


class TestShardedPoleCoarsen:
    """Round 4 (VERDICT r3 #3): the reduced (pole-coarsened) sphere scales
    out. The Galerkin band operator runs under shard_map with shard-local
    phi block means (every pole group must divide nyl — validated) and one
    width-1 ppermute of the block-mean rows per distinct group size."""

    def _cfg(self, **kw):
        base = dict(model="fhn", surface="sphere", x_mesh=96,
                    dtype="float64", diffusion=0.12, surface_length=80.0,
                    t_final=1.0, output_timestep=1, pole_coarsen=1)
        base.update(kw)
        return SimConfig(**base)

    @pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4), (1, 8)])
    def test_matches_single_device(self, mesh_shape):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = self._cfg()
        p = build_problem(cfg)
        r1 = simulate(cfg, problem=p)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=mesh_shape),
                              problem=p)
        assert r1.ok and r8.ok
        np.testing.assert_allclose(np.asarray(r8.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=1e-12, atol=1e-12)
        assert np.array_equal(np.asarray(r8.stats.steps),
                              np.asarray(r1.stats.steps))

    def test_rkc2_matches_single_device(self):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = self._cfg(method="rkc2")
        p = build_problem(cfg)
        r1 = simulate(cfg, problem=p)
        r4 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 2)), problem=p)
        assert r1.ok and r4.ok
        np.testing.assert_allclose(np.asarray(r4.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=1e-11, atol=1e-11)
        assert np.array_equal(np.asarray(r4.stats.steps),
                              np.asarray(r1.stats.steps))

    def test_incompatible_mesh_refused(self):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = self._cfg()   # largest pole group 32; (4,2) gives nyl=48
        with pytest.raises(ValueError, match="pole groups"):
            simulate_sharded(cfg, mesh=make_mesh(shape=(4, 2)))

    def test_streaming_matches_batch(self):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            simulate_sharded, simulate_sharded_streaming)
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = self._cfg(output_timestep=2)
        mesh = make_mesh(shape=(2, 2))
        rb = simulate_sharded(cfg, mesh=mesh)
        rs = simulate_sharded_streaming(cfg, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(rs.trajectory),
                                      np.asarray(rb.trajectory))
