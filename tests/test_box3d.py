"""3-D box domains (surface="box") — beyond-reference capability
(core/grid.py::BoxGeometry + ops/stencil.py::divergence_laplacian3).

The reference is strictly 2-D (four monoliths over flat/torus surfaces,
SURVEY.md §2.1 C5/C6); volumetric tissue — scroll waves, transmural
propagation — needs a depth axis. Oracles:
  - exact discrete plane-wave symbol of the 7-point operator (constant D)
  - conservation + self-adjointness to rounding for random D fields,
    no-flux walls and 3-D obstacle scars
  - e2e heat-mode decay through the adaptive driver matches the discrete
    eigenvalue exactly (single z-mode)
  - a z-invariant box run reproduces the 2-D flat divergence run
    slice-for-slice (the z-flux terms vanish identically)
  - obstacle cells hold their IC exactly; frozen y-boundary rows freeze
  - rkc2 / ark324 / step_mode="normal" all run the box
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import BoxGeometry, face_openness3, make_geometry
from crdmodel_tpu.core.problem import build_problem, make_rho_bound
from crdmodel_tpu.ops.stencil import divergence_laplacian3
from crdmodel_tpu.sim import simulate, simulate_streaming


def _box_cfg(**kw):
    base = dict(model="aliev_panfilov", surface="box", x_mesh=16,
                surface_width=4.0, surface_length=8.0, surface_depth=2.0,
                z_mesh=8, diffusion=0.3, beta=0.10, wave_length=0.25,
                wave_width=0.5, t_final=0.5, output_timestep=2,
                dtype="float64", rtol=1e-6, atol=1e-9)
    base.update(kw)
    return SimConfig(**base)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape)


class TestConfig:
    def test_box_needs_z(self):
        with pytest.raises(ValueError, match="zMesh"):
            _box_cfg(z_mesh=0).validate()
        with pytest.raises(ValueError, match="surfaceDepth"):
            _box_cfg(surface_depth=0.0).validate()

    def test_z_keys_rejected_off_box(self):
        with pytest.raises(ValueError, match="only meaningful"):
            SimConfig(surface="flat", z_mesh=8).validate()

    def test_derived_geometry(self):
        cfg = _box_cfg().validate()
        assert cfg.nz == 8 and cfg.ny == 32 and cfg.nx == 16
        assert cfg.dz == pytest.approx(2.0 / 7.0)
        g = make_geometry(cfg)
        assert isinstance(g, BoxGeometry)
        assert g.grid.shape == (8, 32, 16)

    def test_noflux_z_needs_box(self):
        with pytest.raises(ValueError, match="noflux_z"):
            SimConfig(surface="flat", boundary="noflux_z").validate()

    def test_fingerprint_sees_z(self):
        from crdmodel_tpu.io.checkpoint import config_fingerprint
        a = _box_cfg().validate()
        b = _box_cfg(z_mesh=10).validate()
        assert config_fingerprint(a) != config_fingerprint(b)


class TestOperator:
    def test_plane_wave_symbol(self):
        """L e^{i(kx i + ky j + kz k)} = symbol * wave, exactly (constant D,
        periodic): symbol = -4 sum_a a_face sin^2(k_a/2)."""
        cfg = _box_cfg().validate()
        geo = make_geometry(cfg)
        D = 0.3
        faces = geo.divergence_coeffs(np.float64(D), jnp.float64)
        nz, ny, nx = geo.grid.shape
        kz, ky, kx = 2 * np.pi * 3 / nz, 2 * np.pi * 5 / ny, 2 * np.pi * 2 / nx
        K, J, I = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                              indexing="ij")
        phase = kz * K + ky * J + kx * I
        aE = D / cfg.dx ** 2
        aN = D / cfg.dy ** 2
        aU = D / cfg.dz ** 2
        sym = -4.0 * (aE * np.sin(kx / 2) ** 2 + aN * np.sin(ky / 2) ** 2
                      + aU * np.sin(kz / 2) ** 2)
        for wave in (np.cos(phase), np.sin(phase)):
            L = np.asarray(divergence_laplacian3(jnp.asarray(wave), faces))
            np.testing.assert_allclose(L, sym * wave, atol=1e-10)

    def test_conservation_and_self_adjointness(self):
        """Random full D field + no-flux walls + obstacle: sum L u = 0 and
        <v, Lu> = <Lv, u> to rounding (both by construction)."""
        cfg = _box_cfg(boundary="noflux").validate()
        geo = make_geometry(cfg)
        shape = geo.grid.shape
        Df = 0.1 + np.abs(_rand(shape, 1))
        tissue = np.ones(shape, dtype=bool)
        tissue[2:4, 5:9, 4:8] = False
        fm = face_openness3(*shape, cfg.boundary, tissue)
        faces = geo.divergence_coeffs(Df, jnp.float64, face_mask=fm)
        u = jnp.asarray(_rand(shape, 2))
        v = jnp.asarray(_rand(shape, 3))
        Lu = divergence_laplacian3(u, faces)
        Lv = divergence_laplacian3(v, faces)
        scale = float(jnp.max(jnp.abs(Lu)))
        assert abs(float(jnp.sum(Lu))) < 1e-10 * scale * u.size ** 0.5
        assert abs(float(jnp.sum(v * Lu) - jnp.sum(u * Lv))) < \
            1e-10 * scale * u.size ** 0.5

    def test_obstacle_faces_closed_both_sides(self):
        fm = face_openness3(6, 6, 6, "periodic",
                            tissue=np.ones((6, 6, 6), bool))
        # all-open tissue with periodic boundary -> no masks materialised
        oE, oW, oN, oS, oU, oD = fm
        assert np.all(oE == 1) and np.all(oU == 1)
        t = np.ones((6, 6, 6), bool)
        t[3, 3, 3] = False
        oE, oW, oN, oS, oU, oD = face_openness3(6, 6, 6, "periodic", t)
        # shared-face pairing: oW = roll_x(oE), oD = roll_z(oU)
        np.testing.assert_array_equal(oW, np.roll(oE, 1, axis=-1))
        np.testing.assert_array_equal(oS, np.roll(oN, 1, axis=-2))
        np.testing.assert_array_equal(oD, np.roll(oU, 1, axis=-3))

    def test_rho_bound_dominates(self):
        """The Gershgorin bound exceeds |symbol| of the fastest mode."""
        cfg = _box_cfg(just_diffusion=1, model="goldbeter").validate()
        geo = make_geometry(cfg)
        from crdmodel_tpu.models.base import get_model
        rho_fn = make_rho_bound(cfg, get_model("goldbeter"), geo,
                                jnp.float64,
                                diffusion_field=np.float64(cfg.diffusion))
        p = build_problem(cfg)
        rho = float(rho_fn(0.0, p.y0, p.params))
        worst = 4.0 * cfg.diffusion * (1 / cfg.dx ** 2 + 1 / cfg.dy ** 2
                                       + 1 / cfg.dz ** 2)
        assert rho >= worst - 1e-9


class TestEndToEnd:
    def test_heat_mode_decay_exact(self):
        """justDiffusion: a single array-periodic z-mode decays at the
        discrete eigenvalue -4 aU sin^2(pi m / nz) through the adaptive
        driver (tolerance-level accuracy; no spatial discretisation error
        because the mode is an EXACT eigenvector of the operator)."""
        cfg = _box_cfg(model="goldbeter", just_diffusion=1, t_final=0.4,
                       output_timestep=2, rtol=1e-8, atol=1e-12).validate()
        p = build_problem(cfg)
        nz = cfg.nz
        m = 2
        mode = np.cos(2 * np.pi * m * np.arange(nz) / nz)
        y0 = jnp.zeros_like(p.y0)
        y0 = y0.at[0].set(jnp.asarray(
            1.0 + 0.5 * mode[:, None, None]
            * np.ones((nz, cfg.ny, cfg.nx))))
        p = dataclasses.replace(p, y0=y0)
        res = simulate(cfg, problem=p)
        assert res.ok
        aU = cfg.diffusion / cfg.dz ** 2
        lam = -4.0 * aU * np.sin(np.pi * m / nz) ** 2
        traj = np.asarray(res.trajectory)
        for k, t in enumerate(np.asarray(res.touts)):
            amp = (traj[k, 0].max() - traj[k, 0].min()) / 1.0
            assert abs(amp - np.exp(lam * t)) < 1e-6, (k, t, amp)

    def test_z_invariant_matches_flat_divergence(self):
        """A z-invariant box run == the 2-D flat divergence run slice-wise:
        the z-flux terms are identically zero, and the WRMS norms scale out
        (same mean of nz identical copies)."""
        kw = dict(model="aliev_panfilov", x_mesh=16, surface_width=4.0,
                  surface_length=8.0, diffusion=0.3, beta=0.10,
                  wave_length=0.25, wave_width=0.5, t_final=0.5,
                  output_timestep=2, dtype="float64", rtol=1e-6, atol=1e-9)
        cfg3 = SimConfig(surface="box", surface_depth=2.0, z_mesh=4,
                         **kw).validate()
        cfg2 = SimConfig(surface="flat", **kw).validate()
        r3 = simulate(cfg3)
        # force the flat run through the SAME divergence operator
        p2 = build_problem(cfg2, diffusion_field=np.float64(0.3))
        r2 = simulate(cfg2, problem=p2)
        assert r3.ok and r2.ok
        assert r3.total_steps() == r2.total_steps()
        t3 = np.asarray(r3.trajectory)   # (nt, nvars, nz, ny, nx)
        t2 = np.asarray(r2.trajectory)   # (nt, nvars, ny, nx)
        for k in range(cfg3.nz):
            np.testing.assert_allclose(t3[:, :, k], t2, rtol=1e-12,
                                       atol=1e-13)

    def test_obstacle_holds_ic_and_walls_conserve(self):
        """3-D scar: inert cells hold IC exactly; justDiffusion total mass
        is conserved through the driver with no-flux walls."""
        cfg = _box_cfg(model="goldbeter", just_diffusion=1,
                       boundary="noflux", t_final=0.3,
                       output_timestep=2).validate()
        shape = (cfg.nz, cfg.ny, cfg.nx)
        tissue = np.ones(shape, dtype=bool)
        tissue[3:5, 10:16, 6:10] = False
        p = build_problem(cfg, obstacle_mask=tissue)
        y0 = p.y0.at[0].set(jnp.asarray(1.0 + 0.2 * _rand(shape, 4)))
        p = dataclasses.replace(p, y0=y0)
        res = simulate(cfg, problem=p)
        assert res.ok
        traj = np.asarray(res.trajectory)
        # scar cells bitwise-frozen
        np.testing.assert_array_equal(traj[-1, 0][~tissue],
                                      np.asarray(y0[0])[~tissue])
        # mass conserved over tissue cells (no flux crosses walls)
        m0 = traj[0, 0][tissue].sum()
        m1 = traj[-1, 0][tissue].sum()
        assert abs(m1 - m0) < 1e-9 * abs(m0)

    def test_boundary_freeze_rows(self):
        """t < tBoundary freezes global y rows 0 and ny-1 (both variables,
        every depth) exactly like the 2-D reference behaviour
        (src/FHNmodel_torus.cpp:643-653)."""
        cfg = _box_cfg(t_boundary=0.25, t_final=0.2,
                       output_timestep=1).validate()
        res = simulate(cfg)
        assert res.ok
        traj = np.asarray(res.trajectory)
        np.testing.assert_array_equal(traj[-1][:, :, 0, :],
                                      traj[0][:, :, 0, :])
        np.testing.assert_array_equal(traj[-1][:, :, -1, :],
                                      traj[0][:, :, -1, :])
        # interior moved
        assert np.abs(traj[-1] - traj[0]).max() > 1e-6

    @pytest.mark.parametrize("method", ["rkc2", "ark324", "dopri54"])
    def test_methods_run(self, method):
        cfg = _box_cfg(method=method, t_final=0.2,
                       output_timestep=1).validate()
        res = simulate(cfg)
        assert res.ok
        assert np.isfinite(np.asarray(res.trajectory)).all()

    def test_normal_mode_and_streaming(self):
        cfg = _box_cfg(t_final=0.3, output_timestep=3).validate()
        cfgn = dataclasses.replace(cfg, step_mode="normal")
        rn = simulate(cfgn)
        assert rn.ok
        rs = simulate_streaming(cfg)
        rb = simulate(cfg)
        assert rs.ok and rb.ok
        np.testing.assert_array_equal(np.asarray(rs.trajectory),
                                      np.asarray(rb.trajectory))


class TestSharded:
    """Sharded box: the y/x axes decompose over the ('py','px') mesh with z
    mesh-local (parallel/sharded.py state specs are rank-aware)."""

    @pytest.fixture(autouse=True)
    def _need_devices(self):
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
    def test_sharded_matches_single_device(self, mesh_shape):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        cfg = _box_cfg(x_mesh=16, t_final=0.3, output_timestep=2).validate()
        r1 = simulate(cfg)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=mesh_shape))
        assert r1.ok and r8.ok
        assert r1.total_steps() == r8.total_steps()
        np.testing.assert_allclose(np.asarray(r8.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=1e-12, atol=1e-13)

    def test_sharded_uneven_grid(self):
        """Pad-and-mask on a grid that does NOT divide the mesh."""
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        cfg = _box_cfg(x_mesh=17, y_mesh=21, z_mesh=5, t_final=0.2,
                       output_timestep=1).validate()
        r1 = simulate(cfg)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)))
        assert r1.ok and r8.ok
        assert r1.total_steps() == r8.total_steps()
        np.testing.assert_allclose(np.asarray(r8.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=1e-12, atol=1e-13)

    def test_sharded_noflux_obstacle(self):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        cfg = _box_cfg(boundary="noflux", t_final=0.2,
                       output_timestep=1).validate()
        shape = (cfg.nz, cfg.ny, cfg.nx)
        tissue = np.ones(shape, dtype=bool)
        tissue[2:5, 8:14, 5:9] = False
        p1 = build_problem(cfg, obstacle_mask=tissue)
        p8 = build_problem(cfg, obstacle_mask=tissue)
        r1 = simulate(cfg, problem=p1)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)), problem=p8)
        assert r1.ok and r8.ok
        np.testing.assert_allclose(np.asarray(r8.trajectory),
                                   np.asarray(r1.trajectory),
                                   rtol=1e-12, atol=1e-13)

    def test_sharded_rkc2_streaming(self):
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            simulate_sharded, simulate_sharded_streaming)
        cfg = _box_cfg(method="rkc2", t_final=0.2,
                       output_timestep=2).validate()
        mesh = make_mesh(shape=(2, 4))
        rb = simulate_sharded(cfg, mesh=mesh)
        rs = simulate_sharded_streaming(cfg, mesh=mesh)
        assert rb.ok and rs.ok
        assert rb.total_steps() == rs.total_steps()
        # batch (one scan jit) and streaming (per-interval jit) are separate
        # compilation units: XLA reassociates the 3-D WRMS/rho reductions
        # differently, so equality holds to f64 rounding, not bitwise
        # (measured 1.1e-13 after 171 steps; the 2-D suites happen to get
        # identical fusions and stay bitwise)
        np.testing.assert_allclose(np.asarray(rs.trajectory),
                                   np.asarray(rb.trajectory),
                                   rtol=1e-11, atol=1e-11)


class TestVolumeViz:
    def test_vti_round_trip(self, tmp_path):
        from crdmodel_tpu.viz.volume import read_vti, write_vti
        rng = np.random.default_rng(7)
        u = rng.standard_normal((4, 6, 5))
        v = rng.standard_normal((4, 6, 5))
        for fmt in ("binary", "ascii"):
            path = str(tmp_path / f"t_{fmt}.vti")
            write_vti(path, {"u": u, "v": v}, spacing=(0.1, 0.2, 0.3),
                      origin=(1.0, 2.0, 3.0), fmt=fmt)
            fields, spacing, origin = read_vti(path)
            np.testing.assert_allclose(fields["u"], u, rtol=1e-15)
            np.testing.assert_allclose(fields["v"], v, rtol=1e-15)
            assert spacing == (0.1, 0.2, 0.3) and origin == (1.0, 2.0, 3.0)

    def test_vti_point_order_is_x_fastest(self, tmp_path):
        """VTK ImageData expects x-fastest ordering — the C-order ravel of
        (nz, ny, nx). Pin it with an index-encoding field."""
        from crdmodel_tpu.viz.volume import write_vti
        from crdmodel_tpu.viz.vtp import _decode_array
        import xml.etree.ElementTree as ET
        nz, ny, nx = 2, 3, 4
        K, J, I = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                              indexing="ij")
        enc = I + 10 * J + 100 * K
        path = str(tmp_path / "o.vti")
        write_vti(path, {"e": enc}, spacing=(1, 1, 1))
        da = ET.parse(path).getroot().find(
            "./ImageData/Piece/PointData/DataArray")
        flat = _decode_array(da)
        # first nx entries: x sweeps 0..nx-1 at j=k=0
        np.testing.assert_array_equal(flat[:nx], np.arange(nx))
        # entry nx: j=1, i=0
        assert flat[nx] == 10.0

    def test_volume_series_and_slice(self, tmp_path):
        from crdmodel_tpu.viz.volume import (read_vti, save_volume_series,
                                             volume_slice)
        cfg = _box_cfg(t_final=0.2, output_timestep=2).validate()
        res = simulate(cfg)
        pvd = save_volume_series(res, str(tmp_path))
        assert pvd.endswith("VolumeSteps.pvd")
        import glob
        vtis = sorted(glob.glob(str(tmp_path / "*step" / "*.vti")))
        assert len(vtis) == 3   # IC + 2 outputs
        fields, spacing, _ = read_vti(vtis[0])
        np.testing.assert_allclose(fields["u"],
                                   np.asarray(res.trajectory[0, 0]),
                                   rtol=1e-7)
        assert spacing == (cfg.dx, cfg.dy, cfg.dz)
        sl = volume_slice(res)                      # mid-z
        np.testing.assert_array_equal(
            sl, np.asarray(res.trajectory[:, 0, cfg.nz // 2]))
        sly = volume_slice(res, axis="y", index=3)
        np.testing.assert_array_equal(
            sly, np.asarray(res.trajectory[:, 0, :, 3, :]))
        with pytest.raises(ValueError, match="out of range"):
            volume_slice(res, axis="z", index=99)

    def test_cli_run_box(self, tmp_path):
        """CLI pipeline on the box: npz + frames + volume series."""
        import subprocess, sys, os, glob
        ini = tmp_path / "box.ini"
        ini.write_text(
            "[Parameters]\ndiffusion = 0.3\nbeta = 0.1\n"
            "surfaceWidth = 4\nsurfaceLength = 8\nsurfaceDepth = 2\n"
            "waveLength = 0.25\nwaveWidth = 0.5\noutputTimestep = 1\n"
            "tBoundary = 0\ntFinal = 0.2\nxMesh = 12\nzMesh = 4\n"
            "[System]\nincludeAllVars = 0\nvaryBeta = 0\n")
        out = tmp_path / "out"
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-m", "crdmodel_tpu", "run", str(ini),
             "--model", "aliev_panfilov", "--surface", "box",
             "--outdir", str(out), "--plot", "--map-torus", "--quiet"],
            capture_output=True, text=True, env=env, timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        assert glob.glob(str(out / "*.npz"))
        assert glob.glob(str(out / "*VolumeSteps.pvd"))
        assert glob.glob(str(out / "*step" / "*.vti"))
        assert glob.glob(str(out / "png" / "*.png"))
