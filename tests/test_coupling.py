"""Spatially-varying diffusion (conservative flux form) + curvature coupling.

The reference computes the Kneer et al. (2014) curvature-coupling profile
C(theta) for visualisation only (util/GenCurvatureCoupling.py:29-43,90) —
its simulations are constant-D. coupling="curvature" feeds that profile back
into the dynamics through ops/stencil.py::divergence_laplacian, a flux-form
discretisation of div(D grad u) on the surface metric that is exactly
conservative and self-adjoint by construction (core/grid.py::
divergence_coeffs). These tests pin those exact properties plus 2nd-order
consistency, cross-path equivalence (sharded/IMEX/dscale) and the
end-to-end drivers.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import (build_problem,
                                       diffusion_field_from_cfg, make_rhs)
from crdmodel_tpu.core.grid import make_geometry
from crdmodel_tpu.ops.stencil import (divergence_laplacian, flat_laplacian,
                                      torus_laplacian)
from crdmodel_tpu import simulate


def torus_cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=48, surface_width=20.0,
                surface_length=80.0, t_final=0.5, output_timestep=2,
                beta=1.25, dtype="float64")
    base.update(kw)
    return SimConfig(**base)


def rand_field(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape)


class TestOperatorExactProperties:
    """Conservation and self-adjointness hold to rounding for ANY D and u."""

    def test_torus_conservation(self):
        cfg = torus_cfg()
        geom = make_geometry(cfg)
        D = 0.12 * (1.0 + 0.8 * rand_field(geom.grid.shape, 1) ** 2)
        fc = geom.divergence_coeffs(D, jnp.float64)
        u = jnp.asarray(rand_field(geom.grid.shape, 2))
        Lu = np.asarray(divergence_laplacian(u, fc))
        w = geom.row_weights()
        total = np.sum(Lu * w)
        assert abs(total) < 1e-10 * np.sum(np.abs(Lu) * w)

    def test_flat_conservation(self):
        cfg = torus_cfg(surface="flat")
        geom = make_geometry(cfg)
        D = 0.12 * (1.0 + 0.8 * rand_field(geom.grid.shape, 3) ** 2)
        fc = geom.divergence_coeffs(D, jnp.float64)
        u = jnp.asarray(rand_field(geom.grid.shape, 4))
        Lu = np.asarray(divergence_laplacian(u, fc))
        assert abs(np.sum(Lu)) < 1e-10 * np.sum(np.abs(Lu))

    @pytest.mark.parametrize("surface", ["torus", "flat"])
    def test_self_adjoint(self, surface):
        cfg = torus_cfg(surface=surface)
        geom = make_geometry(cfg)
        D = 0.12 * (1.0 + 0.8 * rand_field(geom.grid.shape, 5) ** 2)
        fc = geom.divergence_coeffs(D, jnp.float64)
        u = jnp.asarray(rand_field(geom.grid.shape, 6))
        v = jnp.asarray(rand_field(geom.grid.shape, 7))
        w = geom.row_weights() if surface == "torus" else 1.0
        a1 = np.sum(np.asarray(v) * np.asarray(divergence_laplacian(u, fc)) * w)
        a2 = np.sum(np.asarray(u) * np.asarray(divergence_laplacian(v, fc)) * w)
        assert abs(a1 - a2) < 1e-9 * max(abs(a1), 1.0)

    def test_constant_u_is_exactly_zero(self):
        cfg = torus_cfg()
        geom = make_geometry(cfg)
        fc = geom.divergence_coeffs(0.12 * (1 + 0.5 * np.cos(
            np.asarray(geom.grid.x_coords(jnp.float64)))), jnp.float64)
        u = jnp.full(geom.grid.shape, 3.7, dtype=jnp.float64)
        assert np.all(np.asarray(divergence_laplacian(u, fc)) == 0.0)


class TestConsistency:
    def test_flat_constant_D_equals_five_point_stencil(self):
        """With constant D the flat flux form IS the reference 5-point
        stencil (src/FHNmodel_flat.cpp:489-500) up to association order."""
        cfg = torus_cfg(surface="flat")
        geom = make_geometry(cfg)
        u = jnp.asarray(rand_field(geom.grid.shape, 8))
        fc = geom.divergence_coeffs(cfg.diffusion, jnp.float64)
        L1 = np.asarray(divergence_laplacian(u, fc))
        L2 = np.asarray(flat_laplacian(u, geom.stencil_coeffs(jnp.float64)))
        np.testing.assert_allclose(L1, L2, rtol=0, atol=1e-12 * np.max(np.abs(L2)))

    def test_torus_constant_D_second_order_vs_reference_stencil(self):
        """Flux form and the reference's non-conservative expansion
        (src/FHNmodel_torus.cpp:527-541) are both 2nd-order discretisations
        of the same operator: their difference shrinks ~4x per refinement."""
        diffs = []
        for n in (48, 96):
            cfg = torus_cfg(x_mesh=n)
            geom = make_geometry(cfg)
            th = np.asarray(geom.grid.x_coords(jnp.float64))
            ph = np.asarray(geom.grid.y_coords(jnp.float64))
            u = jnp.asarray(np.cos(th)[None, :]
                            + 0.3 * np.cos(ph)[:, None])
            L1 = np.asarray(divergence_laplacian(
                u, geom.divergence_coeffs(cfg.diffusion, jnp.float64)))
            L2 = np.asarray(torus_laplacian(
                u, geom.stencil_coeffs(jnp.float64)))
            diffs.append(np.max(np.abs(L1 - L2)))
        ratio = diffs[0] / diffs[1]
        assert 3.3 < ratio < 4.7, (diffs, ratio)

    def test_torus_variable_D_converges_to_analytic(self):
        """Manufactured solution: u = cos(th) + 0.3 cos(phi),
        D = D0 (1 + 0.5 cos th). Analytic
        div(D grad u) = (1/(r^2 ring)) d/dth(ring D u_th) + D u_phiphi/ring^2
        with ring = R + r cos th."""
        errs = []
        for n in (48, 96):
            cfg = torus_cfg(x_mesh=n)
            geom = make_geometry(cfg)
            R, r = geom.R, geom.r
            th = np.asarray(geom.grid.x_coords(jnp.float64))
            ph = np.asarray(geom.grid.y_coords(jnp.float64))
            D0 = cfg.diffusion
            D = D0 * (1.0 + 0.5 * np.cos(th))
            ring = R + r * np.cos(th)
            # d/dth [ ring * D * (-sin th) ]
            dth_term = ((-r * np.sin(th)) * D * (-np.sin(th))
                        + ring * (-0.5 * D0 * np.sin(th)) * (-np.sin(th))
                        + ring * D * (-np.cos(th)))
            exact = (dth_term / (r * r * ring))[None, :] \
                + (D / ring ** 2)[None, :] * (-0.3 * np.cos(ph))[:, None]
            u = jnp.asarray(np.cos(th)[None, :] + 0.3 * np.cos(ph)[:, None])
            L = np.asarray(divergence_laplacian(
                u, geom.divergence_coeffs(D, jnp.float64)))
            # exclude the duplicated-seam rows/columns: the grid's
            # (n-1)-spacing convention (reference src/FHNmodel_torus.cpp:
            # 233-234, a documented parity quirk shared by ALL the stencils)
            # makes the wrap neighbours inconsistent with the continuum at
            # the seam itself; interior points see correct neighbours.
            err = np.abs(L - exact)[1:-1, 1:-1]
            errs.append(np.max(err))
        ratio = errs[0] / errs[1]
        assert 3.3 < ratio < 4.7, (errs, ratio)


class TestCurvatureCouplingField:
    def test_mean_normalised_to_diffusion(self):
        cfg = torus_cfg(coupling="curvature")
        geom = make_geometry(cfg)
        D = diffusion_field_from_cfg(cfg, geom)
        assert D.shape == (cfg.nx,)
        assert abs(np.mean(D) - cfg.diffusion) < 1e-14
        assert np.all(D > 0)

    def test_profile_matches_viz_formula(self):
        """The dynamics use exactly the P10/P11 coupling profile
        (viz/curvature.py::coupling_strength)."""
        from crdmodel_tpu.viz.curvature import coupling_strength
        cfg = torus_cfg(coupling="curvature")
        geom = make_geometry(cfg)
        D = diffusion_field_from_cfg(cfg, geom)
        th = np.asarray(geom.grid.x_coords(jnp.float64))
        C = coupling_strength(th, geom.r, geom.R)
        np.testing.assert_allclose(D / D.mean(), C / C.mean(), rtol=1e-12)

    def test_validation(self):
        with pytest.raises(ValueError, match="coupling"):
            torus_cfg(coupling="nope").validate()
        with pytest.raises(ValueError, match="torus"):
            torus_cfg(surface="flat", coupling="curvature").validate()
        with pytest.raises(ValueError, match="non-negative"):
            build_problem(torus_cfg(), diffusion_field=np.array([-0.1, 0.2]))
        with pytest.raises(ValueError, match="broadcast"):
            build_problem(torus_cfg(), diffusion_field=np.full(7, 0.1))

    def test_none_coupling_keeps_reference_operator(self):
        prob = build_problem(torus_cfg())
        assert prob.diffusion_field is None

    def test_coupling_joins_checkpoint_fingerprint(self):
        """Resuming a constant-D checkpoint with coupling='curvature' (or
        vice versa) must be refused: the operator changes the physics."""
        from crdmodel_tpu.io.checkpoint import config_fingerprint
        a = config_fingerprint(torus_cfg())
        b = config_fingerprint(torus_cfg(coupling="curvature"))
        assert a != b


class TestEndToEnd:
    def test_mass_conserved_through_integrator(self):
        """justDiffusion + curvature coupling: sum(ring*u) is a linear
        invariant of the flux form, preserved exactly by any Runge-Kutta
        step — conservation holds through the full adaptive driver."""
        cfg = torus_cfg(model="goldbeter", just_diffusion=1,
                        coupling="curvature", t_final=0.5,
                        output_timestep=4)
        prob = build_problem(cfg)
        res = simulate(cfg, problem=prob)
        assert res.ok
        w = prob.geometry.row_weights()
        m = [float(np.sum(np.asarray(res.trajectory[k, 0]) * w))
             for k in range(res.trajectory.shape[0])]
        assert max(abs(mi - m[0]) for mi in m) < 1e-12 * abs(m[0])

    def test_fhn_curvature_run_ok_and_differs_from_constant(self):
        cfg = torus_cfg(t_final=1.0, output_timestep=2)
        r_const = simulate(cfg)
        r_curv = simulate(dataclasses.replace(cfg, coupling="curvature"))
        assert r_const.ok and r_curv.ok
        d = np.max(np.abs(np.asarray(r_const.trajectory[-1])
                          - np.asarray(r_curv.trajectory[-1])))
        assert d > 1e-3  # the coupling visibly changes the dynamics

    def test_rkc2_with_coupling(self):
        cfg = torus_cfg(coupling="curvature", method="rkc2", t_final=0.5)
        res = simulate(cfg)
        assert res.ok
        ref = simulate(dataclasses.replace(cfg, method="bs32"))
        d = np.max(np.abs(np.asarray(res.trajectory[-1])
                          - np.asarray(ref.trajectory[-1])))
        assert d < 5e-4  # same dynamics within integrator tolerance

    def test_ark324_split_matches_composed_rhs(self):
        cfg = torus_cfg(coupling="curvature", t_boundary=0.2)
        prob = build_problem(cfg)
        rhs_ex, rhs_im = make_rhs(cfg, prob.model, prob.geometry,
                                  jnp.float64, split=True,
                                  diffusion_field=prob.diffusion_field)
        y = prob.y0 + 0.01 * jnp.asarray(
            rand_field(prob.y0.shape, 9))
        for t in (0.1, 0.3):
            full = np.asarray(prob.rhs(t, y, prob.params))
            parts = (np.asarray(rhs_ex(t, y, prob.params))
                     + np.asarray(rhs_im(t, y, prob.params)))
            np.testing.assert_array_equal(full, parts)

    def test_dscale_scales_field_operator(self):
        """The sweep driver's runtime dscale composes with field diffusion:
        dscale=2 equals a rebuilt problem with 2*D(x)."""
        cfg = torus_cfg(coupling="curvature")
        prob = build_problem(cfg)
        y = prob.y0
        p2 = dict(prob.params)
        p2["dscale"] = jnp.asarray(2.0, jnp.float64)
        scaled = np.asarray(prob.rhs(0.0, y, p2))
        prob2 = build_problem(cfg, diffusion_field=2.0 * prob.diffusion_field)
        rebuilt = np.asarray(prob2.rhs(0.0, y, prob2.params))
        np.testing.assert_allclose(scaled, rebuilt, rtol=0, atol=1e-13)


class TestFusedKernels:
    """Theta-only diffusion fields run through the fused Pallas kernels via
    the exact 3-profile remap (ops/kernel_common.py::kernel_stencil_coeffs):
    ca=(aE-aW)/2, ct=(aE+aW)/2. Interpreter-mode equivalence vs the XLA
    divergence path — f32-tolerance (the remap regroups the arithmetic),
    matching step counts."""

    def _run_pair(self, cfg, mesh_shape=(2, 4)):
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, sharded_params)
        from crdmodel_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(shape=mesh_shape)
        problem = build_problem(cfg)
        params, _ = sharded_params(problem)
        run_f, _ = make_sharded_simulation_fn(problem, mesh,
                                              interpret_pallas=True)
        traj_f, stats_f = run_f(problem.y0, params)
        p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
        run_x, _ = make_sharded_simulation_fn(p2, mesh)
        traj_x, stats_x = run_x(p2.y0, params)
        return (np.asarray(traj_f), stats_f), (np.asarray(traj_x), stats_x)

    def _cfg(self, **kw):
        base = dict(model="fhn", surface="torus", x_mesh=64,
                    surface_width=20.0, surface_length=40.0,
                    coupling="curvature", t_final=0.2, output_timestep=2,
                    beta=1.25, dtype="float32", rtol=1e-4, atol=1e-6,
                    use_pallas=True)
        base.update(kw)
        return SimConfig(**base)

    def test_fused_shard_step_matches_xla(self):
        (tf, sf), (tx, sx) = self._run_pair(self._cfg())
        assert int(np.sum(np.asarray(sf.steps))) == \
            int(np.sum(np.asarray(sx.steps)))
        np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)

    def test_fused_shard_rkc_matches_xla(self):
        (tf, sf), (tx, sx) = self._run_pair(self._cfg(method="rkc2"))
        assert int(np.sum(np.asarray(sf.steps))) == \
            int(np.sum(np.asarray(sx.steps)))
        np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)

    def test_fused_shard_imex_matches_xla(self):
        (tf, sf), (tx, sx) = self._run_pair(self._cfg(method="ark324"))
        assert int(np.sum(np.asarray(sf.steps))) == \
            int(np.sum(np.asarray(sx.steps)))
        np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)

    def test_full_2d_field_still_gates_to_xla(self):
        """A (ny, nx) field has no profile form — the kernels must decline."""
        from crdmodel_tpu.parallel.sharded import maybe_fused_shard_step
        from crdmodel_tpu.parallel.mesh import make_mesh
        cfg = self._cfg()
        geom = make_geometry(cfg)
        D = np.full(geom.grid.shape, 0.12)
        prob = build_problem(cfg, diffusion_field=D)
        assert maybe_fused_shard_step(prob, make_mesh(shape=(2, 4)),
                                      interpret=True) is None

    def test_remap_identity_f64(self):
        """In f64 the remapped profiles reproduce the divergence operator to
        rounding on a random field."""
        from crdmodel_tpu.ops.kernel_common import kernel_stencil_coeffs
        cfg = self._cfg(dtype="float64")
        prob = build_problem(cfg)
        ca, ct, cphi = kernel_stencil_coeffs(prob, jnp.float64)
        u = jnp.asarray(rand_field(prob.geometry.grid.shape, 12))
        L_remap = np.asarray(torus_laplacian(u, (ca, ct, cphi)))
        L_flux = np.asarray(divergence_laplacian(
            u, prob.geometry.divergence_coeffs(prob.diffusion_field,
                                               jnp.float64)))
        np.testing.assert_allclose(L_remap, L_flux, rtol=0,
                                   atol=1e-12 * np.max(np.abs(L_flux)))


class TestSharded:
    @pytest.mark.parametrize("x_mesh,shape", [(40, (2, 4)), (39, (2, 4)),
                                              (40, (4, 2))])
    def test_sharded_matches_single_device(self, x_mesh, shape):
        """Single- vs multi-device equivalence with the divergence operator,
        including the uneven (pad-and-mask) grid path."""
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        from crdmodel_tpu.parallel.mesh import make_mesh
        cfg = torus_cfg(x_mesh=x_mesh, coupling="curvature", t_final=0.5)
        r1 = simulate(cfg)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=shape))
        assert r1.ok and r8.ok
        assert r1.total_steps() == r8.total_steps()
        np.testing.assert_allclose(np.asarray(r1.trajectory),
                                   np.asarray(r8.trajectory),
                                   rtol=0, atol=5e-13)

    def test_sharded_full_2d_field(self):
        """A full (ny, nx) D field shards with P(y, x) specs."""
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        from crdmodel_tpu.parallel.mesh import make_mesh
        cfg = torus_cfg(x_mesh=40, t_final=0.25)
        geom = make_geometry(cfg)
        rng = np.random.default_rng(11)
        D = 0.12 * (1.0 + 0.5 * np.cos(
            np.asarray(geom.grid.x_coords(jnp.float64)))[None, :]
            + 0.1 * rng.random(geom.grid.shape))
        p1 = build_problem(cfg, diffusion_field=D)
        r1 = simulate(cfg, problem=p1)
        p8 = build_problem(cfg, diffusion_field=D)
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)), problem=p8)
        assert r1.ok and r8.ok
        np.testing.assert_allclose(np.asarray(r1.trajectory),
                                   np.asarray(r8.trajectory),
                                   rtol=0, atol=5e-13)
