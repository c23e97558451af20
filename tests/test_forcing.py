"""Time-dependent forcing (beyond-reference; the non-autonomy door).

Registered kinetics stay autonomous (models/base.py AUTONOMY CONTRACT —
every reference RHS is, src/FHNmodel_torus.cpp:504-667); time dependence
enters through build_problem(cfg, forcing=fn) with fn(t, state, params).
The XLA steppers evaluate forcing at true stage times t + C[i]*h, which
these tests pin with exact time-quadrature oracles; the fused kernels
decline (sim._pallas_eligible / sharded gates).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rhs
from crdmodel_tpu import simulate


def flat_cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=24, surface_width=10.0,
                surface_length=20.0, beta=1.25, t_final=2.0,
                output_timestep=4, dtype="float64", rtol=1e-8, atol=1e-12)
    base.update(kw)
    return SimConfig(**base)


OMEGA = 3.0


def cos_forcing(t, state, params):
    """Spatially-uniform A*cos(w t) drive on variable 0."""
    f0 = 0.7 * jnp.cos(OMEGA * t) * jnp.ones_like(state[0])
    return jnp.stack([f0] + [jnp.zeros_like(state[0])
                             for _ in range(state.shape[0] - 1)])


class TestStageTimeQuadrature:
    def test_pure_forcing_integrates_cos_exactly(self):
        """diffusion=0 + justDiffusion: u' = 0.7 cos(w t), so
        u(t) = u0 + 0.7 sin(w t)/w — an exact oracle for stage-time
        placement (a stepper evaluating the forcing without stage times
        would integrate a staircase instead)."""
        cfg = flat_cfg(model="goldbeter", just_diffusion=1, diffusion=0.0)
        prob = build_problem(cfg, forcing=cos_forcing)
        res = simulate(cfg, problem=prob)
        assert res.ok
        u0 = np.asarray(prob.y0[0])
        for k, t in enumerate(res.touts):
            expect = u0 + 0.7 * np.sin(OMEGA * t) / OMEGA
            np.testing.assert_allclose(np.asarray(res.trajectory[k, 0]),
                                       expect, rtol=0, atol=1e-7)

    def test_forced_heat_mean_mode(self):
        """With diffusion on, the spatial mean is untouched by the
        Laplacian (conservation), so mean(u)(t) still follows the exact
        forced-mode solution."""
        cfg = flat_cfg(model="goldbeter", just_diffusion=1, diffusion=0.12)
        prob = build_problem(cfg, forcing=cos_forcing)
        res = simulate(cfg, problem=prob)
        assert res.ok
        m0 = float(np.mean(np.asarray(prob.y0[0])))
        for k, t in enumerate(res.touts):
            expect = m0 + 0.7 * np.sin(OMEGA * t) / OMEGA
            assert abs(float(np.mean(np.asarray(res.trajectory[k, 0])))
                       - expect) < 1e-7


class TestComposition:
    def test_rhs_is_unforced_plus_forcing(self):
        cfg = flat_cfg()
        pf = build_problem(cfg, forcing=cos_forcing)
        pu = build_problem(cfg)
        y = pf.y0 + 0.1
        for t in (0.0, 0.37):
            # 1-ulp association tolerance: the forced rhs adds the terms as
            # (diff + forcing) + kinetics
            np.testing.assert_allclose(
                np.asarray(pf.rhs(t, y, pf.params)),
                np.asarray(pu.rhs(t, y, pu.params)
                           + cos_forcing(t, y, pu.params)),
                rtol=0, atol=1e-14)

    def test_imex_split_keeps_forcing_explicit(self):
        cfg = flat_cfg(method="ark324", t_boundary=0.5)
        prob = build_problem(cfg, forcing=cos_forcing)
        rhs_ex, rhs_im = make_rhs(cfg, prob.model, prob.geometry,
                                  jnp.float64, split=True,
                                  forcing=cos_forcing)
        y = prob.y0 + 0.05
        for t in (0.2, 0.8):
            np.testing.assert_allclose(
                np.asarray(prob.rhs(t, y, prob.params)),
                np.asarray(rhs_ex(t, y, prob.params))
                + np.asarray(rhs_im(t, y, prob.params)),
                rtol=0, atol=1e-14)
        # implicit part must not depend on t (pointwise autonomous) —
        # compare two times on the SAME side of the freeze boundary
        np.testing.assert_array_equal(
            np.asarray(rhs_im(0.2, y, prob.params)),
            np.asarray(rhs_im(0.3, y, prob.params)))

    def test_ark324_forced_matches_bs32(self):
        cfg = flat_cfg(t_final=1.0)
        r1 = simulate(cfg, problem=build_problem(cfg, forcing=cos_forcing))
        cfg2 = dataclasses.replace(cfg, method="ark324")
        r2 = simulate(cfg2, problem=build_problem(cfg2, forcing=cos_forcing))
        assert r1.ok and r2.ok
        np.testing.assert_allclose(np.asarray(r1.trajectory[-1]),
                                   np.asarray(r2.trajectory[-1]),
                                   rtol=0, atol=1e-6)

    def test_freeze_masks_forcing(self):
        """The absorbing-boundary freeze overrides the forced RHS on the
        global edge rows like everything else (src/FHNmodel_torus.cpp:
        643-653 semantics)."""
        cfg = flat_cfg(t_boundary=1.0)
        prob = build_problem(cfg, forcing=cos_forcing)
        y = prob.y0
        ydot = np.asarray(prob.rhs(0.1, y, prob.params))
        assert np.all(ydot[:, 0, :] == 0.0)
        assert np.all(ydot[:, -1, :] == 0.0)


class TestPacing:
    def test_periodic_stimulus_retriggers_fhn(self):
        """A localized periodic stimulus keeps re-exciting the medium: u
        rises above threshold after each pulse (simple pacing-protocol
        demonstration)."""
        cfg = flat_cfg(beta=1.3, t_final=12.0, output_timestep=12,
                       rtol=1e-6, atol=1e-9)
        prob0 = build_problem(cfg)
        us, _ = prob0.steady_state
        ny, nx = cfg.ny, cfg.nx
        bump = np.zeros((ny, nx))
        bump[ny // 2 - 2:ny // 2 + 2, nx // 2 - 2:nx // 2 + 2] = 4.0
        bump = jnp.asarray(bump)

        def pacing(t, state, params):
            # 20%-duty square pulse, period 4
            on = (jnp.mod(t, 4.0) < 0.8).astype(state.dtype)
            f0 = on * bump
            return jnp.stack([f0] + [jnp.zeros_like(state[0])
                                     for _ in range(state.shape[0] - 1)])

        y0 = jnp.broadcast_to(
            jnp.asarray([us, prob0.steady_state[1]])[:, None, None],
            prob0.y0.shape).astype(prob0.y0.dtype)
        prob = dataclasses.replace(build_problem(cfg, forcing=pacing), y0=y0)
        res = simulate(cfg, problem=prob)
        assert res.ok
        u = res.field(0)
        # rest state everywhere at t=0; excited (u > us + 1) at late pulses
        assert np.max(u[0]) <= us + 1e-9
        assert np.max(u[-1]) > us + 1.0 or np.max(u[-4:]) > us + 1.0


class TestGates:
    def test_kernels_decline_forcing(self):
        from crdmodel_tpu.sim import _pallas_eligible
        cfg = flat_cfg(dtype="float32", use_pallas=True)
        assert not _pallas_eligible(build_problem(cfg, forcing=cos_forcing))

    def test_sharded_forced_matches_single_device(self):
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        from crdmodel_tpu.parallel.mesh import make_mesh
        cfg = flat_cfg(x_mesh=32, t_final=1.0)
        r1 = simulate(cfg, problem=build_problem(cfg, forcing=cos_forcing))
        r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)),
                              problem=build_problem(cfg,
                                                    forcing=cos_forcing))
        assert r1.ok and r8.ok
        assert r1.total_steps() == r8.total_steps()
        np.testing.assert_allclose(np.asarray(r1.trajectory),
                                   np.asarray(r8.trajectory),
                                   rtol=0, atol=1e-12)
