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


# ---------------------------------------------------------------------------
# Structured forcing through the FUSED kernels (VERDICT r3 #5): stimulation
# protocols as data (core/forcing.py::SeparableForcing) — per-stage scalar
# amplitudes at true stage times computed outside the kernel, rank-1 spatial
# profiles streamed like the beta field. Equivalence vs the XLA path, which
# these same protocols also run (the generic forcing contract).
# ---------------------------------------------------------------------------

def _fused_cfg(**kw):
    # fine output intervals: per-interval equivalence is ulp-level; coarse
    # intervals let a single borderline accept flip compound through the
    # pulse edges (same psum/reassociation budget as the sharded suites)
    base = dict(model="fhn", surface="flat", x_mesh=48, surface_width=20.0,
                surface_length=20.0, beta=1.25, t_final=1.0,
                output_timestep=10, dtype="float32", rtol=1e-4, atol=1e-6,
                use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def _protocol_smooth(cfg):
    """Smooth waveforms only: sharp pulse onsets trigger controller
    rejections whose accept/reject borderline flips amplify ulp-level
    path differences into step-count gaps (documented in the per-interval
    analysis) — the pulse machinery is pinned by the single-chip tests."""
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           gaussian_profile, rect_profile)
    s1 = Stimulus(waveform=lambda t: 1.5 * jnp.exp(-((t - 0.3) / 0.1) ** 2),
                  row=rect_profile(cfg.ny, 0, cfg.ny // 4))
    s2 = Stimulus(waveform=lambda t: 0.4 * jnp.cos(3.0 * t),
                  col=gaussian_profile(cfg.nx, cfg.nx / 2, cfg.nx / 8),
                  var=1)
    return SeparableForcing(s1, s2)


def _protocol(cfg, full2d=False):
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           gaussian_profile, pulse_train,
                                           rect_profile)
    if full2d:
        rng = np.random.default_rng(5)
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1], 0.2, 2.0),
                     spatial=rng.random((cfg.ny, cfg.nx))))
    s1 = Stimulus(waveform=pulse_train([0.05, 0.45], 0.15, 1.5),
                  row=rect_profile(cfg.ny, 0, cfg.ny // 4))
    s2 = Stimulus(waveform=lambda t: 0.4 * jnp.cos(3.0 * t),
                  col=gaussian_profile(cfg.nx, cfg.nx / 2, cfg.nx / 8),
                  var=1)
    return SeparableForcing(s1, s2)


class TestFusedForcing:
    def test_single_chip_fused_matches_xla(self):
        import jax
        from crdmodel_tpu.sim import make_run_fn
        cfg = _fused_cfg()
        p_k = build_problem(cfg, forcing=_protocol(cfg))
        run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=_protocol(cfg))
        run_x = jax.jit(make_run_fn(p_x)[0])
        tk, sk = run_k(p_k.y0, p_k.params)
        tx, sx = run_x(p_x.y0, p_x.params)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
        assert gap.max() <= 1 and gap.sum() <= 2
        assert np.all(np.asarray(sk.status) == 0)
        # a borderline accept flip near a pulse edge compounds mildly
        # (f32 controller rounding; per-step equivalence is ulp-level)
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-3)
        # the forcing actually did something
        p_0 = build_problem(cfg_x)
        run_0 = jax.jit(make_run_fn(p_0)[0])
        t0, _ = run_0(p_0.y0, p_0.params)
        assert np.abs(np.asarray(tk) - np.asarray(t0)).max() > 1e-3

    def test_fused_kernel_selected_with_separable_forcing(self):
        from crdmodel_tpu.integrate.erk import TABLEAUS
        from crdmodel_tpu.ops import pallas_step
        import jax.numpy as jnp
        cfg = _fused_cfg()
        p = build_problem(cfg, forcing=_protocol(cfg))
        assert pallas_step.is_supported(p, TABLEAUS["bs32"], jnp.float32)
        # a full-2D spatial stimulus declines
        p2 = build_problem(cfg, forcing=_protocol(cfg, full2d=True))
        assert not pallas_step.is_supported(p2, TABLEAUS["bs32"],
                                            jnp.float32)
        # free-form callables decline
        p3 = build_problem(cfg, forcing=cos_forcing)
        assert not pallas_step.is_supported(p3, TABLEAUS["bs32"],
                                            jnp.float32)

    def test_freeze_masks_forcing_in_kernel(self):
        """tBoundary freeze must mask the stimulus on the frozen rows —
        same bitwise contract as the XLA path's post-sum mask."""
        import jax
        from crdmodel_tpu.sim import make_run_fn
        cfg = _fused_cfg(t_boundary=0.3)
        p_k = build_problem(cfg, forcing=_protocol(cfg))
        run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=_protocol(cfg))
        run_x = jax.jit(make_run_fn(p_x)[0])
        tk, sk = run_k(p_k.y0, p_k.params)
        tx, sx = run_x(p_x.y0, p_x.params)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
        assert gap.max() <= 1 and gap.sum() <= 2
        # one borderline accept flip at the freeze release compounds
        # through the stiff transient (the documented f32 controller-
        # rounding budget; per-step equivalence is ulp-level)
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-3)

    def test_sharded_fused_matches_xla(self):
        import jax
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_step,
            sharded_params)
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = _fused_cfg(x_mesh=64, surface_length=10.0, surface_width=10.0)
        mesh = make_mesh(shape=(2, 4))
        p_k = build_problem(cfg, forcing=_protocol(cfg))
        assert maybe_fused_shard_step(p_k, mesh, interpret=True) is not None
        params, _ = sharded_params(p_k)
        run_k, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tk, sk = run_k(p_k.y0, params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=_protocol(cfg))
        params_x, _ = sharded_params(p_x)
        run_x, _ = make_sharded_simulation_fn(p_x, mesh)
        tx, sx = run_x(p_x.y0, params_x)
        gap = abs(int(np.sum(np.asarray(sk.steps)))
                  - int(np.sum(np.asarray(sx.steps))))
        assert gap <= 3
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=2e-4)

    def test_sharded_fused_padded_with_forcing(self):
        """Mirror padding composes with in-kernel forcing: the stimulus
        profiles are wrap-padded like every other spatial param."""
        import jax
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_step,
            mesh_pad_spec, sharded_params, simulate_sharded)
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = _fused_cfg(x_mesh=17, surface_width=20.0, surface_length=60.0)
        mesh = make_mesh(shape=(2, 2))
        p_k = build_problem(cfg, forcing=_protocol(cfg))
        pad_spec = mesh_pad_spec(cfg, mesh)
        assert pad_spec is not None and pad_spec.active
        assert maybe_fused_shard_step(p_k, mesh, interpret=True,
                                      pad_spec=pad_spec) is not None
        params, _ = sharded_params(p_k, pad_spec)
        run_k, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tk, sk = run_k(pad_spec.pad_field(p_k.y0), params)
        tk = np.asarray(pad_spec.unpad_field(tk))
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=_protocol(cfg))
        r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
        assert r_x.ok
        tx = np.asarray(r_x.trajectory)[1:]
        gap = abs(int(np.sum(np.asarray(sk.steps)))
                  - int(np.sum(np.asarray(r_x.stats.steps))))
        assert gap <= 3
        np.testing.assert_allclose(tk, tx, rtol=0, atol=1e-3)

    def test_s1s2_protocol_elicits_response(self):
        from crdmodel_tpu.core.forcing import s1s2_protocol
        cfg = _fused_cfg(use_pallas=False, t_final=2.0)
        frc = s1s2_protocol(cfg, amplitude=2.0, s1_times=[0.1],
                            s2_time=1.0, duration=0.3)
        p = build_problem(cfg, forcing=frc)
        res = simulate(cfg, problem=p)
        assert res.ok
        u = np.asarray(res.trajectory[-1, 0])
        p0 = build_problem(cfg)
        res0 = simulate(cfg, problem=p0)
        assert np.abs(u - np.asarray(res0.trajectory[-1, 0])).max() > 1e-2


class TestFusedDivformForcing:
    """Pacing on BOUNDED tissue (the real-world S1-S2 configuration):
    no-flux walls force the divergence-form kernel, which also evaluates
    SeparableForcing in-kernel."""

    def test_single_chip_noflux_matches_xla(self):
        import jax
        from crdmodel_tpu.sim import make_run_fn
        from crdmodel_tpu.integrate.erk import TABLEAUS
        from crdmodel_tpu.ops import pallas_divform
        cfg = _fused_cfg(boundary="noflux")
        p_k = build_problem(cfg, forcing=_protocol(cfg))
        assert pallas_divform.is_divform_supported(p_k, TABLEAUS["bs32"],
                                                   jnp.float32)
        run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=_protocol(cfg))
        run_x = jax.jit(make_run_fn(p_x)[0])
        tk, sk = run_k(p_k.y0, p_k.params)
        tx, sx = run_x(p_x.y0, p_x.params)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
        assert gap.max() <= 1 and gap.sum() <= 2
        assert np.all(np.asarray(sk.status) == 0)
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-3)

    def test_sharded_noflux_matches_xla(self):
        import jax
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_divform,
            sharded_params)
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = _fused_cfg(x_mesh=64, surface_length=10.0, surface_width=10.0,
                         boundary="noflux")
        mesh = make_mesh(shape=(2, 4))
        p_k = build_problem(cfg, forcing=_protocol_smooth(cfg))
        assert maybe_fused_shard_divform(p_k, mesh,
                                         interpret=True) is not None
        params, _ = sharded_params(p_k)
        run_k, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tk, sk = run_k(p_k.y0, params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=_protocol_smooth(cfg))
        params_x, _ = sharded_params(p_x)
        run_x, _ = make_sharded_simulation_fn(p_x, mesh)
        tx, sx = run_x(p_x.y0, params_x)
        gap = abs(int(np.sum(np.asarray(sk.steps)))
                  - int(np.sum(np.asarray(sx.steps))))
        assert gap <= 3
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-4)


class TestFusedRKCForcing:
    """Forcing through the fused sharded RKC2 kernel. Segment-gated pulse
    trains are constant per step (one amplitude column); smooth jittable
    waveforms (round 5) carry one amplitude per RHS evaluation, computed
    at the true Chebyshev stage times t + c_j h for the dispatch's pmax'd
    stage count OUTSIDE the kernel (ops/pallas_rkc.py::static_stage_tables
    with_times) — matching the XLA rkc2's stage-time evaluation
    (integrate/rkc.py:126-129)."""

    def test_sharded_rkc2_pulse_matches_xla(self):
        import jax
        from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                               pulse_train, rect_profile)
        from crdmodel_tpu.core.problem import make_rho_bound
        from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_rkc,
            sharded_params)
        from jax import lax
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = _fused_cfg(surface="torus", x_mesh=64, surface_width=20.0,
                         surface_length=40.0, method="rkc2", t_final=0.6)

        def frc():
            return SeparableForcing(
                Stimulus(waveform=pulse_train([0.1, 0.4], 0.1, 1.5),
                         row=rect_profile(cfg.ny, 0, cfg.ny // 4)))

        mesh = make_mesh(shape=(2, 2))
        p_k = build_problem(cfg, forcing=frc())
        rho = make_rho_bound(cfg, p_k.model, p_k.geometry, jnp.float32,
                             max_reduce=lambda x: lax.pmax(x,
                                                           (AXIS_Y, AXIS_X)))
        assert maybe_fused_shard_rkc(p_k, mesh, rho,
                                     interpret=True) is not None
        params, _ = sharded_params(p_k)
        run_k, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tk, sk = run_k(p_k.y0, params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=frc())
        run_x, _ = make_sharded_simulation_fn(p_x, mesh)
        tx, sx = run_x(p_x.y0, sharded_params(p_x)[0])
        assert np.all(np.asarray(sk.status) == 0)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
        assert gap.max() <= 1
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-4)

    def test_sharded_rkc2_smooth_waveform_matches_xla(self):
        """Round 5: smooth waveforms run in-kernel on the sharded RKC2
        path (previously declined) and match the XLA rkc2's true
        stage-time evaluation."""
        import jax
        from crdmodel_tpu.core.problem import make_rho_bound
        from crdmodel_tpu.ops.pallas_shard_rkc import is_shard_rkc_supported
        from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_rkc,
            sharded_params)
        from jax import lax
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = _fused_cfg(surface="torus", x_mesh=64, surface_width=20.0,
                         surface_length=40.0, method="rkc2", t_final=0.6)
        p_k = build_problem(cfg, forcing=_protocol_smooth(cfg))
        assert is_shard_rkc_supported(p_k, jnp.float32, 64, 64)
        mesh = make_mesh(shape=(2, 2))
        rho = make_rho_bound(cfg, p_k.model, p_k.geometry, jnp.float32,
                             max_reduce=lambda x: lax.pmax(x,
                                                           (AXIS_Y, AXIS_X)))
        assert maybe_fused_shard_rkc(p_k, mesh, rho,
                                     interpret=True) is not None
        params, _ = sharded_params(p_k)
        run_k, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tk, sk = run_k(p_k.y0, params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=_protocol_smooth(cfg_x))
        run_x, _ = make_sharded_simulation_fn(p_x, mesh)
        tx, sx = run_x(p_x.y0, sharded_params(p_x)[0])
        assert np.all(np.asarray(sk.status) == 0)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
        assert gap.max() <= 1
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-4)


def test_single_chip_rkc2_pulse_matches_xla():
    """Single-chip fused RKC2 with segment-gated pulses (interpreter)."""
    import jax
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           pulse_train, rect_profile)
    from crdmodel_tpu.sim import make_run_fn
    from crdmodel_tpu.ops.pallas_rkc import is_rkc_supported
    cfg = _fused_cfg(surface="torus", x_mesh=64, surface_width=20.0,
                     surface_length=40.0, method="rkc2", t_final=0.6)

    def frc():
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1, 0.4], 0.1, 1.5),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 4)))

    p_k = build_problem(cfg, forcing=frc())
    assert is_rkc_supported(p_k, jnp.float32)
    run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=frc())
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    assert np.all(np.asarray(sk.status) == 0)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 1
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=1e-4)


def test_single_chip_rkc2_divform_pulse_matches_xla():
    """Gated pulses + bounded tissue through the fused RKC divform branch."""
    import jax
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           pulse_train, rect_profile)
    from crdmodel_tpu.sim import make_run_fn
    cfg = _fused_cfg(boundary="noflux", method="rkc2", t_final=0.6)

    def frc():
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1, 0.4], 0.1, 1.5),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 4)))

    p_k = build_problem(cfg, forcing=frc())
    run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=frc())
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    assert np.all(np.asarray(sk.status) == 0)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 1
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=1e-4)


def test_single_chip_rkc2_smooth_waveform_matches_xla():
    """Round 5: smooth (non-gated) waveforms through the single-chip fused
    RKC2 kernel — per-eval amplitudes at the true Chebyshev stage times."""
    import jax
    from crdmodel_tpu.sim import make_run_fn
    from crdmodel_tpu.ops.pallas_rkc import is_rkc_supported
    cfg = _fused_cfg(surface="torus", x_mesh=64, surface_width=20.0,
                     surface_length=40.0, method="rkc2", t_final=0.6)
    p_k = build_problem(cfg, forcing=_protocol_smooth(cfg))
    assert is_rkc_supported(p_k, jnp.float32)
    run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=_protocol_smooth(cfg_x))
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    assert np.all(np.asarray(sk.status) == 0)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 1
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=1e-4)


def test_single_chip_rkc2_divform_smooth_matches_xla():
    """Smooth waveforms + bounded tissue through the fused RKC divform
    branch (round 5)."""
    import jax
    from crdmodel_tpu.sim import make_run_fn
    cfg = _fused_cfg(boundary="noflux", method="rkc2", t_final=0.6)
    p_k = build_problem(cfg, forcing=_protocol_smooth(cfg))
    run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=_protocol_smooth(cfg_x))
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    assert np.all(np.asarray(sk.status) == 0)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 1
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=1e-4)


class TestFusedBoxForcing:
    """Round 5 (VERDICT r4 item 1): structured forcing through ALL FOUR
    3-D box kernels — per-stage (ERK) / per-eval (RKC) amplitudes at true
    stage times, rank-1 row/col profiles, and the optional Stimulus.zprof
    depth profile riding the z-plane schedule. Oracles: the XLA forcing
    path on identical configs (step-count equality + trajectory match)."""

    @staticmethod
    def _box_cfg(**kw):
        base = dict(model="aliev_panfilov", surface="box", x_mesh=16,
                    surface_width=8.0, surface_length=16.0, y_mesh=32,
                    surface_depth=2.0, z_mesh=4, t_final=0.6,
                    output_timestep=1, beta=0.1, dtype="float32",
                    rtol=1e-4, atol=1e-6, boundary="noflux",
                    use_pallas=True)
        base.update(kw)
        return SimConfig(**base)

    @staticmethod
    def _box_protocol(cfg):
        from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                               gaussian_profile,
                                               pulse_train, rect_profile)
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1, 0.35], 0.1, 1.0),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 4),
                     zprof=gaussian_profile(cfg.nz, 0.0, 1.5)),
            Stimulus(waveform=lambda t: 0.3 * jnp.cos(4.0 * t),
                     col=rect_profile(cfg.nx, 0, cfg.nx // 2)))

    @pytest.mark.parametrize("method", ["bs32", "rkc2"])
    def test_single_chip_box_forcing_matches_xla(self, method):
        import jax
        from crdmodel_tpu.sim import make_run_fn
        from crdmodel_tpu.integrate.erk import TABLEAUS
        cfg = self._box_cfg(method=method)
        p_k = build_problem(cfg, forcing=self._box_protocol(cfg))
        if method == "bs32":
            from crdmodel_tpu.ops.pallas_box3d import is_box3d_supported
            assert is_box3d_supported(p_k, TABLEAUS["bs32"], jnp.float32)
        else:
            from crdmodel_tpu.ops.pallas_box3d_rkc import \
                is_box3d_rkc_supported
            assert is_box3d_rkc_supported(p_k, jnp.float32)
        run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
        tk, sk = run_k(p_k.y0, p_k.params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=self._box_protocol(cfg_x))
        run_x = jax.jit(make_run_fn(p_x)[0])
        tx, sx = run_x(p_x.y0, p_x.params)
        assert np.all(np.asarray(sk.status) == 0)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
        assert gap.max() <= 1
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-4)

    @pytest.mark.parametrize("method", ["bs32", "rkc2"])
    def test_sharded_box_forcing_matches_xla(self, method):
        import jax
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_box3d,
            sharded_params)
        from crdmodel_tpu.parallel.sharded import simulate_sharded
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = self._box_cfg(method=method)
        mesh = make_mesh(shape=(2, 2))
        p_k = build_problem(cfg, forcing=self._box_protocol(cfg))
        if method == "bs32":
            assert maybe_fused_shard_box3d(p_k, mesh,
                                           interpret=True) is not None
        params, _ = sharded_params(p_k)
        run_k, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tk, sk = run_k(p_k.y0, params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=self._box_protocol(cfg_x))
        r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
        tx = np.asarray(r_x.trajectory)[1:]
        assert np.all(np.asarray(sk.status) == 0)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(r_x.stats.steps))
        assert gap.max() <= 1
        np.testing.assert_allclose(np.asarray(tk), tx, rtol=0, atol=1e-4)

    def test_zprof_freeze_mask_and_validation(self):
        """zprof composes with the freeze mask bitwise in-kernel, and
        non-box surfaces reject zprof stimuli loudly."""
        import jax
        from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                               gaussian_profile,
                                               pulse_train, rect_profile)
        from crdmodel_tpu.sim import make_run_fn
        cfg = self._box_cfg(t_boundary=0.2, t_final=0.4)
        p_k = build_problem(cfg, forcing=self._box_protocol(cfg))
        run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
        tk, sk = run_k(p_k.y0, p_k.params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=self._box_protocol(cfg_x))
        run_x = jax.jit(make_run_fn(p_x)[0])
        tx, sx = run_x(p_x.y0, p_x.params)
        assert np.all(np.asarray(sk.status) == 0)
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-4)
        flat = flat_cfg()
        with pytest.raises(ValueError, match="zprof"):
            build_problem(flat, forcing=SeparableForcing(
                Stimulus(waveform=pulse_train([0.1], 0.1),
                         row=rect_profile(flat.ny, 0, 4),
                         zprof=gaussian_profile(4, 0.0, 1.0))))


class TestFusedImexForcing:
    """Round 5 (late): structured forcing through the fused ark324 IMEX
    kernels — amplitudes at the true EXPLICIT stage times t + C[s] h
    (imex.C), riding the explicit diffusion stages exactly like the XLA
    split's rhs_ex = diffusion + forcing (core/problem.py:505-510).
    With this, every fused kernel family (ERK, divform, aniso, RKC,
    box3d, box3d-RKC, IMEX) evaluates structured protocols in-kernel."""

    @staticmethod
    def _imex_cfg(**kw):
        base = dict(model="goldbeter", surface="torus", x_mesh=48,
                    surface_width=20.0, surface_length=40.0, beta=0.4,
                    t_final=1.0, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-7, method="ark324",
                    use_pallas=True)
        base.update(kw)
        return SimConfig(**base)

    @staticmethod
    def _protocol(cfg):
        from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                               gaussian_profile,
                                               pulse_train, rect_profile)
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1, 0.5], 0.1, 0.5),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 4)),
            Stimulus(waveform=lambda t: 0.2 * jnp.cos(5.0 * t),
                     col=gaussian_profile(cfg.nx, cfg.nx / 2, cfg.nx / 8)))

    def test_single_chip_imex_forcing_matches_xla(self):
        import jax
        from crdmodel_tpu.ops.pallas_imex import is_imex_supported
        from crdmodel_tpu.sim import make_run_fn
        cfg = self._imex_cfg()
        p_k = build_problem(cfg, forcing=self._protocol(cfg))
        assert is_imex_supported(p_k, jnp.float32)
        run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
        tk, sk = run_k(p_k.y0, p_k.params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=self._protocol(cfg_x))
        run_x = jax.jit(make_run_fn(p_x)[0])
        tx, sx = run_x(p_x.y0, p_x.params)
        assert np.all(np.asarray(sk.status) == 0)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
        assert gap.max() <= 1
        np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                                   rtol=0, atol=1e-3)

    def test_sharded_imex_forcing_matches_xla(self):
        import jax
        from crdmodel_tpu.parallel.mesh import make_mesh
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, maybe_fused_shard_imex,
            sharded_params, simulate_sharded)
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = self._imex_cfg()
        mesh = make_mesh(shape=(2, 2))
        p_k = build_problem(cfg, forcing=self._protocol(cfg))
        assert maybe_fused_shard_imex(p_k, mesh, interpret=True) is not None
        params, _ = sharded_params(p_k)
        run_k, _ = make_sharded_simulation_fn(p_k, mesh,
                                              interpret_pallas=True)
        tk, sk = run_k(p_k.y0, params)
        cfg_x = dataclasses.replace(cfg, use_pallas=False)
        p_x = build_problem(cfg_x, forcing=self._protocol(cfg_x))
        r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
        assert np.all(np.asarray(sk.status) == 0)
        gap = np.abs(np.asarray(sk.steps) - np.asarray(r_x.stats.steps))
        assert gap.max() <= 1
        np.testing.assert_allclose(np.asarray(tk),
                                   np.asarray(r_x.trajectory)[1:],
                                   rtol=0, atol=1e-3)
