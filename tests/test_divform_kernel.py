"""Fused divergence-form kernel (ops/pallas_divform.py) — interpreter-mode
equivalence against the XLA divergence path.

The kernel runs the configurations the 3-profile kernels decline (no-flux
boundaries, obstacle walls, full 2-D diffusion fields, flat-surface
fields); the XLA path (core/problem.py::make_rhs ->
ops/stencil.py::divergence_laplacian) is the oracle. The bar matches the
anisotropic kernel's tests: identical accepted/rejected step sequences
(the integrator decisions see the same numbers) and trajectories equal to
f32 rounding; obstacle scars must hold their IC exactly (bitwise).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.ops import pallas_divform, pallas_imex, pallas_rkc, \
    pallas_step
from crdmodel_tpu.ops.kernel_common import needs_divform
from crdmodel_tpu.integrate.erk import TABLEAUS
from crdmodel_tpu.sim import make_run_fn


def flat_cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=48, surface_width=20.0,
                surface_length=20.0, t_final=2.0, output_timestep=4,
                beta=1.25, dtype="float32", method="bs32", rtol=1e-4,
                atol=1e-7, use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def torus_cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=40, t_final=2.0,
                output_timestep=4, beta=1.25, dtype="float32",
                method="bs32", rtol=1e-4, atol=1e-7, use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def run_pair(cfg, **build_kw):
    """(traj_fused, stats_fused, traj_xla, stats_xla) — the fused kernel in
    interpreter mode vs the XLA path on the same problem."""
    p_k = build_problem(cfg, **build_kw)
    run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, **build_kw)
    run_x = jax.jit(make_run_fn(p_x)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    tx, sx = run_x(p_x.y0, p_x.params)
    return (np.asarray(tk), sk, np.asarray(tx), sx), p_k


def assert_equivalent(bundle, atol=5e-6):
    tk, sk, tx, sx = bundle
    assert np.array_equal(np.asarray(sk.steps), np.asarray(sx.steps))
    assert np.array_equal(np.asarray(sk.rejected), np.asarray(sx.rejected))
    assert np.all(np.asarray(sk.status) == 0)
    np.testing.assert_allclose(tk, tx, rtol=0, atol=atol)


# ----------------------------------------------------------------------
# Gate routing


def test_gates_route_divform_cases_off_profile_kernels():
    tab = TABLEAUS["bs32"]
    f32 = jnp.float32
    mask = np.ones((48, 48), bool)
    mask[10:20, 10:20] = False
    tor = torus_cfg()
    cases = [
        (flat_cfg(boundary="noflux"), {}),
        (flat_cfg(), dict(obstacle_mask=mask)),
        (tor, dict(diffusion_field=np.full((tor.ny, tor.nx), 0.1))),
        (flat_cfg(), dict(diffusion_field=np.full(48, 0.1))),
    ]
    for cfg, kw in cases:
        p = build_problem(cfg, **kw)
        assert needs_divform(p)
        assert not pallas_step.is_supported(p, tab, f32)
        assert not pallas_imex.is_imex_supported(p, f32)
        assert pallas_divform.is_divform_supported(p, tab, f32)
        # rkc2 runs divform through its own divform branch (nb=1 plans)
        assert pallas_rkc.is_rkc_supported(p, f32)
    # theta-only torus fields keep the profile remap (NOT divform)
    p = build_problem(torus_cfg(), diffusion_field=np.full(40, 0.1))
    assert not needs_divform(p)
    assert pallas_step.is_supported(p, TABLEAUS["bs32"], f32)
    # constant-D periodic problems keep the profile kernels
    p = build_problem(flat_cfg())
    assert not needs_divform(p)


# ----------------------------------------------------------------------
# Equivalence runs (interpreter mode vs XLA)


def test_noflux_boundary_matches_xla():
    bundle, _ = run_pair(flat_cfg(boundary="noflux"))
    assert_equivalent(bundle)


def test_obstacle_matches_xla_and_scar_holds_ic():
    cfg = flat_cfg()
    mask = np.ones((cfg.ny, cfg.nx), bool)
    mask[20:28, 30:40] = False
    bundle, p_k = run_pair(cfg, obstacle_mask=mask)
    assert_equivalent(bundle)
    tk = bundle[0]
    ic = np.asarray(p_k.y0)[:, 20:28, 30:40]
    assert np.array_equal(tk[-1][:, 20:28, 30:40], ic)


def test_torus_2d_field_matches_xla():
    cfg = torus_cfg()
    rng = np.random.default_rng(7)
    dfield = 0.08 + 0.04 * rng.random((cfg.ny, cfg.nx))
    bundle, _ = run_pair(cfg, diffusion_field=dfield)
    assert_equivalent(bundle)


def test_flat_profile_field_matches_xla():
    # flat-surface diffusion fields had NO fused path before this kernel
    cfg = flat_cfg()
    dfield = 0.06 + 0.05 * np.cos(np.linspace(0, 2 * np.pi, cfg.nx,
                                              endpoint=False))
    bundle, _ = run_pair(cfg, diffusion_field=dfield)
    assert_equivalent(bundle)


def test_sphere_2d_field_matches_xla():
    cfg = SimConfig(model="fhn", surface="sphere", x_mesh=24, t_final=1.0,
                    output_timestep=2, beta=1.25, dtype="float32",
                    method="bs32", rtol=1e-4, atol=1e-7, use_pallas=True)
    rng = np.random.default_rng(3)
    dfield = 0.08 + 0.04 * rng.random((cfg.ny, cfg.nx))
    bundle, _ = run_pair(cfg, diffusion_field=dfield)
    assert_equivalent(bundle)


def test_freeze_and_beta_field_compose():
    cfg = flat_cfg(boundary="noflux_y", t_final=1.0, t_boundary=0.4,
                   vary_beta=1, beta_min=0.9, beta_max=1.5)
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_dopri54_stages_fit_halo():
    cfg = flat_cfg(method="dopri54", boundary="noflux")
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_normal_step_mode_composes():
    cfg = flat_cfg(boundary="noflux", step_mode="normal")
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_dscale_runtime_input_matches_xla():
    # the sweep contract: params["dscale"] rescales the operator without
    # recompiling (ops/pallas_divform.py step_err)
    cfg = flat_cfg(boundary="noflux")
    p_k = build_problem(cfg)
    run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x)
    run_x = jax.jit(make_run_fn(p_x)[0])
    params_k = {**p_k.params, "dscale": jnp.asarray(0.5, jnp.float32)}
    params_x = {**p_x.params, "dscale": jnp.asarray(0.5, jnp.float32)}
    tk, sk = run_k(p_k.y0, params_k)
    tx, sx = run_x(p_x.y0, params_x)
    assert np.array_equal(np.asarray(sk.steps), np.asarray(sx.steps))
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=5e-6)


def test_rkc2_divform_single_steps_match_xla():
    """The divform branch of the fused RKC kernel (pallas_rkc.py): both a
    shallow (s=7) and a deep (s=21) Chebyshev step against the XLA rkc2
    stepper at identical (t, y, h) on a bounded (noflux + scar) problem.
    Drift bars follow test_rkc.py::test_fused_rkc_halo_variants_match_xla
    (measured f32 accumulation drift: ~6e-6 at s=7, ~3e-5 at s=21)."""
    from crdmodel_tpu.core.problem import make_rho_bound, make_rhs
    from crdmodel_tpu.integrate.rkc import choose_stages, make_rkc2_step_err
    from crdmodel_tpu.ops import pallas_rkc

    cfg = flat_cfg(x_mesh=128, diffusion=1.0, method="rkc2",
                   boundary="noflux", rtol=1e-5, atol=1e-8)
    mask = np.ones((cfg.ny, cfg.nx), bool)
    mask[50:78, 40:70] = False
    p = build_problem(cfg, obstacle_mask=mask)
    assert pallas_rkc.is_rkc_supported(p, jnp.float32)
    fused = pallas_rkc.build_fused_rkc_step(p, jnp.float32, interpret=True)
    rho_fn = make_rho_bound(cfg, p.model, p.geometry, jnp.float32,
                            diffusion_field=p.diffusion_field,
                            face_mask=p.face_mask)
    rhs = make_rhs(cfg, p.model, p.geometry, jnp.float32,
                   diffusion_field=p.diffusion_field,
                   face_mask=p.face_mask, obstacle_mask=p.obstacle_mask)
    step_xla, init_carry = make_rkc2_step_err(rhs, rho_fn,
                                              cfg.rtol, cfg.atol)
    rng = np.random.default_rng(1)
    y = jnp.asarray(np.asarray(p.y0)
                    + 0.05 * rng.standard_normal(p.y0.shape), jnp.float32)
    params = {**p.params, "_seg_end": jnp.asarray(2.0, jnp.float32)}
    t = jnp.asarray(0.3, jnp.float32)
    rho = float(rho_fn(t, y, params))
    for target, atol in ((20.0, 2e-5), (250.0, 1e-4)):
        h = jnp.asarray(target / rho, jnp.float32)
        s = int(choose_stages(h, jnp.asarray(rho, jnp.float32)))
        assert (s <= 7) == (target == 20.0), s
        f0 = init_carry(t, y, params)
        y1, ss1, _ = jax.jit(step_xla)(t, y, h, params, f0)
        y2p, ss2, _ = fused.step_err(t, fused.pad(y), h, params)
        np.testing.assert_allclose(np.asarray(fused.unpad(y2p)),
                                   np.asarray(y1), rtol=0, atol=atol)
        np.testing.assert_allclose(float(ss2), float(ss1), rtol=1e-3)


def test_rkc2_divform_full_run_matches_xla():
    """End-to-end: auto-selected divform RKC through make_run_fn on a
    2-D diffusion field vs the XLA rkc2 driver. f32 controller rounding
    can shift accept/reject decisions across ~90 steps, so the bar is
    near-equal step counts + close trajectories (the documented
    fused-vs-XLA rkc drift class), not bitwise step sequences."""
    cfg = flat_cfg(x_mesh=128, diffusion=1.0, method="rkc2",
                   boundary="noflux_y", t_final=1.0, rtol=1e-5, atol=1e-8)
    rng = np.random.default_rng(5)
    dfield = 0.8 + 0.4 * rng.random((cfg.ny, cfg.nx))
    bundle, _ = run_pair(cfg, diffusion_field=dfield)
    tk, sk, tx, sx = bundle
    assert np.all(np.asarray(sk.status) == 0)
    assert np.all(np.asarray(sx.status) == 0)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps)).max()
    assert gap <= 3, (sk.steps, sx.steps)
    np.testing.assert_allclose(tk, tx, rtol=0, atol=2e-3)


def test_gray_scott_two_diffusive_vars():
    # diffusion_ratios != 1 exercise the per-variable ratio scaling
    cfg = flat_cfg(model="grayscott", boundary="noflux", beta=0.06,
                   t_final=10.0, rtol=1e-5, atol=1e-8)
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)
