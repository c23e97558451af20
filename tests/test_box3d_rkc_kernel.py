"""Fused 3-D box RKC kernel (ops/pallas_box3d_rkc.py) — interpreter-mode
equivalence against the XLA rkc2 path.

The kernel streams the whole Chebyshev stage recurrence along z with
per-stage plane ring buffers (module docstring); the XLA path
(integrate/rkc.py over core/problem.py::make_rhs) is the oracle. When the
per-step stage count stays within the kernel's s <= 7 budget the step
sequences are pinned identical (the same bar as the other fused-kernel
suites); the stage-cap divergence case asserts the documented contract
instead (h capped, more steps, same trajectory to integration tolerance).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.ops import pallas_box3d_rkc
from crdmodel_tpu.sim import make_run_fn


def box_cfg(**kw):
    base = dict(model="aliev_panfilov", surface="box", x_mesh=24,
                surface_width=10.0, surface_length=10.0, surface_depth=3.0,
                z_mesh=6, t_final=2.0, output_timestep=2, beta=0.0,
                dtype="float32", method="rkc2", rtol=1e-4, atol=1e-7,
                boundary="noflux", use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def run_pair(cfg, **build_kw):
    p_k = build_problem(cfg, **build_kw)
    run_k = jax.jit(make_run_fn(p_k, interpret=True)[0])
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, **build_kw)
    run_x = jax.jit(make_run_fn(p_x)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    tx, sx = run_x(p_x.y0, p_x.params)
    return (np.asarray(tk), sk, np.asarray(tx), sx), p_k


def assert_equivalent(bundle, atol=1e-5):
    # slightly looser than the ERK suites' 5e-6: the 5-term Chebyshev
    # combination accumulates f32 roundoff in a different order than the
    # XLA fori_loop (measured max drift 5.6e-6 on the noflux_z case)
    tk, sk, tx, sx = bundle
    assert np.array_equal(np.asarray(sk.steps), np.asarray(sx.steps))
    assert np.array_equal(np.asarray(sk.rejected), np.asarray(sx.rejected))
    assert np.all(np.asarray(sk.status) == 0)
    np.testing.assert_allclose(tk, tx, rtol=0, atol=atol)


# ----------------------------------------------------------------------
# Gate routing


def test_gate_requires_closed_z_walls():
    for boundary in ("noflux", "noflux_z"):
        p = build_problem(box_cfg(boundary=boundary))
        assert pallas_box3d_rkc.is_box3d_rkc_supported(p, jnp.float32), \
            boundary
    for boundary in ("periodic", "noflux_x"):
        p = build_problem(box_cfg(boundary=boundary))
        assert not pallas_box3d_rkc.is_box3d_rkc_supported(p, jnp.float32)


def test_gate_accepts_obstacles_and_fields():
    cfg = box_cfg()
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[2:4, 8:14, 6:12] = False
    p = build_problem(cfg, obstacle_mask=mask)
    assert pallas_box3d_rkc.is_box3d_rkc_supported(p, jnp.float32)
    rng = np.random.default_rng(0)
    dfield = 0.08 + 0.02 * rng.random((cfg.nz, cfg.ny, cfg.nx))
    p = build_problem(cfg, diffusion_field=dfield)
    assert pallas_box3d_rkc.is_box3d_rkc_supported(p, jnp.float32)
    # periodic x with a field: z walls still closed -> eligible; but a
    # fully periodic box declines (z clamp)
    p = build_problem(box_cfg(boundary="periodic"), diffusion_field=dfield)
    assert not pallas_box3d_rkc.is_box3d_rkc_supported(p, jnp.float32)


def test_field_matches_xla():
    cfg = box_cfg()
    rng = np.random.default_rng(3)
    dfield = 0.08 + 0.04 * rng.random((cfg.nz, cfg.ny, cfg.nx))
    bundle, _ = run_pair(cfg, diffusion_field=dfield)
    assert_equivalent(bundle)


def test_obstacle_scar_matches_xla_and_holds_ic():
    cfg = box_cfg()
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[2:4, 8:14, 6:12] = False
    bundle, p = run_pair(cfg, obstacle_mask=mask)
    assert_equivalent(bundle)
    ic = np.asarray(p.y0)
    scar = ~mask
    for fr in bundle[0]:
        assert np.array_equal(fr[:, scar], ic[:, scar])


def test_gate_f32_only():
    p = build_problem(box_cfg(dtype="float64"))
    assert not pallas_box3d_rkc.is_box3d_rkc_supported(p, jnp.float64)


# ----------------------------------------------------------------------
# Equivalence runs (interpreter mode vs XLA) — stage count within budget


def test_noflux_box_matches_xla():
    bundle, _ = run_pair(box_cfg())
    assert_equivalent(bundle)


def test_periodic_xy_closed_z_matches_xla():
    bundle, _ = run_pair(box_cfg(boundary="noflux_z"))
    assert_equivalent(bundle)


def test_fhn_freeze_and_beta_ramp_compose():
    cfg = box_cfg(model="fhn", beta=1.25, t_final=1.0, t_boundary=0.4,
                  vary_beta=1, beta_min=0.9, beta_max=1.5)
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_gray_scott_two_diffusive_vars():
    cfg = box_cfg(model="grayscott", beta=0.06, t_final=10.0,
                  rtol=1e-5, atol=1e-8)
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_multi_strip_grid():
    cfg = box_cfg(x_mesh=16, surface_width=8.0, surface_length=24.0,
                  z_mesh=12, surface_depth=6.0, t_final=1.0)
    p = build_problem(cfg)
    assert p.geometry.grid.ny > p.geometry.grid.nx
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_thin_slab_nz3():
    bundle, _ = run_pair(box_cfg(z_mesh=3, surface_depth=1.0))
    assert_equivalent(bundle)


def test_normal_step_mode_composes():
    bundle, _ = run_pair(box_cfg(step_mode="normal"))
    assert_equivalent(bundle)


def test_dscale_runtime_input_matches_xla():
    cfg = box_cfg()
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


def test_just_diffusion_conserves_mass():
    cfg = box_cfg(just_diffusion=1, t_final=1.0)
    bundle, p = run_pair(cfg)
    assert_equivalent(bundle)
    tk = bundle[0]
    m0 = np.asarray(p.y0)[0].astype(np.float64).sum()
    m1 = tk[-1][0].astype(np.float64).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


# ----------------------------------------------------------------------
# Stage-cap divergence: the documented h-cap contract


def test_stage_cap_takes_more_steps_same_solution():
    # loose tolerance + strong diffusion pushes the accuracy-limited h far
    # above the kernel's s <= 7 stability budget: XLA picks s > 7 freely,
    # the fused step caps h (FusedRKCStep.h_limit) and takes more steps —
    # the same contract as the 2-D fused RKC (ops/pallas_rkc.py)
    cfg = box_cfg(just_diffusion=1, diffusion=4.0, t_final=10.0,
                  rtol=1e-3, atol=1e-6)
    p_x = build_problem(dataclasses.replace(cfg, use_pallas=False))
    from crdmodel_tpu.integrate import rkc
    from crdmodel_tpu.core.problem import make_rho_bound
    rho = make_rho_bound(cfg, p_x.model, p_x.geometry, jnp.float32,
                         diffusion_field=p_x.diffusion_field,
                         face_mask=p_x.face_mask)(0.0, p_x.y0, p_x.params)
    bundle, p = run_pair(cfg)
    tk, sk, tx, sx = bundle
    # the XLA run must actually exceed the kernel budget for this test to
    # bite: its mean h implies s > 7
    h_mean = cfg.t_final / np.asarray(sx.steps).sum()
    assert int(rkc.choose_stages(jnp.asarray(h_mean), rho)) > 7
    assert np.all(np.asarray(sk.status) == 0)
    assert np.asarray(sk.steps).sum() > np.asarray(sx.steps).sum()
    np.testing.assert_allclose(tk[-1], tx[-1], rtol=0, atol=5e-3)
    m0 = np.asarray(p.y0)[0].astype(np.float64).sum()
    m1 = tk[-1][0].astype(np.float64).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)
