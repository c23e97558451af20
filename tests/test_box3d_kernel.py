"""Fused 3-D box step kernel (ops/pallas_box3d.py) — interpreter-mode
equivalence against the XLA divergence path.

The kernel streams the embedded-ERK step along z with per-stage plane ring
buffers (module docstring); the XLA path (core/problem.py::make_rhs ->
ops/stencil.py::divergence_laplacian3) is the oracle. The bar matches the
other fused-kernel suites: identical accepted/rejected step sequences and
trajectories equal to f32 rounding.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.ops import pallas_box3d, pallas_divform, pallas_imex, \
    pallas_rkc, pallas_step
from crdmodel_tpu.integrate.erk import TABLEAUS
from crdmodel_tpu.sim import make_run_fn


def box_cfg(**kw):
    base = dict(model="aliev_panfilov", surface="box", x_mesh=24,
                surface_width=10.0, surface_length=10.0, surface_depth=3.0,
                z_mesh=6, t_final=2.0, output_timestep=2, beta=0.0,
                dtype="float32", method="bs32", rtol=1e-4, atol=1e-7,
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


def assert_equivalent(bundle, atol=5e-6):
    tk, sk, tx, sx = bundle
    assert np.array_equal(np.asarray(sk.steps), np.asarray(sx.steps))
    assert np.array_equal(np.asarray(sk.rejected), np.asarray(sx.rejected))
    assert np.all(np.asarray(sk.status) == 0)
    np.testing.assert_allclose(tk, tx, rtol=0, atol=atol)


# ----------------------------------------------------------------------
# Gate routing


def test_gate_requires_closed_z_walls():
    tab = TABLEAUS["bs32"]
    f32 = jnp.float32
    # closed z: noflux (all walls) and noflux_z (z only) are eligible
    for boundary in ("noflux", "noflux_z"):
        p = build_problem(box_cfg(boundary=boundary))
        assert pallas_box3d.is_box3d_supported(p, tab, f32), boundary
        # the 2-D kernels must all decline the box
        assert not pallas_step.is_supported(p, tab, f32)
        assert not pallas_divform.is_divform_supported(p, tab, f32)
        assert not pallas_imex.is_imex_supported(p, f32)
        assert not pallas_rkc.is_rkc_supported(p, f32)
    # periodic z: the clamp would be wrong — XLA path
    p = build_problem(box_cfg(boundary="periodic"))
    assert not pallas_box3d.is_box3d_supported(p, tab, f32)
    p = build_problem(box_cfg(boundary="noflux_x"))
    assert not pallas_box3d.is_box3d_supported(p, tab, f32)


def test_gate_accepts_obstacles_and_fields():
    tab = TABLEAUS["bs32"]
    cfg = box_cfg()
    # obstacle scars run fused: the six openness factors come from the
    # tissue plane ring (session 16) — constant-D coefficients factor as
    # profile x openness exactly
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[2:4, 8:14, 6:12] = False
    p = build_problem(cfg, obstacle_mask=mask)
    assert pallas_box3d.is_box3d_supported(p, tab, jnp.float32)
    # full 3-D diffusion fields stream the coefficient plane ring
    # (session 19) — closed z walls still gate the z clamp
    rng = np.random.default_rng(0)
    dfield = 0.08 + 0.02 * rng.random((cfg.nz, cfg.ny, cfg.nx))
    p = build_problem(cfg, diffusion_field=dfield)
    assert pallas_box3d.is_box3d_supported(p, tab, jnp.float32)
    p = build_problem(box_cfg(boundary="noflux_x"), diffusion_field=dfield)
    assert not pallas_box3d.is_box3d_supported(p, tab, jnp.float32)


def field_3d(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return 0.08 + 0.04 * rng.random((cfg.nz, cfg.ny, cfg.nx))


def test_field_matches_xla():
    cfg = box_cfg()
    bundle, _ = run_pair(cfg, diffusion_field=field_3d(cfg))
    assert_equivalent(bundle)


def test_field_with_scar_matches_xla_and_holds_ic():
    # field mode + obstacle: masked faces ride the coefficient ring, the
    # tissue ring only zeroes kinetics on dead cells
    cfg = box_cfg()
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[2:4, 8:14, 6:12] = False
    bundle, p = run_pair(cfg, diffusion_field=field_3d(cfg, 1),
                         obstacle_mask=mask)
    assert_equivalent(bundle)
    ic = np.asarray(p.y0)
    scar = ~mask
    for fr in bundle[0]:
        assert np.array_equal(fr[:, scar], ic[:, scar])


def test_field_just_diffusion_conserves_mass():
    cfg = box_cfg(just_diffusion=1, t_final=1.0)
    bundle, p = run_pair(cfg, diffusion_field=field_3d(cfg, 2))
    assert_equivalent(bundle)
    tk = bundle[0]
    m0 = np.asarray(p.y0)[0].astype(np.float64).sum()
    m1 = tk[-1][0].astype(np.float64).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def scar_mask(cfg):
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[2:4, 8:14, 6:12] = False
    return mask


def test_obstacle_scar_matches_xla_and_holds_ic():
    cfg = box_cfg()
    mask = scar_mask(cfg)
    bundle, p = run_pair(cfg, obstacle_mask=mask)
    assert_equivalent(bundle)
    ic = np.asarray(p.y0)
    scar = ~mask
    for fr in bundle[0]:
        assert np.array_equal(fr[:, scar], ic[:, scar])


def test_obstacle_scar_conserves_mass():
    # zero-flux scar walls: total mass over LIVE cells is conserved by
    # the masked conservative operator through the adaptive driver
    cfg = box_cfg(just_diffusion=1, t_final=1.0)
    mask = scar_mask(cfg)
    bundle, p = run_pair(cfg, obstacle_mask=mask)
    assert_equivalent(bundle)
    tk = bundle[0]
    m0 = np.asarray(p.y0)[0][mask].astype(np.float64).sum()
    m1 = tk[-1][0][mask].astype(np.float64).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


# ----------------------------------------------------------------------
# Equivalence runs (interpreter mode vs XLA)


def test_noflux_box_matches_xla():
    bundle, _ = run_pair(box_cfg())
    assert_equivalent(bundle)


def test_periodic_xy_closed_z_matches_xla():
    # periodic wrap in x (lane halos) and y (wrapped strip rows) composes
    # with the clamped z stream
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


def test_dopri54_deeper_pipeline():
    # 7 stages: z ring depths grow with the stage count
    bundle, _ = run_pair(box_cfg(method="dopri54"))
    assert_equivalent(bundle)


def test_thin_slab_nz3():
    # nz=3 (the minimum): stage z legs clamp at both walls within the
    # pipeline warmup/drain window
    bundle, _ = run_pair(box_cfg(z_mesh=3, surface_depth=1.0))
    assert_equivalent(bundle)


def test_multi_strip_grid():
    # ny large enough for several strips; nz larger than the ring depth
    cfg = box_cfg(x_mesh=16, surface_width=8.0, surface_length=24.0,
                  z_mesh=12, surface_depth=6.0, t_final=1.0)
    p = build_problem(cfg)
    assert p.geometry.grid.ny > p.geometry.grid.nx
    bundle, _ = run_pair(cfg)
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


def test_just_diffusion_heat_decay():
    # pure heat equation on the closed box: total mass is conserved by the
    # conservative operator through the full fused driver
    cfg = box_cfg(just_diffusion=1, t_final=1.0)
    bundle, p = run_pair(cfg)
    assert_equivalent(bundle)
    tk = bundle[0]
    m0 = np.asarray(p.y0)[0].astype(np.float64).sum()
    m1 = tk[-1][0].astype(np.float64).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)
