"""Fused 3-D box SHARD kernel (ops/pallas_shard_box3d.py) — interpreter-
mode equivalence on the virtual CPU mesh.

The sharded XLA 7-point path (parallel/sharded.py::make_local_rhs with the
six-face divergence) is the oracle; the bar matches the other shard-kernel
suites: identical accepted/rejected step sequences and trajectories equal
to f32 rounding across mesh shapes.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.parallel.mesh import make_mesh
from crdmodel_tpu.parallel.sharded import (make_sharded_simulation_fn,
                                           maybe_fused_shard_box3d,
                                           maybe_fused_shard_divform,
                                           maybe_fused_shard_step,
                                           sharded_params)


def box_cfg(**kw):
    base = dict(model="aliev_panfilov", surface="box", x_mesh=32,
                surface_width=10.0, surface_length=20.0, y_mesh=64,
                surface_depth=3.0, z_mesh=6, t_final=1.0, output_timestep=2,
                beta=0.0, dtype="float32", method="bs32", rtol=1e-4,
                atol=1e-7, boundary="noflux", use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def run_pair(cfg, mesh_shape=(2, 2), **build_kw):
    mesh = make_mesh(shape=mesh_shape)
    p_k = build_problem(cfg, **build_kw)
    assert maybe_fused_shard_box3d(p_k, mesh, interpret=True) is not None
    assert maybe_fused_shard_step(p_k, mesh, interpret=True) is None
    assert maybe_fused_shard_divform(p_k, mesh, interpret=True) is None
    params, _ = sharded_params(p_k)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tf, sf = run_f(p_k.y0, params)
    p_x = build_problem(dataclasses.replace(cfg, use_pallas=False),
                        **build_kw)
    run_x, _ = make_sharded_simulation_fn(p_x, mesh)
    tx, sx = run_x(p_x.y0, params)
    return (np.asarray(tf), sf, np.asarray(tx), sx), p_k


def assert_equivalent(bundle, atol=5e-6):
    tf, sf, tx, sx = bundle
    assert np.array_equal(np.asarray(sf.steps), np.asarray(sx.steps))
    assert np.array_equal(np.asarray(sf.rejected), np.asarray(sx.rejected))
    assert np.all(np.asarray(sf.status) == 0)
    np.testing.assert_allclose(tf, tx, rtol=0, atol=atol)


# ----------------------------------------------------------------------
# Gates


def test_gate_routing():
    mesh = make_mesh(shape=(2, 2))
    # closed z walls: eligible; periodic z: the clamp would be wrong
    p = build_problem(box_cfg())
    assert maybe_fused_shard_box3d(p, mesh, interpret=True) is not None
    p = build_problem(box_cfg(boundary="periodic"))
    assert maybe_fused_shard_box3d(p, mesh, interpret=True) is None
    # obstacle scars run fused (tissue plane ring)
    cfg = box_cfg()
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[2:4, 20:30, 10:20] = False
    p = build_problem(cfg, obstacle_mask=mask)
    assert maybe_fused_shard_box3d(p, mesh, interpret=True) is not None
    # full 3-D diffusion fields run fused too (coefficient plane ring);
    # fully periodic boxes still decline (z clamp)
    dfield = np.full((cfg.nz, cfg.ny, cfg.nx), cfg.diffusion)
    dfield[:, :, : cfg.nx // 2] *= 0.5
    p = build_problem(cfg, diffusion_field=dfield)
    assert maybe_fused_shard_box3d(p, mesh, interpret=True) is not None
    p = build_problem(box_cfg(boundary="periodic"), diffusion_field=dfield)
    assert maybe_fused_shard_box3d(p, mesh, interpret=True) is None
    # rkc2 is not an ERK tableau
    p = build_problem(box_cfg(method="rkc2"))
    assert maybe_fused_shard_box3d(p, mesh, interpret=True) is None


# ----------------------------------------------------------------------
# Equivalence across mesh shapes


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2), (1, 4)])
def test_matches_sharded_xla(mesh_shape):
    bundle, _ = run_pair(box_cfg(), mesh_shape=mesh_shape)
    assert_equivalent(bundle)


def test_matches_single_device_run():
    # the sharded fused run must agree with the UNSHARDED fused kernel's
    # trajectory (f32 rounding): same grid, 2x2 mesh vs one device
    import jax
    from crdmodel_tpu.sim import make_run_fn
    cfg = box_cfg()
    bundle, p_k = run_pair(cfg, mesh_shape=(2, 2))
    tf = bundle[0]
    p1 = build_problem(cfg)
    run1 = jax.jit(make_run_fn(p1, interpret=True)[0])
    t1, s1 = run1(p1.y0, p1.params)
    assert np.array_equal(np.asarray(bundle[1].steps), np.asarray(s1.steps))
    np.testing.assert_allclose(tf, np.asarray(t1), rtol=0, atol=5e-6)


def test_periodic_xy_closed_z():
    bundle, _ = run_pair(box_cfg(boundary="noflux_z"))
    assert_equivalent(bundle)


def test_fhn_freeze_and_beta_ramp():
    cfg = box_cfg(model="fhn", beta=1.25, t_final=1.0, t_boundary=0.4,
                  vary_beta=1, beta_min=0.9, beta_max=1.5)
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_gray_scott_two_diffusive_vars():
    # Tf=8 (not 10): at Tf=10 one marginal reject decision sits exactly at
    # the f32 reduction-order boundary between the kernel's per-strip WRMS
    # partial sums and the XLA path's block sum, flipping the sequences
    # (interval-0 trajectories still agree to 2.4e-7 — rounding, not a bug)
    cfg = box_cfg(model="grayscott", beta=0.06, t_final=8.0,
                  rtol=1e-5, atol=1e-8)
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_normal_step_mode():
    bundle, _ = run_pair(box_cfg(step_mode="normal"))
    assert_equivalent(bundle)


def scar_mask(cfg):
    # the scar column straddles BOTH shard seams of a 2x2 mesh (y=32,
    # x=16) so the halo-padded tissue ring actually carries neighbour
    # openness across devices
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[2:4, 28:38, 12:20] = False
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
    cfg = box_cfg(just_diffusion=1, t_final=1.0)
    mask = scar_mask(cfg)
    bundle, p = run_pair(cfg, obstacle_mask=mask)
    assert_equivalent(bundle)
    tk = bundle[0]
    m0 = np.asarray(p.y0)[0][mask].astype(np.float64).sum()
    m1 = tk[-1][0][mask].astype(np.float64).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def test_just_diffusion_conserves_mass():
    cfg = box_cfg(just_diffusion=1, t_final=1.0)
    bundle, p = run_pair(cfg)
    assert_equivalent(bundle)
    tf = bundle[0]
    m0 = np.asarray(p.y0)[0].astype(np.float64).sum()
    m1 = tf[-1][0].astype(np.float64).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def field_3d(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return 0.08 + 0.04 * rng.random((cfg.nz, cfg.ny, cfg.nx))


def test_field_matches_sharded_xla():
    # full 3-D diffusion field through the SHARD kernel's coefficient
    # plane ring: the halo-padded per-shard face stack must carry true
    # neighbour coefficients across both mesh seams
    cfg = box_cfg()
    bundle, _ = run_pair(cfg, diffusion_field=field_3d(cfg))
    assert_equivalent(bundle)


def test_field_with_scar_matches_sharded_xla():
    cfg = box_cfg()
    mask = scar_mask(cfg)
    bundle, p = run_pair(cfg, diffusion_field=field_3d(cfg, 1),
                         obstacle_mask=mask)
    assert_equivalent(bundle)
    ic = np.asarray(p.y0)
    scar = ~mask
    for fr in bundle[0]:
        assert np.array_equal(fr[:, scar], ic[:, scar])


# ----------------------------------------------------------------------
# Sharded fused 3-D RKC (ops/pallas_shard_box3d_rkc.py)


def run_pair_rkc(cfg, mesh_shape=(2, 2), **build_kw):
    mesh = make_mesh(shape=mesh_shape)
    p_k = build_problem(cfg, **build_kw)
    params, _ = sharded_params(p_k)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tf, sf = run_f(p_k.y0, params)
    p_x = build_problem(dataclasses.replace(cfg, use_pallas=False),
                        **build_kw)
    run_x, _ = make_sharded_simulation_fn(p_x, mesh)
    tx, sx = run_x(p_x.y0, params)
    return (np.asarray(tf), sf, np.asarray(tx), sx), p_k


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4)])
def test_rkc_matches_sharded_xla(mesh_shape):
    # stage counts stay within the s <= 7 budget at this size, so the
    # step sequences are pinned to the sharded XLA rkc2 path
    bundle, _ = run_pair_rkc(box_cfg(method="rkc2"),
                             mesh_shape=mesh_shape)
    assert_equivalent(bundle, atol=1e-5)


def test_rkc_matches_unsharded_fused():
    import jax
    from crdmodel_tpu.sim import make_run_fn
    cfg = box_cfg(method="rkc2")
    bundle, p_k = run_pair_rkc(cfg, mesh_shape=(2, 2))
    p1 = build_problem(cfg)
    run1 = jax.jit(make_run_fn(p1, interpret=True)[0])
    t1, s1 = run1(p1.y0, p1.params)
    assert np.array_equal(np.asarray(bundle[1].steps), np.asarray(s1.steps))
    np.testing.assert_allclose(bundle[0], np.asarray(t1), rtol=0, atol=1e-5)


def test_rkc_freeze_and_beta_ramp():
    cfg = box_cfg(model="fhn", method="rkc2", beta=1.25, t_final=1.0,
                  t_boundary=0.4, vary_beta=1, beta_min=0.9, beta_max=1.5)
    bundle, _ = run_pair_rkc(cfg)
    assert_equivalent(bundle, atol=1e-5)


def test_rkc_obstacle_scar():
    cfg = box_cfg(method="rkc2")
    mask = scar_mask(cfg)
    bundle, p = run_pair_rkc(cfg, obstacle_mask=mask)
    assert_equivalent(bundle, atol=1e-5)
    ic = np.asarray(p.y0)
    scar = ~mask
    for fr in bundle[0]:
        assert np.array_equal(fr[:, scar], ic[:, scar])


def test_rkc_field():
    cfg = box_cfg(method="rkc2")
    bundle, _ = run_pair_rkc(cfg, diffusion_field=field_3d(cfg, 2))
    assert_equivalent(bundle, atol=1e-5)
