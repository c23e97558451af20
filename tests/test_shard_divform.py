"""Fused divergence-form SHARD kernel (ops/pallas_shard_divform.py) —
interpreter-mode equivalence on the virtual CPU mesh.

The sharded XLA divergence path (parallel/sharded.py::make_local_rhs with
divergence=True) is the oracle; the bar matches the single-chip divform
tests (tests/test_divform_kernel.py): identical accepted/rejected step
sequences and trajectories equal to f32 rounding; obstacle scars must
hold their IC bitwise.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.parallel.mesh import make_mesh
from crdmodel_tpu.parallel.sharded import (make_sharded_simulation_fn,
                                           maybe_fused_shard_divform,
                                           maybe_fused_shard_step,
                                           mesh_pad_spec, sharded_params)


def flat_cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=48, surface_width=20.0,
                surface_length=20.0, t_final=1.0, output_timestep=2,
                beta=1.25, dtype="float32", method="bs32", rtol=1e-4,
                atol=1e-7, use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def torus_cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=40, t_final=1.0,
                output_timestep=2, beta=1.25, dtype="float32",
                method="bs32", rtol=1e-4, atol=1e-7, use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def run_pair(cfg, mesh_shape=(2, 4), **build_kw):
    """((traj_f, stats_f, traj_x, stats_x), problem) — the fused divform
    shard kernel in interpreter mode vs the sharded XLA divergence path."""
    mesh = make_mesh(shape=mesh_shape)
    p_k = build_problem(cfg, **build_kw)
    assert maybe_fused_shard_divform(p_k, mesh, interpret=True) is not None
    assert maybe_fused_shard_step(p_k, mesh, interpret=True) is None
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


def test_noflux_boundary_matches_sharded_xla():
    bundle, _ = run_pair(flat_cfg(boundary="noflux"))
    assert_equivalent(bundle)


def test_obstacle_matches_and_scar_holds_ic():
    cfg = flat_cfg()
    mask = np.ones((cfg.ny, cfg.nx), bool)
    mask[20:28, 30:40] = False
    bundle, p_k = run_pair(cfg, obstacle_mask=mask)
    assert_equivalent(bundle)
    tf = bundle[0]
    ic = np.asarray(p_k.y0)[:, 20:28, 30:40]
    assert np.array_equal(tf[-1][:, 20:28, 30:40], ic)


def test_torus_2d_field_varybeta_freeze():
    cfg = torus_cfg(vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.4)
    rng = np.random.default_rng(7)
    dfield = 0.08 + 0.04 * rng.random((cfg.ny, cfg.nx))
    bundle, _ = run_pair(cfg, diffusion_field=dfield)
    assert_equivalent(bundle)


def test_flat_profile_field():
    cfg = flat_cfg()
    dfield = 0.06 + 0.05 * np.cos(np.linspace(0, 2 * np.pi, cfg.nx,
                                              endpoint=False))
    bundle, _ = run_pair(cfg, diffusion_field=dfield)
    assert_equivalent(bundle)


def test_sphere_2d_field():
    cfg = SimConfig(model="fhn", surface="sphere", x_mesh=24, t_final=0.5,
                    output_timestep=2, beta=1.25, dtype="float32",
                    method="bs32", rtol=1e-4, atol=1e-7, use_pallas=True)
    rng = np.random.default_rng(3)
    dfield = 0.08 + 0.04 * rng.random((cfg.ny, cfg.nx))
    bundle, _ = run_pair(cfg, mesh_shape=(2, 2), diffusion_field=dfield)
    assert_equivalent(bundle)


def test_grayscott_two_diffusive_vars():
    cfg = flat_cfg(model="grayscott", boundary="noflux", beta=0.06,
                   t_final=5.0, rtol=1e-5, atol=1e-8)
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (8, 1), (4, 2)])
def test_mesh_shapes(mesh_shape):
    """Degenerate and skewed meshes: 1-device axes reduce to wrap; the
    coefficient halo exchange and the aS roll must stay exact."""
    cfg = flat_cfg(boundary="noflux", x_mesh=64, surface_width=10.0,
                   surface_length=10.0 * max(2, mesh_shape[0]),
                   t_final=0.4)
    if cfg.ny % mesh_shape[0] or cfg.nx % mesh_shape[1]:
        pytest.skip("grid does not factor over this mesh")
    bundle, _ = run_pair(cfg, mesh_shape)
    assert_equivalent(bundle)


def test_matches_single_device_divform_kernel():
    """Sharded fused result vs the single-chip fused divform kernel
    (ops/pallas_divform.py) through the plain driver."""
    import jax
    from crdmodel_tpu.sim import make_run_fn
    cfg = flat_cfg(boundary="noflux")
    p1 = build_problem(cfg)
    run1 = jax.jit(make_run_fn(p1, interpret=True)[0])
    t1, s1 = run1(p1.y0, p1.params)
    bundle, _ = run_pair(cfg)
    tf, sf = bundle[0], bundle[1]
    assert np.array_equal(np.asarray(sf.steps), np.asarray(s1.steps))
    np.testing.assert_allclose(tf, np.asarray(t1), rtol=0, atol=5e-6)


def test_normal_step_mode_composes():
    cfg = flat_cfg(boundary="noflux", step_mode="normal")
    bundle, _ = run_pair(cfg)
    assert_equivalent(bundle)


def test_streaming_interval_path():
    """make_sharded_interval_fn picks the divform kernel: one output
    interval matches the batch driver's first interval."""
    import jax
    from crdmodel_tpu.parallel.sharded import make_sharded_interval_fn
    cfg = flat_cfg(boundary="noflux")
    mesh = make_mesh(shape=(2, 4))
    p = build_problem(cfg)
    params, _ = sharded_params(p)
    one, h0f, _, _ = make_sharded_interval_fn(p, mesh,
                                              interpret_pallas=True)
    dtype = jnp.float32
    h0 = h0f(p.y0, {**params, "_h0_tout": jnp.asarray(0.5, dtype)})
    t, y, h, errp, (ns, na, nr, status) = one(
        jnp.asarray(0.0, dtype), p.y0, h0, jnp.asarray(1.0, dtype),
        jnp.asarray(0, jnp.int32), jnp.asarray(0.5, dtype),
        jnp.asarray(True), params)
    run_f, _ = make_sharded_simulation_fn(p, mesh, interpret_pallas=True)
    tf, sf = run_f(p.y0, params)
    assert int(ns) == int(np.asarray(sf.steps)[0])
    np.testing.assert_array_equal(np.asarray(y), np.asarray(tf)[0])


def test_uneven_grid_keeps_fused_path():
    """Round 4: pad-and-mask grids KEEP the fused divergence path via
    mirror padding (pad cells as live wrapped copies; kernel_common.
    make_shard_halo_helpers docstring). Equivalence is pinned in
    tests/test_uneven.py::test_fused_padded_divform_matches_xla."""
    cfg = flat_cfg(boundary="noflux", x_mesh=50)   # 50 % 4 != 0
    mesh = make_mesh(shape=(2, 4))
    p = build_problem(cfg)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None
    assert maybe_fused_shard_divform(p, mesh, interpret=True,
                                     pad_spec=pad_spec) is not None
