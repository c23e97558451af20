"""On-chip fused 3-D box SHARD kernel (ops/pallas_shard_box3d.py): real
Mosaic lowering of the shard kernel on a 1x1 mesh (ppermutes degenerate to
the periodic wrap), checked against the single-device fused kernel's
trajectory. Multi-device correctness is covered by the virtual-CPU-mesh
suite (tests/test_shard_box3d.py); this pins the TPU compile path."""

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.parallel.mesh import make_mesh
from crdmodel_tpu.parallel.sharded import (make_sharded_simulation_fn,
                                           maybe_fused_shard_box3d,
                                           sharded_params)
from crdmodel_tpu.sim import simulate


def test_shard_box3d_rkc_compiles_and_matches_on_chip():
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=128,
                    y_mesh=128, z_mesh=16, surface_width=8.0,
                    surface_length=8.0, surface_depth=1.0, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=0.5, output_timestep=1, dtype="float32",
                    rtol=1e-4, atol=1e-7, boundary="noflux",
                    method="rkc2", use_pallas=True)
    mesh = make_mesh(shape=(1, 1))
    p_s = build_problem(cfg)
    params, _ = sharded_params(p_s)
    run_s, _ = make_sharded_simulation_fn(p_s, mesh)
    ts, ss = run_s(p_s.y0, params)
    assert int(np.max(np.asarray(ss.status))) == 0
    p_1 = build_problem(cfg)
    r_1 = simulate(cfg, problem=p_1)
    assert r_1.ok
    assert np.array_equal(np.asarray(ss.steps), np.asarray(r_1.stats.steps))
    np.testing.assert_allclose(np.asarray(ts)[-1],
                               np.asarray(r_1.trajectory[-1]),
                               rtol=0, atol=5e-5)


def test_shard_box3d_scar_compiles_and_matches_on_chip():
    # obstacle tissue ring through the SHARD kernel's Mosaic lowering
    # (one contiguous tissue DMA per plane); oracle = the single-device
    # fused scar kernel
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=128,
                    y_mesh=128, z_mesh=16, surface_width=8.0,
                    surface_length=8.0, surface_depth=1.0, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=0.5, output_timestep=1, dtype="float32",
                    rtol=1e-4, atol=1e-7, boundary="noflux",
                    use_pallas=True)
    mask = np.ones((cfg.nz, cfg.ny, cfg.nx), bool)
    mask[:, 48:80, 48:80] = False
    mesh = make_mesh(shape=(1, 1))
    p_s = build_problem(cfg, obstacle_mask=mask)
    assert maybe_fused_shard_box3d(p_s, mesh) is not None
    params, _ = sharded_params(p_s)
    run_s, _ = make_sharded_simulation_fn(p_s, mesh)
    ts, ss = run_s(p_s.y0, params)
    assert int(np.max(np.asarray(ss.status))) == 0
    p_1 = build_problem(cfg, obstacle_mask=mask)
    r_1 = simulate(cfg, problem=p_1)
    assert r_1.ok
    assert np.array_equal(np.asarray(ss.steps), np.asarray(r_1.stats.steps))
    np.testing.assert_allclose(np.asarray(ts)[-1],
                               np.asarray(r_1.trajectory[-1]),
                               rtol=0, atol=5e-5)
    # scar cells hold IC bitwise through the sharded kernel
    scar = ~mask
    ic = np.asarray(p_s.y0)
    assert np.array_equal(np.asarray(ts)[-1][:, scar], ic[:, scar])


def test_shard_box3d_field_compiles_and_matches_on_chip():
    # full 3-D diffusion field through the SHARD kernel's coefficient
    # plane ring on real Mosaic; oracle = the single-device fused field
    # kernel through the plain driver
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=128,
                    y_mesh=128, z_mesh=16, surface_width=8.0,
                    surface_length=8.0, surface_depth=1.0, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=0.5, output_timestep=1, dtype="float32",
                    rtol=1e-4, atol=1e-7, boundary="noflux",
                    use_pallas=True)
    rng = np.random.default_rng(0)
    dfield = 0.8 + 0.4 * rng.random((cfg.nz, cfg.ny, cfg.nx))
    mesh = make_mesh(shape=(1, 1))
    p_s = build_problem(cfg, diffusion_field=dfield)
    assert maybe_fused_shard_box3d(p_s, mesh) is not None
    params, _ = sharded_params(p_s)
    run_s, _ = make_sharded_simulation_fn(p_s, mesh)
    ts, ss = run_s(p_s.y0, params)
    assert int(np.max(np.asarray(ss.status))) == 0
    p_1 = build_problem(cfg, diffusion_field=dfield)
    r_1 = simulate(cfg, problem=p_1)
    assert r_1.ok
    assert np.array_equal(np.asarray(ss.steps), np.asarray(r_1.stats.steps))
    np.testing.assert_allclose(np.asarray(ts)[-1],
                               np.asarray(r_1.trajectory[-1]),
                               rtol=0, atol=5e-5)


def test_shard_box3d_compiles_and_matches_on_chip():
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=128,
                    y_mesh=128, z_mesh=16, surface_width=8.0,
                    surface_length=8.0, surface_depth=1.0, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=0.5, output_timestep=1, dtype="float32",
                    rtol=1e-4, atol=1e-7, boundary="noflux",
                    use_pallas=True)
    mesh = make_mesh(shape=(1, 1))
    p_s = build_problem(cfg)
    assert maybe_fused_shard_box3d(p_s, mesh) is not None
    params, _ = sharded_params(p_s)
    run_s, _ = make_sharded_simulation_fn(p_s, mesh)
    ts, ss = run_s(p_s.y0, params)
    assert int(np.max(np.asarray(ss.status))) == 0
    # oracle: the single-device fused kernel through the plain driver
    p_1 = build_problem(cfg)
    r_1 = simulate(cfg, problem=p_1)
    assert r_1.ok
    assert np.array_equal(np.asarray(ss.steps), np.asarray(r_1.stats.steps))
    np.testing.assert_allclose(np.asarray(ts)[-1],
                               np.asarray(r_1.trajectory[-1]),
                               rtol=0, atol=5e-5)
