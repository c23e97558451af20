"""Fused shard-step kernel (ops/pallas_shard_step.py) — real-TPU validation.

On one chip a 1x1 mesh exercises the real Mosaic lowering of the kernel (the
CPU suite covers multi-device halo correctness through the interpreter);
results must match the XLA sharded step bitwise.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.parallel.mesh import make_mesh
from crdmodel_tpu.parallel.sharded import (
    make_sharded_simulation_fn, maybe_fused_shard_step, sharded_params,
)


def _cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=64, surface_width=20.0,
                surface_length=40.0, t_final=0.2, output_timestep=2,
                vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.1,
                dtype="float32", rtol=1e-4, atol=1e-6, use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def test_fused_shard_sim_matches_xla_on_device():
    cfg = _cfg()
    mesh = make_mesh(shape=(1, 1))
    problem = build_problem(cfg)
    assert maybe_fused_shard_step(problem, mesh) is not None
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh)
    traj_f, stats_f = run_f(problem.y0, params)

    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)

    assert int(np.sum(np.asarray(stats_f.steps))) == \
        int(np.sum(np.asarray(stats_x.steps)))
    np.testing.assert_array_equal(np.asarray(traj_f), np.asarray(traj_x))


def test_fused_shard_multistrip_bitwise():
    """ny=800 -> 4 row strips per shard: exercises the v3 edge-strip
    conditionals (halo rows from thin VMEM inputs on the first/last strip,
    HBM windows on interior strips) under the real Mosaic lowering."""
    cfg = _cfg(x_mesh=200, surface_length=80.0)
    mesh = make_mesh(shape=(1, 1))
    problem = build_problem(cfg)
    fused = maybe_fused_shard_step(problem, mesh)
    assert fused is not None
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh)
    traj_f, stats_f = run_f(problem.y0, params)

    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)

    assert int(np.sum(np.asarray(stats_f.steps))) == \
        int(np.sum(np.asarray(stats_x.steps)))
    np.testing.assert_array_equal(np.asarray(traj_f), np.asarray(traj_x))


def test_fused_shard_rkc_multistrip():
    """Same multi-strip coverage for the sharded fused RKC2 kernel."""
    cfg = _cfg(x_mesh=200, surface_length=80.0, method="rkc2", t_final=0.1)
    mesh = make_mesh(shape=(1, 1))
    problem = build_problem(cfg)
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh)
    traj_f, stats_f = run_f(problem.y0, params)

    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)

    assert np.all(np.asarray(stats_f.status) == 0)
    assert int(np.sum(np.asarray(stats_f.steps))) == \
        int(np.sum(np.asarray(stats_x.steps)))
    np.testing.assert_allclose(np.asarray(traj_f), np.asarray(traj_x),
                               rtol=0, atol=1e-4)
