"""Fused RKC2 kernel (ops/pallas_rkc.py) — real-TPU tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_simulation_fn, simulate_streaming


def _cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=400, surface_width=20.0,
                surface_length=80.0, t_final=2.0, output_timestep=2,
                vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=1.0,
                dtype="float32", rtol=1e-5, atol=1e-8, method="rkc2")
    base.update(kw)
    return SimConfig(**base)


def _run(cfg):
    p = build_problem(cfg)
    run, _ = make_simulation_fn(p)
    traj, stats = run(p.y0, p.params)
    assert np.all(np.asarray(stats.status) == 0)
    return np.asarray(traj), int(np.sum(np.asarray(stats.steps)))


def test_fused_rkc2_matches_xla_rkc2():
    """Same stage selection, same step counts, f32-tolerance agreement."""
    traj_f, steps_f = _run(_cfg(use_pallas=True))
    traj_x, steps_x = _run(_cfg(use_pallas=False))
    assert steps_f == steps_x
    np.testing.assert_allclose(traj_f, traj_x, rtol=1e-3, atol=2e-3)


def test_fused_rkc2_matches_bs32_physics():
    """Different integrators, same physics at shared tolerance."""
    traj_r, _ = _run(_cfg(use_pallas=True))
    traj_b, _ = _run(_cfg(method="bs32", use_pallas=True, atol=1e-8))
    np.testing.assert_allclose(traj_r, traj_b, rtol=2e-3, atol=5e-3)


def test_fused_rkc2_streaming():
    cfg = _cfg(use_pallas=True)
    res = simulate_streaming(cfg)
    assert res.ok
    batch, _ = _run(cfg)
    np.testing.assert_allclose(np.asarray(res.trajectory)[1:], batch,
                               rtol=1e-4, atol=1e-4)


def test_fused_rkc2_heat_decay():
    """justDiffusion on the flat surface: amplitude must decay
    monotonically (pure heat equation sanity on the fused stage loop)."""
    cfg = _cfg(model="goldbeter", surface="flat", just_diffusion=1,
               t_boundary=0.0, vary_beta=0, beta=0.4, diffusion=5.0,
               surface_width=20.0, surface_length=80.0, t_final=4.0)
    p = build_problem(cfg)
    run, _ = make_simulation_fn(p)
    traj, stats = run(p.y0, p.params)
    assert np.all(np.asarray(stats.status) == 0)
    traj = np.asarray(traj)
    mean = np.asarray(p.y0)[0].mean()
    amp = [np.abs(np.asarray(p.y0)[0] - mean).max()] + \
          [np.abs(traj[k, 0] - mean).max() for k in range(traj.shape[0])]
    assert all(a2 < a1 + 1e-6 for a1, a2 in zip(amp, amp[1:])), amp


def test_sharded_fused_rkc2_on_device():
    """Real Mosaic lowering of the sharded fused RKC2 on a 1x1 mesh:
    step counts must match the sharded XLA rkc2 path."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_rkc, sharded_params)
    cfg = _cfg(use_pallas=True)
    mesh = make_mesh(shape=(1, 1))
    problem = build_problem(cfg)
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh)
    traj_f, stats_f = run_f(problem.y0, params)
    assert np.all(np.asarray(stats_f.status) == 0)

    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)
    assert int(np.sum(np.asarray(stats_f.steps))) == \
        int(np.sum(np.asarray(stats_x.steps)))
    np.testing.assert_allclose(np.asarray(traj_f), np.asarray(traj_x),
                               rtol=1e-3, atol=2e-3)
