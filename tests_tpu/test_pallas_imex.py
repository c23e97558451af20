"""Fused IMEX kernel (ops/pallas_imex.py) on the real chip: single-step
equivalence vs the XLA IMEX step and full-trajectory equivalence through
the adaptive driver."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rhs
from crdmodel_tpu.integrate import imex
from crdmodel_tpu.ops import pallas_imex
from crdmodel_tpu.sim import simulate


def _cfg(model, surface, **kw):
    beta = {"fhn": 1.25, "goldbeter": 0.5, "sir": 3.0}[model]
    base = dict(model=model, surface=surface, x_mesh=64,
                surface_width=20, surface_length=80,
                t_boundary=0.2, t_final=1.0, output_timestep=2, beta=beta,
                wave_inside=1, dtype="float32", rtol=1e-5, atol=1e-8,
                method="ark324")
    base.update(kw)
    return SimConfig(**base)


def test_step_matches_xla_on_chip():
    """fhn: the fused step is BITWISE equal to the XLA IMEX step on the
    chip; goldbeter (pow-heavy jvp chains) agrees to f32 roundoff."""
    for model, tol in (("fhn", 0.0), ("goldbeter", 1e-6), ("sir", 0.0)):
        surface = "flat" if model == "sir" else "torus"
        cfg = _cfg(model, surface)
        p = build_problem(cfg)
        assert pallas_imex.is_imex_supported(p, jnp.float32)
        f_ex, f_im = make_rhs(cfg, p.model, p.geometry, jnp.float32,
                              split=True)
        se_xla, _ = imex.make_imex_step_err(f_ex, f_im, cfg.rtol, cfg.atol)
        fused = pallas_imex.build_fused_imex_step(p, jnp.float32)
        rng = np.random.default_rng(1)
        y = jnp.asarray(np.asarray(p.y0)
                        + 0.05 * rng.standard_normal(p.y0.shape), jnp.float32)
        params = {**p.params, "_seg_end": jnp.asarray(0.15, jnp.float32)}
        t = jnp.asarray(0.05, jnp.float32)
        h = jnp.asarray(0.01, jnp.float32)
        y1, ss1, _ = jax.jit(se_xla)(t, y, h, params, ())
        y2p, ss2 = jax.jit(fused.step_err)(t, fused.pad(y), h, params)
        d = np.max(np.abs(np.asarray(fused.unpad(y2p)) - np.asarray(y1)))
        assert d <= tol, (model, d)
        np.testing.assert_allclose(float(ss2), float(ss1), rtol=1e-4)


def test_full_trajectory_fused_vs_xla():
    """End-to-end adaptive run: auto-selected fused kernel vs forced XLA
    path at f32 trajectory tolerance, same step counts to within the
    err-sum association difference."""
    cfg = _cfg("goldbeter", "torus", x_mesh=128, use_pallas=True)
    r_fused = simulate(cfg)
    r_xla = simulate(dataclasses.replace(cfg, use_pallas=False))
    assert r_fused.ok and r_xla.ok
    np.testing.assert_allclose(np.asarray(r_fused.trajectory),
                               np.asarray(r_xla.trajectory),
                               rtol=0, atol=5e-3)
    s1, s2 = r_fused.total_steps(), r_xla.total_steps()
    assert abs(s1 - s2) <= 0.05 * s2, (s1, s2)


def test_shard_imex_real_lowering_matches_xla():
    """Sharded fused IMEX (real Mosaic lowering, 1x1 mesh) vs the sharded
    XLA ark324 path: same trajectory at f32 tolerance, step counts within
    the err-association budget."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (make_sharded_simulation_fn,
                                               sharded_params)
    cfg = _cfg("goldbeter", "torus", x_mesh=128, use_pallas=True)
    mesh = make_mesh(shape=(1, 1))
    p = build_problem(cfg)
    params, _ = sharded_params(p)
    run_f, _ = make_sharded_simulation_fn(p, mesh)
    traj_f, stats_f = run_f(p.y0, params)
    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)
    np.testing.assert_allclose(np.asarray(traj_f), np.asarray(traj_x),
                               rtol=0, atol=5e-3)
    s1 = int(np.sum(np.asarray(stats_f.steps)))
    s2 = int(np.sum(np.asarray(stats_x.steps)))
    assert abs(s1 - s2) <= max(2, 0.05 * s2), (s1, s2)
