"""Curvature-coupled diffusion on the real chip: f32 vs the f64 CPU oracle,
and exact mass conservation at f32 resolution (the flux form's linear
invariant survives single precision because every term telescopes)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_simulation_fn


BASE = dict(model="fhn", surface="torus", x_mesh=48, surface_width=20,
            surface_length=80, beta=1.25, wave_inside=1, t_final=1.0,
            output_timestep=2, rtol=1e-5, coupling="curvature")


def test_tpu_f32_coupling_matches_cpu_f64():
    cfg32 = SimConfig(**BASE, dtype="float32", atol=1e-8)
    p32 = build_problem(cfg32)
    run32, _ = make_simulation_fn(p32)
    traj32, stats32 = run32(p32.y0, p32.params)
    float(jnp.sum(traj32[-1]))  # sync
    assert int(np.asarray(stats32.status).max()) == 0

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        jax.config.update("jax_enable_x64", True)
        try:
            cfg64 = SimConfig(**BASE, dtype="float64", atol=1e-10)
            p64 = build_problem(cfg64)
            run64, _ = make_simulation_fn(p64)
            traj64, stats64 = run64(p64.y0, p64.params)
            traj64 = np.asarray(traj64)
        finally:
            jax.config.update("jax_enable_x64", False)
    assert int(np.asarray(stats64.status).max()) == 0
    np.testing.assert_allclose(np.asarray(traj32, dtype=np.float64), traj64,
                               atol=5e-3)


def test_tpu_fused_kernel_matches_xla_divergence():
    """Theta-only diffusion fields run through the fused step kernel via the
    exact 3-profile remap (ops/kernel_common.py::kernel_stencil_coeffs).
    Real-lowering check: fused and XLA-divergence trajectories agree at f32
    tolerance (the remap regroups arithmetic, so not bitwise — same drift
    class as the documented goldbeter/sir fused cases)."""
    from crdmodel_tpu.sim import _pallas_eligible
    cfg_f = SimConfig(**BASE, dtype="float32", atol=1e-8, use_pallas=True)
    pf = build_problem(cfg_f)
    assert _pallas_eligible(pf), "theta-only field must be kernel-eligible"
    run_f, _ = make_simulation_fn(pf)
    traj_f, stats_f = run_f(pf.y0, pf.params)
    float(jnp.sum(traj_f[-1]))
    assert int(np.asarray(stats_f.status).max()) == 0

    cfg_x = SimConfig(**BASE, dtype="float32", atol=1e-8, use_pallas=False)
    px = build_problem(cfg_x)
    run_x, _ = make_simulation_fn(px)
    traj_x, stats_x = run_x(px.y0, px.params)
    assert int(np.asarray(stats_x.status).max()) == 0
    np.testing.assert_allclose(np.asarray(traj_f), np.asarray(traj_x),
                               rtol=0, atol=5e-3)


def test_tpu_f32_mass_conservation():
    cfg = SimConfig(**{**BASE, "model": "goldbeter", "just_diffusion": 1},
                    dtype="float32", atol=1e-8)
    prob = build_problem(cfg)
    run, _ = make_simulation_fn(prob)
    traj, stats = run(prob.y0, prob.params)
    traj = np.asarray(traj, dtype=np.float64)
    assert int(np.asarray(stats.status).max()) == 0
    w = prob.geometry.row_weights()
    m = [float(np.sum(traj[k, 0] * w)) for k in range(traj.shape[0])]
    drift = max(abs(mi - m[0]) for mi in m) / abs(m[0])
    # f32 state, f32 accumulation over ~hundreds of steps
    assert drift < 5e-6, drift
