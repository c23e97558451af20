"""Precision policy validation (docs/ARCHITECTURE.md §6): TPU f32 production
runs vs the f64 CPU oracle at matched physics."""

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_simulation_fn


def test_tpu_f32_matches_cpu_f64():
    base = dict(model="goldbeter", surface="torus", x_mesh=40,
                surface_width=20, surface_length=40, beta=0.85,
                wave_inside=1, t_final=1.0, output_timestep=2,
                rtol=1e-5)
    cfg32 = SimConfig(**base, dtype="float32", atol=1e-8)
    p32 = build_problem(cfg32)
    run32, _ = make_simulation_fn(p32)
    traj32, stats32 = run32(p32.y0, p32.params)
    s = float(jnp.sum(traj32[-1]))  # sync
    assert int(np.asarray(stats32.status).max()) == 0

    # f64 oracle on the CPU device of the same process
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        jax.config.update("jax_enable_x64", True)
        try:
            cfg64 = SimConfig(**base, dtype="float64", atol=1e-10)
            p64 = build_problem(cfg64)
            run64, _ = make_simulation_fn(p64)
            traj64, stats64 = run64(p64.y0, p64.params)
            traj64 = np.asarray(traj64)
        finally:
            jax.config.update("jax_enable_x64", False)
    assert int(np.asarray(stats64.status).max()) == 0

    # f32 accumulates roundoff over ~1e3 steps; fields are O(1)
    np.testing.assert_allclose(np.asarray(traj32, dtype=np.float64), traj64,
                               rtol=0, atol=2e-3)
