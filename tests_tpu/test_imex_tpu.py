"""ark324 IMEX on the real chip: f32 production run vs the CPU f64 oracle,
and agreement with the explicit path at matched physics (the on-chip
counterpart of tests/test_imex.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_simulation_fn

BASE = dict(model="goldbeter", surface="torus", x_mesh=40,
            surface_width=20, surface_length=40, beta=0.85,
            wave_inside=1, t_final=1.0, output_timestep=2, rtol=1e-5)


def _run(cfg):
    p = build_problem(cfg)
    run, _ = make_simulation_fn(p)
    traj, stats = run(p.y0, p.params)
    float(jnp.sum(traj[-1]))  # sync
    assert int(np.asarray(stats.status).max()) == 0
    return np.asarray(traj, dtype=np.float64), stats


def test_ark324_tpu_f32_matches_cpu_f64():
    traj32, stats32 = _run(SimConfig(**BASE, method="ark324",
                                     dtype="float32", atol=1e-8))
    assert int(np.asarray(stats32.rejected).sum()) < \
        int(np.asarray(stats32.accepted).sum())

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        jax.config.update("jax_enable_x64", True)
        try:
            traj64, _ = _run(SimConfig(**BASE, method="ark324",
                                       dtype="float64", atol=1e-10))
        finally:
            jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(traj32, traj64, rtol=0, atol=2e-3)


def test_ark324_tpu_matches_bs32_tpu():
    """Pointwise Newton solves on-chip agree with the explicit path at f32
    integrator tolerance (both rtol 1e-5)."""
    imex, _ = _run(SimConfig(**BASE, method="ark324", dtype="float32",
                             atol=1e-8))
    erk, _ = _run(SimConfig(**BASE, method="bs32", dtype="float32",
                            atol=1e-8))
    np.testing.assert_allclose(imex, erk, rtol=0, atol=5e-3)
