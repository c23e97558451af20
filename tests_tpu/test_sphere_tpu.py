"""Sphere geometry on the real chip: the fused Pallas kernels run the
capped revolution metric through the x-profile remap
(ops/kernel_common.py::coeff_kind / kernel_stencil_coeffs) with real Mosaic
lowering, and f32 results track the f64 CPU oracle."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_simulation_fn


BASE = dict(model="fhn", surface="sphere", x_mesh=48, surface_length=80,
            beta=1.25, t_final=1.0, output_timestep=2, rtol=1e-5)


def _run(cfg):
    p = build_problem(cfg)
    run, _ = make_simulation_fn(p)
    traj, stats = run(p.y0, p.params)
    float(jnp.sum(traj[-1]))  # sync
    assert int(np.asarray(stats.status).max()) == 0
    return np.asarray(traj), stats


def test_tpu_f32_sphere_matches_cpu_f64():
    traj32, _ = _run(SimConfig(**BASE, dtype="float32", atol=1e-8))
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


def test_tpu_fused_kernels_match_xla_on_sphere():
    """bs32 / rkc2 fused kernels vs the XLA divergence path, real lowering.
    Same drift class as the theta-only coupling remap (not bitwise: the
    remap regroups the face-form arithmetic)."""
    for method in ("bs32", "rkc2"):
        cfg_f = SimConfig(**BASE, dtype="float32", atol=1e-8,
                          use_pallas=True, method=method)
        cfg_x = dataclasses.replace(cfg_f, use_pallas=False)
        traj_f, _ = _run(cfg_f)
        traj_x, _ = _run(cfg_x)
        np.testing.assert_allclose(traj_f, traj_x, rtol=0, atol=5e-4)
