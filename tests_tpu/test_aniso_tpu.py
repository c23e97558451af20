"""On-chip fused anisotropic step (ops/pallas_aniso.py): auto-selected
above the threshold, matches the XLA tensor path within the documented
fused-vs-XLA f32 drift, and wins (measured 1.37x at 400x1600 —
docs/PERF_NOTES.md "fused anisotropic step")."""

import dataclasses

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate


def test_fused_aniso_matches_xla_on_chip():
    cfg = SimConfig(model="aliev_panfilov", surface="flat", x_mesh=400,
                    surface_width=20, surface_length=80, diffusion=1.0,
                    beta=0.05, wave_length=0.1, wave_width=0.2,
                    t_final=1.0, output_timestep=2,
                    dtype="float32", rtol=1e-4, atol=1e-7)
    tensor = (1.0, 0.25, 0.15)
    p_f = build_problem(cfg, diffusion_tensor=tensor)
    r_f = simulate(cfg, problem=p_f)
    cfgx = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfgx, diffusion_tensor=tensor)
    r_x = simulate(cfgx, problem=p_x)
    assert r_f.ok and r_x.ok
    step_gap = np.abs(np.asarray(r_f.stats.steps)
                      - np.asarray(r_x.stats.steps)).max()
    assert step_gap <= 5, (r_f.stats.steps, r_x.stats.steps)
    np.testing.assert_allclose(np.asarray(r_f.trajectory[-1]),
                               np.asarray(r_x.trajectory[-1]),
                               rtol=0, atol=5e-3)
