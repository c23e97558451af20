"""On-chip fused divergence-form step (ops/pallas_divform.py):
auto-selected above the threshold for bounded-tissue configurations
(no-flux boundary + obstacle scar), matches the XLA divergence path
within the documented fused-vs-XLA f32 drift, scar cells hold their IC
exactly (measured speedup in docs/PERF_NOTES.md "fused divergence-form
kernel")."""

import dataclasses

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate


def test_fused_divform_matches_xla_on_chip():
    cfg = SimConfig(model="aliev_panfilov", surface="flat", x_mesh=400,
                    surface_width=20, surface_length=80, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=1.0, output_timestep=2,
                    dtype="float32", rtol=1e-4, atol=1e-7,
                    boundary="noflux")
    ny, nx = cfg.ny, cfg.nx
    jj, ii = np.mgrid[0:ny, 0:nx]
    scar = (jj - ny * 0.5) ** 2 + (ii - nx * 0.55) ** 2 <= (nx * 0.09) ** 2
    p_f = build_problem(cfg, obstacle_mask=~scar)
    r_f = simulate(cfg, problem=p_f)
    cfgx = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfgx, obstacle_mask=~scar)
    r_x = simulate(cfgx, problem=p_x)
    assert r_f.ok and r_x.ok
    step_gap = np.abs(np.asarray(r_f.stats.steps)
                      - np.asarray(r_x.stats.steps)).max()
    assert step_gap <= 5, (r_f.stats.steps, r_x.stats.steps)
    np.testing.assert_allclose(np.asarray(r_f.trajectory[-1]),
                               np.asarray(r_x.trajectory[-1]),
                               rtol=0, atol=5e-3)
    # inert scar cells hold their IC exactly (bitwise), fused and XLA
    ic = np.asarray(p_f.y0)[:, scar]
    assert np.array_equal(np.asarray(r_f.trajectory[-1])[:, scar], ic)
    assert np.array_equal(np.asarray(r_x.trajectory[-1])[:, scar], ic)
