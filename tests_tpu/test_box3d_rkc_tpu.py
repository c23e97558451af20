"""On-chip fused 3-D box RKC step (ops/pallas_box3d_rkc.py): compiles
through Mosaic at a realistic slab size and matches the XLA rkc2 path
within the documented fused-vs-XLA f32 drift (measured speedup in
docs/PERF_NOTES.md "fused 3-D box RKC")."""

import dataclasses

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import simulate


def test_fused_box3d_rkc_matches_xla_on_chip():
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=128,
                    y_mesh=128, z_mesh=16, surface_width=8.0,
                    surface_length=8.0, surface_depth=1.0, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=1.0, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-7, boundary="noflux",
                    method="rkc2", use_pallas=True)
    import jax.numpy as jnp
    from crdmodel_tpu.ops import pallas_box3d_rkc
    p_f = build_problem(cfg)
    assert pallas_box3d_rkc.is_box3d_rkc_supported(p_f, jnp.float32)
    r_f = simulate(cfg, problem=p_f)
    cfgx = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfgx)
    r_x = simulate(cfgx, problem=p_x)
    assert r_f.ok and r_x.ok
    # at this grid rho ~ 3e3, and in the smooth post-wave phase accuracy
    # allows h*rho >> 23.4: XLA picks s freely while the kernel caps h at
    # its s <= 7 budget — the documented contract is MORE steps (never
    # fewer), same trajectory to integration tolerance
    assert (np.asarray(r_f.stats.steps)
            >= np.asarray(r_x.stats.steps)).all(), \
        (r_f.stats.steps, r_x.stats.steps)
    np.testing.assert_allclose(np.asarray(r_f.trajectory[-1]),
                               np.asarray(r_x.trajectory[-1]),
                               rtol=0, atol=5e-3)
