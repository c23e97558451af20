"""Randomized configuration sweep: any valid SimConfig must either run
cleanly or fail with a meaningful status — never crash or emit NaNs on an
'ok' run.
"""

import random

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate

rng = random.Random(20260816)


def _random_cfg():
    model = rng.choice(["fhn", "goldbeter", "barkley", "lambdaomega", "sir",
                        "aliev_panfilov"])
    surface = rng.choice(["flat", "torus"])
    vary_beta = rng.choice([0, 1]) if model in ("fhn", "goldbeter") else 0
    beta = {"fhn": rng.uniform(0.5, 2.0),
            "goldbeter": rng.uniform(0.1, 1.0),
            "barkley": rng.uniform(0.02, 0.2),
            "lambdaomega": rng.uniform(0.0, 1.0),
            "sir": rng.uniform(1.0, 3.0),
            "aliev_panfilov": rng.uniform(0.05, 0.3)}[model]
    width = rng.choice([10.0, 20.0])
    # rkc2 needs jac_bound (all these have it); ark324/step_mode stack on
    # every other axis here, fuzzing the new integrator and output modes
    method = rng.choice(["bs32", "zonneveld43", "dopri54", "rkc2", "ark324"])
    step_mode = rng.choice(["tstop", "tstop", "normal"])
    return SimConfig(
        model=model, surface=surface,
        x_mesh=rng.choice([8, 12, 17, 24]),
        surface_width=width,
        surface_length=width * rng.choice([1, 2, 3]),
        diffusion=rng.choice([0.05, 0.12, 1.0]),
        beta=beta, vary_beta=vary_beta,
        beta_min=0.1, beta_max=1.5,
        ic_type=rng.choice([0, 1, 2]),
        wave_inside=rng.choice([0, 1]),
        wave_length=rng.uniform(0.05, 0.3),
        wave_width=rng.uniform(0.2, 0.8),
        t_boundary=rng.choice([0.0, 0.3, 5.0]),
        t_final=1.0,
        output_timestep=rng.choice([1, 2, 3]),
        just_diffusion=rng.choice([0, 0, 1]),
        include_all_vars=rng.choice([0, 1]),
        method=method, step_mode=step_mode,
        rng_seed=rng.randrange(1000),
        dtype="float64", rtol=1e-5, atol=1e-9,
    )


CASES = [_random_cfg() for _ in range(16)]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_random_config_runs_clean(idx):
    cfg = CASES[idx]
    res = simulate(cfg)
    traj = np.asarray(res.trajectory)
    if res.ok:
        assert np.isfinite(traj).all(), cfg
    else:
        # failures must be flagged, never silent garbage
        assert int(np.asarray(res.stats.status).max()) in (1, 2), cfg
