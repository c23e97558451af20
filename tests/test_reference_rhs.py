"""Whole-RHS parity vs a serial C++ transcription of the reference's f().

The golden oracles elsewhere pin individual pieces (stencils per point,
kinetics vs scipy); this suite diffs the COMPLETE composed RHS — diffusion +
reaction + beta ramp + boundary freeze + justDiffusion — against
tests/ref_oracle/refrhs.cpp, a g++-compiled transcription of the four reference
routines (src/FHNmodel_torus.cpp:504-667, src/FHNmodel_flat.cpp:469-616,
src/GoldbeterModel_torus.cpp:561-721, src/GoldbeterModel_flat.cpp:537-686),
at randomized states in float64.

Tolerance: the JAX RHS computes the same math with different association
(precomputed coefficient profiles, integer power chains instead of pow), so
agreement is to f64 round-off, not bitwise.
"""

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from tests.ref_oracle import load_refrhs, reference_rhs

pytestmark = pytest.mark.skipif(load_refrhs() is None,
                                reason="g++ unavailable; oracle not built")


def _cfg(model, surface, **kw):
    base = dict(model=model, surface=surface, x_mesh=17, surface_width=20.0,
                surface_length=40.0, diffusion=0.12, beta=1.25,
                t_final=1.0, output_timestep=2, dtype="float64")
    if model == "goldbeter":
        base["beta"] = 0.4
    base.update(kw)
    return SimConfig(**base)


def _random_state(cfg, seed, positive=False):
    rng = np.random.default_rng(seed)
    shape = (2, cfg.ny, cfg.nx)
    if positive:
        # Goldbeter Hill terms: pow() of negative bases is fine for the
        # integer-valued exponents used, but keep states in the physical
        # (concentration) range anyway
        return rng.uniform(0.05, 3.0, size=shape)
    return rng.uniform(-2.5, 2.5, size=shape)


def _compare(cfg, t, state, rtol=2e-13):
    problem = build_problem(cfg)
    params = dict(problem.params)
    got = np.asarray(problem.rhs(np.float64(t), state.astype(np.float64),
                                 params))
    want = reference_rhs(cfg, t, state)
    # mixed-magnitude fields: compare per-variable against its own scale
    for v in range(2):
        scale = np.max(np.abs(want[v])) + 1e-30
        np.testing.assert_allclose(got[v] / scale, want[v] / scale,
                                   rtol=0, atol=rtol,
                                   err_msg=f"var {v} of {cfg.program_name}")


CASES = [
    # (model, surface, extra cfg, t, positive-state)
    ("fhn", "torus", {}, 0.5, False),
    ("fhn", "flat", {}, 0.5, False),
    ("goldbeter", "torus", {}, 0.5, True),
    ("goldbeter", "flat", {}, 0.5, True),
    # varyBeta ramp
    ("fhn", "torus", dict(vary_beta=1, beta_min=0.7, beta_max=1.7), 0.5, False),
    ("fhn", "flat", dict(vary_beta=1, beta_min=0.7, beta_max=1.7), 0.5, False),
    ("goldbeter", "torus", dict(vary_beta=1, beta_min=0.1, beta_max=0.9), 0.5, True),
    ("goldbeter", "flat", dict(vary_beta=1, beta_min=0.1, beta_max=0.9), 0.5, True),
    # boundary freeze active (t < tBoundary) and released (t > tBoundary)
    ("fhn", "torus", dict(t_boundary=0.8), 0.5, False),
    ("fhn", "torus", dict(t_boundary=0.3), 0.5, False),
    ("goldbeter", "flat", dict(t_boundary=0.8), 0.5, True),
    # justDiffusion (goldbeter only in the reference; skips freeze too)
    ("goldbeter", "torus", dict(just_diffusion=1, t_boundary=0.8), 0.5, True),
    ("goldbeter", "flat", dict(just_diffusion=1), 0.5, True),
]


@pytest.mark.parametrize("model,surface,extra,t,positive", CASES)
def test_whole_rhs_parity(model, surface, extra, t, positive):
    cfg = _cfg(model, surface, **extra)
    for seed in (0, 1, 2):
        state = _random_state(cfg, seed, positive=positive)
        _compare(cfg, t, state)


def test_freeze_rows_match_reference_exactly():
    """With t < tBoundary both oracle and JAX RHS zero BOTH variables on
    global rows 0 and ny-1 and nothing else."""
    cfg = _cfg("fhn", "torus", t_boundary=1.0)
    state = _random_state(cfg, 7)
    want = reference_rhs(cfg, 0.2, state)
    assert np.all(want[:, 0, :] == 0.0)
    assert np.all(want[:, -1, :] == 0.0)
    assert np.any(want[:, 1, :] != 0.0)
    _compare(cfg, 0.2, state)


def test_canonical_config_states():
    """Parity at the canonical inis' own parameters on the actual ICs (the
    state the first RK stage sees)."""
    from crdmodel_tpu.config import config_from_ini
    for ini, model in (("/root/reference/data/FHNmodelArgs.ini", "fhn"),
                       ("/root/reference/data/GoldbeterModelArgs.ini",
                        "goldbeter")):
        cfg = config_from_ini(ini, model=model, surface="torus",
                              x_mesh=16, dtype="float64")
        problem = build_problem(cfg)
        state = np.asarray(problem.y0, dtype=np.float64)
        _compare(cfg, 0.0, state)
        _compare(cfg, cfg.t_final, state)
