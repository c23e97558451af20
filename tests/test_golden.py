"""Golden regression fixtures.

Small deterministic f64 CPU runs for each model x surface, frozen as npz in
tests/golden/. Any change to stencils, kinetics, ICs, or the integrator that
shifts results beyond integrator-level tolerance trips these — the guard
against silent numerical drift across refactors/rounds.

Regenerate deliberately (after verifying the change is intended) with:
    python tests/test_golden.py regen
"""

import os
import sys

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

CASES = {
    "fhn_flat": dict(model="fhn", surface="flat", beta=1.25, t_boundary=0.4),
    "fhn_torus": dict(model="fhn", surface="torus", beta=1.25, vary_beta=1,
                      beta_min=0.7, beta_max=1.7, t_boundary=0.4),
    "goldbeter_flat": dict(model="goldbeter", surface="flat", beta=0.85),
    "goldbeter_torus": dict(model="goldbeter", surface="torus", beta=0.4,
                            wave_inside=1),
    "barkley_flat": dict(model="barkley", surface="flat", beta=0.05,
                         diffusion=1.0),
    "barkley_torus": dict(model="barkley", surface="torus", beta=0.05,
                          diffusion=1.0),
    # grayscott: the only multi-species diffusion-ratio path (D_v = D_u/2) —
    # without a fixture that path has no drift guard (VERDICT r1 weak #5)
    "grayscott_flat": dict(model="grayscott", surface="flat", beta=0.03,
                           diffusion=2e-5, t_final=20.0),
    "grayscott_torus": dict(model="grayscott", surface="torus", beta=0.03,
                            diffusion=2e-5, t_final=20.0),
    "oregonator_flat": dict(model="oregonator", surface="flat", beta=1.5,
                            diffusion=1.0),
    "oregonator_torus": dict(model="oregonator", surface="torus", beta=1.5,
                             diffusion=1.0),
    # brusselator: second multi-species path (D_v = 8 D_u), Turing window
    "brusselator_flat": dict(model="brusselator", surface="flat", beta=1.9,
                             diffusion=0.2),
    "brusselator_torus": dict(model="brusselator", surface="torus", beta=1.9,
                              diffusion=0.2),
    # sir: nvars=3 + offset diffusing variable (index 1)
    "sir_flat": dict(model="sir", surface="flat", beta=1.5, diffusion=1.0),
    "sir_torus": dict(model="sir", surface="torus", beta=1.5, diffusion=1.0),
    # lambdaomega: equal-coefficient two-species diffusion, oscillatory
    # background (exact-solution oracle lives in test_lambdaomega.py)
    "lambdaomega_flat": dict(model="lambdaomega", surface="flat", beta=0.5,
                             diffusion=0.5),
    "lambdaomega_torus": dict(model="lambdaomega", surface="torus", beta=0.5,
                              diffusion=0.5),
    # aliev_panfilov: cardiac kinetics with a state-dependent relaxation
    # rate eps(u,v) (the only non-polynomial-in-v family)
    "aliev_panfilov_flat": dict(model="aliev_panfilov", surface="flat",
                                beta=0.15, diffusion=1.0),
    "aliev_panfilov_torus": dict(model="aliev_panfilov", surface="torus",
                                 beta=0.15, diffusion=1.0),
    # sphere (round 3): drift anchors for the surfaces-of-revolution
    # geometry — the capped metric, pole closure and staggered x-grid
    # (core/grid.py::RevolutionGeometry; tests/test_sphere.py)
    "fhn_sphere": dict(model="fhn", surface="sphere", beta=1.25),
    "barkley_sphere": dict(model="barkley", surface="sphere", beta=0.05,
                           diffusion=1.0),
}
BASE = dict(x_mesh=16, surface_width=20, surface_length=40,
            t_final=1.0, output_timestep=2, wave_length=0.1, wave_width=0.5,
            dtype="float64", rtol=1e-7, atol=1e-11)


def _run(case):
    cfg = SimConfig(**{**BASE, **CASES[case]})
    res = simulate(cfg)
    assert res.ok, case
    return np.asarray(res.trajectory)


def _path(case):
    return os.path.join(GOLDEN_DIR, f"{case}.npz")


def regenerate():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for case in CASES:
        np.savez_compressed(_path(case), trajectory=_run(case))
        print("wrote", _path(case))


def _check(case):
    with np.load(_path(case)) as z:
        want = z["trajectory"]
    got = _run(case)
    # integrator-tolerance agreement: controller/step-sequence changes are
    # fine, physics changes are not
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("case", sorted(CASES))
def test_golden(case):
    _check(case)


def test_cases_cover_every_model_surface():
    """Every registered model x surface combination has a golden fixture."""
    import crdmodel_tpu.models  # noqa: F401  (populates the registry)
    from crdmodel_tpu.models.base import _REGISTRY
    covered = {(CASES[c]["model"], CASES[c]["surface"]) for c in CASES}
    want = {(m, s) for m in _REGISTRY for s in ("flat", "torus")}
    # every model on the reference's two surfaces, plus the sphere drift
    # anchors (the extra surfaces don't need per-model fixtures)
    assert want <= covered, want - covered


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        regenerate()
    else:
        print(__doc__)
