"""Reaction-model registry.

The reference hardcodes model kinetics inline in each monolith's RHS
(SURVEY.md C7/C8). Here a model is data: a pair of pure functions
(kinetics, steady_state) registered by name, so the solver core is shared by
every model x surface combination and new models are one small file.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

# kinetics(state, b) -> dstate  where state/dstate are (nvars, ...) arrays
# and b is the (possibly spatially varying) bifurcation parameter field.
#
# AUTONOMY CONTRACT: kinetics take no time argument — every registered model
# is autonomous, like all four reference RHS's (time enters the reference's
# f() only through the t<tBoundary freeze, SURVEY.md C7, which the framework
# applies outside kinetics). The fused Pallas kernels rely on this: they
# evaluate kinetics without per-stage times (e.g. ops/pallas_imex.py
# step_err discards t), which is exactly equivalent to the XLA steppers'
# ti = t + C[i]*h stage times ONLY for autonomous kinetics. Time-dependent
# dynamics enter through the separate per-problem forcing hook
# (build_problem(cfg, forcing=fn), core/problem.py) — the XLA steppers
# evaluate it at true stage times and every fused-kernel eligibility gate
# declines when a forcing is present, so the contract here stays intact.
KineticsFn = Callable[..., object]
# steady_state(beta) -> tuple of nvars floats
SteadyStateFn = Callable[[float], Tuple[float, ...]]


@dataclasses.dataclass(frozen=True)
class ReactionModel:
    name: str
    nvars: int
    var_names: Tuple[str, ...]     # output file suffixes: ("u","v") / ("Z","Y")
    kinetics: KineticsFn
    steady_state: SteadyStateFn
    # which variables diffuse, and their diffusion coefficient as a multiple
    # of cfg.diffusion. The reference models diffuse variable 0 only
    # (SURVEY.md C5/C6); multi-species diffusion (e.g. Gray-Scott) is a
    # framework generalisation.
    diffusive_vars: Tuple[int, ...] = (0,)
    diffusion_ratios: Tuple[float, ...] = (1.0,)
    # jac_bound(state, b) -> POINTWISE Gershgorin bound on the kinetics
    # Jacobian's spectral radius, same trailing shape as state[0] (used by
    # the RKC2 stabilized integrator's stage selection; the grid max — or
    # per-member max for batched sweeps — is taken by make_rho_bound);
    # None disables rkc2 for the model
    jac_bound: Callable = None


_REGISTRY: Dict[str, ReactionModel] = {}


def register_model(model: ReactionModel) -> ReactionModel:
    _REGISTRY[model.name] = model
    return model


def get_model(name: str) -> ReactionModel:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(_REGISTRY)}")
