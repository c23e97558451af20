"""Kernel auto-selection cost model (round 5 — VERDICT r4 item 6).

The fused RKC kernels win 1.4-4.2x net wall on every measured ACTIVE
configuration but lose at provably-quiescent runs (stage-budget h cap
inflates steps with nothing to amortise — the measured 4.1x-steps /
1.35x-loss shape E in PERF_NOTES "fused-vs-XLA rkc2 selection"). AUTO
selection must keep such runs on the XLA path; use_pallas=True still
forces the kernel.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import _quiescent_autonomous


def _cfg(**kw):
    base = dict(model="aliev_panfilov", surface="flat", x_mesh=64,
                surface_width=4.0, surface_length=4.0, y_mesh=64,
                beta=0.1, t_final=2.0, output_timestep=1, dtype="float32",
                rtol=1e-4, atol=1e-6, boundary="noflux", method="rkc2")
    base.update(kw)
    return SimConfig(**base)


def test_quiescent_predicate():
    # uniform rest ICs + autonomous -> provably quiescent
    quiet = build_problem(_cfg(wave_length=0.0, wave_width=0.0))
    assert _quiescent_autonomous(quiet)
    # wave ICs -> active
    active = build_problem(_cfg())
    assert not _quiescent_autonomous(active)
    # forcing makes any rest state non-quiescent
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           pulse_train, rect_profile)
    cfg = _cfg(wave_length=0.0, wave_width=0.0)
    forced = build_problem(cfg, forcing=SeparableForcing(
        Stimulus(waveform=pulse_train([0.1], 0.1, 1.0),
                 row=rect_profile(cfg.ny, 0, 8))))
    assert not _quiescent_autonomous(forced)
    # a beta ramp keeps the kinetics off the uniform fixed point
    ramp = build_problem(_cfg(model="fhn", beta=1.25, wave_length=0.0,
                              wave_width=0.0, vary_beta=1, beta_min=0.7,
                              beta_max=1.7, boundary="periodic"))
    assert not _quiescent_autonomous(ramp)


def test_sharded_rkc_auto_declines_quiescent():
    from crdmodel_tpu.core.problem import make_rho_bound
    from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
    from crdmodel_tpu.parallel.sharded import maybe_fused_shard_rkc
    from jax import lax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(shape=(2, 2))
    # periodic: the profile branch of the shard RKC kernel (the noflux
    # divform configuration routes differently and is pinned elsewhere)
    cfg = _cfg(wave_length=0.0, wave_width=0.0,
               boundary="periodic")   # use_pallas=None (auto)
    p = build_problem(cfg)
    rho = make_rho_bound(cfg, p.model, p.geometry, jnp.float32,
                         max_reduce=lambda x: lax.pmax(x,
                                                       (AXIS_Y, AXIS_X)),
                         face_mask=p.face_mask,
                         diffusion_field=p.diffusion_field)
    assert maybe_fused_shard_rkc(p, mesh, rho, interpret=True) is None
    # the explicit override still builds the kernel
    cfg_f = dataclasses.replace(cfg, use_pallas=True)
    p_f = build_problem(cfg_f)
    assert maybe_fused_shard_rkc(p_f, mesh, rho, interpret=True) is not None
