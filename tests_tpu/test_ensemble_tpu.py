"""On-chip ensemble sweep: the M=1 member mesh (on-device lax.map fold of
the fused single-member program, ONE dispatch) must reproduce the serial
fused host loop — same kernels, same runtime _fused_b inputs
(docs/PERF_NOTES.md "Ensemble device-parallel sweeps")."""

import dataclasses

import numpy as np

from crdmodel_tpu.config import config_from_ini
from crdmodel_tpu.parallel.ensemble import make_ensemble_mesh
from crdmodel_tpu.sweep import sweep_beta

BETAS = [1.0, 1.1, 1.2, 1.3]


def test_ensemble_fold_matches_serial_fused():
    cfg = config_from_ini("/root/reference/data/FHNmodelArgs.ini",
                          model="fhn", surface="torus")
    cfg = dataclasses.replace(cfg, vary_beta=0, beta=1.2, t_final=2.0,
                              output_timestep=2, t_boundary=1.0)
    serial = sweep_beta(cfg, BETAS, batch_mode="serial")
    ens = sweep_beta(cfg, BETAS, mesh=make_ensemble_mesh(1))
    assert serial.ok() and ens.ok()
    # identical fused kernel; f32 controller rounding may shift a few
    # accept/reject decisions near threshold (h0 runs under shard_map vs
    # plain jit) — trajectories agree to integration tolerance and step
    # counts to a handful out of thousands
    np.testing.assert_allclose(np.asarray(ens.trajectories),
                               np.asarray(serial.trajectories),
                               rtol=0, atol=5e-3)
    steps_s = np.asarray(serial.stats.steps).sum(axis=1)
    steps_e = np.asarray(ens.stats.steps).sum(axis=1)
    assert np.abs(steps_s - steps_e).max() <= 10, (steps_s, steps_e)
