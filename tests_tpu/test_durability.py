"""End-to-end durability on the chip: a checkpointed production run killed
mid-stream must resume to a final state BITWISE identical to an
uninterrupted run (checkpoints capture the exact solver state — t, h,
controller error history — so the post-resume step sequence is the same)."""

import dataclasses
import os

import numpy as np
import pytest

from crdmodel_tpu.config import config_from_ini
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.io.checkpoint import resume_streaming
from crdmodel_tpu.sim import simulate_streaming


class _Crash(Exception):
    pass


def test_crash_resume_bitwise(tmp_path):
    cfg = config_from_ini("/root/reference/data/FHNmodelArgs.ini",
                          model="fhn", surface="torus")
    cfg = dataclasses.replace(cfg, t_final=20.0, output_timestep=10)
    p = build_problem(cfg)
    ck = str(tmp_path / "state.npz")

    full = simulate_streaming(cfg, problem=p, host_offload=True)
    assert full.ok

    def crash_at_5(k, y):
        if k == 5:
            raise _Crash()

    with pytest.raises(_Crash):
        simulate_streaming(cfg, problem=p, checkpoint_every=2,
                           checkpoint_path=ck, on_snapshot=crash_at_5,
                           host_offload=True)
    assert os.path.exists(ck)

    res = resume_streaming(cfg, ck, problem=p, host_offload=True)
    assert res.ok
    np.testing.assert_array_equal(np.asarray(res.trajectory[-1]),
                                  np.asarray(full.trajectory[-1]))
    assert res.total_steps() == full.total_steps()
