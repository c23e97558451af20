"""Checkpoint / resume (SURVEY.md §5: absent in the reference — its text
rows are a trajectory record with no reader on the C++ side; this is the
promised strict superset).

A checkpoint freezes the integration at an output boundary: solver state
(y, t, h, err_prev), accumulated snapshots, per-interval stats, and a config
fingerprint so resuming with a different physical setup is refused.

Format: compressed npz (dependency-free). An orbax-backed variant for
async/multi-host checkpointing of sharded runs is future work — the state is
a single host-gatherable array at current scales.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig

# fields that affect the trajectory (resume refuses a mismatch); knobs like
# use_pallas or dtype may legitimately change between sessions
_PHYSICS_FIELDS = (
    "model", "surface", "diffusion", "beta", "surface_width",
    "surface_length", "wave_length", "wave_width", "wave_inside",
    "output_timestep", "t_boundary", "t_final", "x_mesh", "beta_min",
    "beta_max", "vary_beta", "just_diffusion", "ic_type", "rng_seed",
    "rtol", "atol", "method",
)


def config_fingerprint(cfg: SimConfig) -> str:
    blob = json.dumps({f: getattr(cfg, f) for f in _PHYSICS_FIELDS},
                      sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_checkpoint(path: str, cfg: SimConfig, k_out: int,
                    y, t: float, h: float, err_prev: float,
                    snapshots, stats: dict):
    """Write a resumable checkpoint after output interval k_out."""
    np.savez_compressed(
        path,
        fingerprint=config_fingerprint(cfg),
        k_out=k_out,
        y=np.asarray(y),
        t=float(t), h=float(h), err_prev=float(err_prev),
        snapshots=np.asarray(snapshots),
        **{f"stats_{k}": np.asarray(v) for k, v in stats.items()},
    )
    return path


def load_checkpoint(path: str, cfg: SimConfig) -> dict:
    with np.load(path, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}
    fp = str(data["fingerprint"])
    want = config_fingerprint(cfg)
    if fp != want:
        raise ValueError(
            f"checkpoint {path} was written for a different problem "
            f"(fingerprint {fp} != {want}); refusing to resume")
    return data


def resume_streaming(cfg: SimConfig, path: str, problem=None,
                     on_snapshot=None, progress: bool = False,
                     checkpoint_every: Optional[int] = None,
                     checkpoint_path: Optional[str] = None):
    """Resume a simulate_streaming run from a checkpoint file."""
    from crdmodel_tpu.sim import simulate_streaming
    data = load_checkpoint(path, cfg)
    return simulate_streaming(
        cfg, problem=problem, on_snapshot=on_snapshot, progress=progress,
        checkpoint_every=checkpoint_every, checkpoint_path=checkpoint_path,
        _resume=data)
