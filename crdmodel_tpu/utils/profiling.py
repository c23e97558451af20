"""Tracing / profiling / observability (SURVEY.md §5).

The reference's only instrumentation is a rank-0 elapsed/ETA line
(src/FHNmodel_torus.cpp:457-477) and `time` in the shell scripts. Here:

  - throughput(result): the north-star grid-points x internal-steps / sec
    metric from a SimResult
  - trace(logdir): context manager around jax.profiler for TensorBoard-
    compatible device traces
  - device_sync(x): force completion of device work. On this image's axon
    TPU backend `block_until_ready` is a NO-OP (verified 2026-08-16) — only
    a device->host transfer synchronises, so all wall-clock timing in the
    framework brackets a scalar pull. Use this helper, never
    block_until_ready, when timing.
  - RunManifest: structured record of a run (config echo, environment,
    timings, solver stats) serialisable to JSON — the "per-run manifest"
    upgrade over the reference's stdout banner.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import platform
import time
from typing import Optional

import numpy as np


def device_sync(x) -> float:
    """Synchronise by pulling a scalar reduction to the host; returns it."""
    import jax.numpy as jnp
    return float(jnp.sum(x))


def throughput(result) -> float:
    """grid-points x internal steps / second for a completed SimResult."""
    cfg = result.cfg
    steps = int(np.sum(np.asarray(result.stats.steps)))
    return cfg.nx * cfg.ny * steps / max(result.wall_time, 1e-12)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace context (TensorBoard format). No-op without logdir."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class RunManifest:
    config: dict
    backend: str
    device: str
    jax_version: str
    python_version: str
    wall_time: float
    total_steps: int
    accepted: int
    rejected: int
    status: list
    throughput: float

    @classmethod
    def from_result(cls, result) -> "RunManifest":
        import jax
        devs = jax.devices()
        s = result.stats
        return cls(
            config=dataclasses.asdict(result.cfg),
            backend=jax.default_backend(),
            device=str(devs[0]) if devs else "none",
            jax_version=jax.__version__,
            python_version=platform.python_version(),
            wall_time=result.wall_time,
            total_steps=int(np.sum(np.asarray(s.steps))),
            accepted=int(np.sum(np.asarray(s.accepted))),
            rejected=int(np.sum(np.asarray(s.rejected))),
            status=[int(v) for v in np.asarray(s.status)],
            throughput=throughput(result),
        )

    def save(self, path: str) -> str:
        with open(path, "w") as fh:
            json.dump(dataclasses.asdict(self), fh, indent=2)
        return path
