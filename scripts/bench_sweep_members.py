"""TPU parameter-sweep batching benchmark: members vs serial, two sizes.

Measures the production sweep driver (sweep.sweep_configs) in its two
on-TPU modes at a small grid (one member underutilises the VPU — batching
should win) and the canonical 400x1600 grid (one member saturates the VPU
and serial gets the fused Pallas kernel — batching should lose, serial
fused should beat serial XLA).  Prints one JSON line per (size, mode).

These numbers set the auto policy in sweep._resolve_batch_mode (members
below PALLAS_AUTO_POINTS, serial+fused above); measured results live in
docs/PERF_NOTES.md "TPU-batched sweeps".

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_sweep_members.py
"""

import dataclasses
import json

import numpy as np

from crdmodel_tpu.config import config_from_ini
from crdmodel_tpu.sweep import sweep_beta

BETAS = [0.8, 0.9, 1.0, 1.1, 1.2, 1.3, 1.45, 1.6]


def measure(cfg, label, mode, mesh=None):
    cold = sweep_beta(cfg, BETAS, mesh=mesh, batch_mode=mode)
    warm = sweep_beta(cfg, BETAS, mesh=mesh, batch_mode=mode)
    ok = bool(np.all(np.asarray(warm.stats.status) == 0))
    print(json.dumps({
        "label": label, "mode": mode, "B": len(BETAS),
        "grid": [cfg.ny, cfg.nx], "ok": ok,
        "cold_s": round(cold.wall_time, 1),
        "warm_s": round(warm.wall_time, 3),
        "total_member_steps": int(np.sum(np.asarray(warm.stats.steps))),
    }), flush=True)
    return warm


def main():
    from crdmodel_tpu.parallel.ensemble import make_ensemble_mesh

    cfg = config_from_ini("/root/reference/data/FHNmodelArgs.ini",
                          model="fhn", surface="torus")
    cfg = dataclasses.replace(cfg, vary_beta=0, beta=1.2, t_final=5.0,
                              output_timestep=2, t_boundary=2.0)
    small = dataclasses.replace(cfg, x_mesh=100)   # 40K points
    for label, c in (("small-100x400", small), ("canonical-400x1600", cfg)):
        for mode in ("members", "serial"):
            measure(c, label, mode)
        # ensemble over however many devices exist (1 on this image: the
        # on-device lax.map member fold in ONE dispatch — measured beating
        # the host serial loop, docs/PERF_NOTES.md "Ensemble device-
        # parallel sweeps"; on a real pod M devices scale it ~Mx)
        import jax
        m = min(len(jax.devices()), len(BETAS))
        measure(c, f"{label}-ensemble-m{m}", "auto",
                mesh=make_ensemble_mesh(m))


if __name__ == "__main__":
    main()
