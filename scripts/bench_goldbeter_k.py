"""Round-5: attack the Goldbeter canonical latency floor (VERDICT item 3).

The two Goldbeter reference programs (100x400 = 40K points,
data/GoldbeterModelArgs.ini:4-14) sit far below PALLAS_AUTO_POINTS, so no
fused kernel engages and the run is per-step-overhead-bound (~25 us/step on
the XLA path). This script measures every overhead-amortisation tool the
framework has at the canonical size, on the real chip:

  - XLA path, spec_k in {0, 2, 4, 8}   (XLA-side speculative batching)
  - fused single-step kernel forced on (use_pallas=True)
  - fused + speculative_k=2             (K-step kernel; K=2 is max for
                                         BS3(2) at HALO=8 - pallas_kstep.max_k)

Timing protocol per CLAUDE.md: warm twice (the axon backend charges ~2.6 s
to the SECOND execution of a fresh executable), then best-of-3.

    python scripts/bench_goldbeter_k.py [torus|flat|both]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(cfg, label):
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import simulate
    from crdmodel_tpu.utils.profiling import throughput

    problem = build_problem(cfg)
    simulate(cfg, problem=problem)       # compile + warm
    simulate(cfg, problem=problem)       # absorb 2nd-run charge
    best = None
    for _ in range(3):
        r = simulate(cfg, problem=problem)
        if best is None or r.wall_time < best.wall_time:
            best = r
    steps = int(np.sum(np.asarray(best.stats.steps)))
    rej = int(np.sum(np.asarray(best.stats.rejected)))
    print(f"  {label:28s} steps {steps:6d} (rej {rej:4d}), "
          f"wall {best.wall_time*1e3:7.1f} ms, "
          f"{best.wall_time/steps*1e6:6.1f} us/step, "
          f"{throughput(best):.3e} pts*steps/s", flush=True)
    return best


def section(surface):
    from crdmodel_tpu.config import config_from_ini

    cfg0 = config_from_ini("/root/reference/data/GoldbeterModelArgs.ini",
                           model="goldbeter", surface=surface)
    cfg0 = dataclasses.replace(cfg0, dtype="float32", rtol=1e-5, atol=1e-8)
    print(f"goldbeter_{surface}: grid {cfg0.ny}x{cfg0.nx}, Tf={cfg0.t_final}")
    for k in (0, 2, 4, 8):
        run_variant(dataclasses.replace(cfg0, use_pallas=False,
                                        speculative_k=k),
                    f"xla spec_k={k}")
    run_variant(dataclasses.replace(cfg0, use_pallas=True), "fused k=1")
    for k in (2, 5, 10):
        run_variant(dataclasses.replace(cfg0, use_pallas=True,
                                        speculative_k=k),
                    f"fused kstep k={k}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for s in (["torus", "flat"] if which == "both" else [which]):
        section(s)
