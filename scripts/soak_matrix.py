"""Production soak matrix: model x method at production grid size.

Runs every registered 2/3-variable family through each integrator at
800x3200 (2.56M grid points, the size where all fused kernels are active)
on the current accelerator, asserting clean status and finite fields. One
command of robustness evidence across the full model/method matrix — the
reference's only analogue was 'run mpirun and look at the movie'.

    python scripts/soak_matrix.py            # full matrix (~10-20 min cold)
    python scripts/soak_matrix.py --tf 0.2   # shorter physics
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# per-model physics that puts the run in its interesting regime at this size
MODELS = {
    "fhn": dict(beta=1.25, diffusion=0.12, vary_beta=1,
                beta_min=0.7, beta_max=1.7, t_boundary=0.0),
    "goldbeter": dict(beta=0.4, diffusion=0.12, wave_inside=1),
    "barkley": dict(beta=0.05, diffusion=1.0),
    "grayscott": dict(beta=0.03, diffusion=2e-5),
    "oregonator": dict(beta=1.5, diffusion=1.0),
    "brusselator": dict(beta=1.9, diffusion=0.2),
    "sir": dict(beta=1.5, diffusion=1.0),
    "lambdaomega": dict(beta=0.5, diffusion=0.5),
    "aliev_panfilov": dict(beta=0.15, diffusion=1.0),
}
METHODS = ("bs32", "rkc2", "ark324")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tf", type=float, default=0.5)
    ap.add_argument("--x-mesh", type=int, default=800)
    args = ap.parse_args()

    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import simulate

    failures = []
    for model, phys in MODELS.items():
        for method in METHODS:
            cfg = SimConfig(model=model, surface="torus",
                            x_mesh=args.x_mesh, surface_width=20,
                            surface_length=80, t_final=args.tf,
                            output_timestep=1, wave_length=0.2,
                            wave_width=0.5, dtype="float32",
                            rtol=1e-5, atol=1e-8, method=method, **phys)
            t0 = time.perf_counter()
            try:
                res = simulate(cfg, problem=build_problem(cfg))
                ok = res.ok and bool(np.isfinite(
                    np.asarray(res.trajectory)).all())
                note = (f"steps={res.total_steps()} "
                        f"wall={time.perf_counter() - t0:.1f}s")
            except Exception as e:              # noqa: BLE001 — report all
                ok, note = False, f"EXC {type(e).__name__}: {e}"
            print(f"{'ok ' if ok else 'FAIL'} {model:12s} {method:7s} {note}",
                  flush=True)
            if not ok:
                failures.append((model, method, note))

    if failures:
        print(f"\n{len(failures)} failures: {failures}")
        return 1
    print(f"\nsoak matrix clean: {len(MODELS)} models x {len(METHODS)} "
          f"methods at {args.x_mesh}x{4 * args.x_mesh}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
