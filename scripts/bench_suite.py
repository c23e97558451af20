"""Reproduce the headline performance table (docs/PERF_NOTES.md) in one run.

Warm-measures a curated set of configurations on the current accelerator:
each entry compiles once (cached driver on the Problem), then times a second
full run. Prints a markdown table and writes bench_suite.json next to it.

    python scripts/bench_suite.py            # full suite (~10 min w/ compiles)
    python scripts/bench_suite.py --quick    # canonical rows only
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def canonical_fhn(method):
    from crdmodel_tpu.config import config_from_ini
    cfg = config_from_ini("/root/reference/data/FHNmodelArgs.ini",
                          model="fhn", surface="torus")
    import dataclasses
    return dataclasses.replace(cfg, method=method)


def canonical_goldbeter(method):
    from crdmodel_tpu.config import config_from_ini
    cfg = config_from_ini("/root/reference/data/GoldbeterModelArgs.ini",
                          model="goldbeter", surface="torus")
    import dataclasses
    return dataclasses.replace(cfg, method=method)


def large_goldbeter(method):
    from crdmodel_tpu.config import SimConfig
    return SimConfig(model="goldbeter", surface="torus", x_mesh=800,
                     surface_width=20, surface_length=80,
                     t_final=1.0, output_timestep=2, beta=0.4,
                     wave_length=0.2, wave_width=0.5, wave_inside=1,
                     dtype="float32", rtol=1e-5, atol=1e-8, method=method)


def large_fhn(method):
    from crdmodel_tpu.config import SimConfig
    return SimConfig(model="fhn", surface="torus", x_mesh=1600,
                     surface_width=20, surface_length=80,
                     t_final=1.0, output_timestep=2, vary_beta=1,
                     beta_min=0.7, beta_max=1.7, t_boundary=0.0,
                     dtype="float32", rtol=1e-5, atol=1e-8, method=method)


def wide_fhn(method):
    """Wide-grid flat FHN (41M points, nx=3200): the shape where the fused
    RKC halo ladder matters — no S>=24 strip exists, so before round 3's
    variant_plan this silently ran the XLA path at 82.9 ms/step
    (PERF_NOTES "adaptive halo depth"; now shallow-fused at ~10 ms/step)."""
    from crdmodel_tpu.config import SimConfig
    return SimConfig(model="fhn", surface="flat", x_mesh=3200,
                     surface_width=20, surface_length=80,
                     t_final=0.5, output_timestep=1, vary_beta=0,
                     t_boundary=0.0, dtype="float32",
                     rtol=1e-5, atol=1e-8, method=method)


def curvature_fhn():
    """Curvature-coupled diffusion (round 3): the Kneer profile as D(theta)
    through the fused kernel's 3-profile remap (kernel_stencil_coeffs)."""
    import dataclasses
    return dataclasses.replace(canonical_fhn("bs32"), coupling="curvature",
                               t_final=5.0, output_timestep=2)


def bounded_tissue():
    """Bounded cardiac tissue (round 3, session 11): no-flux walls + a
    circular scar through the fused divergence-form kernel
    (ops/pallas_divform.py; measured 1.51x vs the XLA divergence path —
    PERF_NOTES 'fused divergence-form kernel'). Returns (cfg, build_kw)."""
    from crdmodel_tpu.config import SimConfig
    cfg = SimConfig(model="aliev_panfilov", surface="flat", x_mesh=400,
                    surface_width=20, surface_length=80, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=8.0, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-7, boundary="noflux")
    ny, nx = cfg.ny, cfg.nx
    jj, ii = np.mgrid[0:ny, 0:nx]
    scar = (jj - ny * 0.5) ** 2 + (ii - nx * 0.55) ** 2 <= (nx * 0.09) ** 2
    return cfg, dict(obstacle_mask=~scar)


def volumetric_box():
    """Volumetric bounded slab (round 3, session 14): the z-streaming fused
    3-D box kernel (ops/pallas_box3d.py; measured 4.1x at 8.4M / 4.4x at
    33.5M vs the XLA 7-point path — PERF_NOTES 'fused 3-D box step')."""
    from crdmodel_tpu.config import SimConfig
    return SimConfig(model="aliev_panfilov", surface="box", x_mesh=512,
                     y_mesh=512, z_mesh=32, surface_width=32.0,
                     surface_length=32.0, surface_depth=2.0, diffusion=1.0,
                     beta=0.10, wave_length=0.25, wave_width=0.5,
                     t_final=0.5, output_timestep=1, dtype="float32",
                     rtol=1e-4, atol=1e-7, boundary="noflux")


ROWS = [
    # (name, cfg builder, quick?)
    ("FHN torus 400x1600 Tf=50 bs32 (headline)",
     lambda: canonical_fhn("bs32"), True),
    ("FHN torus 400x1600 Tf=5 bs32 curvature-coupled",
     curvature_fhn, False),
    ("FHN torus 400x1600 Tf=50 rkc2",
     lambda: canonical_fhn("rkc2"), True),
    ("Goldbeter torus 100x400 Tf=4 bs32 (canonical)",
     lambda: canonical_goldbeter("bs32"), True),
    ("Goldbeter torus 100x400 Tf=4 ark324",
     lambda: canonical_goldbeter("ark324"), True),
    ("Goldbeter torus 800x3200 Tf=1 bs32",
     lambda: large_goldbeter("bs32"), False),
    ("Goldbeter torus 800x3200 Tf=1 rkc2",
     lambda: large_goldbeter("rkc2"), False),
    ("Goldbeter torus 800x3200 Tf=1 ark324",
     lambda: large_goldbeter("ark324"), False),
    ("FHN torus 1600x6400 Tf=1 rkc2",
     lambda: large_fhn("rkc2"), False),
    ("FHN flat 12800x3200 Tf=0.5 rkc2 (halo ladder)",
     lambda: wide_fhn("rkc2"), False),
    ("AP bounded tissue 1600x400 Tf=8 bs32 (noflux+scar, divform kernel)",
     bounded_tissue, False),
    ("AP box 32x512x512 (8.4M pts) Tf=0.5 bs32 (noflux, box3d kernel)",
     volumetric_box, False),
    ("AP box 32x512x512 (8.4M pts) Tf=0.5 rkc2 (noflux, box3d RKC kernel)",
     lambda: dataclasses.replace(volumetric_box(), method="rkc2"), False),
]


def max_scale_row(results):
    """Largest demonstrated single-chip grid: 100M points (20000x5000 FHN
    torus, varyBeta), streaming fused column-blocked rkc2 — state + rkc
    stage buffers fill most of the 16 GB HBM (the next size up, 164M,
    crashes the TPU worker). Two numbers, two stories (docs/PERF_NOTES.md
    'max-scale demo anatomy'): snapshot_mode='none' measures the solver
    loop itself (64.5 ms/step measured 2026-08-18); host-offloaded
    snapshots add 800 MB device->host pulls that the axon tunnel serves at
    28.8 MB/s (async-overlapped with compute, but the tail still lands in
    wall) — on real TPU hosts (~10 GB/s D2H) that end-to-end gap
    disappears. bs32 at this grid would be diffusion-CFL-bound thousands
    of steps."""
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import simulate_streaming
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=5000,
                    surface_width=20, surface_length=80,
                    t_final=0.25, output_timestep=2, vary_beta=1,
                    beta_min=0.7, beta_max=1.7, t_boundary=0.0,
                    dtype="float32", rtol=1e-5, atol=1e-8, method="rkc2")
    problem = build_problem(cfg)
    simulate_streaming(cfg, problem=problem, snapshot_mode="none")  # compile
    r = simulate_streaming(cfg, problem=problem, snapshot_mode="none")
    steps = r.total_steps()
    rate = cfg.nx * cfg.ny * steps / r.wall_time
    r2 = simulate_streaming(cfg, problem=problem, host_offload=True)
    results.append(dict(
        name="FHN torus 20000x5000 (100M pts) Tf=0.25 rkc2 streaming",
        ok=bool(r.ok and r2.ok), steps=int(steps),
        wall_s=round(r.wall_time, 1),
        us_per_step=round(1e6 * r.wall_time / max(steps, 1), 0),
        points_steps_per_s=float(f"{rate:.4g}"),
        wall_s_with_host_snapshots=round(r2.wall_time, 1)))
    print(f"done: max-scale: loop {r.wall_time:.1f}s / {steps} steps; "
          f"with host snapshots {r2.wall_time:.1f}s", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--max-scale", action="store_true",
                    help="append the 100M-point streaming-rkc2 row "
                         "(~12 min incl. compile; TPU only)")
    args = ap.parse_args()

    import jax
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import simulate

    backend = jax.default_backend()
    results = []
    for name, make_cfg, quick in ROWS:
        if args.quick and not quick:
            continue
        cfg = make_cfg()
        build_kw = {}
        if isinstance(cfg, tuple):
            cfg, build_kw = cfg
        problem = build_problem(cfg, **build_kw)
        r = simulate(cfg, problem=problem)          # compile + warm
        # best-of-2: the axon backend charges a one-time ~2.6 s cost to the
        # SECOND execution of a fresh executable (PERF_NOTES "fused rkc2
        # driver anomaly resolved"), so warm-once/time-once over-reads
        wall = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            r = simulate(cfg, problem=problem)
            wall = min(wall, time.perf_counter() - t0)
        steps = r.total_steps()
        rate = cfg.nx * cfg.ny * max(cfg.nz, 1) * steps / wall
        results.append(dict(name=name, ok=bool(r.ok), steps=int(steps),
                            wall_s=round(wall, 4),
                            us_per_step=round(1e6 * wall / max(steps, 1), 2),
                            points_steps_per_s=float(f"{rate:.4g}")))
        print(f"done: {name}: {wall:.3f}s / {steps} steps", file=sys.stderr)

    # ensemble (TPU-batched sweep) row: B=8 beta members, members mode
    # below PALLAS_AUTO_POINTS — the measured-crossover configuration
    # (PERF_NOTES "TPU-batched sweeps"); one compiled program, 8 members
    if not args.quick:
        from crdmodel_tpu.sweep import sweep_beta
        cfg_e = canonical_fhn("bs32")
        cfg_e = dataclasses.replace(cfg_e, x_mesh=100, t_final=5.0,
                                    output_timestep=1, vary_beta=0,
                                    beta=1.25, beta_min=0.0, beta_max=0.0)
        betas = [1.0 + 0.05 * i for i in range(8)]
        sweep_beta(cfg_e, betas, batch_mode="members")   # compile + warm
        wall = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            se = sweep_beta(cfg_e, betas, batch_mode="members")
            wall = min(wall, time.perf_counter() - t0)
        steps = int(np.sum(np.asarray(se.stats.steps)))
        rate = cfg_e.nx * cfg_e.ny * steps / wall
        results.append(dict(
            name=f"FHN sweep B=8 members-mode {cfg_e.ny}x{cfg_e.nx} Tf=5",
            ok=True, steps=steps, wall_s=round(wall, 4),
            us_per_step=round(1e6 * wall / max(steps, 1), 2),
            points_steps_per_s=float(f"{rate:.4g}")))
        print(f"done: ensemble members B=8: {wall:.3f}s / {steps} steps",
              file=sys.stderr)

    if args.max_scale:
        max_scale_row(results)

    print(f"\n## bench_suite ({backend})\n")
    print("| configuration | steps | wall (s) | us/step | points*steps/s |")
    print("|---|---|---|---|---|")
    for e in results:
        flag = "" if e["ok"] else " **FAILED**"
        print(f"| {e['name']}{flag} | {e['steps']} | {e['wall_s']} "
              f"| {e['us_per_step']} | {e['points_steps_per_s']:.3g} |")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_suite.json")
    with open(out, "w") as f:
        json.dump({"backend": backend, "rows": results}, f, indent=1)
    print(f"\nwrote {out}", file=sys.stderr)
    return 0 if all(e["ok"] for e in results) else 1


if __name__ == "__main__":
    sys.exit(main())
