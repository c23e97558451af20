"""Round-4 on-chip measurements: mirror padding, tensor kernels, forcing.

Each section warms the compiled program once, then times best-of-N (N>=2
timed calls after the warm call — the axon backend charges ~2.6 s to the
SECOND execution of every fresh executable; CLAUDE.md). Run sections
individually to keep TPU dispatches bounded:

    python scripts/bench_round4.py pad      # mirror-pad uneven vs even
    python scripts/bench_round4.py tensor   # 19-point tensor fused vs XLA
    python scripts/bench_round4.py forcing  # in-kernel forcing overhead
    python scripts/bench_round4.py programs # Goldbeter/FHN-flat TPU rows
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def best_of(fn, n=3):
    fn()                      # warm executable (first run compiles)
    fn()                      # absorb the backend's second-run charge
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def section_pad():
    """Uneven (mirror-pad) vs even fused at ~10M points on the real chip
    (1x1 mesh: pads come from the 8-row block alignment of pad_spec_for
    — the mirror legs degenerate to local slices, measuring the pad
    machinery's cost: masked error sums, wrapped params, extra rows)."""
    import jax.numpy as jnp
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, mesh_pad_spec, sharded_params)
    from crdmodel_tpu.utils.profiling import device_sync

    mesh = make_mesh(shape=(1, 1))
    for name, ny_mesh, method in [("even-bs32", 6400, "bs32"),
                                  ("uneven-bs32", 6401, "bs32"),
                                  ("even-rkc2", 6400, "rkc2"),
                                  ("uneven-rkc2", 6401, "rkc2")]:
        cfg = SimConfig(model="fhn", surface="flat", x_mesh=1600,
                        y_mesh=ny_mesh, surface_width=20.0,
                        surface_length=20.0 * ny_mesh / 1600.0,
                        t_final=0.05, output_timestep=1, beta=1.25,
                        dtype="float32", rtol=1e-5, atol=1e-8,
                        method=method, use_pallas=True)
        ny = cfg.ny
        problem = build_problem(cfg)
        pad_spec = mesh_pad_spec(cfg, mesh)
        params, _ = sharded_params(problem, pad_spec)
        run, _ = make_sharded_simulation_fn(problem, mesh)
        y0 = (pad_spec.pad_field(problem.y0) if pad_spec is not None
              else problem.y0)

        def one():
            traj, stats = run(y0, params)
            device_sync(traj)
            return stats

        dt = best_of(one)
        _, st = run(y0, params)
        steps = int(np.sum(np.asarray(st.steps)))
        print(f"pad {name}: grid {ny}x{cfg.nx} "
              f"(pad {'on' if pad_spec else 'off'}"
              f"{' -> ' + str(pad_spec.padded_shape) if pad_spec else ''}), "
              f"steps {steps}, best {dt*1e3:.1f} ms, "
              f"{dt/steps*1e6:.1f} us/step, "
              f"{ny*cfg.nx*steps/dt:.3e} pts*steps/s")


def section_tensor():
    """19-point tensor fused vs XLA at 8.4M points (512x512x32)."""
    import jax.numpy as jnp
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import make_simulation_fn
    from crdmodel_tpu.utils.profiling import device_sync

    def tensor_for(cfg):
        nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
        z = np.linspace(0, 1, nz)[:, None, None] * np.ones((nz, ny, nx))
        th = (z - 0.5) * np.pi / 3
        dpar, dperp, dtrans = 1.0, 0.25, 0.02
        c, s_ = np.cos(th), np.sin(th)
        return (dpar * c * c + dperp * s_ * s_,
                dpar * s_ * s_ + dperp * c * c,
                np.full_like(c, dtrans), (dpar - dperp) * c * s_,
                np.where((z > 0.2) & (z < 0.8), 0.02, 0.0),
                np.where((z > 0.2) & (z < 0.8), -0.015, 0.0))

    for method in ("bs32", "rkc2"):
        for use_pallas in (True, False):
            cfg = SimConfig(model="aliev_panfilov", surface="box",
                            x_mesh=512, y_mesh=512, z_mesh=32,
                            surface_width=40.0, surface_length=40.0,
                            surface_depth=5.0, diffusion=1.0, beta=0.05,
                            wave_length=0.06, wave_width=0.06,
                            t_final=0.2, output_timestep=1,
                            boundary="noflux_z", dtype="float32",
                            rtol=1e-4, atol=1e-7, method=method,
                            use_pallas=use_pallas)
            problem = build_problem(cfg, diffusion_tensor=tensor_for(cfg))
            run, _ = make_simulation_fn(problem)

            def one():
                traj, stats = run(problem.y0, problem.params)
                device_sync(traj)
                return stats

            dt = best_of(one)
            _, st = run(problem.y0, problem.params)
            steps = int(np.sum(np.asarray(st.steps)))
            pts = cfg.nz * cfg.ny * cfg.nx
            print(f"tensor {method} {'fused' if use_pallas else 'xla  '}: "
                  f"{cfg.nz}x{cfg.ny}x{cfg.nx} ({pts/1e6:.1f}M), "
                  f"steps {steps}, best {dt*1e3:.1f} ms, "
                  f"{dt/steps*1e3:.2f} ms/step, "
                  f"{pts*steps/dt:.3e} pts*steps/s")


def section_forcing():
    """In-kernel forcing vs XLA forcing vs unforced fused, canonical-ish
    flat grid (the profile step kernel path)."""
    import jax.numpy as jnp
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.forcing import s1s2_protocol
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import make_simulation_fn
    from crdmodel_tpu.utils.profiling import device_sync

    base = SimConfig(model="fhn", surface="flat", x_mesh=1600,
                     surface_width=20.0, surface_length=80.0,
                     t_final=0.05, output_timestep=1, beta=1.25,
                     dtype="float32", rtol=1e-5, atol=1e-8)
    for name, use_pallas, forced in [("fused unforced", True, False),
                                     ("fused forced  ", True, True),
                                     ("xla   forced  ", False, True)]:
        cfg = dataclasses.replace(base, use_pallas=use_pallas)
        frc = (s1s2_protocol(cfg, amplitude=1.0, s1_times=[0.01],
                             s2_time=0.03, duration=0.005)
               if forced else None)
        problem = build_problem(cfg, forcing=frc)
        run, _ = make_simulation_fn(problem)

        def one():
            traj, stats = run(problem.y0, problem.params)
            device_sync(traj)
            return stats

        dt = best_of(one)
        _, st = run(problem.y0, problem.params)
        steps = int(np.sum(np.asarray(st.steps)))
        print(f"forcing {name}: {cfg.ny}x{cfg.nx}, steps {steps}, "
              f"best {dt*1e3:.1f} ms, {dt/steps*1e6:.1f} us/step")


def section_programs():
    """TPU rows for the four reference programs' canonical configs
    (BASELINE.md): full Tf runs, warm-driver timing."""
    from crdmodel_tpu.config import config_from_ini
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import simulate
    from crdmodel_tpu.utils.profiling import throughput

    for model, surface, ini in [
            ("fhn", "torus", "/root/reference/data/FHNmodelArgs.ini"),
            ("fhn", "flat", "/root/reference/data/FHNmodelArgs.ini"),
            ("goldbeter", "torus",
             "/root/reference/data/GoldbeterModelArgs.ini"),
            ("goldbeter", "flat",
             "/root/reference/data/GoldbeterModelArgs.ini")]:
        cfg = config_from_ini(ini, model=model, surface=surface)
        cfg = dataclasses.replace(cfg, dtype="float32",
                                  rtol=1e-5, atol=1e-8)
        problem = build_problem(cfg)
        r1 = simulate(cfg, problem=problem)      # compile + warm
        r2 = simulate(cfg, problem=problem)      # absorb 2nd-run charge
        best = None
        for _ in range(3):
            r = simulate(cfg, problem=problem)
            if best is None or r.wall_time < best.wall_time:
                best = r
        steps = int(np.sum(np.asarray(best.stats.steps)))
        print(f"program {model}_{surface}: grid {cfg.ny}x{cfg.nx}, "
              f"Tf={cfg.t_final}, steps {steps}, "
              f"wall {best.wall_time:.3f} s warm, "
              f"{throughput(best):.3e} pts*steps/s")


if __name__ == "__main__":
    sections = sys.argv[1:] or ["pad", "tensor", "forcing", "programs"]
    for sec in sections:
        print(f"=== {sec} ===")
        {"pad": section_pad, "tensor": section_tensor,
         "forcing": section_forcing, "programs": section_programs}[sec]()
