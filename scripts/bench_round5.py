"""Round-5 on-chip measurements: smooth-waveform RKC forcing, tensor on
padded grids, 3-D in-kernel pacing (as sections land).

Timing protocol per CLAUDE.md: warm the compiled program, absorb the
backend's second-run charge, then best-of-3.

    python scripts/bench_round5.py smoothrkc   # smooth drive: fused vs XLA rkc2
    python scripts/bench_round5.py tensorpad   # aniso tensor, uneven grid: fused vs XLA
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def best_of(fn, n=3):
    fn()
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def section_smoothrkc():
    """Sinusoidal pacing drive at 1600x1600 noflux (the round-4 pulsed
    shape): fused RKC2 with per-eval stage-time amplitudes vs XLA rkc2."""
    import jax
    import jax.numpy as jnp
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           rect_profile)
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import make_run_fn
    from crdmodel_tpu.utils.profiling import device_sync

    cfg0 = SimConfig(model="aliev_panfilov", surface="flat", x_mesh=1600,
                     surface_width=40.0, surface_length=40.0, y_mesh=1600,
                     beta=0.1, t_final=2.0, output_timestep=1,
                     dtype="float32", rtol=1e-4, atol=1e-6,
                     boundary="noflux", method="rkc2")

    def frc(cfg):
        return SeparableForcing(
            Stimulus(waveform=lambda t: 0.6 * (1.0 + jnp.sin(8.0 * t)),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 8)))

    for name, up in [("fused", True), ("xla", False)]:
        cfg = dataclasses.replace(cfg0, use_pallas=up)
        p = build_problem(cfg, forcing=frc(cfg))
        run = jax.jit(make_run_fn(p)[0])

        def one():
            tr, st = run(p.y0, p.params)
            device_sync(tr)
            return st

        dt = best_of(one)
        _, st = run(p.y0, p.params)
        steps = int(np.sum(np.asarray(st.steps)))
        print(f"smoothrkc {name}: steps {steps}, best {dt*1e3:.0f} ms, "
              f"{dt/steps*1e6:.0f} us/step, "
              f"{cfg.ny*cfg.nx*steps/dt:.3e} pts*steps/s", flush=True)


def section_tensorpad():
    """2-D anisotropic tensor FIELD on an uneven grid (3200x3201 -> padded)
    at ~10M points: fused aniso shard kernel (mirror pad) vs the XLA padded
    path, 1x1 mesh on the chip."""
    import jax
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_aniso,
        mesh_pad_spec, sharded_params)
    from crdmodel_tpu.utils.profiling import device_sync

    cfg0 = SimConfig(model="fhn", surface="flat", x_mesh=3200, y_mesh=3201,
                     surface_width=20.0, surface_length=20.0, beta=1.25,
                     t_final=0.05, output_timestep=1, dtype="float32",
                     rtol=1e-5, atol=1e-8)
    rng = np.random.default_rng(31)
    shape = (cfg0.ny, cfg0.nx)
    dxx = 0.1 + 0.2 * rng.random(shape)
    dyy = 0.1 + 0.2 * rng.random(shape)
    dxy = 0.8 * np.sqrt(dxx * dyy) * (2 * rng.random(shape) - 1)
    tensor = (dxx, dyy, dxy)
    mesh = make_mesh(shape=(1, 1))
    for name, up in [("fused", True), ("xla", False)]:
        cfg = dataclasses.replace(cfg0, use_pallas=up)
        p = build_problem(cfg, diffusion_tensor=tensor)
        pad_spec = mesh_pad_spec(cfg, mesh)
        if up:
            assert pad_spec is not None and pad_spec.active
            assert maybe_fused_shard_aniso(p, mesh,
                                           pad_spec=pad_spec) is not None
        params, _ = sharded_params(p, pad_spec)
        run, _ = make_sharded_simulation_fn(p, mesh)
        y0 = (pad_spec.pad_field(p.y0) if pad_spec is not None else p.y0)

        def one():
            tr, st = run(y0, params)
            device_sync(tr)
            return st

        dt = best_of(one)
        _, st = run(y0, params)
        steps = int(np.sum(np.asarray(st.steps)))
        print(f"tensorpad {name}: grid {cfg.ny}x{cfg.nx}"
              f"{' padded ' + str(pad_spec.padded_shape) if pad_spec else ''},"
              f" steps {steps}, best {dt*1e3:.0f} ms, "
              f"{dt/steps*1e6:.0f} us/step, "
              f"{cfg.ny*cfg.nx*steps/dt:.3e} pts*steps/s", flush=True)


def section_boxforcing():
    """Paced volumetric slab at 8.4M points (1024x1024x8, the round-4
    tensor-bench shape): in-kernel pacing through the z-streaming box
    kernels vs the XLA forcing path."""
    import jax
    import jax.numpy as jnp
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           gaussian_profile, pulse_train,
                                           rect_profile)
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import make_run_fn
    from crdmodel_tpu.utils.profiling import device_sync

    cfg0 = SimConfig(model="aliev_panfilov", surface="box", x_mesh=1024,
                     surface_width=40.0, surface_length=40.0, y_mesh=1024,
                     surface_depth=2.0, z_mesh=8, t_final=0.5,
                     output_timestep=1, beta=0.1, dtype="float32",
                     rtol=1e-4, atol=1e-6, boundary="noflux")

    def frc(cfg):
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.05, 0.3], 0.08, 1.0),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 8),
                     zprof=gaussian_profile(cfg.nz, 0.0, 2.0)),
            Stimulus(waveform=lambda t: 0.3 * jnp.cos(4.0 * t),
                     col=rect_profile(cfg.nx, 0, cfg.nx // 2)))

    for method in ("bs32", "rkc2"):
        for name, up in [("fused", True), ("xla", False)]:
            cfg = dataclasses.replace(cfg0, use_pallas=up, method=method)
            p = build_problem(cfg, forcing=frc(cfg))
            run = jax.jit(make_run_fn(p)[0])

            def one():
                tr, st = run(p.y0, p.params)
                device_sync(tr)
                return st

            dt = best_of(one)
            _, st = run(p.y0, p.params)
            steps = int(np.sum(np.asarray(st.steps)))
            print(f"boxforcing {method} {name}: steps {steps}, "
                  f"best {dt*1e3:.0f} ms, {dt/steps*1e6:.0f} us/step, "
                  f"{cfg.nz*cfg.ny*cfg.nx*steps/dt:.3e} pts*steps/s",
                  flush=True)




def section_curvedtensor():
    """Torus-metric anisotropic tensor FIELD at ~10.2M points: the fused
    shard aniso kernel (streamed inv4 lane profile) vs the XLA curved
    path, 1x1 mesh on the chip."""
    import jax
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_aniso, sharded_params)
    from crdmodel_tpu.utils.profiling import device_sync

    cfg0 = SimConfig(model="fhn", surface="torus", x_mesh=1600,
                     surface_width=20.0, surface_length=80.0, beta=1.25,
                     t_final=0.05, output_timestep=1, dtype="float32",
                     rtol=1e-5, atol=1e-8)
    rng = np.random.default_rng(37)
    shape = (cfg0.ny, cfg0.nx)
    dxx = 0.1 + 0.2 * rng.random(shape)
    dyy = 0.1 + 0.2 * rng.random(shape)
    dxy = 0.7 * np.sqrt(dxx * dyy) * (2 * rng.random(shape) - 1)
    tensor = (dxx, dyy, dxy)
    mesh = make_mesh(shape=(1, 1))
    for name, up in [("fused", True), ("xla", False)]:
        cfg = dataclasses.replace(cfg0, use_pallas=up)
        p = build_problem(cfg, diffusion_tensor=tensor)
        if up:
            assert maybe_fused_shard_aniso(p, mesh) is not None
        params, _ = sharded_params(p)
        run, _ = make_sharded_simulation_fn(p, mesh)

        def one():
            tr, st = run(p.y0, params)
            device_sync(tr)
            return st

        dt = best_of(one)
        _, st = run(p.y0, params)
        steps = int(np.sum(np.asarray(st.steps)))
        print(f"curvedtensor {name}: grid {cfg.ny}x{cfg.nx}, steps {steps}, "
              f"best {dt*1e3:.0f} ms, {dt/steps*1e6:.0f} us/step, "
              f"{cfg.ny*cfg.nx*steps/dt:.3e} pts*steps/s", flush=True)




def section_imexforcing():
    """Paced reaction-stiff Goldbeter at 800x3200 (the fused-IMEX
    headline shape): structured forcing through the fused ark324 kernel
    vs the XLA forcing path."""
    import jax
    import jax.numpy as jnp
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           gaussian_profile, pulse_train,
                                           rect_profile)
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import make_run_fn
    from crdmodel_tpu.utils.profiling import device_sync

    cfg0 = SimConfig(model="goldbeter", surface="torus", x_mesh=800,
                     surface_width=20.0, surface_length=80.0, beta=0.4,
                     t_final=1.0, output_timestep=1, dtype="float32",
                     rtol=1e-4, atol=1e-7, method="ark324")

    def frc(cfg):
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1, 0.5], 0.1, 0.5),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 8)),
            Stimulus(waveform=lambda t: 0.2 * jnp.cos(5.0 * t),
                     col=gaussian_profile(cfg.nx, cfg.nx / 2, cfg.nx / 8)))

    for name, up in [("fused", True), ("xla", False)]:
        cfg = dataclasses.replace(cfg0, use_pallas=up)
        p = build_problem(cfg, forcing=frc(cfg))
        run = jax.jit(make_run_fn(p)[0])

        def one():
            tr, st = run(p.y0, p.params)
            device_sync(tr)
            return st

        dt = best_of(one)
        _, st = run(p.y0, p.params)
        steps = int(np.sum(np.asarray(st.steps)))
        print(f"imexforcing {name}: steps {steps}, best {dt*1e3:.0f} ms, "
              f"{dt/steps*1e6:.0f} us/step, "
              f"{cfg.ny*cfg.nx*steps/dt:.3e} pts*steps/s", flush=True)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["smoothrkc", "tensorpad", "boxforcing",
                                "curvedtensor", "imexforcing"]
    for sec in sections:
        print(f"=== {sec} ===")
        {"smoothrkc": section_smoothrkc,
         "tensorpad": section_tensorpad,
         "boxforcing": section_boxforcing,
         "curvedtensor": section_curvedtensor,
         "imexforcing": section_imexforcing}[sec]()
