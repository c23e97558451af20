"""Measure the 3-D box (XLA 7-point divergence path) on the chip.

For each size: warm once, then best-of-3 timed runs (the axon backend
charges ~2.6 s one-time to the SECOND execution of a fresh executable —
PERF_NOTES "fused rkc2 driver anomaly resolved"). Also times the same
point count as a 2-D flat divergence grid (ny*nz rows) to isolate the
3-D-operator tax from sheer size.

Run ONE case per invocation (TPU compiles are slow; the tunnel punishes
killed processes): python scripts/bench_box3d.py CASE
Cases: box1M box8M flat1M flat8M box1M_rkc2 box8M_rkc2 flat8M_rkc2
"""

import dataclasses
import sys
import time

import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_simulation_fn


def box_cfg(nz, nxy, method, boundary="periodic", use_pallas=None):
    return SimConfig(model="aliev_panfilov", surface="box", x_mesh=nxy,
                     y_mesh=nxy, surface_width=float(nxy) / 16,
                     surface_length=float(nxy) / 16,
                     surface_depth=float(nz) / 16, z_mesh=nz,
                     diffusion=1.0, beta=0.10, wave_length=0.25,
                     wave_width=0.5, t_final=0.5, output_timestep=1,
                     dtype="float32", rtol=1e-4, atol=1e-7, method=method,
                     boundary=boundary, use_pallas=use_pallas)


def flat_cfg(ny, nx, method, use_pallas=False):
    return SimConfig(model="aliev_panfilov", surface="flat", x_mesh=nx,
                     y_mesh=ny, surface_width=float(nx) / 16,
                     surface_length=float(ny) / 16,
                     diffusion=1.0, beta=0.10, wave_length=0.25,
                     wave_width=0.5, t_final=0.5, output_timestep=1,
                     dtype="float32", rtol=1e-4, atol=1e-7, method=method,
                     use_pallas=use_pallas)


def _scar_case(method, use_pallas):
    cfg = box_cfg(32, 512, method, "noflux", use_pallas)
    yy, xx = np.meshgrid(np.arange(512), np.arange(512), indexing="ij")
    scar = (yy - 256) ** 2 + (xx - 256) ** 2 < 48 ** 2
    mask = np.broadcast_to(~scar, (32, 512, 512))
    return cfg, dict(obstacle_mask=mask)


CASES = {
    "box1M": lambda: (box_cfg(16, 256, "bs32"), {}),
    "box8M": lambda: (box_cfg(32, 512, "bs32"), {}),
    "flat1M": lambda: (flat_cfg(16 * 256, 256, "bs32"),
                       dict(diffusion_field=np.float64(1.0))),
    "flat8M": lambda: (flat_cfg(32 * 512, 512, "bs32"),
                       dict(diffusion_field=np.float64(1.0))),
    # fused z-streaming kernel (ops/pallas_box3d.py) vs XLA on the SAME
    # bounded slab (the kernel needs closed z walls)
    "box1M_nf_fused": lambda: (box_cfg(16, 256, "bs32", "noflux", True), {}),
    "box1M_nf_xla": lambda: (box_cfg(16, 256, "bs32", "noflux", False), {}),
    "box8M_nf_fused": lambda: (box_cfg(32, 512, "bs32", "noflux", True), {}),
    "box8M_nf_xla": lambda: (box_cfg(32, 512, "bs32", "noflux", False), {}),
    # 33.5M: tall orientation (ny > nx) keeps the strip divisor large
    "box33M_nf_fused": lambda: (dataclasses.replace(
        box_cfg(64, 512, "bs32", "noflux", True), y_mesh=1024,
        surface_length=64.0), {}),
    "box33M_nf_xla": lambda: (dataclasses.replace(
        box_cfg(64, 512, "bs32", "noflux", False), y_mesh=1024,
        surface_length=64.0), {}),
    # 3-D obstacle scar (session 16): a cylindrical scar column through
    # the slab — fused via the tissue plane ring vs XLA masked divergence
    "box8M_scar_fused": lambda: _scar_case("bs32", True),
    "box8M_scar_xla": lambda: _scar_case("bs32", False),
    "box8M_scar_rkc2_fused": lambda: _scar_case("rkc2", True),
    "box8M_scar_rkc2_xla": lambda: _scar_case("rkc2", False),
    "box1M_rkc2": lambda: (box_cfg(16, 256, "rkc2"), {}),
    "box8M_rkc2": lambda: (box_cfg(32, 512, "rkc2"), {}),
    # fused z-streaming RKC (ops/pallas_box3d_rkc.py) vs XLA rkc2 on the
    # bounded slab
    "box1M_rkc2_nf_fused": lambda: (
        box_cfg(16, 256, "rkc2", "noflux", True), {}),
    "box1M_rkc2_nf_xla": lambda: (
        box_cfg(16, 256, "rkc2", "noflux", False), {}),
    "box8M_rkc2_nf_fused": lambda: (
        box_cfg(32, 512, "rkc2", "noflux", True), {}),
    "box8M_rkc2_nf_xla": lambda: (
        box_cfg(32, 512, "rkc2", "noflux", False), {}),
    "box33M_rkc2_nf_fused": lambda: (dataclasses.replace(
        box_cfg(64, 512, "rkc2", "noflux", True), y_mesh=1024,
        surface_length=64.0), {}),
    "box33M_rkc2_nf_xla": lambda: (dataclasses.replace(
        box_cfg(64, 512, "rkc2", "noflux", False), y_mesh=1024,
        surface_length=64.0), {}),
    "flat8M_rkc2": lambda: (flat_cfg(32 * 512, 512, "rkc2"),
                            dict(diffusion_field=np.float64(1.0))),
    # full 3-D diffusion field (session 19): the coefficient plane ring
    # vs the XLA six-face field path, +-20% heterogeneity
    "box8M_field_fused": lambda: _field_case("bs32", True),
    "box8M_field_xla": lambda: _field_case("bs32", False),
    "box8M_field_rkc2_fused": lambda: _field_case("rkc2", True),
    "box8M_field_rkc2_xla": lambda: _field_case("rkc2", False),
}


def _field_case(method, use_pallas):
    cfg = box_cfg(32, 512, method, "noflux", use_pallas)
    rng = np.random.default_rng(0)
    dfield = 0.8 + 0.4 * rng.random((32, 512, 512))
    return cfg, dict(diffusion_field=dfield)


def main():
    for case in sys.argv[1:] or ["box1M"]:
        cfg, bkw = CASES[case]()
        problem = build_problem(cfg, **bkw)
        pts = problem.y0[0].size
        run, _ = make_simulation_fn(problem)
        traj, stats = run(problem.y0, problem.params)   # compile + warm
        steps = int(np.sum(np.asarray(stats.steps)))
        ok = int(np.max(np.asarray(stats.status))) == 0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            traj, stats = run(problem.y0, problem.params)
            float(jnp.sum(traj[-1]))
            best = min(best, time.perf_counter() - t0)
        print(f"{case:12s}: {pts / 1e6:5.2f}M pts  {steps:5d} steps  "
              f"{best:7.3f}s  {best / steps * 1e6:9.1f} us/step  "
              f"{pts * steps / best:.3e} pts*steps/s  ok={ok}")


if __name__ == "__main__":
    main()
