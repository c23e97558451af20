"""Spectral exponential-integrator probe: measured negative (round 3).

Hypothesis: on flat periodic grids the 5-point stencil is CIRCULANT, so its
exact exponential is elementwise in Fourier space — an ETD2 integrator
(exact diffusion + explicit reaction) would remove the diffusion CFL
entirely, stepping at the reaction-accuracy limit where rkc2 still pays
s ~ sqrt(h*rho/0.65) first-order-cost stages per step
(integrate/rkc.py::choose_stages).

The numerics check out — the FD symbol

  lambda(kx, ky) = -4*cu1*sin^2(pi*kx/nx) - 4*cu2*sin^2(pi*ky/ny)

reproduces ops/stencil.py::flat_laplacian through rfft2/irfft2 to f32
rounding (validated below), so ETD would integrate the SAME semi-discrete
system as bs32/rkc2 (reference operator: src/FHNmodel_flat.cpp:489-566).

The HARDWARE does not: XLA's TPU FFT runs far off the HBM roofline (a
round trip moves ~10 passes of the array; at 819 GB/s that budgets ~2.5 ms
at 41M points — measured is 10-15x that), while the rkc2 stage streams at
the roofline. An ETD2 step needs 2 FFT round trips + 2 kinetics passes vs
rkc2's s stencil passes, both at the same accuracy-limited step count
(both order 2), so ETD2 wins only where (2*fft_pair) < s*rhs_pass. This
script measures both sides and prints the implied per-step model. Result
(2026-08-18, v5e): ETD2 loses at every size that fits the chip — see
docs/PERF_NOTES.md "Spectral ETD probe".

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_spectral_etd.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rho_bound
from crdmodel_tpu.integrate.rkc import choose_stages
from crdmodel_tpu.utils.profiling import device_sync

H_ACC = 0.05   # typical accuracy-limited step (FHN @ rtol 1e-5; PERF_NOTES)


def timeit(fn, *args, n=10):
    out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def fd_symbol(cfg, dtype=jnp.float32):
    """Circulant symbol of flat_laplacian (exact, not the continuum -k^2)."""
    cu1 = cfg.diffusion / cfg.dx ** 2
    cu2 = cfg.diffusion / cfg.dy ** 2
    kx = np.arange(cfg.nx // 2 + 1)
    ky = np.arange(cfg.ny)
    sx = np.sin(np.pi * kx / cfg.nx) ** 2
    sy = np.sin(np.pi * ky / cfg.ny) ** 2
    lam = -4.0 * (cu1 * sx[None, :] + cu2 * sy[:, None])
    return jnp.asarray(lam, dtype)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    for xmesh in (400, 800, 1600, 3200):
        cfg = SimConfig(model="fhn", surface="flat", x_mesh=xmesh,
                        surface_width=20.0, surface_length=80.0,
                        t_final=50.0, t_boundary=0.0, vary_beta=0,
                        dtype="float32")
        prob = build_problem(cfg)
        ny, nx = prob.grid.ny, prob.grid.nx
        pts = ny * nx

        # -- correctness: spectral apply == stencil apply (f32 rounding) --
        lam = fd_symbol(cfg)
        u = prob.y0[0]
        spec = jnp.fft.irfft2(jnp.fft.rfft2(u) * lam.astype(jnp.complex64),
                              s=u.shape)
        from crdmodel_tpu.ops.stencil import flat_laplacian
        ref = flat_laplacian(u, prob.geometry.stencil_coeffs(jnp.float32))
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        relerr = float(jnp.max(jnp.abs(spec - ref))) / scale

        # -- measured: one FFT round trip; one production RHS pass --
        pair = jax.jit(lambda v: jnp.fft.irfft2(
            jnp.fft.rfft2(v) * lam.astype(jnp.complex64), s=v.shape))
        t_fft = timeit(pair, u)
        rhs = jax.jit(lambda t, y, p: prob.rhs(t, y, p))
        t_rhs = timeit(rhs, jnp.float32(0.0), prob.y0, prob.params)

        # -- implied step model at the accuracy-limited h --
        rho_fn = make_rho_bound(cfg, prob.model, prob.geometry, jnp.float32)
        rho = float(rho_fn(0.0, prob.y0, prob.params))
        s = int(choose_stages(jnp.float32(H_ACC), jnp.float32(rho)))
        etd_step = 2 * t_fft + 2 * 0.3 * t_rhs   # kinetics ~30% of the RHS
        rkc_step = s * t_rhs
        print(json.dumps({
            "grid": f"{ny}x{nx}", "mpts": round(pts / 1e6, 2),
            "sym_vs_stencil_relerr": relerr,
            "fft_pair_ms": round(t_fft * 1e3, 3),
            "rhs_pass_ms": round(t_rhs * 1e3, 3),
            "rho": round(rho, 1), "rkc2_stages_at_h0.05": s,
            "etd2_step_ms": round(etd_step * 1e3, 3),
            "rkc2_step_ms": round(rkc_step * 1e3, 3),
            "etd2_vs_rkc2": round(etd_step / rkc_step, 2),
        }))


if __name__ == "__main__":
    main()
