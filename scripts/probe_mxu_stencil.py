"""MXU probe (VERDICT r2 #3): can the torus stencil beat the VPU roofline
by riding the MXU as (banded) matmuls?

The torus Laplace-Beltrami (ops/stencil.py::torus_laplacian,
reference src/FHNmodel_torus.cpp:527-541) splits exactly into

  lap(u) = c_phi(x) * (D2y @ u)  +  u @ Ax

with D2y the (ny, ny) circulant second-difference and Ax the (nx, nx)
circulant band combining the theta terms (A[j-1,j] = ct[j]-ca[j],
A[j,j] = -2 ct[j], A[j+1,j] = ct[j]+ca[j]) — both pure GEMMs, i.e. the
MXU's native food. Variants measured per (ny, nx) grid, f32, one chip:

  roll      — the production VPU stencil (jnp.roll, XLA-fused)
  gemm      — full dense circulant matmuls (MXU's best case for reuse;
              arithmetically wasteful: ny^2*nx + ny*nx^2 MACs vs ~10*N
              VPU flops)
  blockband — block-banded y-difference: tiles of 8 rows + 1-row halos as
              a batched (8 x 10) @ (10 x nx) GEMM (einsum), x-band left
              dense (its band structure is x-varying); arithmetic drops to
              ~(tile+2)*N + ny*nx^2 MACs

Each variant is validated against `roll` to f32 tolerance before timing.
Prints one JSON line per (grid, variant). Results + anatomy recorded in
docs/PERF_NOTES.md "MXU probe".

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_mxu_stencil.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.ops.stencil import torus_laplacian
from crdmodel_tpu.utils.profiling import device_sync


def band_matrices(coeffs, ny, nx, dtype):
    ca, ct, cp = (np.asarray(c, np.float64) for c in coeffs)
    d2y = np.zeros((ny, ny))
    idx = np.arange(ny)
    d2y[idx, idx] = -2.0
    d2y[idx, (idx + 1) % ny] = 1.0
    d2y[idx, (idx - 1) % ny] = 1.0
    ax = np.zeros((nx, nx))
    j = np.arange(nx)
    ax[j, j] = -2.0 * ct
    ax[(j - 1) % nx, j] = ct - ca
    ax[(j + 1) % nx, j] = ct + ca
    return jnp.asarray(d2y, dtype), jnp.asarray(ax, dtype)


def main():
    dtype = jnp.float32
    out = []
    for x_mesh in (400, 800):  # 400x1600 (canonical), 800x3200 (2.56M)
        cfg = SimConfig(model="fhn", surface="torus", x_mesh=x_mesh,
                        surface_width=20.0, surface_length=40.0,
                        dtype="float32")
        p = build_problem(cfg)
        ny, nx = cfg.ny, cfg.nx
        coeffs = p.geometry.stencil_coeffs(dtype)
        cp = jnp.asarray(coeffs[2], dtype).reshape(1, nx)
        d2y, ax = band_matrices(coeffs, ny, nx, dtype)
        u = p.y0[0].astype(dtype)

        T = 8           # row-tile height for the block-banded variant
        nt = ny // T
        # (nt, T, T+2) banded blocks: row r of tile t touches ext rows
        # r..r+2 (halo above/below); same coefficients every tile
        bb = np.zeros((T, T + 2))
        r = np.arange(T)
        bb[r, r] = 1.0
        bb[r, r + 1] = -2.0
        bb[r, r + 2] = 1.0
        bb = jnp.asarray(np.broadcast_to(bb, (nt, T, T + 2)), dtype)

        hi = jax.lax.Precision.HIGHEST

        def roll_fn(u):
            return torus_laplacian(u, coeffs)

        def gemm_fn(u):
            # precision=HIGHEST: the TPU's default matmul precision
            # (bf16-pass) loses the second difference to cancellation —
            # measured rel err 1.6e-3 vs the roll stencil, far outside the
            # integrator tolerance. f32-true matmul costs 3-6 passes.
            return (cp * jnp.dot(d2y, u, precision=hi)
                    + jnp.dot(u, ax, precision=hi))

        def gemm_default(u):
            return cp * (d2y @ u) + u @ ax

        def blockband_fn(u):
            un = jnp.roll(u, -1, axis=0)
            us = jnp.roll(u, 1, axis=0)
            # ext[t] = rows (tT-1 .. tT+T) with periodic wrap
            ext = jnp.concatenate(
                [us.reshape(nt, T, nx)[:, :1],
                 u.reshape(nt, T, nx),
                 un.reshape(nt, T, nx)[:, -1:]], axis=1)
            lap_y = jnp.einsum("trk,tkn->trn", bb, ext, precision=hi,
                               preferred_element_type=dtype)
            return cp * lap_y.reshape(ny, nx) + jnp.dot(u, ax, precision=hi)

        fns = {"roll": roll_fn, "gemm": gemm_fn,
               "gemm_default": gemm_default, "blockband": blockband_fn}
        ref = np.asarray(roll_fn(u))
        scale = float(np.max(np.abs(ref))) or 1.0
        for name, fn in fns.items():
            jf = jax.jit(fn)
            got = np.asarray(jf(u))
            err = float(np.max(np.abs(got - ref))) / scale
            # gemm_default documents the TPU default-matmul-precision loss;
            # every production-candidate variant must hit f32 tolerance
            if name != "gemm_default":
                assert err < 1e-4, (name, err)
            # warm then time 200 chained applications (one dispatch)
            reps = 200

            @jax.jit
            def loop(u):
                def body(_, acc):
                    return fn(acc) * 1e-3  # keep values bounded
                return jax.lax.fori_loop(0, reps, body, u)

            device_sync(loop(u))
            t0 = time.perf_counter()
            device_sync(loop(u))
            us_per = (time.perf_counter() - t0) / reps * 1e6
            rec = {"grid": [ny, nx], "variant": name,
                   "us_per_apply": round(us_per, 2),
                   "rel_err_vs_roll": err}
            out.append(rec)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
