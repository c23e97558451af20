"""Fused embedded-ERK step for ANISOTROPIC tensor diffusion.

Same temporal row-blocking design as the isotropic fused step
(ops/pallas_step.py — read that module docstring first): one kernel pass
per step computes every RK stage's stencil + kinetics, the solution
update and the WRMS error partial sums. The differences forced by the
tensor operator div(D grad u), D = [[Dxx,Dxy],[Dxy,Dyy]]:

  * the stencil is 9-point (the mixed terms read diagonal neighbours) —
    the validity-ring arithmetic is UNCHANGED: each stage still consumes
    one ring of the strip halo (P >= stages), because the 9-point ring is
    one cell thick just like the 5-point one;
  * the coefficients are full (ny, nx) FIELDS, not theta profiles. They
    ride per-strip halo windows prebuilt at setup as (n_strips, R, nxp)
    arrays and pipelined by Pallas BlockSpecs — only aE, aN and
    Dxy/(4 dx dy) are shipped; aW/aS are recovered in-kernel by a lane
    roll of aE and a row roll of aN (exact: the faces are shared,
    aW_ij = aE_{i-1,j}, and the strips carry wrapped halos), cutting the
    extra HBM traffic from 5 fields to 3 per step.

Cost model: the isotropic step moves ~4 state fields per pass; this one
moves ~4 + 3*(R/S) coefficient fields and runs ~2x the stencil FLOPs —
measured against the XLA anisotropic path in docs/PERF_NOTES.md
("fused anisotropic step").

float32 only; flat geometry only (grid.py::tensor_coeffs64). The
per-segment freeze and runtime beta ("_fused_b") / diffusion scale
("dscale") contracts match ops/pallas_step.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate.erk import Tableau
from crdmodel_tpu.ops.kernel_common import (
    freeze_scalar, lane_pad_width, load_wrap_strips, prepare_constants)
from crdmodel_tpu.ops.pallas_step import HALO, VMEM_BUDGET, FusedStep


def _aniso_strip_target(nx: int, nvars: int, n_stages: int) -> int:
    """Strip row cap: the isotropic accounting plus 3 double-buffered
    coefficient strip windows."""
    nxp = lane_pad_width(nx, HALO)
    live = nvars * (2 + n_stages + 3) + 6
    bytes_per_row = 4 * nxp * live
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * HALO) // 8 * 8))


def _pick_strip(ny: int, target: int) -> int | None:
    best = None
    for s in range(8, min(ny, target) + 1, 8):
        if ny % s == 0:
            best = s
    return best


def is_aniso_supported(problem, tableau: Tableau, dtype) -> bool:
    if problem.forcing is not None:
        return False   # forcing: pallas_step only (kernel_common.fused_forcing)
    if getattr(problem, "diffusion_tensor", None) is None:
        return False
    if problem.geometry.kind != "flat":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if tableau.stages > HALO:
        return False
    S = _pick_strip(problem.cfg.ny,
                    _aniso_strip_target(problem.cfg.nx,
                                        problem.model.nvars,
                                        tableau.stages))
    # the wrapped-row DMA windows need S >= P (load_wrap_strips contract)
    return S is not None and (S >= HALO or problem.cfg.ny <= S)


def build_fused_aniso_step(problem, tableau: Tableau, dtype=jnp.float32,
                           interpret: bool = False) -> FusedStep:
    cfg = problem.cfg
    model = problem.model
    geometry = problem.geometry
    nvars = model.nvars
    ny, nx = cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)

    a = tableau.a
    bw = tableau.b
    d = tableau.b - tableau.bhat
    n_stages = tableau.stages
    P = HALO
    assert n_stages <= P
    S = _pick_strip(ny, _aniso_strip_target(nx, nvars, n_stages))
    if S is None:
        raise ValueError(f"ny={ny} has no multiple-of-8 divisor in [8,256]")
    n_strips = ny // S
    R = S + 2 * P
    nxp = ((nx + 2 * P + 127) // 128) * 128

    def pad_cols(arr):
        out = jnp.concatenate([arr[..., -P:], arr, arr[..., :P]], axis=-1)
        fill = nxp - (nx + 2 * P)
        if fill:
            padw = [(0, 0)] * (out.ndim - 1) + [(0, fill)]
            out = jnp.pad(out, padw)
        return out

    def unpad_cols(arr):
        return arr[..., P:P + nx]

    # beta / freeze-mask / error-column-mask inputs (identical handling to
    # the isotropic kernel; the tensor coefficients ride their own windows)
    kc = prepare_constants(problem, dtype, P, pad_cols, with_coeffs=False)
    b_is_field, has_freeze = kc.b_is_field, kc.has_freeze

    # --- coefficient strip windows: (n_strips, R, nxp), f64 setup ---
    (aE64, _aW64, aN64, _aS64), dxy64, inv4 = geometry.tensor_coeffs64(
        *problem.diffusion_tensor, boundary=problem.cfg.boundary)

    def np_pad_cols(arr):
        out = np.concatenate([arr[:, -P:], arr, arr[:, :P]], axis=1)
        fill = nxp - (nx + 2 * P)
        if fill:
            out = np.concatenate(
                [out, np.zeros((out.shape[0], fill), out.dtype)], axis=1)
        return out

    def strip_windows(arr2d):
        ap = np_pad_cols(np.asarray(arr2d, np.float64))
        rows = np.concatenate([ap[-P:], ap, ap[:P]], axis=0)
        return jnp.asarray(
            np.stack([rows[i * S:i * S + R] for i in range(n_strips)]),
            dtype)

    ae_s = strip_windows(aE64)
    an_s = strip_windows(aN64)
    # the mixed weight 1/(4 dx dy) is folded into the Dxy window once
    dxy_s = strip_windows(dxy64 * inv4)

    dvars = tuple(model.diffusive_vars)
    ratios = tuple(model.diffusion_ratios)

    def aniso_lap(u, ae, an, dxyw, ds):
        ue = jnp.roll(u, -1, axis=-1)
        uw = jnp.roll(u, 1, axis=-1)
        un = jnp.roll(u, -1, axis=-2)
        us = jnp.roll(u, 1, axis=-2)
        aw = jnp.roll(ae, 1, axis=-1)       # aW_ij = aE_{i-1,j}
        as_ = jnp.roll(an, 1, axis=-2)      # aS_ij = aN_{i,j-1}
        axis = (ae * (ue - u) + aw * (uw - u)
                + an * (un - u) + as_ * (us - u))
        fx = dxyw * (un - us)
        t1 = jnp.roll(fx, -1, axis=-1) - jnp.roll(fx, 1, axis=-1)
        fy = dxyw * (ue - uw)
        t2 = jnp.roll(fy, -1, axis=-2) - jnp.roll(fy, 1, axis=-2)
        return ds * (axis + (t1 + t2))

    def rhs_block(yb, ae, an, dxyw, ds, b_rows, live_rows):
        laps = {}
        for idx, v in enumerate(dvars):
            lap = aniso_lap(yb[v], ae, an, dxyw, ds)
            laps[v] = lap if ratios[idx] == 1.0 else ratios[idx] * lap
        if just_diffusion:
            ydot = jnp.stack([laps[v] if v in laps else jnp.zeros_like(yb[0])
                              for v in range(nvars)])
        else:
            react = model.kinetics(yb, b_rows)
            ydot = jnp.stack([react[v] + laps[v] if v in laps else react[v]
                              for v in range(nvars)])
        if live_rows is not None:
            ydot = ydot * live_rows
        return ydot

    def kernel(h_ref, fz_ref, ds_ref, ae_ref, an_ref, dxy_ref,
               b_ref, m_ref, cm_ref, y_hbm, ynew_ref, ss_ref, yv, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)

        slot = load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips, i)

        h = h_ref[0, 0]
        ds = ds_ref[0, 0]
        if b_is_field:
            b_rows = b_ref[pl.ds(row0, R), :]
        else:
            b_rows = b_ref[0, 0]
        if has_freeze:
            fz = fz_ref[0, 0]
            live_rows = 1.0 - fz * (1.0 - m_ref[pl.ds(row0, R), :])
        else:
            live_rows = None
        ae = ae_ref[0]
        an = an_ref[0]
        dxyw = dxy_ref[0]

        y0 = yv[slot]
        ks = []
        for s in range(n_stages):
            yi = y0
            for j in range(s):
                if a[s, j] != 0.0:
                    yi = yi + (h * float(a[s, j])) * ks[j]
            ks.append(rhs_block(yi, ae, an, dxyw, ds, b_rows, live_rows))

        ynew = y0
        err = jnp.zeros_like(y0)
        for s in range(n_stages):
            if bw[s] != 0.0:
                ynew = ynew + (h * float(bw[s])) * ks[s]
            if d[s] != 0.0:
                err = err + (h * float(d[s])) * ks[s]

        z = ynew[:, P:P + S, :]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, nxp), 2)
        zl = jnp.roll(z, -nx, axis=-1)
        zr = jnp.roll(z, nx, axis=-1)
        z = jnp.where(jcol < P, zl, jnp.where(jcol >= P + nx, zr, z))
        ynew_ref[:, :, :] = z

        yc = y0[:, P:P + S, :]
        w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
        scaled = err[:, P:P + S, :] * w
        ss_ref[i, 0] = jnp.sum(scaled * scaled)

    coeff_strip_spec = pl.BlockSpec((1, R, nxp), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            coeff_strip_spec, coeff_strip_spec, coeff_strip_spec,
            pl.BlockSpec(kc.b_pad.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kc.m_pad.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # y stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((nvars, S, nxp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nvars, R, nxp), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nvars, ny, nxp), dtype),
            jax.ShapeDtypeStruct((n_strips, 1), dtype),
        ],
        interpret=interpret,
    )

    one = jnp.ones((1, 1), dtype)

    def step_err(t, yp, h, params):
        del t  # stage times only matter through the per-segment freeze flag
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        b_in = kc.b_pad
        ds_s = one
        if isinstance(params, dict):
            if "_fused_b" in params:
                b_in = params["_fused_b"].astype(dtype)
            if "dscale" in params:
                ds_s = jnp.reshape(params["dscale"].astype(dtype), (1, 1))
        ynew, ss = call(h_s, fz_s, ds_s, ae_s, an_s, dxy_s,
                        b_in, kc.m_pad, kc.col_mask, yp)
        return ynew, jnp.sum(ss)

    return FusedStep(step_err=step_err, pad=pad_cols, unpad=unpad_cols,
                     nxp=nxp)
