"""Fused IMEX ARK3(2)4L[2]SA step as a single Pallas TPU kernel.

One kernel invocation performs the full additive-RK step of
integrate/imex.py — 4 explicit diffusion stencil evaluations, 3 implicit
stage solves by full vectorized Newton (per-point Jacobians via jax.jvp
traced INSIDE the kernel, closed-form Cramer solves), the solution/error
assembly, and the combined WRMS + Newton-convergence partial sums — in one
pass over HBM. The XLA path materialises every stage and Newton iterate
(measured 5.4 ms/step at 800x3200 Goldbeter vs 0.27 ms for the fused
explicit step at the same size); the implicit work is pointwise, so it
fuses perfectly into the strip-resident representation.

Same strip/lane machinery as ops/pallas_step.py (P=8 halo rows: the step
consumes 4 validity rings, one per explicit stencil evaluation; the Newton
iterations are pointwise and consume none). The algorithm mirrors
imex.make_imex_step_err line by line (same constants, same full-Newton
default, same composite error), so the two paths agree at f32 roundoff.

float32 only; callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate import imex
from crdmodel_tpu.ops.kernel_common import (
    coeff_kind,
    freeze_scalar, load_wrap_strips, make_split_block, prepare_constants,
    read_strip_constants)

HALO = 8           # >= 4 stencil evaluations per step; multiple of 8
VMEM_BUDGET = 10 * 1024 * 1024


def _imex_strip_target(nx: int, nvars: int) -> int:
    nxp = ((nx + 2 * HALO + 127) // 128) * 128
    # live set: y0 + 4 kE + 4 kI + stage state/resid/dy + nvars Jacobian rows
    live = 12 + 3 * nvars + 4
    bytes_per_row = 4 * nxp * nvars * live
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * HALO) // 8 * 8))


def _pick_strip(ny: int, target: int) -> int | None:
    best = None
    for s in range(8, min(ny, target) + 1, 8):
        if ny % s == 0:
            best = s
    return best


def is_imex_supported(problem, dtype) -> bool:
    """Eligibility gate for the fused ark324 kernel.

    Assumes AUTONOMOUS kinetics (the ReactionModel API contract,
    models/base.py): the kernel's step_err discards stage times, which
    matches the XLA stepper's ti = t + C[i]*h evaluation only because no
    registered model's kinetics depend on t. A time-dependent-kinetics
    extension must return False here (fall back to the XLA path)."""
    from crdmodel_tpu.ops.kernel_common import fused_forcing, needs_divform
    if needs_divform(problem):
        return False   # masked faces / 2-D fields: XLA divergence path
    if fused_forcing(problem) is False:
        return False   # free-form forcing needs the XLA path; structured
        # protocols ride the explicit stages at true stage times (round 5)
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return _pick_strip(problem.cfg.ny,
                       _imex_strip_target(problem.cfg.nx,
                                          problem.model.nvars)) is not None


@dataclasses.dataclass(frozen=True)
class FusedImexStep:
    step_err: Callable   # (t, yp, h, params) -> (ynew_p, err_ss)
    pad: Callable
    unpad: Callable
    nxp: int


def imex_block_step(y0, h, f_ex, f_im, nvars, dtype, P, S, w):
    """The ARK3(2)4L[2]SA step on one resident strip — shared verbatim by
    the single-chip kernel below and the sharded kernel
    (ops/pallas_shard_imex.py), mirroring imex.make_imex_step_err line by
    line so every path stays in bitwise lockstep.

    y0: (nvars, R, nxp) strip (R = S + 2P). w: WRMS weights over the strip
    interior, (nvars, S, nxp). Returns (ynew, err, ss_scalar) with ynew/err
    full-strip and ss_scalar the combined WRMS-error + Newton-convergence
    partial sum of the strip interior.
    """
    hg = h * imex.GAMMA
    AE, AI, B, D = imex.AE, imex.AI, imex.B, imex.D

    def jac_block(yb):
        cols = []
        for bv in range(nvars):
            e = jnp.stack([jnp.ones_like(yb[0]) if v == bv
                           else jnp.zeros_like(yb[0])
                           for v in range(nvars)])
            _, col = jax.jvp(f_im, (yb,), (e,))
            cols.append(col)
        return jnp.stack(cols, axis=1)   # (nvars_out, nvars_in, R, nxp)

    eye = jnp.stack([
        jnp.stack([jnp.ones_like(y0[0]) if a == b
                   else jnp.zeros_like(y0[0]) for b in range(nvars)])
        for a in range(nvars)])

    kE = [f_ex(y0, 0)]
    kI = [f_im(y0)]
    delta_ss = jnp.asarray(0.0, dtype)
    for s in range(1, imex.STAGES):
        rhs_known = y0
        for j in range(s):
            if AE[s][j] != 0.0:
                rhs_known = rhs_known + (h * AE[s][j]) * kE[j]
            if AI[s][j] != 0.0:
                rhs_known = rhs_known + (h * AI[s][j]) * kI[j]
        yi = rhs_known + hg * kI[s - 1]
        dy = jnp.zeros_like(y0)
        for _ in range(imex.NEWTON_ITERS):
            m = eye - hg * jac_block(yi)
            resid = yi - hg * f_im(yi) - rhs_known
            dy = imex.solve_pointwise(m, -resid)
            yi = yi + dy
        sdy = dy[:, P:P + S, :] * w
        delta_ss = delta_ss + jnp.sum(sdy * sdy)
        kE.append(f_ex(yi, s))
        kI.append((yi - rhs_known) / hg)

    ynew = y0
    err = jnp.zeros_like(y0)
    for s in range(imex.STAGES):
        k_sum = kE[s] + kI[s]
        if B[s] != 0.0:
            ynew = ynew + (h * B[s]) * k_sum
        if D[s] != 0.0:
            err = err + (h * D[s]) * k_sum

    scaled = err[:, P:P + S, :] * w
    pen = (1.0 / imex.NEWTON_TOL) ** 2
    ss = jnp.sum(scaled * scaled) + pen * delta_ss
    return ynew, err, ss


def build_fused_imex_step(problem, dtype=jnp.float32,
                          interpret: bool = False) -> FusedImexStep:
    cfg = problem.cfg
    model = problem.model
    geometry = problem.geometry
    nvars = model.nvars
    ny, nx = cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(geometry.kind)

    P = HALO
    S = _pick_strip(ny, _imex_strip_target(nx, nvars))
    if S is None:
        raise ValueError(f"ny={ny} has no multiple-of-8 divisor in range")
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

    kc = prepare_constants(problem, dtype, P, pad_cols)
    b_is_field, has_freeze = kc.b_is_field, kc.has_freeze
    ex_block_of, im_block_of = make_split_block(kind, model, just_diffusion)

    # structured forcing rides the EXPLICIT stages at the ARK c nodes
    # (imex.C — the XLA stepper's ti = t + C[i] h), the pallas_step
    # mechanism: per-stage scalar amplitudes + wrapped rank-1 profiles
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    forcing = fused_forcing(problem)
    assert forcing is not False, "is_imex_supported should have declined"
    n_stim = len(forcing.stimuli) if forcing else 0
    if n_stim:
        stim_vars = tuple(st.var for st in forcing.stimuli)
        c_nodes = tuple(float(c) for c in imex.C)
        rows_np, cols_np = [], []
        for st in forcing.stimuli:
            r_ = (np.ones((ny, 1)) if st.row is None
                  else np.asarray(st.row, np.float64).reshape(ny, 1))
            rows_np.append(np.concatenate([r_[-P:], r_, r_[:P]], axis=0))
            c_ = (np.ones(nx) if st.col is None
                  else np.asarray(st.col, np.float64).reshape(nx))
            c_lane = np.zeros(nxp)
            c_lane[:P] = c_[-P:]
            c_lane[P:P + nx] = c_
            c_lane[P + nx:P + nx + P] = c_[:P]
            cols_np.append(c_lane)
        stim_rows = jnp.asarray(np.stack(rows_np), dtype)
        stim_cols = jnp.asarray(np.stack(cols_np)[:, None, :], dtype)
    else:
        stim_rows = jnp.zeros((1, 1, 1), dtype)
        stim_cols = jnp.zeros((1, 1, 1), dtype)
    amps0 = jnp.zeros((max(1, n_stim), imex.STAGES), dtype)

    def kernel(h_ref, fz_ref, amps_ref, srow_ref, scol_ref,
               c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref,
               y_hbm, ynew_ref, ss_ref, yv, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)
        slot = load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips, i)

        h = h_ref[0, 0]
        stencil, b_rows, live_rows = read_strip_constants(
            kind, b_is_field, has_freeze,
            c0_ref, c1_ref, c2_ref, b_ref, m_ref, fz_ref, row0, R)

        def ex_at(e):
            if not n_stim:
                return None
            ex = {}
            for j in range(n_stim):
                contrib = (amps_ref[j, e]
                           * srow_ref[j, pl.ds(row0, R), :]
                           * scol_ref[j, 0, :])
                v = stim_vars[j]
                ex[v] = ex[v] + contrib if v in ex else contrib
            return ex

        def f_ex(yb, e=0):
            return ex_block_of(yb, stencil, live_rows, extra=ex_at(e))

        def f_im(yb):
            return im_block_of(yb, b_rows, live_rows)

        y0 = yv[slot]
        y0c = y0[:, P:P + S, :]
        w = cm_ref[:, :] / (rtol * jnp.abs(y0c) + atol)
        ynew, _, ss = imex_block_step(y0, h, f_ex, f_im, nvars, dtype,
                                      P, S, w)

        z = ynew[:, P:P + S, :]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, nxp), 2)
        zl = jnp.roll(z, -nx, axis=-1)
        zr = jnp.roll(z, nx, axis=-1)
        z = jnp.where(jcol < P, zl, jnp.where(jcol >= P + nx, zr, z))
        ynew_ref[:, :, :] = z
        ss_ref[i, 0] = ss

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(amps0.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # stage amplitudes
            pl.BlockSpec(stim_rows.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus rows
            pl.BlockSpec(stim_cols.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus cols
            kc.coeff_spec, kc.coeff_spec, kc.coeff_spec,
            pl.BlockSpec(kc.b_pad.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kc.m_pad.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
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

    def step_err(t, yp, h, params):
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        if n_stim:
            # true explicit stage times — the one place t enters the kernel
            from crdmodel_tpu.ops.kernel_common import stage_amplitudes
            amps = stage_amplitudes(forcing, t, h, c_nodes, params, dtype)
        else:
            amps = amps0
        ynew, ss = call(h_s, fz_s, amps, stim_rows, stim_cols,
                        kc.c0, kc.c1, kc.c2, kc.b_pad, kc.m_pad,
                        kc.col_mask, yp)
        return ynew, jnp.sum(ss)

    return FusedImexStep(step_err=step_err, pad=pad_cols, unpad=unpad_cols,
                         nxp=nxp)
