"""Fused IMEX ARK3(2)4L[2]SA step for one shard of a 2D device mesh.

Combines the shard-kernel transport (ops/pallas_shard_step.py v2 splice
design: ONE width-P two-phase ppermute exchange per step, thin column/row
strips spliced in VMEM, ~2 HBM passes of the state) with the fused IMEX
body (ops/pallas_imex.py: 4 explicit stencil evaluations + 3 implicit
stage solves by full vectorized Newton with in-kernel jvp Jacobians).

The implicit solve is POINTWISE, so sharding it is free: no halo traffic
beyond the explicit part's single exchange, and the Newton convergence
test rides the same psum as the WRMS error sums (the composite err_ss of
integrate/imex.py). Under shard_map the XLA IMEX stepper instead pays a
width-1 exchange per explicit stage plus fusion breaks at every collective.

float32 only; interpret=True for CPU-mesh correctness tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate import imex  # noqa: F401 (re-exported scheme)
from crdmodel_tpu.ops.pallas_imex import _imex_strip_target, imex_block_step
from crdmodel_tpu.ops.pallas_step import HALO, _pick_strip
from crdmodel_tpu.ops.kernel_common import (
    freeze_scalar, make_split_block, read_strip_constants)
from crdmodel_tpu.parallel.halo import (_shift_from_next, _shift_from_prev,
                                        halo_pad_cols, halo_pad_rows)
from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y


def is_shard_imex_supported(problem, dtype, nyl: int, nxl: int) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if nyl < HALO or nxl < HALO:
        return False
    S = _pick_strip(nyl, target=_imex_strip_target(nxl, problem.model.nvars))
    return S is not None and S >= HALO


@dataclasses.dataclass(frozen=True)
class FusedShardImex:
    step_err: Callable
    pad: Callable
    unpad: Callable
    prepare_params: Callable
    nxp: int


def build_fused_shard_imex(problem, nyl: int, nxl: int,
                           dtype=jnp.float32, interpret: bool = False,
                           axis_y: str = AXIS_Y,
                           axis_x: str = AXIS_X) -> FusedShardImex:
    """Fused IMEX step for (nyl, nxl) local blocks; step_err and
    prepare_params must run INSIDE shard_map over (axis_y, axis_x)."""
    cfg = problem.cfg
    model = problem.model
    nvars = model.nvars
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = problem.geometry.kind

    P = HALO
    S = _pick_strip(nyl, target=_imex_strip_target(nxl, nvars))
    if S is None or S < P:
        raise ValueError(f"nyl={nyl} unsupported for the fused shard imex")
    n_strips = nyl // S
    R = S + 2 * P
    nxp = ((nxl + 2 * P + 127) // 128) * 128
    fill = nxp - (nxl + 2 * P)

    b_is_field = cfg.vary_beta == 1
    has_freeze = (t_boundary > 0.0) and not just_diffusion
    ex_block_of, im_block_of = make_split_block(kind, model, just_diffusion)

    def pad(y_local):
        return jnp.pad(y_local, ((0, 0), (0, 0), (P, nxp - nxl - P)))

    def unpad(yp):
        return yp[..., P:P + nxl]

    def splice_inputs(yp):
        w_cols = _shift_from_prev(
            lax.slice_in_dim(yp, nxl, P + nxl, axis=2), axis_x)
        e_cols = _shift_from_next(
            lax.slice_in_dim(yp, P, 2 * P, axis=2), axis_x)
        w_ext = halo_pad_rows(w_cols, axis_y, P)
        e_ext = halo_pad_rows(e_cols, axis_y, P)
        lo_rows = _shift_from_prev(yp[:, nyl - P:, :], axis_y)
        hi_rows = _shift_from_next(yp[:, :P, :], axis_y)
        return w_ext, e_ext, lo_rows, hi_rows

    def prepare_params(params):
        out = dict(params)
        coeffs = params["coeffs"]
        if kind == "torus":
            cs = []
            for c in coeffs:
                prof = jnp.asarray(c, dtype).reshape(1, nxl)
                prof = halo_pad_cols(prof, axis_x, P)
                if fill:
                    prof = jnp.pad(prof, ((0, 0), (0, fill)))
                cs.append(prof)
            out["_fused_coeffs"] = tuple(cs)
        else:
            out["_fused_coeffs"] = tuple(
                jnp.reshape(jnp.asarray(c, dtype), (1, 1)) for c in coeffs)
        b = params["b"]
        if b_is_field:
            out["_fused_b"] = halo_pad_rows(
                jnp.asarray(b, dtype).reshape(nyl, 1), axis_y, P)
        else:
            out["_fused_b"] = jnp.reshape(jnp.asarray(b, dtype), (1, 1))
        if has_freeze:
            out["_fused_live"] = halo_pad_rows(
                params["interior"].astype(dtype).reshape(nyl, 1), axis_y, P)
        return out

    col_mask_np = np.zeros((1, nxp), dtype=np.float32)
    col_mask_np[0, P:P + nxl] = 1.0
    col_mask = jnp.asarray(col_mask_np, dtype)

    def kernel(h_ref, fz_ref, c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref,
               y_hbm, w_ref, e_ref, lo_ref, hi_ref, ynew_ref, ss_ref,
               yv, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)

        def start_strip(strip, slot):
            r0s = pl.multiple_of(strip * S, 8)

            @pl.when(strip == 0)
            def _():
                yv[slot, :, 0:P, :] = lo_ref[:, :, :]

            @pl.when(strip > 0)
            def _():
                top0 = pl.multiple_of(jnp.maximum(r0s - P, 0), 8)
                pltpu.make_async_copy(
                    y_hbm.at[:, pl.ds(top0, P), :],
                    yv.at[slot, :, pl.ds(0, P), :],
                    sems.at[slot, 0]).start()

            pltpu.make_async_copy(
                y_hbm.at[:, pl.ds(r0s, S), :],
                yv.at[slot, :, pl.ds(P, S), :], sems.at[slot, 1]).start()

            @pl.when(strip == n_strips - 1)
            def _():
                yv[slot, :, P + S:R, :] = hi_ref[:, :, :]

            @pl.when(strip < n_strips - 1)
            def _():
                bot0 = pl.multiple_of(jnp.minimum(r0s + S, max(nyl - P, 0)),
                                      8)
                pltpu.make_async_copy(
                    y_hbm.at[:, pl.ds(bot0, P), :],
                    yv.at[slot, :, pl.ds(P + S, P), :],
                    sems.at[slot, 2]).start()

        def wait_strip(strip, slot):
            @pl.when(strip > 0)
            def _():
                pltpu.make_async_copy(
                    y_hbm.at[:, pl.ds(0, P), :],
                    yv.at[slot, :, pl.ds(0, P), :], sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                y_hbm.at[:, pl.ds(0, S), :],
                yv.at[slot, :, pl.ds(P, S), :], sems.at[slot, 1]).wait()

            @pl.when(strip < n_strips - 1)
            def _():
                pltpu.make_async_copy(
                    y_hbm.at[:, pl.ds(0, P), :],
                    yv.at[slot, :, pl.ds(P + S, P), :],
                    sems.at[slot, 2]).wait()

        two = jnp.asarray(2, i.dtype)
        slot = jax.lax.rem(i, two)
        nslot = jax.lax.rem(i + jnp.asarray(1, i.dtype), two)

        @pl.when(i == 0)
        def _():
            start_strip(i, slot)

        @pl.when(i + 1 < n_strips)
        def _():
            start_strip(i + 1, nslot)

        wait_strip(i, slot)

        h = h_ref[0, 0]
        stencil, b_rows, live_rows = read_strip_constants(
            kind, b_is_field, has_freeze,
            c0_ref, c1_ref, c2_ref, b_ref, m_ref, fz_ref, row0, R)

        def f_ex(yb):
            return ex_block_of(yb, stencil, live_rows)

        def f_im(yb):
            return im_block_of(yb, b_rows, live_rows)

        wrow = w_ref[:, pl.ds(row0, R), :]
        erow = e_ref[:, pl.ds(row0, R), :]
        y0 = jnp.concatenate(
            [wrow, yv[slot][..., P:P + nxl], erow,
             yv[slot][..., P + nxl + P:]], axis=-1)

        y0c = y0[:, P:P + S, :]
        w = cm_ref[:, :] / (rtol * jnp.abs(y0c) + atol)
        # the exact ARK step body shared with the single-chip kernel
        ynew, _, ss = imex_block_step(y0, h, f_ex, f_im, nvars, dtype,
                                      P, S, w)

        ynew_ref[:, :, :] = ynew[:, P:P + S, :]
        ss_ref[i, 0] = ss

    if kind == "torus":
        coeff_spec = pl.BlockSpec((1, nxp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        coeff_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    b_shape = (nyl + 2 * P, 1) if b_is_field else (1, 1)
    m_shape = (nyl + 2 * P, 1) if has_freeze else (1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            coeff_spec, coeff_spec, coeff_spec,
            pl.BlockSpec(b_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((nvars, nyl + 2 * P, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvars, nyl + 2 * P, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvars, P, nxp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvars, P, nxp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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

    vma = frozenset({axis_y, axis_x})
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nvars, nyl, nxp), dtype, vma=vma),
            jax.ShapeDtypeStruct((n_strips, 1), dtype, vma=vma),
        ],
        interpret=interpret,
    )

    ones = jnp.ones((1, 1), dtype)

    def step_err(t, yp, h, params):
        del t
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        w_ext, e_ext, lo_rows, hi_rows = splice_inputs(yp)
        c0, c1, c2 = params["_fused_coeffs"]
        b = params["_fused_b"]
        m = params.get("_fused_live", ones)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        ynew, ss = call(h_s, fz_s, c0, c1, c2, b, m, col_mask,
                        yp, w_ext, e_ext, lo_rows, hi_rows)
        return ynew, ss

    return FusedShardImex(step_err=step_err, pad=pad, unpad=unpad,
                          prepare_params=prepare_params, nxp=nxp)
