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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate import imex  # noqa: F401 (re-exported scheme)
from crdmodel_tpu.ops.pallas_imex import _imex_strip_target, imex_block_step
from crdmodel_tpu.ops.pallas_step import HALO, _pick_strip
from crdmodel_tpu.ops.kernel_common import (
    coeff_kind,
    freeze_scalar, load_edge_strips, make_shard_halo_helpers,
    make_split_block, read_strip_constants)
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
                           axis_x: str = AXIS_X,
                           pad_spec=None) -> FusedShardImex:
    """Fused IMEX step for (nyl, nxl) local blocks; step_err and
    prepare_params must run INSIDE shard_map over (axis_y, axis_x)."""
    cfg = problem.cfg
    model = problem.model
    nvars = model.nvars
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(problem.geometry.kind)

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

    # v3 splice transport shared by the sharded kernels
    pad, unpad, splice_inputs, prepare_params = make_shard_halo_helpers(
        kind, nyl, nxl, P, nxp, dtype, b_is_field, has_freeze,
        axis_y, axis_x, pad_spec=pad_spec)

    col_mask_np = np.zeros((1, nxp), dtype=np.float32)
    col_mask_np[0, P:P + nxl] = 1.0
    col_mask = jnp.asarray(col_mask_np, dtype)

    def kernel(h_ref, fz_ref, c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref,
               vr_ref, y_hbm, w_ref, e_ref, lo_ref, hi_ref, ynew_ref, ss_ref,
               yv, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)

        slot = load_edge_strips(y_hbm, yv, sems, nyl, S, P,
                                n_strips, i, lo_ref, hi_ref)

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
        # vr masks pad rows out of the error sum (mirror-pad grids)
        w = cm_ref[:, :] / (rtol * jnp.abs(y0c) + atol) * vr_ref[:, :]
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
            pl.BlockSpec((S, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # valid-row error mask
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
    ones_rows = jnp.ones((nyl, 1), dtype)

    def step_err(t, yp, h, params):
        del t
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        w_ext, e_ext, lo_rows, hi_rows = splice_inputs(yp)
        c0, c1, c2 = params["_fused_coeffs"]
        b = params["_fused_b"]
        m = params.get("_fused_live", ones)
        cm = params.get("_fused_cmask", col_mask)
        vr = params.get("_fused_vrow", ones_rows)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        ynew, ss = call(h_s, fz_s, c0, c1, c2, b, m, cm, vr,
                        yp, w_ext, e_ext, lo_rows, hi_rows)
        return ynew, ss

    return FusedShardImex(step_err=step_err, pad=pad, unpad=unpad,
                          prepare_params=prepare_params, nxp=nxp)
