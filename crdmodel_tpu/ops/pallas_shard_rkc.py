"""Fused RKC2 step for one shard of a 2D device mesh.

Combines the two round-2 kernels: the deep-halo shard step
(ops/pallas_shard_step.py — ONE width-P halo exchange per step feeds every
stage of a single-pass per-shard kernel) and the RKC2 stage recurrence
(ops/pallas_rkc.py — constant VMEM live-set for any stage count, stability
coverage ~0.65 s^2). Together they make the production multi-chip
configuration for diffusion-limited large grids: per step, one width-24
two-phase ppermute exchange, then up to 23 Chebyshev stages entirely in
VMEM per strip, then one psum of the error partial sums.

The spectral-radius bound is pmax'd across the mesh (make_rho_bound's
max_reduce), so every device computes the same stage count and coefficient
table; all accept/reject decisions derive from psum'd scalars as in
parallel/sharded.py. The driver caps h at the kernel's stage budget
(h_limit, psum-consistent for the same reason).

float32; interpret=True runs through the Pallas interpreter for CPU-mesh
correctness tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate import rkc
from crdmodel_tpu.ops.pallas_rkc import (
    S_MAX_KERNEL, P_RKC, static_stage_tables)
from crdmodel_tpu.ops.pallas_step import _pick_strip
from crdmodel_tpu.ops.kernel_common import (
    coeff_kind,
    freeze_scalar, load_edge_strips, make_shard_halo_helpers, make_rhs_block, read_strip_constants)
from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y

VMEM_BUDGET = 10 * 1024 * 1024


def _strip_target(nxl: int, nvars: int) -> int:
    nxp = ((nxl + 2 * P_RKC + 127) // 128) * 128
    live = 2 + 7
    bytes_per_row = 4 * nxp * nvars * live
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * P_RKC) // 8 * 8))


def is_shard_rkc_supported(problem, dtype, nyl: int, nxl: int) -> bool:
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    ff = fused_forcing(problem)
    if ff is False:
        return False   # free-form forcing needs the XLA path
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if nyl < P_RKC or nxl < P_RKC:
        return False  # halo deeper than a neighbour's block
    S = _pick_strip(nyl, target=_strip_target(nxl, problem.model.nvars))
    if S is None:
        return False
    if nyl // S > 1 and S < P_RKC:
        return False  # multi-strip row windows must not wrap (see kernel)
    if problem.model.jac_bound is None and not problem.cfg.just_diffusion:
        return False
    from crdmodel_tpu.ops.pallas_rkc import pole_inflated_rho
    if pole_inflated_rho(problem):
        return False  # capped-sphere pole rho exceeds the kernel's
        # stage-count coverage ~120x sooner than XLA's S_MAX=256
    return True


@dataclasses.dataclass(frozen=True)
class FusedShardRKC:
    step_err: Callable
    h_limit: Callable
    pad: Callable
    unpad: Callable
    prepare_params: Callable
    nxp: int


def build_fused_shard_rkc(problem, nyl: int, nxl: int, dtype=jnp.float32,
                          rho_fn=None, interpret: bool = False,
                          axis_y: str = AXIS_Y,
                          axis_x: str = AXIS_X,
                          pad_spec=None) -> FusedShardRKC:
    """step_err/prepare_params/h_limit must run INSIDE shard_map over
    (axis_y, axis_x); rho_fn must pmax across the mesh."""
    cfg = problem.cfg
    model = problem.model
    nvars = model.nvars
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(problem.geometry.kind)

    if rho_fn is None:
        raise ValueError("sharded fused RKC needs a pmax'd rho_fn")

    P = P_RKC
    S = _pick_strip(nyl, target=_strip_target(nxl, nvars))
    if S is None:
        raise ValueError(f"nyl={nyl} has no usable strip divisor")
    n_strips = nyl // S
    assert n_strips == 1 or S >= P_RKC  # strip windows must not wrap
    R = S + 2 * P
    nxp = ((nxl + 2 * P + 127) // 128) * 128
    fill = nxp - (nxl + 2 * P)

    b_is_field = cfg.vary_beta == 1
    has_freeze = (t_boundary > 0.0) and not just_diffusion
    rhs_block_of = make_rhs_block(kind, model, just_diffusion)

    # v3 splice transport shared by the sharded kernels
    pad, unpad, splice_inputs, prepare_params0 = make_shard_halo_helpers(
        kind, nyl, nxl, P, nxp, dtype, b_is_field, has_freeze,
        axis_y, axis_x, pad_spec=pad_spec)

    # in-kernel forcing: all-gated pulse trains are constant per step
    # (one amplitude column); smooth jittable waveforms carry one
    # amplitude per RHS evaluation, filled at the true Chebyshev stage
    # times outside the kernel (static_stage_tables with_times; round 5)
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    from crdmodel_tpu.parallel.halo import (halo_pad_cols, halo_pad_rows,
                                            mirror_halo_pad_cols,
                                            mirror_halo_pad_rows)
    forcing = fused_forcing(problem)
    assert forcing is not False
    n_stim = len(forcing.stimuli) if forcing else 0
    all_gated = (not n_stim) or all(
        getattr(st.waveform, "segment_gated", False)
        for st in forcing.stimuli)
    n_amp = 1 if all_gated else S_MAX_KERNEL + 2
    pady = pad_spec is not None and pad_spec.y.active
    padx = pad_spec is not None and pad_spec.x.active
    fill = nxp - (nxl + 2 * P)

    def prepare_params(params):
        out = prepare_params0(params)
        if n_stim:
            rows, cols = [], []
            for i in range(n_stim):
                r_ = params[f"_stim_row_{i}"].astype(dtype).reshape(nyl, 1)
                r_ = (mirror_halo_pad_rows(r_, axis_y, P, pad_spec.y.n,
                                           pad_spec.y.blk)
                      if pady else halo_pad_rows(r_, axis_y, P))
                rows.append(r_)
                c_ = params[f"_stim_col_{i}"].astype(dtype).reshape(1, nxl)
                c_ = (mirror_halo_pad_cols(c_, axis_x, P, pad_spec.x.n,
                                           pad_spec.x.blk)
                      if padx else halo_pad_cols(c_, axis_x, P))
                if fill:
                    c_ = jnp.pad(c_, ((0, 0), (0, fill)))
                cols.append(c_)
            out["_fused_stim_rows"] = jnp.stack(rows)
            out["_fused_stim_cols"] = jnp.stack(cols)
        return out

    if n_stim:
        stim_vars = tuple(st.var for st in forcing.stimuli)

    col_mask_np = np.zeros((1, nxp), dtype=np.float32)
    col_mask_np[0, P:P + nxl] = 1.0
    col_mask = jnp.asarray(col_mask_np, dtype)

    def kernel(h_ref, fz_ref, s_ref, mu1_ref, ctab_ref, amps_ref,
               srow_ref, scol_ref,
               c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref, vr_ref,
               y_hbm, w_ref, e_ref, lo_ref, hi_ref, ynew_ref, ss_ref,
               yv, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)

        # strip rows [iS-P, iS+S+P) of the state are contiguous in HBM; the
        # first/last P halo rows at the block edges come from the thin
        # lo/hi VMEM inputs (see ops/pallas_shard_step.py)
        slot = load_edge_strips(y_hbm, yv, sems, nyl, S, P,
                                n_strips, i, lo_ref, hi_ref)

        h = h_ref[0, 0]
        s = s_ref[0, 0]
        mu1 = mu1_ref[0, 0]
        stencil, b_rows, live_rows = read_strip_constants(
            kind, b_is_field, has_freeze,
            c0_ref, c1_ref, c2_ref, b_ref, m_ref, fz_ref, row0, R)

        if n_stim:
            profs = [srow_ref[j, pl.ds(row0, R), :]
                     * scol_ref[j, 0, :] for j in range(n_stim)]

            def ex_at(e):
                ex = {}
                for j in range(n_stim):
                    a = amps_ref[j, 0] if n_amp == 1 else amps_ref[j, e]
                    v = stim_vars[j]
                    contrib = a * profs[j]
                    ex[v] = ex[v] + contrib if v in ex else contrib
                return ex
        else:
            def ex_at(e):
                return None

        def rhs_block(yb, ex=None):
            return rhs_block_of(yb, stencil, b_rows, live_rows, extra=ex)

        # in-kernel column splice (VPU-only; HBM halo lanes are stale)
        wrow = w_ref[:, pl.ds(row0, R), :]
        erow = e_ref[:, pl.ds(row0, R), :]
        y0 = jnp.concatenate(
            [wrow, yv[slot][..., P:P + nxl], erow,
             yv[slot][..., P + nxl + P:]], axis=-1)
        f0 = rhs_block(y0, ex_at(0))             # time t
        y_jm1 = y0 + (h * mu1) * f0
        y_jm2 = y0

        def stage(j, carry):
            yjm1, yjm2 = carry
            mu = ctab_ref[j, 0]
            nu = ctab_ref[j, 1]
            mut = ctab_ref[j, 2]
            gt = ctab_ref[j, 3]
            fy = rhs_block(yjm1, ex_at(j))       # time t + c_{j-1} h
            yj = ((1.0 - mu - nu) * y0 + mu * yjm1 + nu * yjm2
                  + (h * mut) * fy + (h * gt) * f0)
            return (yj, yjm1)

        y_new, _ = jax.lax.fori_loop(2, s + 1, stage, (y_jm1, y_jm2))

        f1 = rhs_block(y_new, ex_at(s + 1))      # time t + h
        est = 0.8 * (y0 - y_new) + (0.4 * h) * (f0 + f1)

        ynew_ref[:, :, :] = y_new[:, P:P + S, :]

        yc = y0[:, P:P + S, :]
        w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
        # vr masks pad rows out of the error sum (mirror-pad grids)
        scaled = est[:, P:P + S, :] * w * vr_ref[:, :]
        ss_ref[i, 0] = jnp.sum(scaled * scaled)

    if kind == "torus":
        coeff_spec = pl.BlockSpec((1, nxp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        coeff_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    b_shape = (nyl + 2 * P, 1) if b_is_field else (1, 1)
    m_shape = (nyl + 2 * P, 1) if has_freeze else (1, 1)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips,),
        in_specs=[
            smem11, smem11, smem11, smem11,
            pl.BlockSpec((S_MAX_KERNEL + 1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((max(1, n_stim), n_amp), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # per-eval amplitudes
            pl.BlockSpec((max(1, n_stim), nyl + 2 * P if n_stim else 1, 1),
                         lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus row profiles
            pl.BlockSpec((max(1, n_stim), 1, nxp if n_stim else 1),
                         lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus col profiles
            coeff_spec, coeff_spec, coeff_spec,
            pl.BlockSpec(b_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # valid-row error mask
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((nvars, nyl + 2 * P, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # west column strips
            pl.BlockSpec((nvars, nyl + 2 * P, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # east column strips
            pl.BlockSpec((nvars, P, nxp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # rows below the block
            pl.BlockSpec((nvars, P, nxp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # rows above the block
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
    amps0 = jnp.zeros((max(1, n_stim), n_amp), dtype)
    srow0 = jnp.zeros((1, 1, 1), dtype)
    scol0 = jnp.zeros((1, 1, 1), dtype)
    mu1_tab, ctab_tab, ctimes_tab = static_stage_tables(
        S_MAX_KERNEL, dtype, with_times=True)

    def _freeze_scalar(params):
        return freeze_scalar(params, has_freeze, t_boundary, dtype)

    def step_err(t, yp, h, params, carry=()):
        rho = rho_fn(t, unpad(yp), params).astype(dtype)   # pmax'd
        s = jnp.minimum(rkc.choose_stages(h, rho),
                        jnp.asarray(S_MAX_KERNEL, jnp.int32))
        mu1 = mu1_tab[s]
        ctab = jax.lax.dynamic_index_in_dim(ctab_tab, s, 0, keepdims=False)
        w_ext, e_ext, lo_rows, hi_rows = splice_inputs(yp)
        c0, c1, c2 = params["_fused_coeffs"]
        b = params["_fused_b"]
        m = params.get("_fused_live", ones)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(_freeze_scalar(params), (1, 1))
        s_s = jnp.reshape(s, (1, 1))
        mu1_s = jnp.reshape(mu1, (1, 1))
        cm = params.get("_fused_cmask", col_mask)
        vr = params.get("_fused_vrow", ones_rows)
        if n_stim:
            seg = params.get("_seg_end") if isinstance(params, dict) else None
            if all_gated:
                amps = jnp.stack([
                    jnp.asarray(st.waveform(t, seg_end=seg), dtype)
                    for st in forcing.stimuli]).reshape(n_stim, 1)
            else:
                # true Chebyshev stage times for THIS dispatch's pmax'd
                # stage count (every shard computes the same s, so the
                # same table row — collective-consistent)
                ctv = jax.lax.dynamic_index_in_dim(ctimes_tab, s, 0,
                                                   keepdims=False)
                times = (t + ctv * h).astype(dtype)
                rows = []
                for st in forcing.stimuli:
                    if getattr(st.waveform, "segment_gated", False):
                        a = jnp.asarray(st.waveform(t, seg_end=seg), dtype)
                        rows.append(jnp.broadcast_to(a, times.shape))
                    else:
                        rows.append(jnp.asarray(st.waveform(times), dtype))
                amps = jnp.stack(rows)
            srow = params["_fused_stim_rows"]
            scol = params["_fused_stim_cols"]
        else:
            amps, srow, scol = amps0, srow0, scol0
        ynew, ss = call(h_s, fz_s, s_s, mu1_s, ctab, amps, srow, scol,
                        c0, c1, c2, b, m, cm, vr,
                        yp, w_ext, e_ext, lo_rows, hi_rows)
        return ynew, ss, ()

    def h_limit(t, yp, params):
        rho = rho_fn(t, unpad(yp), params).astype(dtype)
        return (rkc.STAB_FACTOR * (S_MAX_KERNEL - 1) ** 2
                / jnp.maximum(rho, 1e-30)).astype(dtype)

    return FusedShardRKC(step_err=step_err, h_limit=h_limit, pad=pad,
                         unpad=unpad, prepare_params=prepare_params,
                         nxp=nxp)
