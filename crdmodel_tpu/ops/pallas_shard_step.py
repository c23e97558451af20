"""Fused embedded-ERK step for one shard of a 2D device mesh.

The multi-chip hot path. Under shard_map, the XLA stepper exchanges width-1
halos before EVERY RK stage and XLA's whole-body fusion breaks at each
collective boundary, materialising stage tensors in HBM — the same
exchange-then-stencil structure as the reference's per-RHS-call Exchange
(src/FHNmodel_torus.cpp:521-615), with the same latency-per-stage cost.

This kernel hoists communication out of the stage loop: ONE width-P halo
exchange per step (P=8 >= stage count) feeds a single Pallas kernel that
computes every stage, the solution update, and the WRMS error partial sums
in one pass over the shard. Stage s values are valid on a region that
shrinks one ring per RHS evaluation — starting from a P-deep halo the
physical block stays valid through the last stage (the same
temporal-blocking argument as the single-chip kernel, ops/pallas_step.py).

Layout and traffic (v2 — splice design): the integration-loop state is the
lane-padded local block (nvars, nyl, nxp), nxp = round128(nxl + 2P),
physical columns at [P, P+nxl). Per step, XLA
  1. ppermutes two thin COLUMN strips (nvars, nyl, P) and splices them into
     the state's halo lanes via in-place dynamic_update_slice (touching two
     lane-tiles per row, not the whole array), then
  2. ppermutes two thin ROW strips (nvars, P, nxp) of the column-spliced
     state (two-phase: corners carry true diagonal values).
The kernel reads the state rows directly from HBM — strip row windows
[iS-P, iS+S+P) are contiguous, no wrap — taking the first/last P halo rows
from the thin row-strip VMEM inputs at the block edges, and writes the new
lane-padded block. That is ~2 HBM passes of the state per step; the v1
design materialised a fully halo-padded copy of the block first (write +
read + write = 3 passes — measured 776 us/step unsharded vs 1635 us/step
sharded at 1600x6400, the difference being exactly this extra pass plus
concat overhead). Stale kernel-written halo lanes are refreshed by the next
step's splice; fill lanes beyond the halo evolve as bounded dynamics and
are masked from the error norm (same argument as ops/pallas_step.py).

Error control: the kernel emits per-strip sums of squared WRMS-scaled
errors over the PHYSICAL block only; the caller psums them across the mesh,
so every device takes identical accept/reject decisions — the same
distributed-control contract as parallel/sharded.py.

float32 only (TPU f64 is emulated); interpret=True runs the kernel in the
Pallas interpreter for CPU-mesh correctness tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate.erk import Tableau
from crdmodel_tpu.ops.pallas_step import HALO, _pick_strip
from crdmodel_tpu.ops.kernel_common import (
    coeff_kind,
    freeze_scalar, load_edge_strips, make_shard_halo_helpers, make_rhs_block, read_strip_constants)
from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y


VMEM_BUDGET = 10 * 1024 * 1024  # stage working set budget per strip (bytes)


def _strip_target(nxl: int, nvars: int, n_stages: int) -> int:
    """Largest strip row count whose in-kernel working set (double-buffered
    input scratch + all live stage arrays) stays under VMEM_BUDGET — huge
    shards otherwise blow the 16MB VMEM stack (observed at 6400x1600)."""
    nxp = ((nxl + 2 * HALO + 127) // 128) * 128
    # per resident row: 2 scratch slots x nvars + ~(stages+4) live stage-sized
    # arrays (ks, yi, ynew, err, weights) x nvars, f32
    bytes_per_row = 4 * nxp * nvars * (2 + n_stages + 4)
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * HALO) // 8 * 8))


def is_shard_supported(problem, tableau: Tableau, dtype,
                       nyl: int, nxl: int) -> bool:
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return False   # free-form forcing needs the XLA path
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if tableau.stages > HALO:
        return False
    if nyl < HALO or nxl < HALO:
        return False  # halo deeper than a neighbour's block
    nvars = problem.model.nvars
    if _pick_strip(nyl, target=_strip_target(nxl, nvars, tableau.stages)) is None:
        return False
    return True


@dataclasses.dataclass(frozen=True)
class FusedShardStep:
    step_err: Callable      # (t, yp, h, params) -> (ynew_p, err_ss)
    pad: Callable           # local (nvars, nyl, nxl) -> (nvars, nyl, nxp)
    unpad: Callable         # (nvars, nyl, nxp) -> (nvars, nyl, nxl)
    prepare_params: Callable  # params -> params + halo-padded constants
    nxp: int


def build_fused_shard_step(problem, tableau: Tableau, nyl: int, nxl: int,
                           dtype=jnp.float32, interpret: bool = False,
                           axis_y: str = AXIS_Y,
                           axis_x: str = AXIS_X,
                           pad_spec=None) -> FusedShardStep:
    """Build the fused step for (nyl, nxl) local blocks of problem's grid.

    Must be called so that step_err runs INSIDE shard_map over
    (axis_y, axis_x); prepare_params must also run inside shard_map (it
    ppermutes the static coefficient/beta/mask shards once per dispatch,
    outside the integration loop).
    """
    cfg = problem.cfg
    model = problem.model
    nvars = model.nvars
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(problem.geometry.kind)

    a = tableau.a.tolist()
    bw = tableau.b.tolist()
    d = (tableau.b - tableau.bhat).tolist()
    n_stages = tableau.stages
    P = HALO
    assert n_stages <= P
    S = _pick_strip(nyl, target=_strip_target(nxl, nvars, n_stages))
    if S is None:
        raise ValueError(f"nyl={nyl} has no multiple-of-8 divisor in [8,256]")
    assert S >= P  # strip row windows [iS-P, iS+S+P) must not wrap
    n_strips = nyl // S
    R = S + 2 * P                               # rows resident per strip
    nxp = ((nxl + 2 * P + 127) // 128) * 128    # padded lane width
    fill = nxp - (nxl + 2 * P)

    b_is_field = cfg.vary_beta == 1
    has_freeze = (t_boundary > 0.0) and not just_diffusion
    rhs_block_of = make_rhs_block(kind, model, just_diffusion)

    # v3 splice transport shared by the sharded kernels
    pad, unpad, splice_inputs, prepare_params0 = make_shard_halo_helpers(
        kind, nyl, nxl, P, nxp, dtype, b_is_field, has_freeze,
        axis_y, axis_x, pad_spec=pad_spec)

    # structured forcing (core/forcing.py): stage amplitudes are computed
    # outside the kernel at true stage times; the rank-1 profiles arrive
    # as SHARDED params ("_stim_row_{i}"/"_stim_col_{i}",
    # parallel/sharded.py::sharded_params) and are halo-padded per
    # dispatch here (mirror-aware on padded grids)
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    forcing = fused_forcing(problem)
    assert forcing is not False, "is_shard_supported should have declined"
    n_stim = len(forcing.stimuli) if forcing else 0
    if n_stim:
        stim_vars = tuple(s.var for s in forcing.stimuli)
        c_nodes = tuple(float(c) for c in tableau.c)
    fill = nxp - (nxl + 2 * P)

    from crdmodel_tpu.parallel.halo import (halo_pad_cols, halo_pad_rows,
                                            mirror_halo_pad_cols,
                                            mirror_halo_pad_rows)
    pady = pad_spec is not None and pad_spec.y.active
    padx = pad_spec is not None and pad_spec.x.active

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

    col_mask_np = np.zeros((1, nxp), dtype=np.float32)
    col_mask_np[0, P:P + nxl] = 1.0
    col_mask = jnp.asarray(col_mask_np, dtype)

    def kernel(h_ref, fz_ref, amps_ref, srow_ref, scol_ref,
               c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref,
               vr_ref, y_hbm, w_ref, e_ref, lo_ref, hi_ref, ynew_ref, ss_ref,
               yv, sems):
        i = pl.program_id(0)
        # row0 indexes the halo-padded constant arrays (b/freeze rows),
        # whose row r corresponds to state row r - P
        row0 = pl.multiple_of(i * S, 8)

        # Double-buffered input strips. Strip rows [iS-P, iS+S+P) of the
        # state are contiguous in HBM (no wrap): the first/last P halo rows
        # at the block edges come from the thin lo/hi VMEM inputs instead
        # (immediate vector copies), everything else via up-to-3 DMAs.
        # Program i prefetches strip i+1 while computing strip i.
        slot = load_edge_strips(y_hbm, yv, sems, nyl, S, P,
                                n_strips, i, lo_ref, hi_ref)

        h = h_ref[0, 0]
        stencil, b_rows, live_rows = read_strip_constants(
            kind, b_is_field, has_freeze,
            c0_ref, c1_ref, c2_ref, b_ref, m_ref, fz_ref, row0, R)

        def rhs_block(yb, extra=None):
            return rhs_block_of(yb, stencil, b_rows, live_rows, extra=extra)

        def stage_extra(s):
            if not n_stim:
                return None
            ex = {}
            for j in range(n_stim):
                contrib = (amps_ref[j, s]
                           * srow_ref[j, pl.ds(row0, R), :]
                           * scol_ref[j, 0, :])
                v = stim_vars[j]
                ex[v] = ex[v] + contrib if v in ex else contrib
            return ex

        # splice the fresh column halos into the resident strip (VPU-only;
        # the HBM state's halo lanes are stale): lanes [0,P) <- west strip,
        # [P+nxl, P+nxl+P) <- east strip, fill lanes untouched
        wrow = w_ref[:, pl.ds(row0, R), :]
        erow = e_ref[:, pl.ds(row0, R), :]
        y0 = jnp.concatenate(
            [wrow, yv[slot][..., P:P + nxl], erow,
             yv[slot][..., P + nxl + P:]], axis=-1)
        ks = []
        for s in range(n_stages):
            yi = y0
            for j in range(s):
                if a[s][j] != 0.0:
                    yi = yi + (h * a[s][j]) * ks[j]
            ks.append(rhs_block(yi, stage_extra(s)))

        ynew = y0
        err = jnp.zeros_like(y0)
        for s in range(n_stages):
            if bw[s] != 0.0:
                ynew = ynew + (h * bw[s]) * ks[s]
            if d[s] != 0.0:
                err = err + (h * d[s]) * ks[s]

        # centre rows only; lane halos go stale and are refreshed from
        # neighbours by the next step's splice()
        ynew_ref[:, :, :] = ynew[:, P:P + S, :]

        yc = y0[:, P:P + S, :]
        w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
        # vr masks pad rows out of the error sum (mirror-pad grids; all-ones
        # on even grids) — pad lanes are already zeroed by cm
        scaled = err[:, P:P + S, :] * w * vr_ref[:, :]
        ss_ref[i, 0] = jnp.sum(scaled * scaled)

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
            pl.BlockSpec((max(1, n_stim), n_stages), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # stage amplitudes
            pl.BlockSpec((max(1, n_stim), nyl + 2 * P if n_stim else 1, 1),
                         lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus row profiles
            pl.BlockSpec((max(1, n_stim), 1, nxp if n_stim else 1),
                         lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus col profiles
            coeff_spec, coeff_spec, coeff_spec,
            pl.BlockSpec(b_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # valid-row error mask
            pl.BlockSpec(memory_space=pltpu.HBM),   # state stays in HBM
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
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (n_strips, 1)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nvars, R, nxp), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    # outputs vary across both mesh axes (each device steps its own block);
    # shard_map's check_vma needs this declared on pallas out_shapes
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
    amps0 = jnp.zeros((max(1, n_stim), n_stages), dtype)
    srow0 = jnp.zeros((1, 1, 1), dtype)
    scol0 = jnp.zeros((1, 1, 1), dtype)

    def step_err(t, yp, h, params):
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        w_ext, e_ext, lo_rows, hi_rows = splice_inputs(yp)
        c0, c1, c2 = params["_fused_coeffs"]
        b = params["_fused_b"]
        m = params.get("_fused_live", ones)
        cm = params.get("_fused_cmask", col_mask)
        vr = params.get("_fused_vrow", ones_rows)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        if n_stim:
            from crdmodel_tpu.ops.kernel_common import stage_amplitudes
            amps = stage_amplitudes(forcing, t, h, c_nodes, params, dtype)
            srow = params["_fused_stim_rows"]
            scol = params["_fused_stim_cols"]
        else:
            amps, srow, scol = amps0, srow0, scol0
        ynew, ss = call(h_s, fz_s, amps, srow, scol,
                        c0, c1, c2, b, m, cm, vr,
                        yp, w_ext, e_ext, lo_rows, hi_rows)
        return ynew, ss

    return FusedShardStep(step_err=step_err, pad=pad, unpad=unpad,
                          prepare_params=prepare_params, nxp=nxp)
