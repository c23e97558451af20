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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate.erk import Tableau
from crdmodel_tpu.ops.pallas_step import HALO, _pick_strip
from crdmodel_tpu.ops.kernel_common import (
    freeze_scalar, make_rhs_block, read_strip_constants)
from crdmodel_tpu.parallel.halo import (_shift_from_next, _shift_from_prev,
                                        halo_pad_cols, halo_pad_rows)
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
                           axis_x: str = AXIS_X) -> FusedShardStep:
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
    kind = problem.geometry.kind

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

    def pad(y_local):
        """(nvars, nyl, nxl) -> lane-padded loop state (halo lanes zero;
        they are refreshed from neighbours at the top of every step)."""
        return jnp.pad(y_local, ((0, 0), (0, 0), (P, nxp - nxl - P)))

    def unpad(yp):
        return yp[..., P:P + nxl]

    def splice_inputs(yp):
        """Thin halo strips for the in-kernel splice — NO pass over the
        state. Column halos: two (nvars, nyl, P) ppermutes, row-halo-padded
        to (nvars, nyl+2P, P) so the kernel can splice every resident row
        (their own row halos carry the diagonal neighbours' corners —
        two-phase). Row halos: two (nvars, P, nxp) ppermutes of the state's
        edge rows; their stale column lanes are fixed by the same in-kernel
        splice."""
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
        """Halo-pad the static per-shard arrays once per dispatch."""
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
        # row0 indexes the halo-padded constant arrays (b/freeze rows),
        # whose row r corresponds to state row r - P
        row0 = pl.multiple_of(i * S, 8)

        # Double-buffered input strips. Strip rows [iS-P, iS+S+P) of the
        # state are contiguous in HBM (no wrap): the first/last P halo rows
        # at the block edges come from the thin lo/hi VMEM inputs instead
        # (immediate vector copies), everything else via up-to-3 DMAs.
        # Program i prefetches strip i+1 while computing strip i.
        def start_strip(strip, slot):
            r0s = pl.multiple_of(strip * S, 8)

            @pl.when(strip == 0)
            def _():
                yv[slot, :, 0:P, :] = lo_ref[:, :, :]

            @pl.when(strip > 0)
            def _():
                top0 = pl.multiple_of(
                    jnp.maximum(r0s - P, 0), 8)
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
                bot0 = pl.multiple_of(
                    jnp.minimum(r0s + S, max(nyl - P, 0)), 8)
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

        def rhs_block(yb):
            return rhs_block_of(yb, stencil, b_rows, live_rows)

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
            ks.append(rhs_block(yi))

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
        scaled = err[:, P:P + S, :] * w
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
            coeff_spec, coeff_spec, coeff_spec,
            pl.BlockSpec(b_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM),
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

    def step_err(t, yp, h, params):
        del t  # stage times only matter through the per-segment freeze flag
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

    return FusedShardStep(step_err=step_err, pad=pad, unpad=unpad,
                          prepare_params=prepare_params, nxp=nxp)
