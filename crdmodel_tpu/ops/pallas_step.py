"""Fused embedded-ERK step as a single Pallas TPU kernel.

The hot loop of the whole framework. One kernel invocation performs a full
embedded Runge–Kutta step — every stage's stencil + kinetics, the solution
update, and the WRMS error-norm partial sums — in one pass over HBM:

  read y (2 fields, + ~1% halo re-reads) -> [VMEM: all stages via temporal
  row-blocking] -> write y_new (2 fields) + per-strip error partial sums

The XLA path materialises stage tensors and runs a separate norm pass
(measured ~117us/step on the canonical 400x1600 FHN torus grid vs a ~66us
single-read-write floor at this chip's measured effective bandwidth).

Temporal blocking: the grid is processed in row strips. A strip loaded with
P halo rows (P >= number of RHS evaluations) supports all stages entirely in
VMEM: stage s's values are valid on a region that shrinks by one ring per
stage, and the strip interior stays valid through the last stage.

Lane alignment: Mosaic requires lane (last-dim) DMA slices to be 128-aligned,
so the solver state lives in a *persistently lane-padded* representation
(nvars, ny, nxp): columns = [P wrapped halo | nx physical | P wrapped halo |
zero fill to nxp], nxp a multiple of 128. Every in-kernel DMA then moves
full-width rows (always aligned). The kernel refreshes the column halos of
y_new before writing (two lane-rotates + selects), so the representation is
closed under steps; `pad`/`unpad` convert at the boundaries of the
integration loop only. Garbage fill lanes evolve as independent 0-D ODEs
(bounded for both models), never contaminate the physical region (roll
pollution travels 1 lane/stage, < P), and are masked out of the error norm.

Row periodicity comes from three in-kernel DMAs per strip with wrapped row
offsets (top halo / body / bottom halo). All row offsets stay multiples of 8
(Mosaic sublane alignment) because the strip size and P are multiples of 8.

The per-step freeze decision (absorbing boundary,
src/FHNmodel_torus.cpp:643-653) is derived from the integration segment
(params["_seg_end"], see integrate/erk.py breakpoints) — a scalar, since
segments never straddle the tBoundary discontinuity.

float32 only (TPU f64 is emulated); callers fall back to the XLA path
otherwise (see is_supported()).
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
from crdmodel_tpu.ops.kernel_common import (
    coeff_kind,
    freeze_scalar, load_wrap_strips, make_rhs_block, prepare_constants,
    read_strip_constants)

HALO = 8  # >= stages for every supported tableau; multiple of 8 for alignment

VMEM_BUDGET = 10 * 1024 * 1024


def _step_strip_target(nx: int, nvars: int, n_stages: int,
                       halo: int = HALO) -> int:
    """Strip row cap keeping the working set (2 scratch slots + live stage
    arrays) under VMEM_BUDGET — at wide grids the default 256-row strips
    brush the 16MB VMEM stack limit."""
    nxp = ((nx + 2 * halo + 127) // 128) * 128
    live = 2 + n_stages + 3
    bytes_per_row = 4 * nxp * nvars * live
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * halo) // 8 * 8))


def _pick_strip(ny: int, target: int = 256, min_s: int = 8) -> int | None:
    """Largest divisor of ny <= target that is a multiple of 8 (Mosaic
    sublane alignment for row slices). min_s > 8: deep-halo callers need
    S >= P so the wrapped strip DMA windows stay contiguous
    (kernel_common.load_wrap_strips)."""
    best = None
    for s in range(max(8, min_s), min(ny, target) + 1, 8):
        if ny % s == 0:
            best = s
    return best


def is_supported(problem, tableau: Tableau, dtype, halo: int = None) -> bool:
    from crdmodel_tpu.ops.kernel_common import fused_forcing, needs_divform
    P = HALO if halo is None else halo
    if needs_divform(problem):
        return False   # masked faces / 2-D fields: ops/pallas_divform.py
    if fused_forcing(problem) is False:
        return False   # free-form forcing needs the XLA path
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if tableau.stages > P:
        return False
    if _pick_strip(problem.cfg.ny,
                   target=_step_strip_target(problem.cfg.nx,
                                             problem.model.nvars,
                                             tableau.stages, P),
                   min_s=P) is None:
        return False
    return True


@dataclasses.dataclass(frozen=True)
class FusedStep:
    step_err: Callable   # (t, yp, h, params) -> (ynew_p, err_ss)
    pad: Callable        # (nvars, ny, nx) -> (nvars, ny, nxp)
    unpad: Callable      # (nvars, ny, nxp) -> (nvars, ny, nx)
    nxp: int


def build_fused_step(problem, tableau: Tableau, dtype=jnp.float32,
                     interpret: bool = False, halo: int = None) -> FusedStep:
    """halo: row/column halo depth P (default HALO=8). Deep halos (16/32,
    multiples of 8) exist for the speculative K-step companion kernel
    (ops/pallas_kstep.py::halo_for) — both kernels must share one padded
    state layout, so the adaptive driver builds them with the same P."""
    cfg = problem.cfg
    model = problem.model
    geometry = problem.geometry
    nvars = model.nvars
    ny, nx = cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(geometry.kind)

    a = tableau.a
    bw = tableau.b
    d = tableau.b - tableau.bhat
    n_stages = tableau.stages
    P = HALO if halo is None else halo
    assert n_stages <= P and P % 8 == 0
    S = _pick_strip(ny, target=_step_strip_target(nx, nvars, n_stages, P),
                    min_s=P)
    if S is None:
        raise ValueError(f"ny={ny} has no multiple-of-8 divisor in "
                         f"[{P},256]")
    n_strips = ny // S
    R = S + 2 * P                              # rows resident per strip
    nxp = ((nx + 2 * P + 127) // 128) * 128    # padded lane width

    def pad_cols(arr):
        out = jnp.concatenate([arr[..., -P:], arr, arr[..., :P]], axis=-1)
        fill = nxp - (nx + 2 * P)
        if fill:
            padw = [(0, 0)] * (out.ndim - 1) + [(0, fill)]
            out = jnp.pad(out, padw)
        return out

    def unpad_cols(arr):
        return arr[..., P:P + nx]

    # --- per-problem constant arrays, passed as kernel inputs ---
    kc = prepare_constants(problem, dtype, P, pad_cols)
    b_is_field, has_freeze = kc.b_is_field, kc.has_freeze
    rhs_block_of = make_rhs_block(kind, model, just_diffusion)

    # structured forcing (core/forcing.py): per-stage scalar amplitudes
    # computed OUTSIDE the kernel at the true stage times t + c_s*h; the
    # rank-1 spatial profiles ride as trace-time constant inputs (rows
    # wrap-padded like the beta field, cols in the lane layout)
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    forcing = fused_forcing(problem)
    assert forcing is not False, "is_supported should have declined"
    n_stim = len(forcing.stimuli) if forcing else 0
    if n_stim:
        stim_vars = tuple(s.var for s in forcing.stimuli)
        c_nodes = tuple(float(c) for c in tableau.c)
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
        stim_rows = jnp.asarray(np.stack(rows_np), dtype)  # (n_stim,ny+2P,1)
        stim_cols = jnp.asarray(np.stack(cols_np)[:, None, :], dtype)
    else:
        stim_rows = jnp.zeros((1, 1, 1), dtype)
        stim_cols = jnp.zeros((1, 1, 1), dtype)
    amps0 = jnp.zeros((max(1, n_stim), n_stages), dtype)

    def kernel(h_ref, fz_ref, amps_ref, srow_ref, scol_ref,
               c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref,
               y_hbm, ynew_ref, ss_ref, yv, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)

        # Double-buffered wrapped-row input schedule, shared by all
        # single-chip kernels (kernel_common.load_wrap_strips)
        slot = load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips, i)

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

        # tableau entries as PYTHON floats: a numpy f64 scalar would
        # promote the whole update to f64 under x64 (interpreter tests)
        y0 = yv[slot]
        ks = []
        for s in range(n_stages):
            yi = y0
            for j in range(s):
                if a[s, j] != 0.0:
                    yi = yi + (h * float(a[s, j])) * ks[j]
            ks.append(rhs_block(yi, stage_extra(s)))

        ynew = y0
        err = jnp.zeros_like(y0)
        for s in range(n_stages):
            if bw[s] != 0.0:
                ynew = ynew + (h * float(bw[s])) * ks[s]
            if d[s] != 0.0:
                err = err + (h * float(d[s])) * ks[s]

        # centre rows; refresh the wrapped column halos so the padded
        # representation is closed under steps
        z = ynew[:, P:P + S, :]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, nxp), 2)
        zl = jnp.roll(z, -nx, axis=-1)    # left halo j<P wants z[j+nx]
        zr = jnp.roll(z, nx, axis=-1)     # right halo j>=P+nx wants z[j-nx]
        z = jnp.where(jcol < P, zl, jnp.where(jcol >= P + nx, zr, z))
        ynew_ref[:, :, :] = z

        yc = y0[:, P:P + S, :]
        w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
        scaled = err[:, P:P + S, :] * w
        ss_ref[i, 0] = jnp.sum(scaled * scaled)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(amps0.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # stage amplitudes
            pl.BlockSpec(stim_rows.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus row profiles
            pl.BlockSpec(stim_cols.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus col profiles
            kc.coeff_spec, kc.coeff_spec, kc.coeff_spec,
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
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (n_strips, 1), whole
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
            # true stage times — the one place t enters the kernels
            from crdmodel_tpu.ops.kernel_common import stage_amplitudes
            amps = stage_amplitudes(forcing, t, h, c_nodes, params, dtype)          # (n_stim, n_stages)
        else:
            amps = amps0
        # per-call parameter overrides (the serial-sweep path, sweep.py):
        # beta and the diffusion scale are KERNEL INPUTS, not baked
        # constants, so one compiled program serves every sweep member —
        # "_fused_b" replaces the scalar-beta input, "dscale" scales the
        # stencil coefficient inputs (the laplacian is linear in them,
        # mirroring the XLA rhs's params["dscale"])
        b_in, c0, c1, c2 = kc.b_pad, kc.c0, kc.c1, kc.c2
        if isinstance(params, dict):
            if "_fused_b" in params:
                b_in = params["_fused_b"].astype(dtype)
            if "dscale" in params:
                ds = params["dscale"].astype(dtype)
                c0, c1, c2 = c0 * ds, c1 * ds, c2 * ds
        ynew, ss = call(h_s, fz_s, amps, stim_rows, stim_cols,
                        c0, c1, c2, b_in, kc.m_pad,
                        kc.col_mask, yp)
        return ynew, jnp.sum(ss)

    return FusedStep(step_err=step_err, pad=pad_cols, unpad=unpad_cols,
                     nxp=nxp)
