"""Speculative K-step fused kernel: K embedded ERK steps per HBM pass.

The single-step fused kernel (ops/pallas_step.py) is memory-bound: one read
+ one write of the state per step. This kernel amortises that traffic over
K steps taken with a FROZEN step size h, entirely in VMEM per row strip:

  read y -> [step 1 stages ... step K stages, FSAL-chained] -> write ONE
  committed state + the K per-step WRMS error partial sums.

Each sub-step is individually validated by the caller against the WRMS
test (the tolerance contract is identical to the per-step loop — only the
h *sequence* differs, h updating once per batch), and the batch commits the
longest accepted prefix: the kernel takes a scalar `n_commit` selecting
which sub-step's state to write (K on the speculative first call; on a
mid-batch rejection the caller re-invokes with n_commit=prefix, a
deterministic recompute — measured rejection rates are a few % of batches,
so the recovery invocation amortises to noise).

FSAL chaining across sub-steps (BS3(2)/DOPRI5(4): last stage of an accepted
step is the first of the next) gives 1 + (stages-1)*K RHS evaluations per
batch. Halo depth must cover them all: evals <= HALO rings (P=8 supports
BS32 up to K=2; the builder checks). Round-1 history: an earlier K-step
kernel measured 52 us/step raw at K=8 but lost end-to-end to the old
~110 us invocation overhead economics; at round-2 overheads the tradeoff
inverts (docs/PERF_NOTES.md).

Layout, strips, double-buffered DMAs, lane-padded persistent state: same as
ops/pallas_step.py (see its module docstring).
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
    freeze_scalar, load_wrap_strips, make_rhs_block, prepare_constants,
    read_strip_constants)


VMEM_BUDGET = 10 * 1024 * 1024


def _strip_target(nx: int, nvars: int, n_stages: int, k: int,
                  halo: int = HALO) -> int:
    """Strip row cap keeping the K-step working set under VMEM_BUDGET.
    Liveness is k-INDEPENDENT: the unrolled sub-steps run sequentially, so
    after sub-step j only (y, k1, committed) persist — peak residency is
    one sub-step's stage arrays (~stages+5), not k of them (round-5
    recalibration; the old k*(stages+3) model forced needlessly thin strips
    at K=2 and ruled deep-K out entirely)."""
    nxp = ((nx + 2 * halo + 127) // 128) * 128
    live = 2 + n_stages + 5
    bytes_per_row = 4 * nxp * nvars * live
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * halo) // 8 * 8))


def halo_for(tableau: Tableau, k: int) -> int:
    """Smallest multiple-of-8 halo depth covering the 1+(s-1)K (FSAL) or
    s*K RHS evaluations of a K-step batch — each eval consumes one halo
    ring. K=2 keeps the standard P=8; K=5 needs 16; K=10 needs 32."""
    evals = (1 + (tableau.stages - 1) * k if tableau.fsal
             else tableau.stages * k)
    return max(8, -(-evals // 8) * 8)


def max_k(tableau: Tableau, halo: int = HALO) -> int:
    """Largest K whose RHS evaluations fit in the given halo depth."""
    if not tableau.fsal:
        return halo // tableau.stages
    return (halo - 1) // (tableau.stages - 1)


def is_kstep_supported(problem, tableau: Tableau, dtype, k: int) -> bool:
    if problem.forcing is not None:
        return False   # forcing: pallas_step only (kernel_common.fused_forcing)
    if not tableau.fsal:
        return False
    if k < 1:
        return False
    P = halo_for(tableau, k)
    from crdmodel_tpu.ops.pallas_step import is_supported
    if not is_supported(problem, tableau, dtype, halo=P):
        return False
    if _pick_strip(problem.cfg.ny,
                   target=_strip_target(problem.cfg.nx, problem.model.nvars,
                                        tableau.stages, k, P),
                   min_s=P) is None:
        return False
    return k <= max_k(tableau, P)


@dataclasses.dataclass(frozen=True)
class FusedKStep:
    call: Callable     # (t, yp, h, n_commit, params) -> (ynew_p, sss (n_strips, K))
    pad: Callable
    unpad: Callable
    k: int
    nxp: int


def build_fused_kstep(problem, tableau: Tableau, k: int,
                      dtype=jnp.float32) -> FusedKStep:
    cfg = problem.cfg
    model = problem.model
    geometry = problem.geometry
    nvars = model.nvars
    ny, nx = cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(geometry.kind)

    P = halo_for(tableau, k)
    assert tableau.fsal and 1 <= k <= max_k(tableau, P)
    a = tableau.a.tolist()
    bw = tableau.b.tolist()
    d = (tableau.b - tableau.bhat).tolist()
    n_stages = tableau.stages
    S = _pick_strip(ny, target=_strip_target(nx, nvars, n_stages, k, P),
                    min_s=P)
    if S is None:
        raise ValueError(f"ny={ny} has no multiple-of-8 divisor in "
                         f"[{P},256]")
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
    rhs_block_of = make_rhs_block(kind, model, just_diffusion)

    def kernel(h_ref, fz_ref, nc_ref, c0_ref, c1_ref, c2_ref, b_ref, m_ref,
               cm_ref, y_hbm, ynew_ref, ss_ref, yv, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)

        slot = load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips, i)

        h = h_ref[0, 0]
        n_commit = nc_ref[0, 0]
        stencil, b_rows, live_rows = read_strip_constants(
            kind, b_is_field, has_freeze,
            c0_ref, c1_ref, c2_ref, b_ref, m_ref, fz_ref, row0, R)

        def rhs_block(yb):
            return rhs_block_of(yb, stencil, b_rows, live_rows)

        y = yv[slot]
        y0_center = y[:, P:P + S, :]
        k1 = rhs_block(y)                    # eval 1; FSAL-chained below
        committed = y0_center                # n_commit == 0 -> identity
        for step in range(k):
            ks = [k1]
            for s in range(1, n_stages):
                yi = y
                for j in range(s):
                    if a[s][j] != 0.0:
                        yi = yi + (h * a[s][j]) * ks[j]
                ks.append(rhs_block(yi))
            ynew = y
            err = jnp.zeros_like(y)
            for s in range(n_stages):
                if bw[s] != 0.0:
                    ynew = ynew + (h * bw[s]) * ks[s]
                if d[s] != 0.0:
                    err = err + (h * d[s]) * ks[s]
            # per-sub-step WRMS partial sum over the physical center region,
            # weights from the state BEFORE this sub-step (SUNDIALS ewt)
            w = cm_ref[:, :] / (rtol * jnp.abs(y[:, P:P + S, :]) + atol)
            scaled = err[:, P:P + S, :] * w
            ss_ref[i, step] = jnp.sum(scaled * scaled)
            committed = jnp.where(n_commit >= step + 1,
                                  ynew[:, P:P + S, :], committed)
            # FSAL: the last stage of this step is eval 1 of the next
            y, k1 = ynew, ks[-1]

        # refresh wrapped column halos so the padded state stays closed
        jcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, nxp), 2)
        zl = jnp.roll(committed, -nx, axis=-1)
        zr = jnp.roll(committed, nx, axis=-1)
        committed = jnp.where(jcol < P, zl,
                              jnp.where(jcol >= P + nx, zr, committed))
        ynew_ref[:, :, :] = committed

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (n_strips, K)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nvars, R, nxp), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    pallas = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nvars, ny, nxp), dtype),
            jax.ShapeDtypeStruct((n_strips, k), dtype),
        ],
    )

    def call(t, yp, h, n_commit, params):
        del t
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        nc_s = jnp.reshape(jnp.asarray(n_commit, jnp.int32), (1, 1))
        ynew, sss = pallas(h_s, fz_s, nc_s, kc.c0, kc.c1, kc.c2, kc.b_pad, kc.m_pad,
                           kc.col_mask, yp)
        return ynew, sss

    return FusedKStep(call=call, pad=pad_cols, unpad=unpad_cols, k=k,
                      nxp=nxp)
