"""Fused embedded-ERK step for the GENERAL divergence-form operator.

Same temporal row-blocking design as the isotropic fused step
(ops/pallas_step.py — read that module docstring first), but the
diffusion operator is the conservative face-coefficient form

    L u = aE (uE - u) + aW (uW - u) + aN (uN - u) + aS (uS - u)

with full (ny, nx) coefficient FIELDS (core/grid.py::divergence_coeffs64
+ optional face_openness masks). This is everything the 3-profile
kernels cannot express — and it is the operator behind the
bounded-tissue configurations (the flagship beyond-reference use cases):

  * no-flux domain boundaries (cfg.boundary = noflux/noflux_x/noflux_y),
  * obstacle walls / inert scars (build_problem(obstacle_mask=...)),
    including the frozen-kinetics tissue mask,
  * full 2-D diffusion fields D(x, y) on any surface,
  * diffusion fields on the FLAT surface (flat has no profile remap).

All of these previously fell back to the XLA divergence path
(core/problem.py::make_rhs); the profile kernels' gates decline them via
kernel_common.needs_divform.

Coefficient traffic: only aE, aW and aN ship (+ the obstacle tissue mask
when present), stacked into ONE (n_coeff, ny, nxp) HBM-resident array
whose per-strip row windows the kernel DMAs with the same wrapped-row
schedule as the state (load_wrap_strips) — no (R/S)x prebuilt-window
storage, and passed as a RUNTIME input via params["_divform_coeffs"]
(attached to problem.params at build) rather than a baked constant,
because closure constants ride the remote-compile request
(kernel_common.build_coeff_hbm). aS is recovered in-kernel by a row
roll of aN.
That identity is EXACT by construction for every geometry here: the cell
weight w of the conservative form depends only on x (flat w=1, torus
w=ring(theta), revolution w=sqrt(E) rho — core/grid.py), so
aS_ij = f_S/w_i = roll_y(f_N)/w_i = roll_y(aN)_ij for the shared y-faces,
and the openness masks satisfy oS = roll_y(oN) (face_openness docstring).
aW = roll_x(aE) does NOT hold on metric surfaces (w varies along x), so
aW ships as its own window. build() verifies the aS identity on the f64
coefficients and refuses otherwise (future geometry safety).

Numerics follow the XLA path's ops/stencil.py::divergence_laplacian
exactly in real arithmetic (same difference grouping, same
f64-build-then-cast coefficients; the obstacle tissue mask multiplies
ydot by a 0/1 field, which equals the XLA path's jnp.where exactly) —
f32 results agree to rounding (compiler reassociation/FMA differ, like
every fused kernel here) with step sequences pinned equal in tests.

float32 only; the per-segment freeze and runtime beta ("_fused_b") /
diffusion scale ("dscale") contracts match ops/pallas_step.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate.erk import Tableau
from crdmodel_tpu.ops.kernel_common import (
    build_coeff_hbm, freeze_scalar, lane_pad_width, load_wrap_strips,
    make_divform_rhs_block, needs_divform, prepare_constants)
from crdmodel_tpu.ops.pallas_step import HALO, VMEM_BUDGET, FusedStep


def _n_windows(problem) -> int:
    """Coefficient strip windows shipped per step: aE, aW, aN (+ the
    tissue mask when an obstacle is present)."""
    return 3 + (1 if getattr(problem, "obstacle_mask", None) is not None
                else 0)


def _divform_strip_target(nx: int, nvars: int, n_stages: int,
                          n_windows: int) -> int:
    """Strip row cap: the isotropic live-set accounting plus the
    double-buffered coefficient strip windows."""
    nxp = lane_pad_width(nx, HALO)
    live = nvars * (2 + n_stages) + 2 * n_windows + 6
    bytes_per_row = 4 * nxp * live
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * HALO) // 8 * 8))


def _pick_strip(ny: int, target: int) -> int | None:
    best = None
    for s in range(8, min(ny, target) + 1, 8):
        if ny % s == 0:
            best = s
    return best


def _face_coeffs64(problem):
    """The four (ny, nx) f64 face-coefficient fields of the XLA path."""
    geometry = problem.geometry
    shape = geometry.grid.shape
    faces = geometry.divergence_coeffs64(
        problem.diffusion_field, face_mask=getattr(problem, "face_mask",
                                                   None))
    return tuple(np.ascontiguousarray(
        np.broadcast_to(np.asarray(a, np.float64), shape)) for a in faces)


def is_divform_supported(problem, tableau: Tableau, dtype) -> bool:
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return False   # free-form forcing needs the XLA path
    if not needs_divform(problem):
        return False
    if problem.geometry.kind not in ("flat", "torus", "revolution"):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if tableau.stages > HALO:
        return False
    S = _pick_strip(problem.cfg.ny,
                    _divform_strip_target(problem.cfg.nx,
                                          problem.model.nvars,
                                          tableau.stages,
                                          _n_windows(problem)))
    if S is None or not (S >= HALO or problem.cfg.ny <= S):
        # load_wrap_strips needs non-edge-crossing halo windows (S >= P)
        return False
    _aE, _aW, aN, aS = _face_coeffs64(problem)
    # the in-kernel aS recovery must be exact (see module docstring)
    return np.array_equal(aS, np.roll(aN, 1, axis=0))


def build_fused_divform_step(problem, tableau: Tableau, dtype=jnp.float32,
                             interpret: bool = False) -> FusedStep:
    cfg = problem.cfg
    model = problem.model
    nvars = model.nvars
    ny, nx = cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    has_tissue = getattr(problem, "obstacle_mask", None) is not None

    a = tableau.a
    bw = tableau.b
    d = tableau.b - tableau.bhat
    n_stages = tableau.stages
    P = HALO
    assert n_stages <= P
    S = _pick_strip(ny, _divform_strip_target(nx, nvars, n_stages,
                                              _n_windows(problem)))
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

    # beta / freeze-mask / error-column-mask inputs (the face coefficients
    # ride their own strip windows below)
    kc = prepare_constants(problem, dtype, P, pad_cols, with_coeffs=False)
    b_is_field, has_freeze = kc.b_is_field, kc.has_freeze

    # structured forcing (core/forcing.py) — same machinery as
    # ops/pallas_step.py: per-stage amplitudes at true stage times from
    # outside the kernel, rank-1 profiles as trace-time constant inputs
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    forcing = fused_forcing(problem)
    assert forcing is not False, "is_divform_supported should have declined"
    n_stim = len(forcing.stimuli) if forcing else 0
    if n_stim:
        stim_vars = tuple(st.var for st in forcing.stimuli)
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
        stim_rows = jnp.asarray(np.stack(rows_np), dtype)
        stim_cols = jnp.asarray(np.stack(cols_np)[:, None, :], dtype)
    else:
        stim_rows = jnp.zeros((1, 1, 1), dtype)
        stim_cols = jnp.zeros((1, 1, 1), dtype)
    amps0 = jnp.zeros((max(1, n_stim), n_stages), dtype)

    # --- coefficient strip windows: (n_strips, R, nxp), f64 setup ---
    aE64, aW64, aN64, aS64 = _face_coeffs64(problem)
    if not np.array_equal(aS64, np.roll(aN64, 1, axis=0)):
        raise ValueError("aS != roll_y(aN): the geometry's cell weight "
                         "varies along y — unsupported (is_divform_"
                         "supported should have declined)")

    # ONE stacked (n_coeff, ny, nxp) HBM-resident coefficient array,
    # row-windowed per strip by in-kernel DMAs (load_wrap_strips) and
    # passed as a RUNTIME input via params["_divform_coeffs"] (attached
    # to problem.params below) — see build_coeff_hbm for why it must not
    # be a baked constant
    fields = [aE64, aW64, aN64]
    if has_tissue:
        fields.append(np.asarray(problem.obstacle_mask, np.float64))
    n_coeff = len(fields)
    coeffs_hbm = build_coeff_hbm(fields, P, nx, nxp, dtype)
    problem.params["_divform_coeffs"] = coeffs_hbm

    rhs_block = make_divform_rhs_block(model, just_diffusion)

    def kernel(h_ref, fz_ref, ds_ref, amps_ref, srow_ref, scol_ref,
               b_ref, m_ref, cm_ref,
               y_hbm, c_hbm, ynew_ref, ss_ref, yv, sems, cv, csems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * S, 8)

        slot = load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips, i)
        cslot = load_wrap_strips(c_hbm, cv, csems, ny, S, P, n_strips, i)

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
        cb = cv[cslot]
        ae, aw, an = cb[0], cb[1], cb[2]
        # aS recovery: rows carry wrapped halos, so the roll is correct on
        # rows [1, R) — one ring, inside every stage's validity region
        as_ = jnp.roll(an, 1, axis=-2)
        tis = cb[3] if has_tissue else None

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

        y0 = yv[slot]
        faces = (ae, aw, an, as_)
        ks = []
        for s in range(n_stages):
            yi = y0
            for j in range(s):
                if a[s, j] != 0.0:
                    yi = yi + (h * float(a[s, j])) * ks[j]
            ks.append(rhs_block(yi, faces, tis, ds, b_rows, live_rows,
                                stage_extra(s)))

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

    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips,),
        in_specs=[
            smem_scalar, smem_scalar, smem_scalar,
            pl.BlockSpec(amps0.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # stage amplitudes
            pl.BlockSpec(stim_rows.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus row profiles
            pl.BlockSpec(stim_cols.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # stimulus col profiles
            pl.BlockSpec(kc.b_pad.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kc.m_pad.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # y stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),   # coefficient fields
        ],
        out_specs=[
            pl.BlockSpec((nvars, S, nxp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nvars, R, nxp), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((2, n_coeff, R, nxp), dtype),
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
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        if n_stim:
            from crdmodel_tpu.ops.kernel_common import stage_amplitudes
            amps = stage_amplitudes(forcing, t, h, c_nodes, params, dtype)
        else:
            amps = amps0
        b_in = kc.b_pad
        ds_s = one
        ch = coeffs_hbm   # fallback: callers that don't thread params
        if isinstance(params, dict):
            if "_fused_b" in params:
                b_in = params["_fused_b"].astype(dtype)
            if "dscale" in params:
                ds_s = jnp.reshape(params["dscale"].astype(dtype), (1, 1))
            if "_divform_coeffs" in params:
                ch = params["_divform_coeffs"]
        ynew, ss = call(h_s, fz_s, ds_s, amps, stim_rows, stim_cols,
                        b_in, kc.m_pad, kc.col_mask,
                        yp, ch)
        return ynew, jnp.sum(ss)

    return FusedStep(step_err=step_err, pad=pad_cols, unpad=unpad_cols,
                     nxp=nxp)
