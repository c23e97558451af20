"""Fused RKC2 step for the 3-D box — the z-streaming Chebyshev pipeline.

The volumetric CFL regime is where RKC2 matters most (the z axis adds a
third 1/dz^2 term to the diffusion spectral radius), yet on the XLA path
every Chebyshev stage is a separate memory sweep and the large-grid
non-fused falloff applies per stage (measured 8.9 ms/step at 8.4M points,
docs/PERF_NOTES.md "fused 3-D box RKC"). This kernel runs the ENTIRE
stage recurrence in one pass over HBM by streaming along z, marrying

  - ops/pallas_box3d.py's z-pipeline (per-stage plane ring buffers in
    VMEM, one (nvars, R, nxp) y-strip plane window DMA'd per iteration,
    clamped z reads exact under closed z walls), and
  - ops/pallas_rkc.py's recurrence (Y_j from Y_{j-1}, Y_{j-2}, y0, F0 —
    constant live state per stage, coefficients from a per-step SMEM
    table built by static_stage_tables).

Schedule — iteration m of grid (n_strips, nz + C + 1):

    load y0 plane m (prefetched at m-1)
    stage 1 at plane m-1:   F0 = f(y0), Y_1 = y0 + h*mu1*F0
    stage j at plane m-j:   Y_j = (1-mu-nu) y0 + mu Y_{j-1} + nu Y_{j-2}
                                  + h*mut*f(Y_{j-1}) + h*gt*F0   (j<=s)
                            Y_j = Y_{j-1}                        (j>s)
    output at plane m-C-1:  f1 = f(Y_C); est = .8(y0-ynew)+.4h(F0+f1)

Stage j's RHS consumes Y_{j-1} at planes p-1/p/p+1, computed earlier in
the same or previous iterations (ring depths: y0 C+3, F0 C+2, each Y_j 4).
The passthrough rows (j > s) make the pipeline depth static while the
per-step stage count s stays dynamic (SMEM scalar) — the recurrence
coefficients for j > s are never read.

Capacity: each RHS evaluation consumes one in-plane validity ring, and
s+1 evaluations (F0, F(Y_1..Y_{s-1}), f1) fit the P=8 halo exactly at
s <= C = 7, i.e. stability coverage h*rho <= 0.65*36 ~ 23 per pass.  The
adaptive driver hard-caps h there (h_limit, the 2-D fused-RKC contract,
ops/pallas_rkc.py): a stiffer grid costs more steps, each still ONE HBM
sweep — per-step traffic is (R/S amplification + 1) state reads/writes
independent of the stage count, vs ~5 sweeps per STAGE on XLA.

Gates (is_box3d_rkc_supported): box geometry, f32, profile-expressible
coefficients with closed z walls (the pallas_box3d contract), and a
model jac_bound for the spectral-radius bound. Reference context: the
reference is strictly 2-D explicit-ERK (src/FHNmodel_flat.cpp:489-566);
both the box surface and stabilized stepping are beyond-reference
capabilities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate import rkc
from crdmodel_tpu.ops.kernel_common import (
    freeze_scalar, lane_pad_width, prepare_constants)
from crdmodel_tpu.ops.pallas_box3d import _box_mode, _pick_strip
from crdmodel_tpu.ops.pallas_rkc import (S_MAX_KERNEL, FusedRKCStep,
                                         static_stage_tables)
from crdmodel_tpu.ops.pallas_step import HALO, VMEM_BUDGET

C_RKC = HALO - 1     # stage capacity: s + 1 evaluations <= P = HALO
DJ = 4               # per-stage Y_j ring depth (write at p+j, last read p+j+2)


def _rkc_ring_planes() -> int:
    """Resident (nvars, R, nxp) planes: y0 ring C+3, F0 ring C+2, one
    depth-DJ ring per stage, plus a margin for the compiler's stage
    temporaries (fy, yj, est)."""
    return (C_RKC + 3) + (C_RKC + 2) + DJ * C_RKC + 8


def _rkc_strip_target(nx: int, nvars: int, has_tissue: bool = False,
                      has_field: bool = False) -> int:
    nxp = lane_pad_width(nx, HALO)
    # tissue plane ring (obstacle scars) is nvars-independent: depth C+4
    # plus ~3 openness temporaries; the coefficient plane ring (full 3-D
    # fields) carries 3 face fields per slot plus recovery-roll temps
    tis = (C_RKC + 7) if has_tissue else 0
    fld = 0
    if has_field == "tensor":
        fld = 6 * (C_RKC + 4) + 8
    elif has_field:
        fld = 3 * (C_RKC + 4) + 3
    bytes_per_row = 4 * nxp * (nvars * _rkc_ring_planes() + tis + fld)
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * HALO) // 8 * 8))


def is_box3d_rkc_supported(problem, dtype) -> bool:
    cfg = problem.cfg
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return False   # free-form forcing needs the XLA path; structured
        # protocols run in-kernel with per-eval amplitudes at the true
        # Chebyshev stage times (round 5)
    if problem.geometry.kind != "box":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if problem.model.jac_bound is None and not cfg.just_diffusion:
        return False
    mode, _ = _box_mode(problem)
    if mode is None:
        return False
    has_tissue = getattr(problem, "obstacle_mask", None) is not None
    S = _pick_strip(cfg.ny, _rkc_strip_target(cfg.nx, problem.model.nvars,
                                              has_tissue,
                                              "tensor" if mode == "tensor"
                                              else mode == "field"))
    if S is None or not (S >= HALO or cfg.ny <= S):
        return False
    return True


def build_fused_box3d_rkc_step(problem, dtype=jnp.float32, rho_fn=None,
                               interpret: bool = False) -> FusedRKCStep:
    cfg = problem.cfg
    model = problem.model
    nvars = model.nvars
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)

    if rho_fn is None:
        from crdmodel_tpu.core.problem import make_rho_bound
        rho_fn = make_rho_bound(cfg, model, problem.geometry, dtype,
                                diffusion_field=problem.diffusion_field,
                                diffusion_tensor=problem.diffusion_tensor,
                                face_mask=problem.face_mask)

    C = C_RKC
    P = HALO
    has_tissue = getattr(problem, "obstacle_mask", None) is not None
    mode, mode_data = _box_mode(problem)
    if mode is None:
        raise ValueError("operator is neither profile-expressible nor a "
                         "closed-z 3-D field (is_box3d_rkc_supported "
                         "should have declined)")
    has_tensor = mode == "tensor"
    has_field = has_tensor or mode == "field"
    n_cfield = 6 if has_tensor else 3
    S = _pick_strip(ny, _rkc_strip_target(nx, nvars, has_tissue,
                                          "tensor" if has_tensor
                                          else mode == "field"))
    if S is None:
        raise ValueError(f"ny={ny} has no multiple-of-8 divisor in [8,256]")
    n_strips = ny // S
    R = S + 2 * P
    nxp = lane_pad_width(nx, P)
    DY = C + 3                 # y0 ring (+ prefetch slot)
    DF = C + 2                 # F0 ring
    DT = C + 4                 # tissue ring (f1 reads plane p+1 at m=p+C+2)
    DC = C + 4                 # coeff ring (drain reads aU at q-1 = m-C-2:
                               # DC=C+3 would let iteration m's prefetch of
                               # plane m+1 land on that very slot)

    def pad_cols(arr):
        out = jnp.concatenate([arr[..., -P:], arr, arr[..., :P]], axis=-1)
        fill = nxp - (nx + 2 * P)
        if fill:
            padw = [(0, 0)] * (out.ndim - 1) + [(0, fill)]
            out = jnp.pad(out, padw)
        return out

    def unpad_cols(arr):
        return arr[..., P:P + nx]

    kc = prepare_constants(problem, dtype, P, pad_cols, with_coeffs=False)
    b_is_field, has_freeze = kc.b_is_field, kc.has_freeze

    # structured forcing: per-EVAL amplitude rows at the true Chebyshev
    # stage times (eval e=0: F0 at t; e=j: stage j at t+c_{j-1}h;
    # e=s+1: f1 at t+h — static_stage_tables with_times), rank-1 row/col
    # profiles as wrapped constants, z profile in SMEM (round 5)
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    forcing = fused_forcing(problem)
    assert forcing is not False, "is_box3d_rkc_supported should have declined"
    n_stim = len(forcing.stimuli) if forcing else 0
    if n_stim:
        stim_vars = tuple(st.var for st in forcing.stimuli)
        rows_np, cols_np, z_np = [], [], []
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
            z_ = (np.ones(nz) if st.zprof is None
                  else np.asarray(st.zprof, np.float64).reshape(nz))
            z_np.append(z_)
        stim_rows = jnp.asarray(np.stack(rows_np), dtype)
        stim_cols = jnp.asarray(np.stack(cols_np)[:, None, :], dtype)
        stim_z = jnp.asarray(np.stack(z_np), dtype)
    else:
        stim_rows = jnp.zeros((1, 1, 1), dtype)
        stim_cols = jnp.zeros((1, 1, 1), dtype)
        stim_z = jnp.zeros((1, 1), dtype)
    amps0 = jnp.zeros((max(1, n_stim), C + 2), dtype)

    inv_xy = inv_xz = inv_yz = 0.0
    if has_field:
        # full-field faces: the ops/pallas_box3d.py coefficient plane
        # ring (aE, aN, aU streamed; aW/aS by in-window rolls, aD from
        # the ring's p-1 slot); tensor mode streams six fields
        # (+ Dxy, Dxz, Dyz — _box_tensor_fields)
        if has_tensor:
            stack6, (inv_xy, inv_xz, inv_yz) = mode_data
            fields = list(stack6)
        else:
            aE64f, aN64f, aU64f = mode_data
            fields = [aE64f, aN64f, aU64f]
        c64 = np.stack([np.concatenate([a[:, -P:], a, a[:, :P]], axis=1)
                        for a in fields])
        c_hbm = pad_cols(jnp.asarray(c64, dtype))  # (n_cfield,nz,ny+2P,nxp)
        ae_row = aw_row = jnp.zeros((1, nxp), dtype)
        an_col = as_col = jnp.zeros((ny + 2 * P, 1), dtype)
        au_z = ad_z = jnp.zeros((nz, 1), dtype)
    else:
        aE64, aW64, aN64, aS64, aU64, aD64 = mode_data
        ae_row = pad_cols(jnp.asarray(aE64, dtype).reshape(1, nx))
        aw_row = pad_cols(jnp.asarray(aW64, dtype).reshape(1, nx))

        def pad_rows(col64):
            c = np.asarray(col64, np.float64).reshape(ny, 1)
            return jnp.asarray(np.concatenate([c[-P:], c, c[:P]], axis=0),
                               dtype)

        an_col = pad_rows(aN64)
        as_col = pad_rows(aS64)
        au_z = jnp.asarray(aU64, dtype).reshape(nz, 1)
        ad_z = jnp.asarray(aD64, dtype).reshape(nz, 1)
        c_hbm = jnp.zeros((1, 1, 1, 1), dtype)      # unused placeholder

    if has_tissue:
        tis_np = np.broadcast_to(
            np.asarray(problem.obstacle_mask, bool),
            (nz, ny, nx)).astype(np.float32)
        tis_hbm = pad_cols(jnp.asarray(tis_np, dtype))
    else:
        tis_hbm = jnp.zeros((1, 1, 1), dtype)   # unused placeholder

    dvars = tuple(model.diffusive_vars)
    ratios = tuple(model.diffusion_ratios)

    # the coefficient/tissue stacks can reach hundreds of MB at volumetric
    # scale: pass them as RUNTIME params, never baked constants — closure
    # constants ride the compile request, which the axon tunnel rejects
    # above ~128 MB (HTTP 413; same lesson as kernel_common.build_coeff_hbm)
    if has_field:
        problem.params["_box3d_coeffs"] = c_hbm
    if has_tissue:
        problem.params["_box3d_tissue"] = tis_hbm

    def kernel(h_ref, fz_ref, ds_ref, s_ref, mu1_ref, ctab_ref,
               amps_ref, srow_ref, scol_ref, szp_ref,
               ae_ref, aw_ref, an_ref, as_ref, au_ref, ad_ref,
               b_ref, m_ref, cm_ref, y_hbm, t_hbm, c_hbm_ref,
               ynew_ref, ss_ref, y0v, sems, tv, tsems, cv, csems,
               f0v, *yv):
        i = pl.program_id(0)
        m = pl.program_id(1)
        row0 = pl.multiple_of(i * S, 8)

        # --- y0 plane DMAs (identical to ops/pallas_box3d.py) ---
        def plane_dmas(mm, slot, tslot):
            tops = pl.multiple_of((i * S - P) % ny, 8)
            bots = pl.multiple_of((i * S + S) % ny, 8)
            dmas = (
                pltpu.make_async_copy(
                    y_hbm.at[:, mm, pl.ds(tops, P), :],
                    y0v.at[slot, :, pl.ds(0, P), :], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    y_hbm.at[:, mm, pl.ds(row0, S), :],
                    y0v.at[slot, :, pl.ds(P, S), :], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    y_hbm.at[:, mm, pl.ds(bots, P), :],
                    y0v.at[slot, :, pl.ds(P + S, P), :], sems.at[slot, 2]),
            )
            if has_tissue:
                dmas += (
                    pltpu.make_async_copy(
                        t_hbm.at[mm, pl.ds(tops, P), :],
                        tv.at[tslot, pl.ds(0, P), :], tsems.at[tslot, 0]),
                    pltpu.make_async_copy(
                        t_hbm.at[mm, pl.ds(row0, S), :],
                        tv.at[tslot, pl.ds(P, S), :], tsems.at[tslot, 1]),
                    pltpu.make_async_copy(
                        t_hbm.at[mm, pl.ds(bots, P), :],
                        tv.at[tslot, pl.ds(P + S, P), :],
                        tsems.at[tslot, 2]),
                )
            if has_field:
                # DC == DT, so the tissue slot index doubles as the
                # coefficient ring slot; rows pre-padded at build — ONE
                # contiguous copy per plane
                dmas += (
                    pltpu.make_async_copy(
                        c_hbm_ref.at[:, mm, pl.ds(row0, R), :],
                        cv.at[tslot], csems.at[tslot, 0]),
                )
            return dmas

        dy = jnp.asarray(DY, m.dtype)
        dt = jnp.asarray(DT, m.dtype)

        @pl.when(m == 0)
        def _():
            for dma in plane_dmas(jnp.asarray(0, m.dtype), 0, 0):
                dma.start()

        @pl.when(m + 1 < nz)
        def _():
            for dma in plane_dmas(m + 1, lax.rem(m + 1, dy),
                                  lax.rem(m + 1, dt)):
                dma.start()

        @pl.when(m < nz)
        def _():
            for dma in plane_dmas(m, lax.rem(m, dy), lax.rem(m, dt)):
                dma.wait()

        h = h_ref[0, 0]
        ds = ds_ref[0, 0]
        s = s_ref[0, 0]
        mu1 = mu1_ref[0, 0]
        ae = ae_ref[:, :]
        aw = aw_ref[:, :]
        an = an_ref[pl.ds(row0, R), :]
        as_ = as_ref[pl.ds(row0, R), :]
        if b_is_field:
            b_rows = b_ref[pl.ds(row0, R), :]
        else:
            b_rows = b_ref[0, 0]
        if has_freeze:
            fz = fz_ref[0, 0]
            live_rows = 1.0 - fz * (1.0 - m_ref[pl.ds(row0, R), :])
        else:
            live_rows = None

        def clampz(p):
            return jnp.clip(p, 0, nz - 1)

        def y0_at(p):
            return y0v[lax.rem(clampz(p), dy)]

        def f0_at(p):
            return f0v[lax.rem(clampz(p), jnp.asarray(DF, m.dtype))]

        def yj_at(j, p):
            """Y_j at (clamped) plane p; Y_0 is the y0 ring."""
            if j == 0:
                return y0_at(p)
            return yv[j - 1][lax.rem(clampz(p), jnp.asarray(DJ, m.dtype))]

        def tis_at(p):
            return tv[lax.rem(clampz(p), dt)]

        def coeff_at(p):
            return cv[lax.rem(clampz(p), dt)]   # DC == DT

        def rhs_plane(get, p, e=0):
            """f(Y) at plane p: 7-point divergence stencil + kinetics on
            the plane triple get(p-1), get(p), get(p+1) — the
            ops/pallas_box3d.py stencil body (incl. its obstacle-openness
            recovery from the tissue plane ring and the full-field
            coefficient plane ring). e: the evaluation index selecting
            the forcing amplitude column (stage time)."""
            yc = get(p)
            yu = get(p + 1)
            yd = get(p - 1)
            au = au_ref[clampz(p), 0]
            ad = ad_ref[clampz(p), 0]
            mixed = None
            if has_field:
                cp = coeff_at(p)
                aeL = cp[0]
                awL = jnp.roll(cp[0], 1, -1)
                anL = cp[1]
                asL = jnp.roll(cp[1], 1, -2)
                auL = cp[2]
                # aD(p) = aU(p-1); zero at the p=0 wall (closed z gate)
                adL = jnp.where(p >= 1, coeff_at(p - 1)[2], 0.0)
                if has_tensor:
                    cpu_ = coeff_at(p + 1)
                    cpd_ = coeff_at(p - 1)
                    mixed = (cp[3], cp[4], cp[5],
                             cpu_[4], cpd_[4], cpu_[5], cpd_[5])
            elif has_tissue:
                tc = tis_at(p)
                aeL = ae * (tc * jnp.roll(tc, -1, -1))
                awL = aw * (tc * jnp.roll(tc, 1, -1))
                anL = an * (tc * jnp.roll(tc, -1, -2))
                asL = as_ * (tc * jnp.roll(tc, 1, -2))
                auL = au * (tc * tis_at(p + 1))
                adL = ad * (tc * tis_at(p - 1))
            else:
                aeL, awL, anL, asL, auL, adL = ae, aw, an, as_, au, ad
            laps = {}
            for idx, v in enumerate(dvars):
                u = yc[v]
                lap = (aeL * (jnp.roll(u, -1, -1) - u)
                       + awL * (jnp.roll(u, 1, -1) - u)
                       + anL * (jnp.roll(u, -1, -2) - u)
                       + asL * (jnp.roll(u, 1, -2) - u)
                       + auL * (yu[v] - u) + adL * (yd[v] - u))
                if mixed is not None:
                    # the centred mixed pairs, EXACTLY the XLA association
                    # (ops/stencil.py::anisotropic_laplacian3; see the
                    # ERK tensor branch in ops/pallas_box3d.py)
                    dxy, dxz, dyz, dxz_u, dxz_d, dyz_u, dyz_d = mixed
                    uu, ud = yu[v], yd[v]
                    dys = jnp.roll(u, -1, -2) - jnp.roll(u, 1, -2)
                    dxs = jnp.roll(u, -1, -1) - jnp.roll(u, 1, -1)
                    fa = dxy * dys
                    t_xy = (jnp.roll(fa, -1, -1) - jnp.roll(fa, 1, -1))
                    fb = dxy * dxs
                    t_xy = t_xy + (jnp.roll(fb, -1, -2)
                                   - jnp.roll(fb, 1, -2))
                    dzs = uu - ud
                    fa = dxz * dzs
                    t_xz = (jnp.roll(fa, -1, -1) - jnp.roll(fa, 1, -1))
                    fz_u = dxz_u * (jnp.roll(uu, -1, -1)
                                    - jnp.roll(uu, 1, -1))
                    fz_d = dxz_d * (jnp.roll(ud, -1, -1)
                                    - jnp.roll(ud, 1, -1))
                    t_xz = t_xz + (fz_u - fz_d)
                    fa = dyz * dzs
                    t_yz = (jnp.roll(fa, -1, -2) - jnp.roll(fa, 1, -2))
                    gz_u = dyz_u * (jnp.roll(uu, -1, -2)
                                    - jnp.roll(uu, 1, -2))
                    gz_d = dyz_d * (jnp.roll(ud, -1, -2)
                                    - jnp.roll(ud, 1, -2))
                    t_yz = t_yz + (gz_u - gz_d)
                    lap = ((lap + inv_xy * t_xy) + inv_xz * t_xz) \
                        + inv_yz * t_yz
                lap = ds * lap
                laps[v] = lap if ratios[idx] == 1.0 else ratios[idx] * lap
            if just_diffusion:
                ydot = jnp.stack([laps[v] if v in laps
                                  else jnp.zeros_like(yc[0])
                                  for v in range(nvars)])
            else:
                react = model.kinetics(yc, b_rows)
                ydot = jnp.stack([react[v] + laps[v] if v in laps
                                  else react[v] for v in range(nvars)])
            if n_stim:
                # amplitude at this eval's stage time x z(p) x row x col;
                # added BEFORE the freeze/tissue masks (XLA parity)
                ex = {}
                for jj in range(n_stim):
                    contrib = (amps_ref[jj, e] * szp_ref[jj, clampz(p)]
                               * srow_ref[jj, pl.ds(row0, R), :]
                               * scol_ref[jj, 0, :])
                    v2 = stim_vars[jj]
                    ex[v2] = ex[v2] + contrib if v2 in ex else contrib
                # static per-var restack (no scatter: Mosaic has no
                # scatter-add lowering)
                ydot = jnp.stack([ydot[v2] + ex[v2] if v2 in ex
                                  else ydot[v2] for v2 in range(nvars)])
            if live_rows is not None:
                ydot = ydot * live_rows
            if has_tissue:
                ydot = ydot * tis_at(p)
            return ydot

        # --- stage 1: F0 and Y_1 at plane m - 1 ---
        @pl.when((m >= 1) & (m <= nz))
        def _():
            p = m - 1
            f0 = rhs_plane(y0_at, p, 0)
            f0v[lax.rem(p, jnp.asarray(DF, m.dtype))] = f0
            yv[0][lax.rem(p, jnp.asarray(DJ, m.dtype))] = (
                y0_at(p) + (h * mu1) * f0)

        # --- stages j = 2..C at plane m - j (passthrough when j > s) ---
        for j in range(2, C + 1):
            @pl.when((m >= j) & (m <= nz - 1 + j))
            def _(j=j):
                p = m - j
                slot = lax.rem(p, jnp.asarray(DJ, m.dtype))

                @pl.when(j <= s)
                def _():
                    mu = ctab_ref[j, 0]
                    nu = ctab_ref[j, 1]
                    mut = ctab_ref[j, 2]
                    gt = ctab_ref[j, 3]
                    fy = rhs_plane(lambda q: yj_at(j - 1, q), p, j)
                    yv[j - 1][slot] = (
                        (1.0 - mu - nu) * y0_at(p)
                        + mu * yj_at(j - 1, p) + nu * yj_at(j - 2, p)
                        + (h * mut) * fy + (h * gt) * f0_at(p))

                @pl.when(j > s)
                def _():
                    yv[j - 1][slot] = yj_at(j - 1, p)

        # --- drain: f1, error estimate, output at plane q = m - C - 1 ---
        @pl.when(m >= C + 1)
        def _():
            q = m - (C + 1)
            f1 = rhs_plane(lambda p: yj_at(C, p), q, s + 1)
            y0q = y0_at(q)
            ynew = yj_at(C, q)
            est = 0.8 * (y0q - ynew) + (0.4 * h) * (f0_at(q) + f1)

            z = ynew[:, P:P + S, :]
            jcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, nxp), 2)
            zl = jnp.roll(z, -nx, axis=-1)
            zr = jnp.roll(z, nx, axis=-1)
            z = jnp.where(jcol < P, zl, jnp.where(jcol >= P + nx, zr, z))
            ynew_ref[:, 0, :, :] = z

            yc = y0q[:, P:P + S, :]
            w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
            scaled = est[:, P:P + S, :] * w
            val = jnp.sum(scaled * scaled)
            ss_ref[i, 0] = jnp.where(m == C + 1, val, ss_ref[i, 0] + val)

    smem_scalar = pl.BlockSpec((1, 1), lambda i, m: (0, 0),
                               memory_space=pltpu.SMEM)
    vmem_const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, m: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips, nz + C + 1),
        in_specs=[
            smem_scalar, smem_scalar, smem_scalar,       # h, fz, ds
            pl.BlockSpec((1, 1), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),       # s (int32)
            smem_scalar,                                 # mu1
            pl.BlockSpec((S_MAX_KERNEL + 1, 4), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),       # ctab rows
            pl.BlockSpec(amps0.shape, lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),       # per-eval amps
            vmem_const(stim_rows.shape),                 # stimulus rows
            vmem_const(stim_cols.shape),                 # stimulus cols
            pl.BlockSpec(stim_z.shape, lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),       # stimulus z prof
            vmem_const((1, nxp)),                        # ae
            vmem_const((1, nxp)),                        # aw
            vmem_const((ny + 2 * P, 1)),                 # an
            vmem_const((ny + 2 * P, 1)),                 # as
            pl.BlockSpec((nz, 1), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),       # au
            pl.BlockSpec((nz, 1), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),       # ad
            vmem_const(kc.b_pad.shape),                  # beta
            vmem_const(kc.m_pad.shape),                  # interior mask
            vmem_const((1, nxp)),                        # error column mask
            pl.BlockSpec(memory_space=pltpu.HBM),        # y stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),        # tissue (or stub)
            pl.BlockSpec(memory_space=pltpu.HBM),        # coeff (or stub)
        ],
        out_specs=[
            pl.BlockSpec((nvars, 1, S, nxp),
                         lambda i, m: (0, jnp.maximum(m - (C + 1), 0), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # (n_strips, 1)
        ],
        scratch_shapes=[
            pltpu.VMEM((DY, nvars, R, nxp), dtype),
            pltpu.SemaphoreType.DMA((DY, 3)),
            pltpu.VMEM((DT, R, nxp) if has_tissue else (1, 1, 1), dtype),
            pltpu.SemaphoreType.DMA((DT, 3) if has_tissue else (1, 3)),
            pltpu.VMEM((DC, n_cfield, R, nxp) if has_field
                       else (1, 1, 1, 1), dtype),
            pltpu.SemaphoreType.DMA((DC, 1) if has_field else (1, 1)),
            pltpu.VMEM((DF, nvars, R, nxp), dtype),
        ] + [pltpu.VMEM((DJ, nvars, R, nxp), dtype) for _ in range(C)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nvars, nz, ny, nxp), dtype),
            jax.ShapeDtypeStruct((n_strips, 1), dtype),
        ],
        interpret=interpret,
    )

    s_cap = C
    mu1_tab, ctab_tab, ctimes_tab = static_stage_tables(
        s_cap, dtype, with_times=True)
    ctimes_tab = ctimes_tab[:, :s_cap + 2]
    one = jnp.ones((1, 1), dtype)

    def step_err(t, yp, h, params, carry=()):
        rho = rho_fn(t, unpad_cols(yp), params).astype(dtype)
        s = jnp.minimum(rkc.choose_stages(h, rho),
                        jnp.asarray(s_cap, jnp.int32))
        mu1 = mu1_tab[s]
        ctab = jax.lax.dynamic_index_in_dim(ctab_tab, s, 0, keepdims=False)
        if n_stim:
            seg = params.get("_seg_end") if isinstance(params, dict) else None
            ctv = jax.lax.dynamic_index_in_dim(ctimes_tab, s, 0,
                                               keepdims=False)
            times = (t + ctv * h).astype(dtype)
            arows = []
            for st in forcing.stimuli:
                if getattr(st.waveform, "segment_gated", False):
                    a_ = jnp.asarray(st.waveform(t, seg_end=seg), dtype)
                    arows.append(jnp.broadcast_to(a_, times.shape))
                else:
                    arows.append(jnp.asarray(st.waveform(times), dtype))
            amps = jnp.stack(arows)
        else:
            amps = amps0
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        s_s = jnp.reshape(s, (1, 1))
        mu1_s = jnp.reshape(mu1, (1, 1))
        b_in = kc.b_pad
        ds_s = one
        if isinstance(params, dict):
            if "_fused_b" in params:
                b_in = params["_fused_b"].astype(dtype)
            if "dscale" in params:
                ds_s = jnp.reshape(params["dscale"].astype(dtype), (1, 1))
        th = tis_hbm
        ch = c_hbm
        if isinstance(params, dict):
            th = params.get("_box3d_tissue", th)
            ch = params.get("_box3d_coeffs", ch)
        ynew, ss = call(h_s, fz_s, ds_s, s_s, mu1_s, ctab,
                        amps, stim_rows, stim_cols, stim_z,
                        ae_row, aw_row, an_col, as_col, au_z, ad_z,
                        b_in, kc.m_pad, kc.col_mask, yp, th, ch)
        return ynew, jnp.sum(ss), ()

    def h_limit(t, yp, params):
        """Largest h the kernel's stage budget stabilizes (the 2-D fused
        RKC contract, ops/pallas_rkc.py::h_limit)."""
        rho = rho_fn(t, unpad_cols(yp), params).astype(dtype)
        return (rkc.STAB_FACTOR * (s_cap - 1) ** 2
                / jnp.maximum(rho, 1e-30)).astype(dtype)

    return FusedRKCStep(step_err=step_err, h_limit=h_limit,
                        pad=pad_cols, unpad=unpad_cols, nxp=nxp)
