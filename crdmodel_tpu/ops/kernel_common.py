"""Shared pieces of the fused Pallas kernels.

Five kernels (ops/pallas_step.py, pallas_kstep.py, pallas_rkc.py,
pallas_shard_step.py, pallas_shard_rkc.py) share the same per-strip RHS
body, constant-array preparation (stencil coefficient profiles, beta field,
freeze mask, error column mask), lane padding arithmetic, and the
per-segment freeze scalar. This module is that common core; each kernel
keeps only its integration scheme and DMA schedule.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lane_pad_width(n_phys: int, p: int) -> int:
    """Padded lane width: [p halo | n_phys | p halo | fill to 128-multiple]."""
    return ((n_phys + 2 * p + 127) // 128) * 128


def needs_divform(problem) -> bool:
    """True when the diffusion operator only exists in the general
    divergence (face-coefficient) form — coefficients the 3-profile
    kernels cannot express: masked faces (no-flux boundaries / obstacle
    walls, grid.py::face_openness), full (ny, nx) diffusion fields, or
    any diffusion field on the flat surface (only torus/revolution have
    the profile remap of kernel_stencil_coeffs). These route to the
    generic divergence fused kernel (ops/pallas_divform.py, ERK methods)
    or the XLA divergence path (core/problem.py::make_rhs); the profile
    kernels' is_*_supported gates must decline them."""
    if problem.diffusion_tensor is not None:
        return False            # the 9-point aniso kernel's territory
    if getattr(problem.cfg, "pole_coarsen", 0):
        # reduced-grid operator is XLA-only BY ARCHITECTURE, not policy:
        # the Galerkin band term couples rows up to 2g away with pole
        # group sizes up to ny/6 (g=128 at the 384-mesh sphere) — far
        # beyond any feasible strip halo — and it must be evaluated
        # INSIDE every RK/Chebyshev stage, so no pre/post pass around a
        # fused step can be exact. The dense-matmul route prices at
        # ~3.2 GFLOP/eval (>= 10x the measured band cost at f32-true MXU
        # throughput; DEFAULT precision loses the second differences).
        # The XLA band path is instead optimised directly — measured
        # decomposition + numbers in PERF_NOTES round-5 "sphere band
        # path".
        return False
    if getattr(problem, "face_mask", None) is not None:
        return True
    df = problem.diffusion_field
    if df is None:
        return False
    if problem.geometry.kind not in ("torus", "revolution"):
        return True
    return np.ndim(df) > 1


def fused_forcing(problem):
    """The structured forcing the ERK step kernels evaluate in-kernel
    (core/forcing.py::SeparableForcing, all stimuli rank-1): returns the
    forcing, or None when the problem has none, or False when a forcing
    exists but is not kernel-consumable (free-form callable / full 2-D
    spatial) — callers decline to the XLA path on False."""
    f = problem.forcing
    if f is None:
        return None
    from crdmodel_tpu.core.forcing import SeparableForcing
    if isinstance(f, SeparableForcing) and f.separable:
        if (problem.geometry.kind != "box"
                and any(st.zprof is not None for st in f.stimuli)):
            return False   # zprof is a box-only axis (core/forcing.py)
        return f
    return False


def stage_amplitudes(forcing, t, h, c_nodes, params, dtype):
    """(n_stim, n_stages) per-stage forcing amplitudes at true stage times
    t + c_s h — segment-gated waveforms (pulse trains) receive
    params['_seg_end'] instead, making the amplitude constant per segment
    (core/forcing.py::pulse_train docstring)."""
    seg = params.get("_seg_end") if isinstance(params, dict) else None
    rows = []
    for st in forcing.stimuli:
        gated = seg is not None and getattr(st.waveform, "segment_gated",
                                            False)
        rows.append(jnp.stack([
            jnp.asarray(st.waveform(t + cs * h, seg_end=seg) if gated
                        else st.waveform(t + cs * h), dtype)
            for cs in c_nodes]))
    return jnp.stack(rows)


def coeff_kind(geometry_kind: str) -> str:
    """The kernels' coefficient layout for a geometry kind.

    "torus" = x-profile coefficients (three (nx,) rows in VMEM); "flat" =
    scalars in SMEM. Surfaces of revolution (core/grid.py::
    RevolutionGeometry) use the SAME x-profile layout — their conservative
    face form maps exactly onto the kernels' 3-profile structure via
    kernel_stencil_coeffs, with capped (sphere-like) surfaces carrying
    zero end-face coefficients so the kernels' periodic wrap in x leaks
    nothing (zero-multiplied halo values, like obstacle walls)."""
    return "torus" if geometry_kind in ("torus", "revolution") else geometry_kind


def make_rhs_block(kind: str, model, just_diffusion: bool):
    """Per-strip RHS: rhs_block(yb, stencil, b_rows, live_rows) -> ydot.

    yb: (nvars, R, nxp) resident strip. stencil: the three coefficient
    values/rows already read from refs (torus: (1, nxp) profiles; flat:
    scalars). live_rows: None or a (R, 1) row mask applying the absorbing
    boundary freeze. Identical math to the XLA path (ops/stencil.py and
    problem.py::make_rhs diffusion_terms): per-variable diffusion via
    model.diffusive_vars/diffusion_ratios (the reference models diffuse
    var 0 only, SURVEY.md C5/C6; Gray-Scott diffuses both species).
    """
    nvars = model.nvars
    dvars = tuple(model.diffusive_vars)
    ratios = tuple(model.diffusion_ratios)

    def lap_of(u, stencil):
        ue = jnp.roll(u, -1, axis=-1)
        uw = jnp.roll(u, 1, axis=-1)
        un = jnp.roll(u, -1, axis=-2)
        us = jnp.roll(u, 1, axis=-2)
        if kind == "torus":
            ca, ct, cphi = stencil
            return (ca * (ue - uw) + ct * (ue - 2.0 * u + uw)
                    + cphi * (un - 2.0 * u + us))
        cu1, cu2, cu3 = stencil
        return cu1 * (uw + ue) + cu2 * (us + un) + cu3 * u

    def rhs_block(yb, stencil, b_rows, live_rows, extra=None):
        """extra: optional {var: array} forcing contributions, added to the
        diffusion term BEFORE kinetics (matching the XLA association order
        `kinetics + (diff + forcing)`, core/problem.py::make_rhs — and the
        live_rows mask is 0/1, so masking the sum equals masking the parts
        bitwise)."""
        laps = {}
        for idx, v in enumerate(dvars):
            lap = lap_of(yb[v], stencil)
            laps[v] = lap if ratios[idx] == 1.0 else ratios[idx] * lap
        if extra:
            for v, add in extra.items():
                laps[v] = laps[v] + add if v in laps else add
        if just_diffusion:
            ydot = jnp.stack([laps[v] if v in laps else jnp.zeros_like(yb[0])
                              for v in range(nvars)])
        else:
            react = model.kinetics(yb, b_rows)
            # gather-free per-var assembly (Mosaic has no scatter-add)
            ydot = jnp.stack([react[v] + laps[v] if v in laps else react[v]
                              for v in range(nvars)])
        if live_rows is not None:
            ydot = ydot * live_rows
        return ydot

    return rhs_block


def make_divform_rhs_block(model, just_diffusion: bool):
    """Per-strip RHS for the GENERAL divergence-form operator
    (ops/pallas_divform.py and the divform branch of ops/pallas_rkc.py):

        rhs_block(yb, faces, tis, ds, b_rows, live_rows) -> ydot

    faces = (ae, aw, an, as_) — (R, nxp) face-coefficient strip windows
    (as_ recovered by the caller's row roll of an); tis = None or a 0/1
    tissue window multiplying ydot (obstacle scars, == the XLA path's
    jnp.where); ds = scalar diffusion rescale (sweeps). Same difference
    grouping as ops/stencil.py::divergence_laplacian."""
    nvars = model.nvars
    dvars = tuple(model.diffusive_vars)
    ratios = tuple(model.diffusion_ratios)

    def div_lap(u, faces, ds):
        ae, aw, an, as_ = faces
        ue = jnp.roll(u, -1, axis=-1)
        uw = jnp.roll(u, 1, axis=-1)
        un = jnp.roll(u, -1, axis=-2)
        us = jnp.roll(u, 1, axis=-2)
        lap = (ae * (ue - u) + aw * (uw - u)
               + an * (un - u) + as_ * (us - u))
        # ds=None skips the rescale entirely (pallas_rkc's divform branch:
        # rkc2 sweeps never carry dscale, and a captured traced scalar is
        # not a legal Pallas kernel constant)
        return lap if ds is None else ds * lap

    def rhs_block(yb, faces, tis, ds, b_rows, live_rows, extra=None,
                  mixed=None):
        laps = {}
        for idx, v in enumerate(dvars):
            if mixed is None:
                lap = div_lap(yb[v], faces, ds)
            else:
                # 2-D anisotropic 9-point operator: axis part + the
                # symmetric centred mixed pair, EXACTLY the XLA
                # association (ops/stencil.py::anisotropic_laplacian:
                # axis + inv4*(t1+t2), ds applied to the total like the
                # XLA path's dscale)
                dxy_w, inv4 = mixed
                u = yb[v]
                lap = div_lap(u, faces, None)
                dys = jnp.roll(u, -1, -2) - jnp.roll(u, 1, -2)
                fx = dxy_w * dys
                t1 = jnp.roll(fx, -1, -1) - jnp.roll(fx, 1, -1)
                dxs = jnp.roll(u, -1, -1) - jnp.roll(u, 1, -1)
                fy = dxy_w * dxs
                t2 = jnp.roll(fy, -1, -2) - jnp.roll(fy, 1, -2)
                lap = lap + inv4 * (t1 + t2)
                if ds is not None:
                    lap = ds * lap
            laps[v] = lap if ratios[idx] == 1.0 else ratios[idx] * lap
        if extra:
            # forcing joins the diffusion term (XLA association order; the
            # dscale rescale does NOT touch it, matching make_rhs)
            for v, add in extra.items():
                laps[v] = laps[v] + add if v in laps else add
        if just_diffusion:
            ydot = jnp.stack([laps[v] if v in laps else jnp.zeros_like(yb[0])
                              for v in range(nvars)])
        else:
            react = model.kinetics(yb, b_rows)
            ydot = jnp.stack([react[v] + laps[v] if v in laps else react[v]
                              for v in range(nvars)])
        if live_rows is not None:
            ydot = ydot * live_rows
        if tis is not None:
            ydot = ydot * tis
        return ydot

    return rhs_block


def build_coeff_hbm(fields, p_col, nx, nxp, dtype):
    """Stack (ny, nx) f64 coefficient fields into ONE (n_coeff, ny, nxp)
    array living in HBM: p_col wrapped halo columns + zero fill, no row
    duplication. The kernels DMA per-strip row windows out of it at run
    time with the same wrapped-row schedule as the state
    (load_wrap_strips), so — unlike prebuilt (n_strips, R, nxp) windows —
    there is no (R/S)x storage amplification and, passed as a RUNTIME
    input (params['_divform_coeffs']), no giant baked constant: closure
    constants ride the compile request, which the axon tunnel serves at
    ~0.5 MB/s and rejects outright above ~128 MB (HTTP 413, measured
    2026-08-19 — docs/PERF_NOTES.md 'fused divergence-form kernel')."""
    rows = []
    for f in fields:
        ap = np.asarray(f, np.float64)
        ap = np.concatenate([ap[:, -p_col:], ap, ap[:, :p_col]], axis=1)
        fill = nxp - (ap.shape[1])
        if fill:
            ap = np.concatenate(
                [ap, np.zeros((ap.shape[0], fill), ap.dtype)], axis=1)
        rows.append(ap)
    return jnp.asarray(np.stack(rows), dtype)


def build_strip_windows(arr2d, n_strips, S, p_row, p_col, nx, nxp, dtype):
    """(ny, nx) f64 field -> (n_strips, R, nxp) per-strip halo windows
    (R = S + 2*p_row): p_col wrapped halo columns + zero fill to nxp, and
    p_row wrapped halo rows around each strip — the coefficient-window
    layout the divergence/anisotropic kernels pipeline via BlockSpecs
    (the state's lane layout uses the kernel's column pad p_col, which
    may differ from the row halo depth p_row — pallas_rkc's P_COL=24 vs
    its P_LADDER row variants)."""
    ap = np.asarray(arr2d, np.float64)
    ap = np.concatenate([ap[:, -p_col:], ap, ap[:, :p_col]], axis=1)
    fill = nxp - (nx + 2 * p_col)
    if fill:
        ap = np.concatenate(
            [ap, np.zeros((ap.shape[0], fill), ap.dtype)], axis=1)
    rows = np.concatenate([ap[-p_row:], ap, ap[:p_row]], axis=0)
    R = S + 2 * p_row
    return jnp.asarray(
        np.stack([rows[i * S:i * S + R] for i in range(n_strips)]), dtype)


def make_split_block(kind: str, model, just_diffusion: bool):
    """Per-strip explicit/implicit RHS split for the fused IMEX kernel
    (ops/pallas_imex.py), mirroring problem.py::make_rhs(split=True):
    ex_block = masked diffusion, im_block = masked pointwise kinetics,
    ex + im == make_rhs_block's composed value bitwise."""
    nvars = model.nvars
    full = make_rhs_block(kind, model, just_diffusion=True)

    def ex_block(yb, stencil, live_rows, extra=None):
        # the just_diffusion rhs_block IS the diffusion part; structured
        # forcing joins it (the XLA split's rhs_ex = diffusion + forcing,
        # core/problem.py:505-510 — freeze-masked inside like every term)
        return full(yb, stencil, None, live_rows, extra=extra)

    def im_block(yb, b_rows, live_rows):
        if just_diffusion:
            return jnp.zeros_like(yb)
        react = model.kinetics(yb, b_rows)
        ydot = jnp.stack([react[v] for v in range(nvars)])
        if live_rows is not None:
            ydot = ydot * live_rows
        return ydot

    return ex_block, im_block


def kernel_stencil_coeffs(problem, dtype):
    """The 3 coefficient profiles the kernels consume.

    Constant D: geometry.stencil_coeffs, bitwise-pinned to the XLA path.
    Theta-only diffusion field (coupling="curvature" etc., torus geometry —
    the eligibility gates guarantee ndim<=1): the conservative face form
    maps EXACTLY (in real arithmetic) onto the same 3-profile structure,

        aE(uE-u) + aW(uW-u) + aN(uN-2u+uS)
          == ca(uE-uW) + ct(uE-2u+uW) + aN(uN-2u+uS)
        with ca=(aE-aW)/2, ct=(aE+aW)/2   (aN==aS for theta-only D),

    so the fused kernels run field diffusion with no kernel changes. The
    regrouped form matches the XLA divergence path to rounding (f32
    equivalence, like the documented fused-vs-XLA drift) rather than
    bitwise, and its mass conservation telescopes only in exact arithmetic
    — exact-conservation runs should set use_pallas=False
    (docs/ARCHITECTURE.md 8d).
    """
    geometry = problem.geometry
    if problem.diffusion_field is None:
        return geometry.stencil_coeffs(dtype)
    aE, aW, aN, aS = geometry.divergence_coeffs64(problem.diffusion_field)
    assert aE.ndim == 1, "kernels support theta-only diffusion fields"
    return (jnp.asarray(0.5 * (aE - aW), dtype),
            jnp.asarray(0.5 * (aE + aW), dtype),
            jnp.asarray(aN, dtype))


@dataclasses.dataclass(frozen=True)
class KernelConstants:
    """Trace-time constant kernel inputs + their BlockSpecs (single-chip:
    built once from the problem; sharded kernels build the equivalents per
    dispatch from sharded params instead — see prepare_params there)."""
    c0: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    coeff_spec: pl.BlockSpec
    b_pad: jnp.ndarray
    m_pad: jnp.ndarray
    col_mask: jnp.ndarray
    b_is_field: bool
    has_freeze: bool


def prepare_constants(problem, dtype, p: int, pad_cols,
                      with_coeffs: bool = True) -> KernelConstants:
    """Stencil coefficient profiles (lane-padded for the torus metric),
    the beta field and interior mask (row-padded by p with periodic wrap),
    and the physical-lane error mask. with_coeffs=False skips the
    3-profile coefficient build (kernels that carry their own coefficient
    layout — pallas_aniso reads tensor_coeffs64, pallas_divform full face
    fields — and only want the beta/mask/col-mask plumbing)."""
    cfg = problem.cfg
    geometry = problem.geometry
    kind = coeff_kind(geometry.kind)
    ny, nx = cfg.ny, cfg.nx
    nxp = lane_pad_width(nx, p)

    if not with_coeffs:
        c0 = c1 = c2 = None
        coeff_spec = None
    elif kind == "torus":
        coeffs = kernel_stencil_coeffs(problem, dtype)
        c0 = pad_cols(jnp.asarray(coeffs[0]).reshape(1, nx))
        c1 = pad_cols(jnp.asarray(coeffs[1]).reshape(1, nx))
        c2 = pad_cols(jnp.asarray(coeffs[2]).reshape(1, nx))
        coeff_spec = pl.BlockSpec((1, nxp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        coeffs = kernel_stencil_coeffs(problem, dtype)
        c0 = jnp.reshape(coeffs[0].astype(dtype), (1, 1))
        c1 = jnp.reshape(coeffs[1].astype(dtype), (1, 1))
        c2 = jnp.reshape(coeffs[2].astype(dtype), (1, 1))
        coeff_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)

    from crdmodel_tpu.core.problem import beta_field
    b_arr = beta_field(cfg, dtype)
    b_is_field = getattr(b_arr, "ndim", 0) == 2
    if b_is_field:
        b_np = np.asarray(b_arr)
        b_pad = jnp.asarray(
            np.concatenate([b_np[-p:], b_np, b_np[:p]], axis=0), dtype)
    else:
        b_pad = jnp.full((1, 1), float(b_arr), dtype)

    has_freeze = (float(cfg.t_boundary) > 0.0) and not cfg.just_diffusion
    interior = np.ones((ny, 1), dtype=np.float32)
    interior[0, 0] = 0.0
    interior[-1, 0] = 0.0
    m_pad = jnp.asarray(
        np.concatenate([interior[-p:], interior, interior[:p]], axis=0),
        dtype)

    col_mask_np = np.zeros((1, nxp), dtype=np.float32)
    col_mask_np[0, p:p + nx] = 1.0
    col_mask = jnp.asarray(col_mask_np, dtype)

    return KernelConstants(c0=c0, c1=c1, c2=c2, coeff_spec=coeff_spec,
                           b_pad=b_pad, m_pad=m_pad, col_mask=col_mask,
                           b_is_field=b_is_field, has_freeze=has_freeze)


def load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips, i, block=None):
    """The single-chip kernels' shared input schedule: double-buffered
    scratch, three wrapped-row DMAs per strip (top halo | body | bottom
    halo), program i prefetching strip i+1 while computing strip i. All
    offsets are multiples of 8 (S, P, ny are). The wrap windows
    [iS-P, iS) / [iS+S, iS+S+P) are contiguous only when S >= P or
    n_strips == 1 — callers' is_supported must guarantee it. Returns the
    scratch slot holding strip i (resident rows [iS-P, iS+S+P) mod ny).

    block: for the column-blocked layout (nvars, nb, ny, Wp)
    (pallas_rkc.py::choose_blocking) — the block index whose rows to
    copy; None = the plain (nvars, ny, nxp) layout."""

    def src(r0, rows):
        if block is None:
            return y_hbm.at[:, pl.ds(r0, rows), :]
        return y_hbm.at[:, block, pl.ds(r0, rows), :]

    def strip_dmas(strip, slot):
        r0 = pl.multiple_of(strip * S, 8)
        tops = pl.multiple_of((r0 - P) % ny, 8)
        bots = pl.multiple_of((r0 + S) % ny, 8)
        return (
            pltpu.make_async_copy(
                src(tops, P),
                yv.at[slot, :, pl.ds(0, P), :], sems.at[slot, 0]),
            pltpu.make_async_copy(
                src(r0, S),
                yv.at[slot, :, pl.ds(P, S), :], sems.at[slot, 1]),
            pltpu.make_async_copy(
                src(bots, P),
                yv.at[slot, :, pl.ds(P + S, P), :], sems.at[slot, 2]),
        )

    two = jnp.asarray(2, i.dtype)   # x64-safe under the interpreter
    slot = jax.lax.rem(i, two)
    nslot = jax.lax.rem(i + jnp.asarray(1, i.dtype), two)

    @pl.when(i == 0)
    def _():
        for dma in strip_dmas(0, 0):
            dma.start()

    @pl.when(i + 1 < n_strips)
    def _():
        for dma in strip_dmas(i + 1, nslot):
            dma.start()

    for dma in strip_dmas(i, slot):
        dma.wait()
    return slot


def load_edge_strips(y_hbm, yv, sems, nyl, S, P, n_strips, i,
                     lo_ref, hi_ref):
    """The sharded kernels' shared input schedule: strip rows [iS-P,
    iS+S+P) of the LOCAL block are contiguous in HBM (no wrap); the
    first/last P halo rows at the block edges come instead from the thin
    ppermuted row inputs lo_ref/hi_ref (immediate vector copies). Requires
    S >= P (strip windows must not cross both edges). Returns the scratch
    slot holding strip i."""

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
                yv.at[slot, :, pl.ds(0, P), :], sems.at[slot, 0]).start()

        pltpu.make_async_copy(
            y_hbm.at[:, pl.ds(r0s, S), :],
            yv.at[slot, :, pl.ds(P, S), :], sems.at[slot, 1]).start()

        @pl.when(strip == n_strips - 1)
        def _():
            yv[slot, :, P + S:S + 2 * P, :] = hi_ref[:, :, :]

        @pl.when(strip < n_strips - 1)
        def _():
            bot0 = pl.multiple_of(jnp.minimum(r0s + S, max(nyl - P, 0)), 8)
            pltpu.make_async_copy(
                y_hbm.at[:, pl.ds(bot0, P), :],
                yv.at[slot, :, pl.ds(P + S, P), :], sems.at[slot, 2]).start()

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
                yv.at[slot, :, pl.ds(P + S, P), :], sems.at[slot, 2]).wait()

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
    return slot


def make_shard_halo_helpers(kind, nyl, nxl, P, nxp, dtype,
                            b_is_field, has_freeze, axis_y, axis_x,
                            pad_spec=None):
    """(pad, unpad, splice_inputs, prepare_params) shared by the sharded
    kernels — the v3 splice transport (thin ppermute strips + in-kernel
    column splice; design/traffic rationale in ops/pallas_shard_step.py's
    module docstring). splice_inputs and prepare_params must run INSIDE
    shard_map over (axis_y, axis_x).

    pad_spec (uneven grid, parallel/padding.py): the kernels run MIRROR-pad
    semantics — pad cells evolve as live bitwise copies of their wrapped
    physical sources (the wrap-filled parameter arrays give them identical
    coefficients/beta/freeze values, so identical arithmetic), making every
    interior array position consistent with the n-periodic extension of the
    physical field. Only the two array-edge halo strips per axis need
    repair (parallel/halo.py::mirror_edges), and the error partial sums
    are masked to physical cells in-kernel via the runtime inputs
    `_fused_vrow`/`_fused_cmask` built here. This differs deliberately
    from the XLA padded path (pads frozen + RHS-masked): physical
    trajectories and error norms match; only the never-observed pad
    contents differ (drivers re-derive pads from the physical field when
    crossing paths — io/checkpoint resume, parallel/sharded.py)."""
    from jax import lax

    from crdmodel_tpu.parallel.halo import (_shift_from_next,
                                            _shift_from_prev,
                                            halo_pad_cols, halo_pad_rows,
                                            mirror_edges)
    fill = nxp - (nxl + 2 * P)
    pady = pad_spec is not None and pad_spec.y.active
    padx = pad_spec is not None and pad_spec.x.active

    def pad(y_local):
        return jnp.pad(y_local, ((0, 0), (0, 0), (P, nxp - nxl - P)))

    def unpad(yp):
        return yp[..., P:P + nxl]

    def _row_edges(u):
        """(lo, hi) width-P row halo strips of u (rows = local block rows),
        mirror-corrected at the array wrap when y is padded."""
        ring_lo = _shift_from_prev(u[..., -P:, :], axis_y)
        ring_hi = _shift_from_next(u[..., :P, :], axis_y)
        if not pady:
            return ring_lo, ring_hi
        return mirror_edges(lambda lo, L: u[..., lo:lo + L, :],
                            ring_lo, ring_hi, axis_y, P,
                            pad_spec.y.n, pad_spec.y.blk, axis=-2)

    def _row_pad(u):
        lo, hi = _row_edges(u)
        return jnp.concatenate([lo, u, hi], axis=-2)

    def splice_inputs(yp):
        ring_w = _shift_from_prev(
            lax.slice_in_dim(yp, nxl, P + nxl, axis=2), axis_x)
        ring_e = _shift_from_next(
            lax.slice_in_dim(yp, P, 2 * P, axis=2), axis_x)
        if padx:
            # local col c lives at lane P + c of the lane-padded block
            w_cols, e_cols = mirror_edges(
                lambda lo, L: lax.slice_in_dim(yp, P + lo, P + lo + L,
                                               axis=2),
                ring_w, ring_e, axis_x, P,
                pad_spec.x.n, pad_spec.x.blk, axis=-1)
        else:
            w_cols, e_cols = ring_w, ring_e
        w_ext = _row_pad(w_cols)
        e_ext = _row_pad(e_cols)
        lo_rows, hi_rows = _row_edges(yp)
        return w_ext, e_ext, lo_rows, hi_rows

    def _halo_rows(arr2d):
        """(nyl, k) -> (nyl + 2P, k) row halo pad (mirror-aware)."""
        if not pady:
            return halo_pad_rows(arr2d, axis_y, P)
        lo, hi = _row_edges(arr2d)
        return jnp.concatenate([lo, arr2d, hi], axis=-2)

    def _halo_cols(prof):
        """(1, nxl) -> (1, nxl + 2P) column halo pad (mirror-aware)."""
        if not padx:
            return halo_pad_cols(prof, axis_x, P)
        ring_lo = _shift_from_prev(prof[..., -P:], axis_x)
        ring_hi = _shift_from_next(prof[..., :P], axis_x)
        lo, hi = mirror_edges(lambda lo_i, L: prof[..., lo_i:lo_i + L],
                              ring_lo, ring_hi, axis_x, P,
                              pad_spec.x.n, pad_spec.x.blk, axis=-1)
        return jnp.concatenate([lo, prof, hi], axis=-1)

    def prepare_params(params):
        out = dict(params)
        coeffs = params["coeffs"]
        if len(coeffs) == 4:
            # divergence face form (theta-only diffusion field): map onto
            # the 3-profile torus structure (see kernel_stencil_coeffs);
            # pointwise on the local slices, so valid inside shard_map
            aE, aW, aN, _aS = coeffs
            coeffs = (0.5 * (aE - aW), 0.5 * (aE + aW), aN)
        if "dscale" in params:
            # per-member diffusion override (sweep.py): the laplacian is
            # linear in the coefficients, so scaling the kernel's runtime
            # coefficient inputs mirrors the XLA rhs's params["dscale"]
            # exactly (same contract as ops/pallas_step.py::step_err)
            ds = jnp.asarray(params["dscale"], dtype)
            coeffs = tuple(ds * jnp.asarray(c, dtype) for c in coeffs)
        if kind == "torus":
            cs = []
            for c in coeffs:
                prof = jnp.asarray(c, dtype).reshape(1, nxl)
                prof = _halo_cols(prof)
                if fill:
                    prof = jnp.pad(prof, ((0, 0), (0, fill)))
                cs.append(prof)
            out["_fused_coeffs"] = tuple(cs)
        else:
            out["_fused_coeffs"] = tuple(
                jnp.reshape(jnp.asarray(c, dtype), (1, 1)) for c in coeffs)
        b = params["b"]
        if b_is_field:
            out["_fused_b"] = _halo_rows(
                jnp.asarray(b, dtype).reshape(nyl, 1))
        else:
            out["_fused_b"] = jnp.reshape(jnp.asarray(b, dtype), (1, 1))
        if has_freeze:
            out["_fused_live"] = _halo_rows(
                params["interior"].astype(dtype).reshape(nyl, 1))
        if pad_spec is not None and pad_spec.active:
            # physical-cell masks for the in-kernel error sums: `valid` is
            # an outer product of row/col indicators, so two thin masks
            # reproduce it exactly (pad-only shards zero out via either)
            valid = params["valid"].astype(dtype)     # (nyl, nxl) local
            out["_fused_vrow"] = jnp.max(valid, axis=1, keepdims=True)
            cmask = jnp.zeros((1, nxp), dtype)
            out["_fused_cmask"] = cmask.at[0, P:P + nxl].set(
                jnp.max(valid, axis=0))
        return out

    return pad, unpad, splice_inputs, prepare_params


def freeze_scalar(params, has_freeze: bool, t_boundary: float, dtype):
    """1.0 while the integration segment lies in the frozen piece
    (t < tBoundary), derived from params['_seg_end'] — segments never
    straddle the discontinuity (integrate/erk.py breakpoints)."""
    if not has_freeze:
        return jnp.asarray(0.0, dtype)
    seg_end = params.get("_seg_end") if isinstance(params, dict) else None
    if seg_end is None:
        return jnp.asarray(0.0, dtype)
    return (seg_end <= t_boundary).astype(dtype)


def read_strip_constants(kind, b_is_field, has_freeze,
                         c0_ref, c1_ref, c2_ref, b_ref, m_ref, fz_ref,
                         row0, rows):
    """Read the per-strip slices of the constant inputs inside the kernel:
    (stencil, b_rows, live_rows)."""
    if b_is_field:
        b_rows = b_ref[pl.ds(row0, rows), :]
    else:
        b_rows = b_ref[0, 0]
    if has_freeze:
        fz = fz_ref[0, 0]
        live_rows = 1.0 - fz * (1.0 - m_ref[pl.ds(row0, rows), :])
    else:
        live_rows = None
    if kind == "torus":
        stencil = (c0_ref[:, :], c1_ref[:, :], c2_ref[:, :])
    else:
        stencil = (c0_ref[0, 0], c1_ref[0, 0], c2_ref[0, 0])
    return stencil, b_rows, live_rows
