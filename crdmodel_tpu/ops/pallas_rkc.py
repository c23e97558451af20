"""Fused RKC2 step kernel: every Chebyshev stage in one pass over HBM.

RKC2 (integrate/rkc.py) is the algorithmic answer to diffusion-CFL-limited
fine grids — s first-order-cost stages buy a ~0.65*s^2 stability interval,
so evaluations per unit time scale like sqrt(rho) instead of rho. But on
the XLA path each stage is a separate halo'd RHS pass, and at large grids
XLA's fusion collapse makes every evaluation cost a full memory sweep.

This kernel runs the ENTIRE stage recurrence in VMEM per row strip: the
three-term Chebyshev recurrence keeps only (Y_{j-1}, Y_{j-2}, y0, F0) live
— constant in s, unlike an RK tableau's per-stage arrays — so one read of
the state supports an arbitrary stage count up to the halo depth. Stage j
consumes one validity ring; with halo P=24 the kernel supports s <= 23
(s stage evaluations + the error estimate's F(y_new)), i.e. stability
coverage h*rho <= 0.65*23^2 ~ 345 in a single fused pass. The adaptive
driver caps h to that coverage (integrate_interval's h_limit_fn): a finer
grid then costs more *steps*, each still one HBM pass.

Per step the caller (step_err wrapper) computes the spectral radius bound,
the stage count s = ceil(sqrt(h*rho/0.65))+1, and the per-stage recurrence
coefficients (mu, nu, mut, gt — scalar Chebyshev recurrences, done in XLA)
and passes them as small arrays; the kernel's fori_loop runs 2..s with
dynamic bound, indexing the coefficient table per stage.

Stage times only matter through the per-segment freeze flag (as in
ops/pallas_step.py); the error estimate is RKC's order-2
est = 0.8(y - y_new) + 0.4h(F0 + F(y_new)), WRMS-scaled per strip.

float32, single-chip periodic wrap (the lane-halo refresh trick of
ops/pallas_step.py). The sharded variant is ops/pallas_shard_rkc.py.
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
from crdmodel_tpu.ops.pallas_step import _pick_strip
from crdmodel_tpu.ops.kernel_common import (
    coeff_kind,
    freeze_scalar, load_wrap_strips, make_rhs_block, prepare_constants,
    read_strip_constants)

P_RKC = 24                  # halo depth: s + 1 evaluation rings, s <= 23
S_MAX_KERNEL = P_RKC - 1    # max stage count the halo supports
P_LADDER = (24, 16, 8)      # halo-depth variants, deepest first (see below)
P_SMALL = P_LADDER[-1]
VMEM_BUDGET = 10 * 1024 * 1024


def _strip_target(nx: int, nvars: int, p: int = P_RKC,
                  budget: int = VMEM_BUDGET, extra_live: int = 0) -> int:
    # column pad is ALWAYS P_RKC (the driver's padded-state layout is
    # shared by every halo-depth variant); p sizes only the ROW halo.
    # extra_live: additional non-nvars-scaled (R, nxp) resident arrays
    # (the divform branch's double-buffered coefficient windows)
    nxp = ((nx + 2 * P_RKC + 127) // 128) * 128
    live = 2 + 7   # 2 scratch slots + (y0, f0, yjm1, yjm2, fy, yj, est)
    bytes_per_row = 4 * nxp * (nvars * live + extra_live)
    rows = max(1, budget // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * p) // 8 * 8))


def variant_plan(ny: int, nx: int, nvars: int, blocked: bool = False,
                 extra_live: int = 0):
    """Feasible (P, S) halo-depth variants, deepest first.

    A variant is feasible when (a) ny has a strip divisor at that depth's
    VMEM target, (b) multi-strip wrapped-row DMA windows [iS-P, iS) /
    [iS+S, iS+S+P) stay contiguous (S >= P, or a single strip), and
    (c) the resident working set actually fits Mosaic's 16 MB scoped-vmem
    limit; a too-wide strip is walked DOWN the divisor ladder until it
    fits (at very wide rows nothing fits — those shapes go to the blocked
    layout or the XLA path). A shallower depth is kept only when its
    strip is strictly wider — otherwise it would be pure compile time
    with no traffic win.

    Two residency models, both chip-calibrated:
    - nb=1 kernel: the round-3 heuristic (9 live (nvars, R, nxp) arrays
      within a 1.4x budget guard) — validated by every measured plan up
      to (8,64)@nxp=1664.
    - blocked kernel (blocked=True): Mosaic's measured accounting is
      ~14 live row-arrays plus the double-buffered output strip; the
      (8,64)@Wp=1664 blocked branch allocates 16.48 MB (rejected by the
      16 MB limit) while this model predicts 16.6 MB. Guard at 15.5 MB.
    """
    nxp = ((nx + 2 * P_RKC + 127) // 128) * 128
    # read the module global at CALL time (tests shrink it to force the
    # blocked layout on small grids); the nb=1 residency guard scales
    # with it (10 MB budget -> 14 MB guard, the measured-safe pair)
    budget = VMEM_BUDGET
    guard = (budget * 14) // 10

    def fits(P, S):
        R = S + 2 * P
        if blocked:
            return 4 * nxp * nvars * (14 * R + 2 * S) <= 15_500_000
        # two ceilings: the round-3 9-live model against the calibrated
        # guard, AND a Mosaic-measured 15-live ceiling against the 16MB
        # scoped-vmem limit — the (8,64)@nxp=1664 nb=1 variant (ny=6400,
        # nx=1600) allocates 16.13MB on current Mosaic (15.1 live row
        # arrays; first full bench_suite re-run, round 4), which the
        # 9-live model predicted at 9.6MB. Canonical plans are unchanged
        # by the second ceiling (e.g. 400x1600 stays (24, 200)).
        if 4 * nxp * nvars * 15 * R > 15_500_000:
            return False
        return 4 * nxp * (9 * nvars + extra_live) * R <= guard

    plan = []
    best_S = 0
    for P in P_LADDER:
        S = _pick_strip(ny, target=_strip_target(nx, nvars, P,
                                                 budget=budget,
                                                 extra_live=extra_live))
        while S is not None and not fits(P, S):
            S = _pick_strip(ny, target=S - 8)
        if S is not None and ny // S > 1 and S < P:
            S = None
        if S is None:
            # round 5 (VERDICT r4 item 6): the 10MB strip-target heuristic
            # under-sizes deep-P variants at wide rows (its rows-budget
            # assumes the full 9-live set at the TARGET width and then
            # subtracts 2P, handing back S < P); the chip-calibrated
            # fits() ceilings are the real constraint — search the
            # divisor ladder downward for the widest S >= P that fits.
            # At 1600x1600 noflux this recovers the (24, 24) divform
            # variant, loosening the stage-budget h cap (s<=15 -> s<=23,
            # 2.35x) exactly where the round-4 pulsed-pacing row measured
            # 2.4x per step but only 1.1x net (PERF_NOTES round-5).
            S = _pick_strip(ny, target=256, min_s=P)
            while S is not None and not fits(P, S):
                S = _pick_strip(ny, target=S - 8, min_s=P)
        if S is None:
            continue
        if ny // S > 1 and S < P:
            continue
        if S > best_S:
            plan.append((P, S))
            best_S = S
    return plan


def choose_blocking(ny: int, nx: int, nvars: int):
    """(nb, plan): how many column blocks to split the grid into.

    nb=1 is today's single-pass layout. When its plan lacks the DEEP
    (P_RKC) variant — wide rows force shallow halos and cap h at the
    shallow stage budget, exactly where stability-bound stepping wants
    the quadratic s<=23 coverage — splitting columns into nb blocks of
    width W=nx/nb (each carrying its own P_RKC wrap/halo column pads,
    refreshed between steps in XLA) shrinks the kernel's lane width so
    deep strips fit VMEM again. SMALLEST nb whose blocked plan includes
    P_RKC wins; blocks narrower than 512 lanes are not considered (halo
    columns would dominate). Falls back to (1, nb=1 plan).

    A modelled-efficiency scoring pass (prefer larger nb when it buys a
    wider strip: score = S/(S+2P) * W/Wp) was tried and is measured-dead:
    at 100M points it picked nb=8/W=625 over nb=4/W=1250 and the cold
    compile+run blew through a 10-minute budget that nb=4 finishes in
    ~5.5 (narrow blocks multiply strided DMA descriptors per byte moved —
    the model priced compute amplification and lane fill but not DMA
    issue rate; docs/PERF_NOTES.md "column-blocked RKC")."""
    plan1 = variant_plan(ny, nx, nvars)
    if plan1 and plan1[0][0] == P_RKC:
        return 1, plan1
    fallback = (1, plan1)
    for nb in range(2, max(2, nx // 512) + 1):
        if nx % nb:
            continue
        plan = variant_plan(ny, nx // nb, nvars, blocked=True)
        if not plan:
            continue
        if plan[0][0] == P_RKC:
            return nb, plan
        if not fallback[1]:
            fallback = (nb, plan)
    return fallback


def pole_inflated_rho(problem, factor: float = 16.0) -> bool:
    """True when a capped revolution geometry's coefficient profile is
    pole-dominated: the max stencil row sum exceeds `factor` x the median.

    Near a pole (rho -> 0) the phi-coefficient D/(rho dy)^2 grows like
    nx^4, so the static diffusion spectral radius is set by a handful of
    polar cells. The fused RKC kernels cap the Chebyshev stage count at
    S_MAX_KERNEL (halo depth), which caps h at 0.65 (S-1)^2 / rho — with a
    pole-inflated rho that cap is ~(256/23)^2 ~ 120x tighter than the XLA
    path's S_MAX=256, so the kernels must decline and leave rkc2 to XLA
    (core/grid.py::RevolutionGeometry pole-accuracy note). Capped profiles
    with rho bounded away from 0 (tubes) are not inflated and stay
    eligible."""
    geometry = problem.geometry
    if getattr(geometry, "kind", None) != "revolution" \
            or not getattr(geometry, "capped", False):
        return False
    aE, aW, aN, aS = geometry.divergence_coeffs64(problem.diffusion_field)
    rowsum = sum(np.broadcast_to(a, (geometry.grid.nx,)) if a.ndim <= 1
                 else a.max(axis=0) for a in (aE, aW, aN, aS))
    return bool(np.max(rowsum) > factor * np.median(rowsum))


def _divform_extra_live(problem) -> int:
    """Double-buffered coefficient windows resident in the divform branch
    (aE, aW, aN + the obstacle tissue mask) — fed to variant_plan's
    extra_live VMEM accounting."""
    from crdmodel_tpu.ops.pallas_divform import _n_windows
    return 2 * _n_windows(problem)


def is_rkc_supported(problem, dtype) -> bool:
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    ff = fused_forcing(problem)
    if ff is False:
        return False   # free-form forcing: XLA rkc2 (true stage times)
    if ff is not None:
        from crdmodel_tpu.ops.kernel_common import needs_divform as _ndf
        # round 5: smooth (non-gated) jittable waveforms run in-kernel
        # too — the Chebyshev stage times t + c_j h are computed OUTSIDE
        # the kernel for the dispatch's stage count (static_stage_tables
        # with_times) and a per-eval amplitude row rides SMEM; only
        # free-form forcing (ff is False above) still needs XLA rkc2
        if not _ndf(problem) and choose_blocking(
                problem.cfg.ny, problem.cfg.nx,
                problem.model.nvars)[0] > 1:
            return False   # blocked layout: forcing not wired (rare
            # shape; divform always builds nb=1 so it never blocks)
    if jnp.dtype(dtype) != jnp.float32:
        return False
    cfg = problem.cfg
    from crdmodel_tpu.ops.kernel_common import needs_divform
    if needs_divform(problem):
        # general divergence form (masked faces / 2-D fields): runs the
        # divform branch of build_fused_rkc_step — nb=1 plans only (the
        # column-blocked layout has no per-block window build), and the
        # in-kernel aS = roll_y(aN) recovery must be exact
        # (ops/pallas_divform.py module docstring)
        from crdmodel_tpu.ops.pallas_divform import _face_coeffs64
        if problem.geometry.kind not in ("flat", "torus", "revolution"):
            return False
        if not variant_plan(cfg.ny, cfg.nx, problem.model.nvars,
                            extra_live=_divform_extra_live(problem)):
            return False
        _aE, _aW, aN, aS = _face_coeffs64(problem)
        if not np.array_equal(aS, np.roll(aN, 1, axis=0)):
            return False
    elif not choose_blocking(cfg.ny, cfg.nx, problem.model.nvars)[1]:
        return False
    if problem.model.jac_bound is None and not cfg.just_diffusion:
        return False
    if pole_inflated_rho(problem):
        return False
    return True


def rkc_stage_coeffs(s, dtype):
    """Per-stage recurrence coefficient table for traced s (static length
    S_MAX_KERNEL+1, rows beyond s unused). Returns (mu1, coeffs) with
    coeffs[j] = (mu_j, nu_j, mut_j, gt_j) for j in [2, s]."""
    one = jnp.asarray(1.0, dtype)
    sf = s.astype(dtype)
    w0 = one + rkc.EPS_DAMP / (sf * sf)
    ts, dts, d2ts = rkc._cheb_scalars(s, w0)
    w1 = dts / d2ts

    dt2 = 4 * w0
    b2 = jnp.asarray(4.0, dtype) / (dt2 * dt2)
    mu1 = b2 * w1

    def body(j, st):
        tab, tjm1, tjm2, djm1, djm2, d2jm1, d2jm2, bjm1, bjm2 = st
        tj = 2 * w0 * tjm1 - tjm2
        dj = 2 * w0 * djm1 - djm2 + 2 * tjm1
        d2j = 2 * w0 * d2jm1 - d2jm2 + 4 * djm1
        bj = d2j / (dj * dj)
        mu = 2 * bj * w0 / bjm1
        nu = -bj / bjm2
        mut = 2 * bj * w1 / bjm1
        gt = -(one - bjm1 * tjm1) * mut
        tab = tab.at[j].set(jnp.stack([mu, nu, mut, gt]))
        return (tab, tj, tjm1, dj, djm1, d2j, d2jm1, bj, bjm1)

    tab0 = jnp.zeros((S_MAX_KERNEL + 1, 4), dtype)
    st0 = (tab0,
           w0, one,                         # T_1, T_0
           one, jnp.zeros_like(w0),         # T'_1, T'_0
           jnp.zeros_like(w0), jnp.zeros_like(w0),   # T''_1, T''_0
           b2, b2)                          # b_1, b_0
    st = jax.lax.fori_loop(2, s + 1, body, st0)
    return mu1, st[0]


def static_stage_tables(s_cap: int, dtype, with_times: bool = False):
    """mu1[s] and ctab[s] = rkc_stage_coeffs(s) for every stage count
    s in [2, s_cap], precomputed in f64 numpy at BUILD time.

    The Chebyshev recurrence coefficients depend only on s — yet
    rkc_stage_coeffs recomputed them per step as a sequential scalar
    fori_loop inside the hot jit (up to s_cap dependent scalar ops per
    attempted step). A (s_cap+1, S_MAX_KERNEL+1, 4) static table turns
    that into one dynamic index. f64 table entries cast to the kernel
    dtype differ from the old in-jit f32 recurrence by at most f32
    rounding (strictly more accurate), inside the documented fused-vs-XLA
    f32 drift domain.

    with_times: also return ctimes[s, e] — the normalized STAGE TIME of
    the kernel's e-th RHS evaluation (the offsets the XLA rkc2 uses,
    integrate/rkc.py:126-129): e=0 is F_0 at t (offset 0), e=j for the
    stage-loop index j in [2, s] is F(Y_{j-1}) at t + c_{j-1} h, and
    e=s+1 is the error estimator's F(y_new) at t + h. Smooth-waveform
    forcing evaluates the amplitudes at t + ctimes[s]*h OUTSIDE the
    kernel (round 5 — VERDICT r4 item 5)."""
    mu1 = np.zeros((s_cap + 1,), np.float64)
    ctab = np.zeros((s_cap + 1, S_MAX_KERNEL + 1, 4), np.float64)
    ctimes = np.zeros((s_cap + 1, S_MAX_KERNEL + 2), np.float64)
    for s in range(2, s_cap + 1):
        w0 = 1.0 + rkc.EPS_DAMP / (s * s)
        T = np.zeros(s + 1)
        dT = np.zeros(s + 1)
        d2T = np.zeros(s + 1)
        T[0], T[1] = 1.0, w0
        dT[1] = 1.0
        for j in range(2, s + 1):
            T[j] = 2 * w0 * T[j - 1] - T[j - 2]
            dT[j] = 2 * w0 * dT[j - 1] - dT[j - 2] + 2 * T[j - 1]
            d2T[j] = 2 * w0 * d2T[j - 1] - d2T[j - 2] + 4 * dT[j - 1]
        w1 = dT[s] / d2T[s]
        b = np.zeros(s + 1)
        b[0] = b[1] = 1.0 / (4.0 * w0 * w0)   # b2 = 4/(4 w0)^2
        for j in range(2, s + 1):
            b[j] = d2T[j] / dT[j] ** 2
        mu1[s] = b[1] * w1
        for j in range(2, s + 1):
            mu = 2 * b[j] * w0 / b[j - 1]
            nu = -b[j] / b[j - 2]
            mut = 2 * b[j] * w1 / b[j - 1]
            gt = -(1.0 - b[j - 1] * T[j - 1]) * mut
            ctab[s, j] = (mu, nu, mut, gt)
            # c_{j-1} = w1 T''_{j-1}/T'_{j-1}, c_1 = w1/(4 w0)
            ctimes[s, j] = (0.25 * w1 / w0 if j == 2
                            else w1 * d2T[j - 1] / dT[j - 1])
        ctimes[s, s + 1] = 1.0
    out = (jnp.asarray(mu1, dtype), jnp.asarray(ctab, dtype))
    if with_times:
        out = out + (jnp.asarray(ctimes, dtype),)
    return out


@dataclasses.dataclass(frozen=True)
class FusedRKCStep:
    step_err: Callable      # (t, yp, h, params, carry=()) protocol via wrapper
    h_limit: Callable       # (t, yp, params) -> stability-capped max h
    pad: Callable
    unpad: Callable
    nxp: int


def build_fused_rkc_step(problem, dtype=jnp.float32,
                         rho_fn=None, interpret=False) -> FusedRKCStep:
    """Builds the fused step with up to TWO halo-depth variants.

    The P=24 halo supports s <= 23 stages per pass, but at wide grids the
    VMEM budget then forces narrow strips (e.g. S=8 at nx=3200), and the
    2P halo rows are re-read and re-computed for every strip: a
    (S+2P)/S = 7x HBM-traffic/compute amplification paid on EVERY step —
    including accuracy-limited steps that only need s ~ 5-8 stages
    (measured: 82.9 ms/step at 12800x3200 where the roofline is ~2 ms;
    docs/PERF_NOTES.md "adaptive halo depth"). When stability binds
    (s -> 23) the deep halo is optimal: the quadratic stability interval
    beats the linear halo cost. So the kernel is built at every feasible
    depth of the P_LADDER (24/16/8 — s <= 23/15/7) whose strip strictly
    widens, and step_err lax.switches per step to the shallowest variant
    covering the traced stage count. At narrow nx the ladder collapses to
    the single deep variant (no extra compiles; the deep kernel is already
    roofline-bound); at wide nx where S < 24 has no contiguous-DMA strip
    the shallower depths are the only fused option at all (previously an
    XLA fallback), with h capped to their stage budget. Column padding is
    P_RKC for every variant: the padded-state layout is part of the
    driver contract.
    """
    cfg = problem.cfg
    model = problem.model
    geometry = problem.geometry
    nvars = model.nvars
    ny, nx = cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(geometry.kind)

    if rho_fn is None:
        from crdmodel_tpu.core.problem import make_rho_bound
        rho_fn = make_rho_bound(cfg, model, geometry, dtype,
                                diffusion_field=problem.diffusion_field,
                                face_mask=getattr(problem, "face_mask",
                                                  None))

    from crdmodel_tpu.ops.kernel_common import needs_divform
    divform = needs_divform(problem)
    if divform:
        nb = 1   # is_rkc_supported requires a feasible nb=1 divform plan
    else:
        nb, plan_blocked = choose_blocking(ny, nx, nvars)
        if nb > 1:
            return _build_blocked(problem, dtype, rho_fn, interpret,
                                  nb, plan_blocked)

    P_COL = P_RKC
    nxp = ((nx + 2 * P_COL + 127) // 128) * 128

    def pad_cols(arr):
        out = jnp.concatenate([arr[..., -P_COL:], arr, arr[..., :P_COL]],
                              axis=-1)
        fill = nxp - (nx + 2 * P_COL)
        if fill:
            padw = [(0, 0)] * (out.ndim - 1) + [(0, fill)]
            out = jnp.pad(out, padw)
        return out

    def unpad_cols(arr):
        return arr[..., P_COL:P_COL + nx]

    kc = prepare_constants(problem, dtype, P_COL, pad_cols,
                           with_coeffs=not divform)
    b_is_field, has_freeze = kc.b_is_field, kc.has_freeze

    # segment-gated forcing (pulse trains only, is_rkc_supported): the
    # amplitude is CONSTANT per step, one (n_stim, 1) scalar input covers
    # every Chebyshev stage; rank-1 profiles ride as trace-time constants
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    forcing = fused_forcing(problem)
    assert forcing is not False, "is_rkc_supported should have declined"
    n_stim = len(forcing.stimuli) if forcing else 0
    if n_stim:
        stim_vars = tuple(st.var for st in forcing.stimuli)
        scols_np = []
        srows_phys = []
        for st in forcing.stimuli:
            r_ = (np.ones((ny, 1)) if st.row is None
                  else np.asarray(st.row, np.float64).reshape(ny, 1))
            srows_phys.append(r_)
            c_ = (np.ones(nx) if st.col is None
                  else np.asarray(st.col, np.float64).reshape(nx))
            c_lane = np.zeros(nxp)
            c_lane[:P_COL] = c_[-P_COL:]
            c_lane[P_COL:P_COL + nx] = c_
            c_lane[P_COL + nx:P_COL + nx + P_COL] = c_[:P_COL]
            scols_np.append(c_lane)
        stim_cols = jnp.asarray(np.stack(scols_np)[:, None, :], dtype)
    else:
        stim_cols = jnp.zeros((1, 1, 1), dtype)
    # amplitude layout: all-gated pulse trains are constant per step —
    # ONE column; smooth waveforms vary across the Chebyshev stages, so
    # the SMEM row carries one amplitude per RHS EVALUATION, filled at
    # the true stage times outside the kernel (static_stage_tables
    # with_times; round 5)
    all_gated = (not n_stim) or all(
        getattr(st.waveform, "segment_gated", False)
        for st in forcing.stimuli)
    n_amp = 1 if all_gated else S_MAX_KERNEL + 2
    amps0 = jnp.zeros((max(1, n_stim), n_amp), dtype)
    if divform:
        # general divergence form: full face-coefficient fields stacked
        # into ONE (n_coeff, ny, nxp) HBM array, row-windowed per strip by
        # in-kernel DMAs and passed as a RUNTIME input (the
        # ops/pallas_divform.py design — aS recovered in-kernel by a row
        # roll of aN, aW shipped whole; one array serves every halo-depth
        # variant). See kernel_common.build_coeff_hbm for why it must not
        # be a baked constant.
        from crdmodel_tpu.ops.kernel_common import (build_coeff_hbm,
                                                    make_divform_rhs_block)
        from crdmodel_tpu.ops.pallas_divform import _face_coeffs64
        aE64, aW64, aN64, aS64 = _face_coeffs64(problem)
        if not np.array_equal(aS64, np.roll(aN64, 1, axis=0)):
            raise ValueError("aS != roll_y(aN): unsupported geometry "
                             "(is_rkc_supported should have declined)")
        has_tissue = getattr(problem, "obstacle_mask", None) is not None
        divform_rhs = make_divform_rhs_block(model, just_diffusion)
        fields = [aE64, aW64, aN64]
        if has_tissue:
            fields.append(np.asarray(problem.obstacle_mask, np.float64))
        n_coeff = len(fields)
        coeffs_hbm = build_coeff_hbm(fields, P_COL, nx, nxp, dtype)
        problem.params["_divform_coeffs"] = coeffs_hbm
    else:
        has_tissue = False
        n_coeff = 0
        rhs_block_of = make_rhs_block(kind, model, just_diffusion)

    def make_call(P, S):
        """One pallas_call at row-halo depth P with strip S."""
        n_strips = ny // S
        R = S + 2 * P

        # per-variant ROW padding of the beta field / interior mask (the
        # P_COL-padded kc versions carry P_RKC halo rows)
        if b_is_field:
            from crdmodel_tpu.core.problem import beta_field
            b_np = np.asarray(beta_field(cfg, dtype))
            b_pad = jnp.asarray(
                np.concatenate([b_np[-P:], b_np, b_np[:P]], axis=0), dtype)
        else:
            b_pad = kc.b_pad
        interior = np.ones((ny, 1), dtype=np.float32)
        interior[0, 0] = 0.0
        interior[-1, 0] = 0.0
        m_pad = jnp.asarray(
            np.concatenate([interior[-P:], interior, interior[:P]], axis=0),
            dtype)
        if n_stim:
            stim_rows_v = jnp.asarray(np.stack(
                [np.concatenate([r_[-P:], r_, r_[:P]], axis=0)
                 for r_ in srows_phys]), dtype)   # (n_stim, ny+2P, 1)
        else:
            stim_rows_v = jnp.zeros((1, 1, 1), dtype)

        def kernel(h_ref, fz_ref, s_ref, mu1_ref, ctab_ref, amps_ref,
                   srow_ref, scol_ref, *rest):
            if divform:
                (b_ref, m_ref, cm_ref, y_hbm, c_hbm,
                 ynew_ref, ss_ref, yv, sems, cv, csems) = rest
            else:
                (c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref, y_hbm,
                 ynew_ref, ss_ref, yv, sems) = rest
            i = pl.program_id(0)
            row0 = pl.multiple_of(i * S, 8)

            slot = load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips, i)

            h = h_ref[0, 0]
            s = s_ref[0, 0]
            mu1 = mu1_ref[0, 0]
            if n_stim:
                profs = [srow_ref[j, pl.ds(row0, R), :]
                         * scol_ref[j, 0, :] for j in range(n_stim)]

                def ex_at(e):
                    ex = {}
                    for j in range(n_stim):
                        a = (amps_ref[j, 0] if n_amp == 1
                             else amps_ref[j, e])
                        v = stim_vars[j]
                        contrib = a * profs[j]
                        ex[v] = ex[v] + contrib if v in ex else contrib
                    return ex
            else:
                def ex_at(e):
                    return None
            if divform:
                cslot = load_wrap_strips(c_hbm, cv, csems, ny, S, P,
                                         n_strips, i)
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
                faces = (cb[0], cb[1], cb[2],
                         jnp.roll(cb[2], 1, axis=-2))
                tis = cb[3] if has_tissue else None

                def rhs_block(yb, ex=None):
                    return divform_rhs(yb, faces, tis, None,
                                       b_rows, live_rows, extra=ex)
            else:
                stencil, b_rows, live_rows = read_strip_constants(
                    kind, b_is_field, has_freeze,
                    c0_ref, c1_ref, c2_ref,
                    b_ref, m_ref, fz_ref, row0, R)

                def rhs_block(yb, ex=None):
                    return rhs_block_of(yb, stencil, b_rows, live_rows,
                                        extra=ex)

            y0 = yv[slot]
            f0 = rhs_block(y0, ex_at(0))             # ring 1, time t
            y_jm1 = y0 + (h * mu1) * f0              # stage 1
            y_jm2 = y0

            def stage(j, carry):
                yjm1, yjm2 = carry
                mu = ctab_ref[j, 0]
                nu = ctab_ref[j, 1]
                mut = ctab_ref[j, 2]
                gt = ctab_ref[j, 3]
                fy = rhs_block(yjm1, ex_at(j))       # ring j, t+c_{j-1}h
                yj = ((1.0 - mu - nu) * y0 + mu * yjm1 + nu * yjm2
                      + (h * mut) * fy + (h * gt) * f0)
                return (yj, yjm1)

            y_new, _ = jax.lax.fori_loop(2, s + 1, stage, (y_jm1, y_jm2))

            f1 = rhs_block(y_new, ex_at(s + 1))      # ring s+1, t+h
            est = 0.8 * (y0 - y_new) + (0.4 * h) * (f0 + f1)

            z = y_new[:, P:P + S, :]
            jcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, nxp), 2)
            zl = jnp.roll(z, -nx, axis=-1)
            zr = jnp.roll(z, nx, axis=-1)
            z = jnp.where(jcol < P_COL, zl,
                          jnp.where(jcol >= P_COL + nx, zr, z))
            ynew_ref[:, :, :] = z

            yc = y0[:, P:P + S, :]
            w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
            scaled = est[:, P:P + S, :] * w
            ss_ref[i, 0] = jnp.sum(scaled * scaled)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_strips,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((S_MAX_KERNEL + 1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((max(1, n_stim), n_amp), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),  # per-eval amps
                pl.BlockSpec(stim_rows_v.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # stimulus rows
                pl.BlockSpec(stim_cols.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # stimulus cols
            ] + ([] if divform else [kc.coeff_spec] * 3) + [
                pl.BlockSpec(b_pad.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(m_pad.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nxp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ] + ([pl.BlockSpec(memory_space=pltpu.HBM)]   # coeff fields
                 if divform else []),
            out_specs=[
                pl.BlockSpec((nvars, S, nxp), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, nvars, R, nxp), dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ] + ([pltpu.VMEM((2, n_coeff, R, nxp), dtype),
                  pltpu.SemaphoreType.DMA((2, 3))]
                 if divform else []),
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

        if divform:
            def run(h_s, fz_s, s_s, mu1_s, ctab, amps, yp, ch):
                ynew, ss = call(h_s, fz_s, s_s, mu1_s, ctab,
                                amps, stim_rows_v, stim_cols,
                                b_pad, m_pad, kc.col_mask, yp, ch)
                return ynew, jnp.sum(ss)
        else:
            def run(h_s, fz_s, s_s, mu1_s, ctab, amps, yp):
                ynew, ss = call(h_s, fz_s, s_s, mu1_s, ctab,
                                amps, stim_rows_v, stim_cols,
                                kc.c0, kc.c1, kc.c2, b_pad, m_pad,
                                kc.col_mask, yp)
                return ynew, jnp.sum(ss)

        return run

    plan = variant_plan(ny, nx, nvars,
                        extra_live=(_divform_extra_live(problem)
                                    if divform else 0))
    if not plan:
        raise ValueError(f"no feasible fused-RKC variant for "
                         f"ny={ny}, nx={nx} (see is_rkc_supported)")
    s_cap = plan[0][0] - 1        # deepest variant bounds the stage count
    # branches shallowest-first: per step, lax.switch picks the SHALLOWEST
    # variant whose halo covers s — its strictly wider strip moves strictly
    # less HBM traffic and (the larger cost at wide grids) computes the
    # stage recurrence over strictly fewer amplified halo rows
    branches = [make_call(P, S) for (P, S) in reversed(plan)]
    caps = np.asarray([P - 1 for (P, _) in reversed(plan)], np.int32)
    mu1_tab, ctab_tab, ctimes_tab = static_stage_tables(
        s_cap, dtype, with_times=True)

    def _freeze_scalar(params):
        return freeze_scalar(params, has_freeze, t_boundary, dtype)

    def step_err(t, yp, h, params, carry=()):
        rho = rho_fn(t, unpad_cols(yp), params).astype(dtype)
        s = jnp.minimum(rkc.choose_stages(h, rho),
                        jnp.asarray(s_cap, jnp.int32))
        mu1 = mu1_tab[s]
        ctab = jax.lax.dynamic_index_in_dim(ctab_tab, s, 0, keepdims=False)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(_freeze_scalar(params), (1, 1))
        s_s = jnp.reshape(s, (1, 1))
        mu1_s = jnp.reshape(mu1, (1, 1))
        if n_stim:
            seg = params.get("_seg_end") if isinstance(params, dict) else None
            if all_gated:
                amps = jnp.stack([
                    jnp.asarray(st.waveform(t, seg_end=seg), dtype)
                    for st in forcing.stimuli]).reshape(n_stim, 1)
            else:
                # amplitudes at the TRUE Chebyshev stage times of THIS
                # dispatch's stage count (the offsets the XLA rkc2 uses,
                # integrate/rkc.py:126-129)
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
        else:
            amps = amps0
        args = (h_s, fz_s, s_s, mu1_s, ctab, amps, yp)
        if divform:
            ch = coeffs_hbm   # fallback: callers that don't thread params
            if isinstance(params, dict) and "_divform_coeffs" in params:
                ch = params["_divform_coeffs"]
            args = args + (ch,)
        if len(branches) == 1:
            ynew, ss = branches[0](*args)
        else:
            idx = jnp.sum((s > jnp.asarray(caps)).astype(jnp.int32))
            ynew, ss = jax.lax.switch(idx, branches, *args)
        return ynew, ss, ()

    def h_limit(t, yp, params):
        """Largest h the deepest built variant's stage budget stabilizes."""
        rho = rho_fn(t, unpad_cols(yp), params).astype(dtype)
        return (rkc.STAB_FACTOR * (s_cap - 1) ** 2
                / jnp.maximum(rho, 1e-30)).astype(dtype)

    return FusedRKCStep(step_err=step_err, h_limit=h_limit,
                        pad=pad_cols, unpad=unpad_cols, nxp=nxp)


def _build_blocked(problem, dtype, rho_fn, interpret, nb,
                   plan) -> FusedRKCStep:
    """Column-blocked fused RKC step (choose_blocking, nb > 1).

    Layout: (nvars, nb, ny, Wp) — the grid's nx columns split into nb
    blocks of W = nx/nb, each block carrying its own P_RKC halo columns
    on both sides (the nb=1 padded layout, replicated per block), lane-
    padded to Wp. The kernel body is EXACTLY the single-pass kernel run
    per (block, strip) — row-wrap DMAs within the block, the same
    Chebyshev stage recurrence over validity rings — so deep (P=24)
    strips fit VMEM at any row width. What changes is where the column
    halos come from: instead of the in-kernel wrap-roll refresh, an XLA
    pass after the call rebuilds every block's halo columns from its
    neighbours' interiors (~48/W of the state, one cheap fused op).

    Costs vs nb=1: the refresh pass, (Wp-W)/W lane fill, and an extra
    unpad gather feeding the rho bound. Buys: stability-bound stepping
    keeps the quadratic s<=23 coverage at widths where nb=1 tops out at
    s<=7 (h capped 15x low at the 100M-point demo shape).
    """
    cfg = problem.cfg
    model = problem.model
    geometry = problem.geometry
    nvars = model.nvars
    ny, nx = cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    kind = coeff_kind(geometry.kind)

    P_COL = P_RKC
    W = nx // nb
    Wp = ((W + 2 * P_COL + 127) // 128) * 128
    fill = Wp - W - 2 * P_COL

    col_idx = (np.arange(-P_COL, W + P_COL)[None, :]
               + np.arange(nb)[:, None] * W) % nx          # (nb, W+2P)
    col_idx_j = jnp.asarray(col_idx)

    def pad_cols(arr):
        """(..., ny, nx) -> (..., nb, ny, Wp)."""
        out = arr[..., col_idx_j]                  # (..., ny, nb, W+2P)
        out = jnp.moveaxis(out, -2, -3)            # (..., nb, ny, W+2P)
        if fill:
            padw = [(0, 0)] * (out.ndim - 1) + [(0, fill)]
            out = jnp.pad(out, padw)
        return out

    def unpad_cols(arr):
        """(..., nb, ny, Wp) -> (..., ny, nx)."""
        z = arr[..., P_COL:P_COL + W]              # (..., nb, ny, W)
        z = jnp.moveaxis(z, -3, -2)                # (..., ny, nb, W)
        return z.reshape(z.shape[:-2] + (nx,))

    def refresh(z):
        """Rebuild every block's halo columns from its neighbours."""
        interior = z[..., P_COL:P_COL + W]
        lh = jnp.roll(interior[..., W - P_COL:], 1, axis=-3)
        rh = jnp.roll(interior[..., :P_COL], -1, axis=-3)
        parts = [lh, interior, rh]
        if fill:
            parts.append(jnp.zeros(z.shape[:-1] + (fill,), z.dtype))
        return jnp.concatenate(parts, axis=-1)

    # constants
    from crdmodel_tpu.ops.kernel_common import kernel_stencil_coeffs
    coeffs = kernel_stencil_coeffs(problem, dtype)
    if kind == "torus":
        cs = []
        for c in coeffs:
            c_np = np.asarray(jnp.asarray(c), np.float64).reshape(nx)
            blk = c_np[col_idx]                    # (nb, W+2P)
            blk = np.pad(blk, [(0, 0), (0, fill)])[:, None, :]
            cs.append(jnp.asarray(blk, dtype))     # (nb, 1, Wp)
        c0_in, c1_in, c2_in = cs
        coeff_spec = pl.BlockSpec((1, 1, Wp), lambda b, i: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        c0_in = jnp.reshape(coeffs[0].astype(dtype), (1, 1))
        c1_in = jnp.reshape(coeffs[1].astype(dtype), (1, 1))
        c2_in = jnp.reshape(coeffs[2].astype(dtype), (1, 1))
        coeff_spec = pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                  memory_space=pltpu.SMEM)

    from crdmodel_tpu.core.problem import beta_field
    b_arr = beta_field(cfg, dtype)
    b_is_field = getattr(b_arr, "ndim", 0) == 2
    has_freeze = (t_boundary > 0.0) and not just_diffusion

    col_mask_np = np.zeros((1, Wp), dtype=np.float32)
    col_mask_np[0, P_COL:P_COL + W] = 1.0
    col_mask = jnp.asarray(col_mask_np, dtype)

    rhs_block_of = make_rhs_block(kind, model, just_diffusion)

    def make_call(P, S):
        n_strips = ny // S
        R = S + 2 * P

        if b_is_field:
            b_np = np.asarray(beta_field(cfg, dtype))
            b_pad = jnp.asarray(
                np.concatenate([b_np[-P:], b_np, b_np[:P]], axis=0), dtype)
        else:
            b_pad = jnp.full((1, 1), float(b_arr), dtype)
        interior = np.ones((ny, 1), dtype=np.float32)
        interior[0, 0] = 0.0
        interior[-1, 0] = 0.0
        m_pad = jnp.asarray(
            np.concatenate([interior[-P:], interior, interior[:P]],
                           axis=0), dtype)

        def kernel(h_ref, fz_ref, s_ref, mu1_ref, ctab_ref,
                   c0_ref, c1_ref, c2_ref, b_ref, m_ref, cm_ref,
                   y_hbm, ynew_ref, ss_ref, yv, sems):
            b = pl.program_id(0)
            i = pl.program_id(1)
            row0 = pl.multiple_of(i * S, 8)

            slot = load_wrap_strips(y_hbm, yv, sems, ny, S, P, n_strips,
                                    i, block=b)

            h = h_ref[0, 0]
            s = s_ref[0, 0]
            mu1 = mu1_ref[0, 0]
            if kind == "torus":
                stencil = (c0_ref[0], c1_ref[0], c2_ref[0])   # (1, Wp)
            else:
                stencil = (c0_ref[0, 0], c1_ref[0, 0], c2_ref[0, 0])
            if b_is_field:
                b_rows = b_ref[pl.ds(row0, R), :]
            else:
                b_rows = b_ref[0, 0]
            if has_freeze:
                fz = fz_ref[0, 0]
                live_rows = 1.0 - fz * (1.0 - m_ref[pl.ds(row0, R), :])
            else:
                live_rows = None

            def rhs_block(yb):
                return rhs_block_of(yb, stencil, b_rows, live_rows)

            y0 = yv[slot]
            f0 = rhs_block(y0)                       # ring 1
            y_jm1 = y0 + (h * mu1) * f0              # stage 1
            y_jm2 = y0

            def stage(j, carry):
                yjm1, yjm2 = carry
                mu = ctab_ref[j, 0]
                nu = ctab_ref[j, 1]
                mut = ctab_ref[j, 2]
                gt = ctab_ref[j, 3]
                fy = rhs_block(yjm1)                 # ring j
                yj = ((1.0 - mu - nu) * y0 + mu * yjm1 + nu * yjm2
                      + (h * mut) * fy + (h * gt) * f0)
                return (yj, yjm1)

            y_new, _ = jax.lax.fori_loop(2, s + 1, stage, (y_jm1, y_jm2))

            f1 = rhs_block(y_new)                    # ring s+1
            est = 0.8 * (y0 - y_new) + (0.4 * h) * (f0 + f1)

            # raw write: halo/fill columns carry ring garbage here and
            # are rebuilt by refresh() right after the call
            ynew_ref[:, 0, :, :] = y_new[:, P:P + S, :]

            yc = y0[:, P:P + S, :]
            w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
            scaled = est[:, P:P + S, :] * w
            ss_ref[b, i] = jnp.sum(scaled * scaled)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb, n_strips),
            in_specs=[
                pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((S_MAX_KERNEL + 1, 4), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM),
                coeff_spec, coeff_spec, coeff_spec,
                pl.BlockSpec(b_pad.shape, lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(m_pad.shape, lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Wp), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=[
                pl.BlockSpec((nvars, 1, S, Wp), lambda b, i: (0, b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, nvars, R, Wp), dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        )

        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nvars, nb, ny, Wp), dtype),
                jax.ShapeDtypeStruct((nb, n_strips), dtype),
            ],
            interpret=interpret,
        )

        def run(h_s, fz_s, s_s, mu1_s, ctab, yp):
            ynew, ss = call(h_s, fz_s, s_s, mu1_s, ctab,
                            c0_in, c1_in, c2_in, b_pad, m_pad,
                            col_mask, yp)
            return refresh(ynew), jnp.sum(ss)

        return run

    s_cap = plan[0][0] - 1
    branches = [make_call(P, S) for (P, S) in reversed(plan)]
    caps = np.asarray([P - 1 for (P, _) in reversed(plan)], np.int32)
    mu1_tab, ctab_tab = static_stage_tables(s_cap, dtype)

    def _freeze_scalar(params):
        return freeze_scalar(params, has_freeze, t_boundary, dtype)

    def step_err(t, yp, h, params, carry=()):
        rho = rho_fn(t, unpad_cols(yp), params).astype(dtype)
        s = jnp.minimum(rkc.choose_stages(h, rho),
                        jnp.asarray(s_cap, jnp.int32))
        mu1 = mu1_tab[s]
        ctab = jax.lax.dynamic_index_in_dim(ctab_tab, s, 0, keepdims=False)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(_freeze_scalar(params), (1, 1))
        s_s = jnp.reshape(s, (1, 1))
        mu1_s = jnp.reshape(mu1, (1, 1))
        if len(branches) == 1:
            ynew, ss = branches[0](h_s, fz_s, s_s, mu1_s, ctab, yp)
        else:
            idx = jnp.sum((s > jnp.asarray(caps)).astype(jnp.int32))
            ynew, ss = jax.lax.switch(idx, branches,
                                      h_s, fz_s, s_s, mu1_s, ctab, yp)
        return ynew, ss, ()

    def h_limit(t, yp, params):
        rho = rho_fn(t, unpad_cols(yp), params).astype(dtype)
        return (rkc.STAB_FACTOR * (s_cap - 1) ** 2
                / jnp.maximum(rho, 1e-30)).astype(dtype)

    return FusedRKCStep(step_err=step_err, h_limit=h_limit,
                        pad=pad_cols, unpad=unpad_cols, nxp=Wp)
