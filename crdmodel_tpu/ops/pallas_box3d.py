"""Fused embedded-ERK step for the 3-D box — a z-streaming pipeline.

The 3-D analogue of ops/pallas_step.py. One kernel invocation performs the
full embedded Runge-Kutta step (every stage's 7-point conservative stencil +
kinetics, the solution update, and the WRMS error partial sums) in ONE pass
over HBM. The XLA path's per-point cost grows ~4.4x from 1M to 8M points
(the known non-fused falloff, docs/PERF_NOTES.md "3-D box"); this kernel
exists to hold the fused-regime cost at volumetric sizes.

Design — "3.5-D blocking": temporal blocking in all three axes at once
would amplify z-traffic by (2*stages+1), so instead the kernel streams
along z. The grid is (n_strips, nz + n_stages): for each y-strip the
z-iteration m loads ONE (nvars, R, nxp) y-plane window (R = S + 2*HALO rows
with wrapped-row halos, exactly the 2-D kernels' strip layout) and advances
a software pipeline that keeps per-stage ring buffers of planes in VMEM
(legal because Pallas TPU grid iterations execute sequentially and scratch
persists across them):

    iteration m:  load y0[m]   (double-buffered DMA, prefetched at m-1)
                  k_s[m-s-1] = f(y0 + h*sum_j a_sj k_j)   for each stage s
                  output plane m - n_stages: ynew, err partial sums

Stage s at plane p consumes stage s-1 values at planes p-1, p, p+1 (the
z-legs of the 7-point stencil evaluated on the stage ARGUMENT, recombined
on the fly from the y0 and k_j rings), so each k_s ring holds n_stages-s+1
planes and y0 holds n_stages+3 (liveness + prefetch slot). In-plane x/y
neighbour handling is identical to the 2-D kernels (wrapped lane halos,
wrapped strip rows, per-stage validity shrinking by one ring, HALO=8 >=
stages). Traffic amplification is only the y-strip overlap (R/S) plus
n_stages warmup planes per strip — there is NO z recompute.

z boundary: the pipeline never wraps in z — out-of-range plane indices are
CLAMPED, which is exact only when the z-seam faces carry zero coefficients.
is_box3d_supported therefore requires the z walls closed (cfg.boundary
"noflux"/"noflux_z", or any config whose aU/aD coefficients vanish at the
seam); fully periodic-z boxes keep the XLA path. This matches the flagship
volumetric use case — bounded tissue slabs (examples/scroll_wave.py).

Coefficients, three modes:
  profile  constant D with optional no-flux walls on any axis pair —
           aE/aW x-profiles ((1, nxp) lane rows), aN/aS y-profiles
           ((ny+2P, 1) wrapped columns, strip-sliced like the beta ramp),
           aU/aD z-profiles ((nz, 1) SMEM scalars read at each stage's
           plane index)
  tissue   profile x obstacle-openness, recovered in-kernel from a
           streamed tissue plane ring (0/1 multiplies, bitwise-exact)
  field    full 3-D diffusion fields — a coefficient plane ring streams
           the three face fields (aE, aN, aU) per plane (one contiguous
           DMA: rows are wrap-padded at build); aW/aS recovered by
           in-window rolls and aD from the ring's p-1 slot, all exact
           (_box_field_faces contract)

Numerics follow ops/stencil.py::divergence_laplacian3 exactly in real
arithmetic (same difference grouping); f32 results agree to rounding with
step sequences pinned equal in tests (tests/test_box3d_kernel.py). The
freeze / runtime-beta ("_fused_b") / diffusion-scale ("dscale") contracts
match ops/pallas_step.py. float32 only.

Reference context: the reference is strictly 2-D (src/FHNmodel_flat.cpp:
489-566); the box surface is a beyond-reference capability
(core/grid.py::BoxGeometry).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crdmodel_tpu.integrate.erk import Tableau
from crdmodel_tpu.ops.kernel_common import (
    freeze_scalar, lane_pad_width, prepare_constants)
from crdmodel_tpu.ops.pallas_step import HALO, VMEM_BUDGET, FusedStep


def _ring_planes(ns: int) -> int:
    """Resident ring planes: y0 depth ns+3, k_j depth ns-j+1 (j<ns-1)."""
    return (ns + 3) + sum(ns - j + 1 for j in range(ns - 1))


def _box_strip_target(nx: int, nvars: int, n_stages: int,
                      has_tissue: bool = False,
                      has_field: bool = False) -> int:
    """Strip row cap keeping the ring buffers + stage temporaries under
    VMEM_BUDGET (the margin of 10 covers the compiler's per-stage
    argument/roll temporaries). The tissue plane ring (obstacle scars) is
    nvars-independent: depth n_stages+3 plus ~3 openness temporaries; the
    coefficient plane ring (full 3-D diffusion fields) carries 3 face
    fields per slot plus ~3 recovery-roll temporaries."""
    nxp = lane_pad_width(nx, HALO)
    live = _ring_planes(n_stages) + 10
    tis = (n_stages + 6) if has_tissue else 0
    # has_field: 3-face ring + recovery rolls; "tensor": 6-field ring
    # (3 faces + 3 mixed) + ~8 mixed-term temporaries per stage
    fld = 0
    if has_field == "tensor":
        fld = 6 * (n_stages + 3) + 8
    elif has_field:
        fld = 3 * (n_stages + 3) + 3
    bytes_per_row = 4 * nxp * (nvars * live + tis + fld)
    rows = max(1, VMEM_BUDGET // bytes_per_row)
    return min(256, max(8, (int(rows) - 2 * HALO) // 8 * 8))


def _pick_strip(ny: int, target: int) -> int | None:
    best = None
    for s in range(8, min(ny, target) + 1, 8):
        if ny % s == 0:
            best = s
    return best


def _box_profiles(problem):
    """The six face-coefficient fields as 1-D profiles
    (aE(x), aW(x), aN(y), aS(y), aU(z), aD(z)) in f64, or None when the
    operator is not profile-expressible (3-D diffusion fields make the
    faces full (nz, ny, nx) arrays).

    With an obstacle mask the full coefficients factor EXACTLY as
    profile x tissue-openness (constant D: aE_full = aE_profile(x) *
    (T & roll_x(T)), grid.py::face_openness3), so the profiles here are
    built from the WALL-ONLY face mask and the kernels recover the
    obstacle factors in-kernel from the tissue plane ring — 0/1 masks
    multiply f32 coefficients exactly, keeping bitwise agreement with
    the XLA path's masked-f64-then-cast coefficients."""
    g = problem.geometry.grid
    face_mask = problem.face_mask
    if getattr(problem, "obstacle_mask", None) is not None:
        from crdmodel_tpu.core.grid import face_openness3
        face_mask = face_openness3(g.nz, g.ny, g.nx,
                                   boundary=problem.cfg.boundary,
                                   tissue=None)
    faces = problem.geometry.divergence_coeffs64(
        problem.diffusion_field, face_mask=face_mask)
    aE, aW, aN, aS, aU, aD = [np.asarray(a, np.float64) for a in faces]
    if aE.ndim > 1 or aW.ndim > 1:
        return None
    if aN.ndim not in (0, 2) or aS.ndim not in (0, 2):
        return None
    if aN.ndim == 2 and aN.shape != (g.ny, 1):
        return None
    if aS.ndim == 2 and aS.shape != (g.ny, 1):
        return None
    if aU.ndim not in (0, 3) or aD.ndim not in (0, 3):
        return None
    if aU.ndim == 3 and aU.shape != (g.nz, 1, 1):
        return None
    if aD.ndim == 3 and aD.shape != (g.nz, 1, 1):
        return None
    return (np.broadcast_to(aE, (g.nx,)),
            np.broadcast_to(aW, (g.nx,)),
            np.broadcast_to(aN.reshape(-1), (g.ny,)) if aN.ndim else
            np.broadcast_to(aN, (g.ny,)),
            np.broadcast_to(aS.reshape(-1), (g.ny,)) if aS.ndim else
            np.broadcast_to(aS, (g.ny,)),
            np.broadcast_to(aU.reshape(-1), (g.nz,)) if aU.ndim else
            np.broadcast_to(aU, (g.nz,)),
            np.broadcast_to(aD.reshape(-1), (g.nz,)) if aD.ndim else
            np.broadcast_to(aD, (g.nz,)))


def _box_field_faces(problem):
    """Full-field face coefficients (aE, aN, aU) as f64 (nz, ny, nx)
    arrays when the operator is NOT profile-expressible (3-D diffusion
    fields — per-cell face means, optionally mask-closed), or None.

    Only three of the six faces are streamed: aW = roll_x(aE),
    aS = roll_y(aN), aD = roll_z(aU) hold EXACTLY by the face-mean
    construction (grid.py::BoxGeometry.divergence_coeffs64 builds the
    W/S/D faces as those very rolls), and the openness masks commute with
    the rolls (oW = roll_x(oE) etc., face_openness3) — asserted here at
    build time. The kernel recovers the missing faces in-window: lane/row
    rolls (valid at every consumed cell — the outermost ring is never
    consumed, the HALO >= stages argument) and the ring's p-1 slot for aD
    (zeroed at p=0, exact because closed z walls are gated)."""
    if problem.geometry.kind != "box":
        return None
    if problem.diffusion_field is None or \
            np.ndim(problem.diffusion_field) <= 1:
        return None
    faces = problem.geometry.divergence_coeffs64(
        problem.diffusion_field, face_mask=problem.face_mask)
    aE, aW, aN, aS, aU, aD = [np.asarray(a, np.float64) for a in faces]
    if aE.ndim != 3:
        return None
    # the roll identities are LOAD-BEARING (the kernel recovers aW/aS/aD
    # from them): verify explicitly rather than assert — under python -O a
    # bare assert vanishes and a future divergence_coeffs64/face-mask change
    # that breaks the identity would silently compute wrong faces. A
    # mismatch means the operator is not expressible here: decline to the
    # XLA divergence path (ADVICE r3).
    if not (np.array_equal(aW, np.roll(aE, 1, axis=-1))
            and np.array_equal(aS, np.roll(aN, 1, axis=-2))
            and np.array_equal(aD, np.roll(aU, 1, axis=-3))):
        return None
    return aE, aN, aU


def _box_tensor_fields(problem):
    """The 19-point tensor operator's streamed per-plane field set —
    (6, nz, ny, nx) f64 stack (aE, aN, aU, Dxy, Dxz, Dyz) + the three
    mixed inv4 weights — or None. Requires CLOSED z walls (boundary
    noflux/noflux_z): the z-streaming clamp needs aU[-1] == 0 and the
    wall layers of Dxz/Dyz zeroed (grid.py::tensor_coeffs64 boundary
    masking provides exactly that); aW/aS/aD are recovered in-kernel by
    the same roll identities as field mode (held by construction: the
    rolled faces are built AFTER wall masking)."""
    if problem.geometry.kind != "box":
        return None
    if getattr(problem, "diffusion_tensor", None) is None:
        return None
    faces, mixed, invs = problem.geometry.tensor_coeffs64(
        *problem.diffusion_tensor, boundary=problem.cfg.boundary)
    aE, aW, aN, aS, aU, aD = [np.asarray(a, np.float64) for a in faces]
    dxy, dxz, dyz = [np.asarray(a, np.float64) for a in mixed]
    if np.any(aU[-1] != 0.0):
        return None   # open z walls: the clamp would be wrong
    if np.any(dxz[0] != 0.0) or np.any(dxz[-1] != 0.0) \
            or np.any(dyz[0] != 0.0) or np.any(dyz[-1] != 0.0):
        return None   # mixed z legs must shut off at the walls
    if not (np.array_equal(aW, np.roll(aE, 1, axis=-1))
            and np.array_equal(aS, np.roll(aN, 1, axis=-2))
            and np.array_equal(aD, np.roll(aU, 1, axis=-3))):
        return None
    return (np.stack([aE, aN, aU, dxy, dxz, dyz]),
            tuple(float(v) for v in invs))


_BOX_MODE_CACHE: dict = {}


def _box_mode(problem):
    """("profile", profs) | ("field", (aE, aN, aU)) | (None, None),
    enforcing the closed-z-walls gate (the z clamp) in both modes.

    Cached per Problem instance: is_*_supported and the builders each need
    the mode, and the field construction materialises full (nz, ny, nx) f64
    face arrays — at 8M+ points that is hundreds of MB of transient host
    arrays per duplicate call (ADVICE r3). The cache is id-keyed with a
    weakref guard against id reuse."""
    import weakref
    key = id(problem)
    hit = _BOX_MODE_CACHE.get(key)
    if hit is not None and hit[0]() is problem:
        return hit[1]
    result = _box_mode_impl(problem)
    try:
        _BOX_MODE_CACHE[key] = (weakref.ref(
            problem, lambda _, k=key: _BOX_MODE_CACHE.pop(k, None)), result)
    except TypeError:
        pass
    return result


def _box_mode_impl(problem):
    if getattr(problem, "diffusion_tensor", None) is not None:
        tf = _box_tensor_fields(problem)
        return ("tensor", tf) if tf is not None else (None, None)
    profs = _box_profiles(problem)
    if profs is not None:
        if profs[4][-1] != 0.0 or profs[5][0] != 0.0:
            return None, None
        return "profile", profs
    fields = _box_field_faces(problem)
    if fields is None:
        return None, None
    aU = fields[2]
    if np.any(aU[-1] != 0.0):
        return None, None   # aD[0] = roll_z(aU)[0] = aU[-1]: one check
    return "field", fields


def is_box3d_supported(problem, tableau: Tableau, dtype) -> bool:
    cfg = problem.cfg
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return False   # free-form forcing needs the XLA path; structured
        # separable protocols run in-kernel (round 5): per-stage scalar
        # amplitudes at true stage times + rank-1 row/col/z profiles
    if problem.geometry.kind != "box":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if tableau.stages > HALO or tableau.stages < 2:
        return False
    mode, _ = _box_mode(problem)
    if mode is None:
        return False
    if mode == "tensor" and getattr(problem, "obstacle_mask",
                                    None) is not None:
        return False   # build_problem rejects this anyway
    has_tissue = getattr(problem, "obstacle_mask", None) is not None
    S = _pick_strip(cfg.ny, _box_strip_target(cfg.nx,
                                              problem.model.nvars,
                                              tableau.stages,
                                              has_tissue,
                                              "tensor" if mode == "tensor"
                                              else mode == "field"))
    if S is None or not (S >= HALO or cfg.ny <= S):
        return False
    return True


def build_fused_box3d_step(problem, tableau: Tableau, dtype=jnp.float32,
                           interpret: bool = False) -> FusedStep:
    cfg = problem.cfg
    model = problem.model
    nvars = model.nvars
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    rtol, atol = float(cfg.rtol), float(cfg.atol)
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)

    a = tableau.a
    bw = tableau.b
    d = tableau.b - tableau.bhat
    ns = tableau.stages
    P = HALO
    assert ns <= P
    has_tissue = getattr(problem, "obstacle_mask", None) is not None
    mode, mode_data = _box_mode(problem)
    if mode is None:
        raise ValueError("operator is neither profile-expressible nor a "
                         "closed-z 3-D field (is_box3d_supported should "
                         "have declined)")
    has_tensor = mode == "tensor"
    has_field = has_tensor or mode == "field"
    n_cfield = 6 if has_tensor else 3
    S = _pick_strip(ny, _box_strip_target(nx, nvars, ns, has_tissue,
                                          "tensor" if has_tensor
                                          else mode == "field"))
    if S is None:
        raise ValueError(f"ny={ny} has no multiple-of-8 divisor in [8,256]")
    n_strips = ny // S
    R = S + 2 * P
    nxp = lane_pad_width(nx, P)
    DY = ns + 3                               # y0 ring depth (+ prefetch)
    DK = [ns - j + 1 for j in range(ns - 1)]  # k_j ring depths
    DT = DY                                   # tissue ring (same schedule)
    DC = DY                                   # coefficient ring (fields)

    def pad_cols(arr):
        out = jnp.concatenate([arr[..., -P:], arr, arr[..., :P]], axis=-1)
        fill = nxp - (nx + 2 * P)
        if fill:
            padw = [(0, 0)] * (out.ndim - 1) + [(0, fill)]
            out = jnp.pad(out, padw)
        return out

    def unpad_cols(arr):
        return arr[..., P:P + nx]

    # beta / freeze-mask / error-column-mask plumbing (z-invariant: the
    # beta ramp and boundary freeze act on y rows — core/problem.py)
    kc = prepare_constants(problem, dtype, P, pad_cols, with_coeffs=False)
    b_is_field, has_freeze = kc.b_is_field, kc.has_freeze

    # structured forcing (core/forcing.py): per-stage scalar amplitudes
    # at true stage times t + c_s h computed OUTSIDE the kernel; rank-1
    # row/col profiles as wrapped constants (the 2-D pallas_step layout)
    # and the optional z profile as an SMEM (n_stim, nz) table read at
    # each evaluation's plane index (round 5 — VERDICT r4 item 1)
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    forcing = fused_forcing(problem)
    assert forcing is not False, "is_box3d_supported should have declined"
    n_stim = len(forcing.stimuli) if forcing else 0
    if n_stim:
        stim_vars = tuple(st.var for st in forcing.stimuli)
        c_nodes = tuple(float(c) for c in tableau.c)
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
        stim_z = jnp.asarray(np.stack(z_np), dtype)       # (n_stim, nz)
    else:
        stim_rows = jnp.zeros((1, 1, 1), dtype)
        stim_cols = jnp.zeros((1, 1, 1), dtype)
        stim_z = jnp.zeros((1, 1), dtype)
    amps0 = jnp.zeros((max(1, n_stim), ns), dtype)

    inv_xy = inv_xz = inv_yz = 0.0
    if has_field:
        # full-field faces: wrap-pad rows at build (static), stack the
        # streamed fields; the kernel recovers aW/aS in-window and aD
        # from the ring's p-1 slot (_box_field_faces contract). Tensor
        # mode streams six fields (3 faces + 3 mixed, _box_tensor_fields)
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
        # full-volume tissue mask, lane-padded like the state: the six
        # obstacle openness factors are recovered in-kernel from this one
        # field (module helper _box_profiles docstring)
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

    def kernel(h_ref, fz_ref, ds_ref, amps_ref, srow_ref, scol_ref,
               szp_ref, ae_ref, aw_ref, an_ref, as_ref,
               au_ref, ad_ref, b_ref, m_ref, cm_ref, y_hbm, t_hbm, c_hbm,
               ynew_ref, ss_ref, y0v, sems, tv, tsems, cv, csems, *kv):
        i = pl.program_id(0)
        m = pl.program_id(1)
        row0 = pl.multiple_of(i * S, 8)

        # --- y0 plane DMAs: ring slot m % DY holds plane m (m < nz);
        # prefetch plane m+1 while computing on plane m ---
        def plane_dmas(mm, slot):
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
                        tv.at[slot, pl.ds(0, P), :], tsems.at[slot, 0]),
                    pltpu.make_async_copy(
                        t_hbm.at[mm, pl.ds(row0, S), :],
                        tv.at[slot, pl.ds(P, S), :], tsems.at[slot, 1]),
                    pltpu.make_async_copy(
                        t_hbm.at[mm, pl.ds(bots, P), :],
                        tv.at[slot, pl.ds(P + S, P), :], tsems.at[slot, 2]),
                )
            if has_field:
                # build-time row padding makes the coefficient window
                # [row0, row0+R) contiguous: ONE copy per plane
                dmas += (
                    pltpu.make_async_copy(
                        c_hbm.at[:, mm, pl.ds(row0, R), :],
                        cv.at[slot], csems.at[slot, 0]),
                )
            return dmas

        dy = jnp.asarray(DY, m.dtype)

        @pl.when(m == 0)
        def _():
            for dma in plane_dmas(jnp.asarray(0, m.dtype), 0):
                dma.start()

        @pl.when(m + 1 < nz)
        def _():
            for dma in plane_dmas(m + 1, lax.rem(m + 1, dy)):
                dma.start()

        @pl.when(m < nz)
        def _():
            for dma in plane_dmas(m, lax.rem(m, dy)):
                dma.wait()

        h = h_ref[0, 0]
        ds = ds_ref[0, 0]
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

        def k_at(j, p):
            return kv[j][lax.rem(clampz(p), jnp.asarray(DK[j], m.dtype))]

        def yi_at(s, p):
            """Stage-s argument at (clamped) plane p, recombined from the
            rings: y0 + h * sum_j a[s,j] * k_j."""
            v = y0_at(p)
            for j in range(s):
                if a[s, j] != 0.0:
                    v = v + (h * float(a[s, j])) * k_at(j, p)
            return v

        def tis_at(p):
            return tv[lax.rem(clampz(p), dy)]

        def coeff_at(p):
            return cv[lax.rem(clampz(p), dy)]

        def rhs_at(s, p):
            """k_s at plane p: the 7-point divergence stencil + kinetics
            on the stage argument (z legs from the p+-1 argument planes).
            With obstacle scars the six openness factors are recovered
            from the tissue plane ring — 0/1 multiplies are exact, so the
            effective coefficients match the XLA path's pre-masked f64
            coefficients bitwise; kinetics on dead cells are zeroed like
            problem.py::mask_tissue. Full 3-D diffusion fields stream a
            coefficient plane ring instead: aE/aN/aU per cell, aW/aS by
            in-window rolls and aD from the ring's p-1 slot
            (_box_field_faces contract — masks already live in the
            streamed faces, so no openness recovery)."""
            yc = yi_at(s, p)
            yu = yi_at(s, p + 1)
            yd = yi_at(s, p - 1)
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
                    # mixed fields at p and (clamped) p+-1: the wall
                    # layers of Dxz/Dyz are zero (the _box_tensor_fields
                    # gate), so the clamped reads multiply to exactly the
                    # XLA path's periodic-roll-times-zero values
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
                # z walls are closed (gate), so the clamped ring read at
                # the seam multiplies a zero profile — exact
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
                    # the three centred mixed pairs, EXACTLY the XLA
                    # association (ops/stencil.py::anisotropic_laplacian3
                    # -> _mixed_pair: per pair t1 + t2, summed in
                    # xy, xz, yz order onto the axis part)
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
                # stage-s amplitude x z(p) x row-strip x lane profiles;
                # added BEFORE the freeze/tissue masks so stimulation is
                # masked exactly like every other RHS term (XLA parity)
                ex = {}
                for j2 in range(n_stim):
                    contrib = (amps_ref[j2, s] * szp_ref[j2, clampz(p)]
                               * srow_ref[j2, pl.ds(row0, R), :]
                               * scol_ref[j2, 0, :])
                    v2 = stim_vars[j2]
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

        # --- pipeline stages: k_s computed at plane m - s - 1 ---
        for s in range(ns - 1):
            # plane index is guaranteed in [0, nz-1] by the guard, so the
            # ring write needs no clamp
            @pl.when((m >= s + 1) & (m <= nz + s))
            def _(s=s):
                p = m - (s + 1)
                kv[s][lax.rem(p, jnp.asarray(DK[s], m.dtype))] = rhs_at(s, p)

        # --- drain: last stage + output at plane q = m - ns ---
        @pl.when(m >= ns)
        def _():
            q = m - ns
            k_last = rhs_at(ns - 1, q)

            def k_q(s):
                return k_last if s == ns - 1 else k_at(s, q)

            y0q = y0_at(q)
            ynew = y0q
            err = jnp.zeros_like(y0q)
            for s in range(ns):
                if bw[s] != 0.0:
                    ynew = ynew + (h * float(bw[s])) * k_q(s)
                if d[s] != 0.0:
                    err = err + (h * float(d[s])) * k_q(s)

            z = ynew[:, P:P + S, :]
            jcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, nxp), 2)
            zl = jnp.roll(z, -nx, axis=-1)
            zr = jnp.roll(z, nx, axis=-1)
            z = jnp.where(jcol < P, zl, jnp.where(jcol >= P + nx, zr, z))
            ynew_ref[:, 0, :, :] = z

            yc = y0q[:, P:P + S, :]
            w = cm_ref[:, :] / (rtol * jnp.abs(yc) + atol)
            scaled = err[:, P:P + S, :] * w
            val = jnp.sum(scaled * scaled)
            ss_ref[i, 0] = jnp.where(m == ns, val, ss_ref[i, 0] + val)

    smem_scalar = pl.BlockSpec((1, 1), lambda i, m: (0, 0),
                               memory_space=pltpu.SMEM)
    vmem_const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, m: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_strips, nz + ns),
        in_specs=[
            smem_scalar, smem_scalar, smem_scalar,   # h, fz, ds
            pl.BlockSpec(amps0.shape, lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),   # stage amplitudes
            vmem_const(stim_rows.shape),             # stimulus rows
            vmem_const(stim_cols.shape),             # stimulus cols
            pl.BlockSpec(stim_z.shape, lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),   # stimulus z profiles
            vmem_const((1, nxp)),                    # ae
            vmem_const((1, nxp)),                    # aw
            vmem_const((ny + 2 * P, 1)),             # an
            vmem_const((ny + 2 * P, 1)),             # as
            pl.BlockSpec((nz, 1), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),   # au
            pl.BlockSpec((nz, 1), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),   # ad
            vmem_const(kc.b_pad.shape),              # beta
            vmem_const(kc.m_pad.shape),              # interior mask
            vmem_const((1, nxp)),                    # error column mask
            pl.BlockSpec(memory_space=pltpu.HBM),    # y stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),    # tissue mask (or stub)
            pl.BlockSpec(memory_space=pltpu.HBM),    # coeff fields (or stub)
        ],
        out_specs=[
            pl.BlockSpec((nvars, 1, S, nxp),
                         lambda i, m: (0, jnp.maximum(m - ns, 0), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (n_strips, 1)
        ],
        scratch_shapes=[
            pltpu.VMEM((DY, nvars, R, nxp), dtype),
            pltpu.SemaphoreType.DMA((DY, 3)),
            pltpu.VMEM((DT, R, nxp) if has_tissue else (1, 1, 1), dtype),
            pltpu.SemaphoreType.DMA((DT, 3) if has_tissue else (1, 3)),
            pltpu.VMEM((DC, n_cfield, R, nxp) if has_field
                       else (1, 1, 1, 1), dtype),
            pltpu.SemaphoreType.DMA((DC, 1) if has_field else (1, 1)),
        ] + [pltpu.VMEM((dk, nvars, R, nxp), dtype) for dk in DK],
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

    one = jnp.ones((1, 1), dtype)

    def step_err(t, yp, h, params):
        fz = freeze_scalar(params, has_freeze, t_boundary, dtype)
        h_s = jnp.reshape(h.astype(dtype), (1, 1))
        fz_s = jnp.reshape(fz, (1, 1))
        if n_stim:
            # true stage times — the one place t enters the kernel
            from crdmodel_tpu.ops.kernel_common import stage_amplitudes
            amps = stage_amplitudes(forcing, t, h, c_nodes, params, dtype)
        else:
            amps = amps0
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
        ynew, ss = call(h_s, fz_s, ds_s, amps, stim_rows, stim_cols,
                        stim_z, ae_row, aw_row, an_col, as_col,
                        au_z, ad_z, b_in, kc.m_pad, kc.col_mask, yp,
                        th, ch)
        return ynew, jnp.sum(ss)

    return FusedStep(step_err=step_err, pad=pad_cols, unpad=unpad_cols,
                     nxp=nxp)
