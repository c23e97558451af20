"""Sharded simulation: the full adaptive integration inside jax.shard_map.

The whole solver loop (not just the RHS) runs under shard_map so each device
steps its local block while every control-flow decision — step accept/reject,
step-size update, failure flags — derives from `lax.psum`-reduced WRMS norms
and is therefore bitwise-identical across devices. This is the TPU-native
equivalent of the reference's SUNDIALS parallel NVector, whose hidden
allreduce per step synchronised ARKode's error control across MPI ranks
(src/FHNmodel_torus.cpp:281; SURVEY.md §2.5).

All spatial fields (state, metric coefficient profiles, beta ramp, boundary
masks) are *global* arrays sharded by in_specs — the global-row/column logic
(e.g. the freeze acting on global rows 0 and ny-1, src/FHNmodel_torus.cpp:643-653)
is data, so decomposition needs no index bookkeeping: the reference's
SetupDecomp is/ie/js/je arithmetic (src/FHNmodel_torus.cpp:750-755)
disappears entirely.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import Problem, beta_field, build_problem
from crdmodel_tpu.integrate.erk import integrate_to_outputs
from crdmodel_tpu.ops.stencil import (divergence3_from_padded,
                                      divergence_from_padded,
                                      laplacian_from_padded)
from crdmodel_tpu.ops.kernel_common import coeff_kind
from crdmodel_tpu.parallel.halo import halo_pad
from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
from crdmodel_tpu.sim import SimResult, output_times


def make_local_rhs(cfg: SimConfig, model, kind: str, split: bool = False,
                   pad_spec=None, divergence: bool = False, forcing=None,
                   tensor_inv4=None, tissue: bool = False,
                   pole_gs: tuple = ()):
    """RHS over a local (nvars, nyl, nxl) block with ppermute halos.

    Spatial inputs come through params (so they shard with the mesh):
      params["coeffs"]: stencil coefficient profiles ((nx,) arrays or scalars)
        — or, with divergence=True (spatially-varying diffusion), the four
        face-coefficient arrays (aE, aW, aN, aS) of the conservative
        operator (ops/stencil.py::divergence_from_padded)
      params["b"]: bifurcation parameter (scalar or (ny,1) ramp)
      params["interior"]: (ny,1) bool, False on global rows 0 and ny-1
      params["valid"]: (nyp, nxp) bool, False on pad cells (padded grids)
      params["tissue"]: (ny, nx) bool, False on obstacle cells (tissue=True
        — no-flux walls already live in the masked face coefficients; this
        freezes the kinetics so obstacle cells hold their IC exactly)
      params["_dxy_pad"]: haloed Dxy block — anisotropic tensor diffusion
        only (tensor_inv4 = the mixed-term weight 1/(4 dx dy); the caller
        halo-pads params["dxy"] ONCE per dispatch, outside the loop)
      params["_pole_c_{g}"]: (1, nx) block-Laplacian coefficient profile
        (aN/g^2 on the coarsened band columns, 0 elsewhere) per distinct
        pole group size g (pole_gs static) — the sharded reduced-grid
        sphere operator: per g, shard-local phi block means (g divides
        nyl, checked in sharded_params), ONE width-1 ppermute of the
        block-mean rows, and the Galerkin block Laplacian broadcast back
        (bitwise the single-device core/problem.py::_pole_bands band
        arithmetic; off-band columns multiply zero)

    split=True returns (rhs_ex, rhs_im) for the ark324 IMEX integrator: the
    implicit (reaction) part is pointwise — NO halo exchange, so the whole
    Newton stage solve is shard-local (integrate/imex.py design note).

    pad_spec: PadSpec when the grid doesn't divide the mesh
    (parallel/padding.py) — the halo exchange carries the physical-seam
    legs and every returned derivative is zeroed on pad cells, so pad
    values never move and error norms exclude them for free.
    """
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    has_freeze = (t_boundary > 0.0) and not just_diffusion
    dvars = tuple(model.diffusive_vars)
    ratios = tuple(model.diffusion_ratios)
    padded = pad_spec is not None and pad_spec.active
    seam_y = pad_spec.seam_y() if padded else None
    seam_x = pad_spec.seam_x() if padded else None

    def diffusion_terms(state, coeffs, params=None):
        out = []
        for v in range(model.nvars):
            if v in dvars:
                r = ratios[dvars.index(v)]
                up = halo_pad(state[v], seam_y=seam_y, seam_x=seam_x)
                if tensor_inv4 is not None:
                    from crdmodel_tpu.ops.stencil import (
                        anisotropic3_from_padded, anisotropic_from_padded)
                    if len(coeffs) == 6:
                        # 3-D box tensor: params["_dxy_pad"] is the
                        # stacked (3, nz, nyl+2, nxl+2) haloed
                        # (Dxy, Dxz, Dyz); tensor_inv4 the 3 weights
                        dp = params["_dxy_pad"]
                        term = anisotropic3_from_padded(
                            up, coeffs, (dp[0], dp[1], dp[2]),
                            tensor_inv4)
                    else:
                        inv4 = (params["inv4"]
                                if tensor_inv4 == "param" else tensor_inv4)
                        term = anisotropic_from_padded(
                            up, coeffs, params["_dxy_pad"], inv4)
                elif divergence:
                    # 3-D box: six faces, z mesh-local (ops/stencil.py::
                    # divergence3_from_padded — z neighbours via local roll)
                    term = (divergence3_from_padded(up, coeffs)
                            if len(coeffs) == 6
                            else divergence_from_padded(up, coeffs))
                    if pole_gs:
                        from crdmodel_tpu.parallel.halo import halo_pad_rows
                        u_loc = state[v]
                        for g in pole_gs:
                            c = params[f"_pole_c_{g}"]
                            nyg = u_loc.shape[-2] // g
                            ub = u_loc.reshape(
                                u_loc.shape[:-2]
                                + (nyg, g, u_loc.shape[-1])).mean(-2)
                            ubp = halo_pad_rows(ub)
                            lapb = c * (ubp[..., 2:, :] - 2.0 * ub
                                        + ubp[..., :-2, :])
                            term = term + jnp.repeat(lapb, g, axis=-2)
                else:
                    term = laplacian_from_padded(up, coeffs, kind)
                out.append(term if r == 1.0 else r * term)
            else:
                out.append(jnp.zeros_like(state[v]))
        diff = jnp.stack(out)
        if isinstance(params, dict) and "dscale" in params:
            diff = params["dscale"] * diff
        return diff

    def apply_freeze(t, params, ydot):
        seg_end = params.get("_seg_end")
        if seg_end is not None:
            freeze_now = (t < t_boundary) | (seg_end <= t_boundary)
        else:
            freeze_now = t < t_boundary
        frozen = jnp.where(params["interior"], ydot, 0.0)
        return jnp.where(freeze_now, frozen, ydot)

    def mask_pads(params, ydot):
        if tissue:
            ydot = jnp.where(params["tissue"], ydot, 0.0)
        if not padded:
            return ydot
        return jnp.where(params["valid"], ydot, 0.0)

    def rhs(t, state, params):
        diff = diffusion_terms(state, params["coeffs"], params)
        if forcing is not None:
            diff = diff + forcing(t, state, params)
        if just_diffusion:
            return mask_pads(params, diff)
        ydot = model.kinetics(state, params["b"]) + diff
        if has_freeze:
            ydot = apply_freeze(t, params, ydot)
        return mask_pads(params, ydot)

    if not split:
        return rhs

    def rhs_ex(t, state, params):
        diff = diffusion_terms(state, params["coeffs"], params)
        if forcing is not None:
            diff = diff + forcing(t, state, params)
        if not just_diffusion and has_freeze:
            diff = apply_freeze(t, params, diff)
        return mask_pads(params, diff)

    def rhs_im(t, state, params):
        if just_diffusion:
            return jnp.zeros_like(state)
        ydot = model.kinetics(state, params["b"])
        if has_freeze:
            ydot = apply_freeze(t, params, ydot)
        return mask_pads(params, ydot)

    return rhs_ex, rhs_im


def _axis_shape(mesh) -> dict:
    """{axis_name: size} for a Mesh — or pass a dict through unchanged
    (the ensemble sweep hands the spatial submesh shape directly,
    parallel/ensemble.py)."""
    if isinstance(mesh, dict):
        return mesh
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def mesh_pad_spec(cfg, mesh):
    """PadSpec for running cfg's grid on this mesh (parallel/padding.py);
    None when the grid divides the mesh evenly (no padding machinery).
    mesh: a Mesh or an {axis: size} dict (see _axis_shape). Configs on the
    fused-kernel path get 8-row-aligned blocks (padding.py::pad_spec_for)
    so the mirror-pad fused kernels can engage."""
    from crdmodel_tpu.parallel.padding import pad_spec_for
    shape = _axis_shape(mesh)
    spec = pad_spec_for(cfg, shape[AXIS_Y], shape[AXIS_X])
    return spec if spec.active else None


def _pole_shard_data(problem, dtype):
    """(pole_gs, face_coeffs, {g: (1, nx) coeff profile}) for the reduced
    (pole-coarsened) sphere on a device mesh, or None when coarsening is
    off. face_coeffs are the fine flux profiles with phi faces zeroed on
    coarsened rings; the per-g profiles carry aN/g^2 on that g's band
    columns and 0 elsewhere (core/problem.py::_pole_bands)."""
    from crdmodel_tpu.core.problem import _pole_bands
    pb = _pole_bands(problem.cfg, problem.geometry,
                     problem.diffusion_field, dtype,
                     face_mask=getattr(problem, "face_mask", None))
    if pb is None:
        return None
    bands, face_coeffs = pb
    nx = problem.geometry.grid.nx
    cmap = {}
    for sl, g, c in bands:
        full = cmap.setdefault(int(g), np.zeros((1, nx)))
        full[0, sl] = np.asarray(c, np.float64)
    gs = tuple(sorted(cmap))
    return gs, face_coeffs, {g: jnp.asarray(v, dtype)
                             for g, v in cmap.items()}


def check_pole_mesh(problem, mesh, pad_spec=None):
    """pole_gs for this run (possibly ()), validating the mesh: every pole
    group must divide the local phi block so block means stay shard-local."""
    cfg = problem.cfg
    if not getattr(cfg, "pole_coarsen", 0):
        return ()
    if pad_spec is not None and pad_spec.active:
        raise ValueError(
            "pole_coarsen does not compose with padded (uneven) meshes: "
            "pick a mesh whose y axis divides ny (and every pole group "
            "size divides nyl)")
    pd = _pole_shard_data(problem, jnp.dtype(cfg.dtype))
    if pd is None:
        return ()
    nyl = _local_block_shape(cfg, mesh, pad_spec)[0]
    bad = [g for g in pd[0] if nyl % g]
    if bad:
        raise ValueError(
            f"pole groups {bad} do not divide the local phi block "
            f"nyl={nyl}: choose a mesh with fewer shards along 'py' "
            "(phi block means must stay shard-local)")
    return pd[0]


def sharded_params(problem: Problem, pad_spec=None):
    """Global parameter arrays + their PartitionSpecs.

    With pad_spec (uneven grid), the spatial parameter arrays are wrap-
    padded to the mesh-divisible shape and a `valid` mask marks the
    physical cells; wrap fill keeps pad-cell kinetics/coefficients inside
    the physical value range (they are masked out of the dynamics, but
    spectral-radius bounds still see their values)."""
    cfg = problem.cfg
    dtype = jnp.dtype(cfg.dtype)
    padded = pad_spec is not None and pad_spec.active
    pole = None
    if getattr(cfg, "pole_coarsen", 0):
        if padded:
            raise ValueError("pole_coarsen does not compose with padded "
                             "(uneven) meshes (see check_pole_mesh)")
        pole = _pole_shard_data(problem, dtype)
    dxy = None
    if getattr(problem, "diffusion_tensor", None) is not None:
        # round 5: tensor + padded (uneven) grids are supported — the
        # two-phase seam-fixed exchange delivers correct DIAGONAL halo
        # values for every physical cell (pinned by
        # tests/test_uneven.py::test_seam_halo_nine_point_neighbourhoods),
        # and the Dxy exchange below carries the same seam legs
        face_t, mixed_np, inv_w = problem.geometry.tensor_coeffs64(
            *problem.diffusion_tensor, boundary=cfg.boundary)
        coeffs = tuple(jnp.asarray(a, dtype) for a in face_t)
        if not isinstance(inv_w, tuple) and np.ndim(inv_w) > 0:
            # curved-metric (nx,) mixed-weight profile: shards over the
            # x axis like every column profile (registered below)
            inv4_prof = jnp.asarray(
                np.asarray(inv_w, np.float64).reshape(1, -1), dtype)
        else:
            inv4_prof = None
        if len(face_t) == 6:
            # 3-D box tensor: stack (Dxy, Dxz, Dyz) so ONE halo exchange
            # per dispatch covers all three mixed fields
            dxy = jnp.stack([jnp.asarray(a, dtype) for a in mixed_np])
        else:
            dxy = jnp.asarray(mixed_np, dtype)
    elif pole is not None:
        # reduced (pole-coarsened) sphere: fine flux profiles with phi
        # faces zeroed on coarsened rings; the band operator rides the
        # per-g coefficient profiles registered below
        coeffs = tuple(jnp.asarray(c, dtype) for c in pole[1])
    elif problem.diffusion_field is not None:
        # conservative variable-coefficient operator: coeffs are the four
        # face arrays, (nx,) for x-only D fields or (ny, nx) for full
        # fields; face_mask zeros closed faces (no-flux boundaries /
        # obstacle walls) so the halo exchange needs no boundary handling
        coeffs = problem.geometry.divergence_coeffs(
            problem.diffusion_field, dtype,
            face_mask=getattr(problem, "face_mask", None))
    else:
        coeffs = problem.geometry.stencil_coeffs(dtype)
    if padded:
        def _pad_coeff(c):
            # pad only the axes whose extent matches the grid: the box's
            # broadcast-minimal coefficients carry size-1 placeholders
            # (e.g. aN (ny, 1), aU (nz, 1, 1)) that must stay untouched
            shp = getattr(c, "shape", ())
            if len(shp) >= 1 and shp[-1] == cfg.nx:
                c = pad_spec.pad_cols(c)
            if len(shp) >= 2 and shp[-2] == cfg.ny:
                c = pad_spec.pad_rows(c)
            return c
        coeffs = tuple(_pad_coeff(c) for c in coeffs)

    ny_arr = pad_spec.y.n_pad if padded else cfg.ny
    nx_arr = pad_spec.x.n_pad if padded else cfg.nx

    def _coeff_spec(c):
        # shard an axis only where the coefficient actually spans the grid
        # (size-1 broadcast axes and the box's leading z axis replicate)
        shp = getattr(c, "shape", ())
        if not shp:
            return P()
        spec = [None] * len(shp)
        if shp[-1] == nx_arr:
            spec[-1] = AXIS_X
        if len(shp) >= 2 and shp[-2] == ny_arr:
            spec[-2] = AXIS_Y
        return P(*spec)
    coeff_spec = tuple(_coeff_spec(c) for c in coeffs)
    b = beta_field(cfg, dtype)
    if padded and getattr(b, "ndim", 0) == 2:
        b = pad_spec.pad_rows(b)
    b_spec = P(AXIS_Y, None) if getattr(b, "ndim", 0) == 2 else P()
    interior = np.ones((cfg.ny, 1), dtype=bool)
    interior[0, 0] = False
    interior[-1, 0] = False
    if padded:
        # wrap-fill like every other row parameter: pad rows carry their
        # mirror source's value, so the fused kernels' mirror-pad cells
        # freeze exactly when their physical sources do (the XLA path
        # masks pad RHS entirely, so the fill is inert there)
        interior = np.asarray(pad_spec.pad_rows(interior))
    params = {"coeffs": coeffs, "b": b, "interior": jnp.asarray(interior)}
    specs = {"coeffs": coeff_spec, "b": b_spec, "interior": P(AXIS_Y, None)}
    if dxy is not None:
        if padded:
            # wrap-fill the trailing (ny, nx) axes like every other
            # spatial parameter (the leading (3, nz) axes of the box
            # stack are mesh-local); physical cells read Dxy only at
            # their own and seam-delivered positions, so the fill is
            # inert outside pad cells
            dxy = pad_spec.pad_field(dxy)
        params["dxy"] = dxy
        specs["dxy"] = (P(None, None, AXIS_Y, AXIS_X) if dxy.ndim == 4
                        else P(AXIS_Y, AXIS_X))
        if inv4_prof is not None:
            if padded:
                inv4_prof = pad_spec.pad_cols(inv4_prof)
            params["inv4"] = inv4_prof
            specs["inv4"] = P(None, AXIS_X)
    obstacle = getattr(problem, "obstacle_mask", None)
    if obstacle is not None:
        tis = np.broadcast_to(np.asarray(obstacle, dtype=bool),
                              problem.geometry.grid.shape)
        if padded:
            # pad cells are masked by "valid" regardless; wrap-fill keeps
            # the array mesh-divisible like every other spatial param
            tis = pad_spec.pad_rows(pad_spec.pad_cols(tis))
        params["tissue"] = jnp.asarray(tis)
        specs["tissue"] = (P(None, AXIS_Y, AXIS_X) if tis.ndim == 3
                           else P(AXIS_Y, AXIS_X))
    if padded:
        params["valid"] = jnp.asarray(pad_spec.valid_mask())
        specs["valid"] = P(AXIS_Y, AXIS_X)
    if pole is not None:
        for g, prof in pole[2].items():
            params[f"_pole_c_{g}"] = prof
            specs[f"_pole_c_{g}"] = P(None, AXIS_X)
    frc = getattr(problem, "forcing", None)
    from crdmodel_tpu.core.forcing import SeparableForcing
    if isinstance(frc, SeparableForcing):
        # register the stimulation profiles as sharded params so the
        # forcing sees LOCAL slices under shard_map (core/forcing.py
        # docstring); wrap-pad like every other spatial param so the
        # mirror-pad fused kernels see their sources' values at pad cells
        for i, st in enumerate(frc.stimuli):
            if st.spatial is not None:
                arr = np.broadcast_to(np.asarray(st.spatial, np.float64),
                                      (cfg.ny, cfg.nx))
                a = jnp.asarray(arr, dtype)
                if padded:
                    a = pad_spec.pad_rows(pad_spec.pad_cols(a))
                params[f"_stim_{i}"] = a
                specs[f"_stim_{i}"] = P(AXIS_Y, AXIS_X)
            else:
                r_ = (np.ones((cfg.ny, 1)) if st.row is None
                      else np.asarray(st.row, np.float64).reshape(-1, 1))
                c_ = (np.ones((1, cfg.nx)) if st.col is None
                      else np.asarray(st.col, np.float64).reshape(1, -1))
                rj, cj = jnp.asarray(r_, dtype), jnp.asarray(c_, dtype)
                if padded:
                    rj = pad_spec.pad_rows(rj)
                    cj = pad_spec.pad_cols(cj)
                params[f"_stim_row_{i}"] = rj
                specs[f"_stim_row_{i}"] = P(AXIS_Y, None)
                params[f"_stim_col_{i}"] = cj
                specs[f"_stim_col_{i}"] = P(None, AXIS_X)
    return params, specs


def _local_block_shape(cfg, mesh, pad_spec=None) -> tuple:
    """(nyl, nxl) of one shard on the mesh (Mesh or {axis: size} dict)."""
    if pad_spec is not None and pad_spec.active:
        return pad_spec.y.blk, pad_spec.x.blk
    shape = _axis_shape(mesh)
    return cfg.ny // shape[AXIS_Y], cfg.nx // shape[AXIS_X]


def _shard_kernel_eligible(cfg, mesh, interpret: bool) -> bool:
    """Shard-kernel selection policy: explicit use_pallas wins; auto
    compares the LOCAL block size against the measured crossover (the
    per-chip work is nyl*nxl — gating on the global grid would enable the
    kernel for tiny per-device blocks where launch overhead loses to XLA).
    interpret=True (CPU-mesh tests) requires explicit use_pallas."""
    if interpret:
        return cfg.use_pallas is True
    if cfg.use_pallas is False:
        return False
    if cfg.use_pallas is None:
        from crdmodel_tpu.config import PALLAS_AUTO_POINTS
        nyl, nxl = _local_block_shape(cfg, mesh)
        if nyl * nxl < PALLAS_AUTO_POINTS:
            return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return True


def maybe_fused_shard_step(problem: Problem, mesh: Mesh,
                           interpret: bool = False, pad_spec=None):
    """The fused multi-stage shard kernel (ops/pallas_shard_step.py) when the
    configuration supports it, else None (XLA per-stage path). Padded
    (uneven) grids run the kernel in MIRROR-pad mode (pad cells evolve as
    live copies of their wrapped sources; ops/kernel_common.py::
    make_shard_halo_helpers)."""
    from crdmodel_tpu.integrate.erk import TABLEAUS
    cfg = problem.cfg
    if problem.diffusion_field is not None and (
            problem.geometry.kind not in ("torus", "revolution")
            or np.ndim(problem.diffusion_field) > 1):
        return None   # only theta-only torus fields map onto the kernels
                      # (ops/kernel_common.py::kernel_stencil_coeffs)
    if getattr(problem, "face_mask", None) is not None:
        return None   # no-flux boundaries / obstacle walls: masked 2-D
                      # face coefficients, XLA divergence path only
    if getattr(problem, "diffusion_tensor", None) is not None:
        return None   # anisotropic 9-point operator: XLA path only
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return None   # only structured separable forcing runs in-kernel
    if getattr(cfg, "pole_coarsen", 0):
        return None   # reduced-grid pole coarsening: XLA reduced
        # operator (shards via the band machinery, sharded_params)
    if cfg.method not in TABLEAUS:   # rkc2 / ark324 have their own paths
        return None
    if not _shard_kernel_eligible(cfg, mesh, interpret):
        return None
    from crdmodel_tpu.ops import pallas_shard_step
    tableau = TABLEAUS[cfg.method]
    nyl, nxl = _local_block_shape(cfg, mesh, pad_spec)
    dtype = jnp.dtype(cfg.dtype)
    if not pallas_shard_step.is_shard_supported(problem, tableau, dtype,
                                                nyl, nxl):
        return None
    return pallas_shard_step.build_fused_shard_step(
        problem, tableau, nyl, nxl, dtype, interpret=interpret,
        pad_spec=pad_spec)


def maybe_fused_shard_box3d(problem: Problem, mesh: Mesh,
                            interpret: bool = False, pad_spec=None):
    """The fused z-streaming 3-D box shard kernel
    (ops/pallas_shard_box3d.py) when supported, else None (XLA 7-point
    path). Same FusedShardStep protocol as the 2-D shard kernels."""
    from crdmodel_tpu.integrate.erk import TABLEAUS
    cfg = problem.cfg
    if problem.geometry.kind != "box":
        return None
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return None   # only structured separable forcing runs in-kernel
    if cfg.method not in TABLEAUS:
        return None
    # selection policy: like _shard_kernel_eligible but sized on the
    # per-shard VOLUME against the measured 3-D crossover
    if interpret:
        if cfg.use_pallas is not True:
            return None
    elif cfg.use_pallas is False:
        return None
    else:
        nyl, nxl = _local_block_shape(cfg, mesh)
        if cfg.use_pallas is None:
            from crdmodel_tpu.config import PALLAS_BOX3D_AUTO_POINTS
            if cfg.nz * nyl * nxl < PALLAS_BOX3D_AUTO_POINTS:
                return None
        try:
            if jax.default_backend() != "tpu":
                return None
        except Exception:
            return None
    from crdmodel_tpu.ops import pallas_shard_box3d
    tableau = TABLEAUS[cfg.method]
    nyl, nxl = _local_block_shape(cfg, mesh, pad_spec)
    dtype = jnp.dtype(cfg.dtype)
    if not pallas_shard_box3d.is_shard_box3d_supported(problem, tableau,
                                                       dtype, nyl, nxl):
        return None
    return pallas_shard_box3d.build_fused_shard_box3d(
        problem, tableau, nyl, nxl, dtype, interpret=interpret,
        pad_spec=pad_spec)


def maybe_fused_shard_divform(problem: Problem, mesh: Mesh,
                              interpret: bool = False, pad_spec=None):
    """The fused divergence-form shard kernel (ops/pallas_shard_divform.py)
    for the configurations maybe_fused_shard_step declines — no-flux
    boundaries, obstacle walls, 2-D/flat diffusion fields — else None.
    Same FusedShardStep protocol, so the drivers treat it as `fused`."""
    from crdmodel_tpu.integrate.erk import TABLEAUS
    from crdmodel_tpu.ops.kernel_common import needs_divform
    cfg = problem.cfg
    if problem.geometry.kind == "box":
        return None   # 3-D box: XLA 7-point path (kernels are 2-D machines)
    if not needs_divform(problem):
        return None   # the profile/aniso kernels' territory
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return None   # only structured separable forcing runs in-kernel
    if cfg.method not in TABLEAUS:
        return None
    if not _shard_kernel_eligible(cfg, mesh, interpret):
        return None
    from crdmodel_tpu.ops import pallas_shard_divform
    tableau = TABLEAUS[cfg.method]
    nyl, nxl = _local_block_shape(cfg, mesh, pad_spec)
    dtype = jnp.dtype(cfg.dtype)
    if not pallas_shard_divform.is_shard_divform_supported(
            problem, tableau, dtype, nyl, nxl):
        return None
    return pallas_shard_divform.build_fused_shard_divform(
        problem, tableau, nyl, nxl, dtype, interpret=interpret,
        pad_spec=pad_spec)


def maybe_fused_shard_aniso(problem: Problem, mesh: Mesh,
                            interpret: bool = False, pad_spec=None):
    """The 2-D anisotropic 9-point tensor through the windowed-coefficient
    shard kernel (ops/pallas_shard_divform.py aniso mode: Dxy streamed as
    a fourth field, the mixed pair added in-kernel). Tensor + padded (uneven)
    grids compose: the Dxy field rides the mirror-haloed coefficient
    stack like the three face fields (round 5)."""
    from crdmodel_tpu.integrate.erk import TABLEAUS
    cfg = problem.cfg
    if getattr(problem, "diffusion_tensor", None) is None:
        return None
    if problem.geometry.kind not in ("flat", "torus", "revolution"):
        return None   # curved surfaces: the mixed-weight profile streams
        # as a lane input (round 5 — pallas_shard_divform aniso docstring)
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return None
    if cfg.method not in TABLEAUS:
        return None
    if not _shard_kernel_eligible(cfg, mesh, interpret):
        return None
    from crdmodel_tpu.ops import pallas_shard_divform
    tableau = TABLEAUS[cfg.method]
    nyl, nxl = _local_block_shape(cfg, mesh, pad_spec)
    dtype = jnp.dtype(cfg.dtype)
    if not pallas_shard_divform.is_shard_divform_supported(
            problem, tableau, dtype, nyl, nxl, aniso=True):
        return None
    return pallas_shard_divform.build_fused_shard_divform(
        problem, tableau, nyl, nxl, dtype, interpret=interpret,
        pad_spec=pad_spec, aniso=True)


def maybe_fused_shard_rkc(problem: Problem, mesh: Mesh, rho_fn,
                          interpret: bool = False, pad_spec=None):
    """Sharded fused RKC2 (ops/pallas_shard_rkc.py) when supported — the
    production configuration for diffusion-limited large grids on a mesh.
    3-D boxes route to the z-streaming variant
    (ops/pallas_shard_box3d_rkc.py)."""
    cfg = problem.cfg
    if cfg.use_pallas is None:
        from crdmodel_tpu.sim import _quiescent_autonomous
        if _quiescent_autonomous(problem):
            return None   # stage-budget cost model: a provably-quiescent
            # run inflates fused steps at the h cap with nothing to
            # amortise (sim.py::_quiescent_autonomous; PERF_NOTES r5)
    if problem.geometry.kind == "box":
        from crdmodel_tpu.ops.kernel_common import fused_forcing
        if fused_forcing(problem) is False:
            return None   # only structured separable forcing in-kernel
        if cfg.method != "rkc2":
            return None
        if interpret:
            if cfg.use_pallas is not True:
                return None
        elif cfg.use_pallas is False:
            return None
        else:
            nyl, nxl = _local_block_shape(cfg, mesh)
            if cfg.use_pallas is None:
                from crdmodel_tpu.config import PALLAS_BOX3D_AUTO_POINTS
                if cfg.nz * nyl * nxl < PALLAS_BOX3D_AUTO_POINTS:
                    return None
            try:
                if jax.default_backend() != "tpu":
                    return None
            except Exception:
                return None
        from crdmodel_tpu.ops import pallas_shard_box3d_rkc
        nyl, nxl = _local_block_shape(cfg, mesh, pad_spec)
        dtype = jnp.dtype(cfg.dtype)
        if not pallas_shard_box3d_rkc.is_shard_box3d_rkc_supported(
                problem, dtype, nyl, nxl):
            return None
        return pallas_shard_box3d_rkc.build_fused_shard_box3d_rkc(
            problem, nyl, nxl, dtype, rho_fn=rho_fn, interpret=interpret,
            pad_spec=pad_spec)
    if problem.diffusion_field is not None and (
            problem.geometry.kind not in ("torus", "revolution")
            or np.ndim(problem.diffusion_field) > 1):
        return None   # only theta-only torus fields map onto the kernels
                      # (ops/kernel_common.py::kernel_stencil_coeffs)
    if getattr(problem, "face_mask", None) is not None:
        return None   # no-flux boundaries / obstacle walls: masked 2-D
                      # face coefficients, XLA divergence path only
    if getattr(problem, "diffusion_tensor", None) is not None:
        return None   # anisotropic 9-point operator: XLA path only
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return None   # free-form forcing: XLA path (true stage times);
        # is_shard_rkc_supported additionally requires segment-gated
        # (pulse) stimuli — smooth waveforms vary across Chebyshev stages
    if getattr(cfg, "pole_coarsen", 0):
        return None   # reduced-grid pole coarsening: XLA reduced
        # operator (shards via the band machinery, sharded_params)
    if cfg.method != "rkc2":
        return None
    if not _shard_kernel_eligible(cfg, mesh, interpret):
        return None
    from crdmodel_tpu.ops import pallas_shard_rkc
    nyl, nxl = _local_block_shape(cfg, mesh, pad_spec)
    dtype = jnp.dtype(cfg.dtype)
    if not pallas_shard_rkc.is_shard_rkc_supported(problem, dtype, nyl, nxl):
        return None
    return pallas_shard_rkc.build_fused_shard_rkc(
        problem, nyl, nxl, dtype, rho_fn=rho_fn, interpret=interpret,
        pad_spec=pad_spec)


def maybe_fused_shard_imex(problem: Problem, mesh: Mesh,
                           interpret: bool = False, pad_spec=None):
    """Sharded fused IMEX step (ops/pallas_shard_imex.py) when supported —
    one halo exchange per ark324 step, shard-local Newton in-kernel."""
    cfg = problem.cfg
    if problem.diffusion_field is not None and (
            problem.geometry.kind not in ("torus", "revolution")
            or np.ndim(problem.diffusion_field) > 1):
        return None   # only theta-only torus fields map onto the kernels
                      # (ops/kernel_common.py::kernel_stencil_coeffs)
    if getattr(problem, "face_mask", None) is not None:
        return None   # no-flux boundaries / obstacle walls: masked 2-D
                      # face coefficients, XLA divergence path only
    if getattr(problem, "diffusion_tensor", None) is not None:
        return None   # anisotropic 9-point operator: XLA path only
    from crdmodel_tpu.ops.kernel_common import fused_forcing
    if fused_forcing(problem) is False:
        return None   # free-form forcing: XLA (true stage times);
        # structured protocols ride the explicit stages (round 5)
    if getattr(cfg, "pole_coarsen", 0):
        return None   # reduced-grid pole coarsening: XLA reduced
        # operator (shards via the band machinery, sharded_params)
    if cfg.method != "ark324":
        return None
    if not _shard_kernel_eligible(cfg, mesh, interpret):
        return None
    from crdmodel_tpu.ops import pallas_shard_imex
    nyl, nxl = _local_block_shape(cfg, mesh, pad_spec)
    dtype = jnp.dtype(cfg.dtype)
    if not pallas_shard_imex.is_shard_imex_supported(problem, dtype,
                                                     nyl, nxl):
        return None
    return pallas_shard_imex.build_fused_shard_imex(
        problem, nyl, nxl, dtype, interpret=interpret,
        pad_spec=pad_spec)


def _make_reduce(params):
    """psum-reduction for WRMS norms. With padded params (uneven grid),
    cell-shaped inputs (ndim >= 2: the full-field norms of the initial
    step-size heuristic) are masked to the physical cells; already-reduced
    scalar partial sums pass through (the XLA steppers' err_ss is built
    from the pad-masked RHS, so pad cells contribute exactly zero)."""
    valid = params.get("valid") if params is not None else None

    def reduce_fn(x):
        if valid is not None and getattr(x, "ndim", 0) >= 2 \
                and x.shape[-2:] == valid.shape[-2:]:
            # cell-shaped full-field norms (initial step-size heuristic);
            # the fused kernels' (n_strips, 1) partial sums are already
            # masked in-kernel and pass through
            x = jnp.where(valid, x, 0.0)
        return lax.psum(jnp.sum(x), (AXIS_Y, AXIS_X))

    return reduce_fn


def _mask_rho(rho0):
    """Spectral-radius bound over the PHYSICAL cells only: pad cells hold
    frozen IC values whose kinetics Jacobian bound could exceed the live
    field's as it evolves; substitute each shard's own (0,0) cell so the
    pmax sees physical values. (On pad-dominated shards that cell is itself
    a frozen wrap-copied IC — finite and conservative: the max over a
    superset of physical values can only add stages, never lose them.)"""
    def rho(t, y, params):
        y = jnp.where(params["valid"], y, y[..., :1, :1])
        return rho0(t, y, params)

    return rho


def build_local_run(problem: Problem, mesh,
                    interpret_pallas: bool = False,
                    extra_param_specs: Optional[dict] = None,
                    member_sync: bool = False):
    """One member's spatially-decomposed run_local(y0_local, params_local)
    -> (traj, stats), plus its PartitionSpecs, pad_spec and output times.

    This is the body make_sharded_simulation_fn puts under shard_map —
    exposed separately so the ensemble sweep (parallel/ensemble.py) can
    embed the SAME program per member inside a shard_map whose mesh has a
    leading 'member' axis: every cross-device reduction in here names the
    spatial axes ('py','px') explicitly, so members never couple through
    the error control.

    member_sync=True runs the adaptive loops in cross-member LOCKSTEP
    (integrate_interval sync_fn): the halo ppermutes are single whole-mesh
    collectives, so divergent per-member trip counts would deadlock them —
    finished members instead spin through state-frozen no-op iterations
    until the slowest member finishes, preserving exact per-member step
    sequences. Requires a MATCHED per-step collective count: rkc2's stage
    loop (halo exchange per Chebyshev stage) is data-dependent, so its
    stage count is additionally pmax'ed over the member axis
    (rkc.make_rkc2_step_err stage_sync) — always stable, still 2nd order,
    but members forced above their own stage requirement take a slightly
    different (equally valid) step than they would solo, so rkc2 composed
    sweeps match solo runs to integration tolerance rather than bitwise
    (documented divergence; member-only meshes stay bitwise).

    mesh: a Mesh or an {axis: size} dict covering the SPATIAL axes only."""
    cfg = problem.cfg
    model = problem.model
    kind = coeff_kind(problem.geometry.kind)
    touts = output_times(cfg)
    pad_spec = mesh_pad_spec(cfg, mesh)
    padded = pad_spec is not None
    divergence = problem.diffusion_field is not None
    tensor = getattr(problem, "diffusion_tensor", None)
    tensor_inv4 = None
    if tensor is not None:
        tensor_inv4 = problem.geometry.tensor_coeffs64(
            *tensor, boundary=cfg.boundary)[2]
        # python floats: an np.float64 scalar would promote the whole f32
        # RHS to f64 under x64 (the forced-x64 CPU test environment)
        if isinstance(tensor_inv4, tuple):
            tensor_inv4 = tuple(float(v) for v in tensor_inv4)
        elif np.ndim(tensor_inv4) > 0:
            # curved-metric mixed weight (TorusGeometry.tensor_coeffs64:
            # inv4 is an (nx,) profile 1/(4 dx dy r ring)) — the LOCAL
            # slice rides params["inv4"] (sharded_params), so the static
            # closure value is just a marker here
            tensor_inv4 = "param"
        else:
            tensor_inv4 = float(tensor_inv4)
    tissue = getattr(problem, "obstacle_mask", None) is not None
    pole_gs = check_pole_mesh(problem, mesh, pad_spec)
    local_rhs = make_local_rhs(cfg, model, kind, pad_spec=pad_spec,
                               divergence=divergence,
                               forcing=problem.forcing,
                               tensor_inv4=tensor_inv4, tissue=tissue,
                               pole_gs=pole_gs)
    # PHYSICAL cell count: pad cells contribute exactly zero to every norm
    # (masked RHS => zero error stages; explicit mask in reduce_fn below)
    global_size = problem.y0.size   # nvars*ny*nx (+ nz on the 3-D box)

    from crdmodel_tpu.core.problem import solver_breakpoints
    breakpoints = solver_breakpoints(cfg, problem.forcing)

    rho_fn = None
    if cfg.method == "rkc2":
        from crdmodel_tpu.core.problem import make_rho_bound
        # pmax so every device picks the same stage count
        rho_fn = make_rho_bound(
            cfg, model, problem.geometry, jnp.dtype(cfg.dtype),
            max_reduce=lambda x: lax.pmax(x, (AXIS_Y, AXIS_X)),
            diffusion_field=problem.diffusion_field,
            diffusion_tensor=tensor,
            face_mask=getattr(problem, "face_mask", None))
        if padded:
            rho_fn = _mask_rho(rho_fn)

    rhs_split = (make_local_rhs(cfg, model, kind, split=True,
                                pad_spec=pad_spec, divergence=divergence,
                                forcing=problem.forcing,
                                tensor_inv4=tensor_inv4, tissue=tissue,
                                pole_gs=pole_gs)
                 if cfg.method == "ark324" else None)

    fused = (maybe_fused_shard_step(problem, mesh,
                                    interpret=interpret_pallas,
                                    pad_spec=pad_spec)
             or maybe_fused_shard_divform(problem, mesh,
                                          interpret=interpret_pallas,
                                          pad_spec=pad_spec)
             or maybe_fused_shard_aniso(problem, mesh,
                                        interpret=interpret_pallas,
                                        pad_spec=pad_spec)
             or maybe_fused_shard_box3d(problem, mesh,
                                        interpret=interpret_pallas,
                                        pad_spec=pad_spec))
    fimex = maybe_fused_shard_imex(problem, mesh,
                                   interpret=interpret_pallas,
                                   pad_spec=pad_spec)
    sync_fn = None
    stage_sync = None
    if member_sync:
        # lockstep ensemble: the fused ERK/IMEX shard kernels are
        # lockstep-safe (FIXED ppermute count per step: the splice
        # transport and the in-kernel work don't depend on data). The
        # fused RKC kernel is NOT (per-step halo-depth variant switch
        # with different collective shapes per branch) — rkc2 takes the
        # XLA path with a member-pmax'ed stage count instead (docstring).
        from crdmodel_tpu.parallel.mesh import AXIS_M
        frkc = None
        sync_fn = lambda go: lax.pmax(go.astype(jnp.int32), AXIS_M) > 0
        if cfg.method == "rkc2":
            stage_sync = lambda s: lax.pmax(s, AXIS_M)
    else:
        frkc = maybe_fused_shard_rkc(problem, mesh, rho_fn,
                                     interpret=interpret_pallas,
                                     pad_spec=pad_spec)

    def run_local(y0, params):
        reduce_fn = _make_reduce(params if padded else None)
        kw = {}
        params_run = params
        if tensor is not None:
            # one ring exchange per DISPATCH (not per RHS eval): Dxy is
            # static, only its halo view is mesh-local (the XLA local_rhs
            # — h0 heuristic and fallback path — reads it; the fused box
            # tensor kernel streams its own field ring instead)
            params_run = {**params, "_dxy_pad": halo_pad(
                params["dxy"],
                seam_y=pad_spec.seam_y() if padded else None,
                seam_x=pad_spec.seam_x() if padded else None)}
        if fused is not None:
            params_run = fused.prepare_params(params_run)
            kw = dict(
                step_err=lambda t, y, h, p, carry:
                    (*fused.step_err(t, y, h, p), ()),
                y_loop0=fused.pad(y0), capture=fused.unpad)
        elif fimex is not None:
            from crdmodel_tpu.integrate import imex
            params_run = fimex.prepare_params(params_run)
            kw = dict(
                step_err=lambda t, y, h, p, carry:
                    (*fimex.step_err(t, y, h, p), ()),
                init_carry=lambda t, y, p: (),
                err_order=imex.ERR_ORDER,
                y_loop0=fimex.pad(y0), capture=fimex.unpad)
        elif frkc is not None:
            from crdmodel_tpu.integrate import rkc as _rkc
            params_run = frkc.prepare_params(params_run)
            kw = dict(step_err=frkc.step_err,
                      y_loop0=frkc.pad(y0), capture=frkc.unpad,
                      err_order=_rkc.ERR_ORDER,
                      h_limit_fn=frkc.h_limit)
        return integrate_to_outputs(
            local_rhs, y0, params_run, 0.0, touts,
            rtol=cfg.rtol, atol=cfg.atol, method=cfg.method,
            max_steps=cfg.max_steps, breakpoints=breakpoints,
            reduce_fn=reduce_fn, global_size=global_size, rho_fn=rho_fn,
            rhs_split=rhs_split, step_mode=cfg.step_mode, sync_fn=sync_fn,
            stage_sync=stage_sync, **kw)

    _, param_specs = sharded_params(problem, pad_spec)
    if extra_param_specs:
        param_specs = {**param_specs, **extra_param_specs}
    return run_local, param_specs, pad_spec, touts


def make_sharded_simulation_fn(problem: Problem, mesh: Mesh,
                               interpret_pallas: bool = False,
                               extra_param_specs: Optional[dict] = None):
    """Jitted (y0, params) -> (traj, stats) with everything under shard_map.

    extra_param_specs: PartitionSpecs for additional (replicated or sharded)
    keys the caller will add to params at call time — e.g. the sweep
    driver's per-member "dscale" scalar (sweep.py::sweep_configs; only valid
    on the XLA path, which sweeps force)."""
    run_local, param_specs, _, touts = build_local_run(
        problem, mesh, interpret_pallas, extra_param_specs)
    state_spec = _state_spec(problem)
    traj_spec = P(None, *state_spec)
    stats_spec = jax.tree_util.tree_map(lambda _: P(), _stats_struct())

    fn = jax.shard_map(
        run_local,
        mesh=mesh,
        in_specs=(state_spec, param_specs),
        out_specs=(traj_spec, stats_spec),
        # the Pallas interpreter's internal slices trip shard_map's vma
        # checker (real TPU lowering declares vma on out_shapes and passes)
        check_vma=not interpret_pallas,
    )
    return jax.jit(fn), touts


def _state_spec(problem):
    """PartitionSpec of the state: trailing (y, x) axes on the mesh,
    everything leading (nvars, and the box's z axis) replicated."""
    return P(*([None] * (problem.y0.ndim - 2)), AXIS_Y, AXIS_X)


def _stats_struct():
    from crdmodel_tpu.integrate.erk import SolveStats
    return SolveStats(steps=0, accepted=0, rejected=0, status=0)


def make_sharded_interval_fn(problem: Problem, mesh: Mesh,
                             interpret_pallas: bool = False):
    """Jitted sharded single-interval steppers over global arrays.

    Returns (one_interval, h0_fn, one_interval_free, snap_at); the last two
    are None unless cfg.step_mode == "normal", where they provide the
    free-running (ARK_NORMAL) interval with its dense-output bracket and
    the cubic-Hermite snapshot evaluator.

    The per-interval building block for streaming sharded runs — at
    production scale a whole run in one dispatch is both unwieldy (tens of
    seconds of device time) and brittle; one dispatch per output interval
    keeps each execution bounded while everything still runs under
    shard_map with psum'd control flow.
    """
    from crdmodel_tpu.integrate.erk import (
        _initial_step, integrate_interval, make_stepper)

    cfg = problem.cfg
    model = problem.model
    kind = coeff_kind(problem.geometry.kind)
    pad_spec = mesh_pad_spec(cfg, mesh)
    padded = pad_spec is not None
    divergence = problem.diffusion_field is not None
    tensor = getattr(problem, "diffusion_tensor", None)
    tensor_inv4 = None
    if tensor is not None:
        tensor_inv4 = problem.geometry.tensor_coeffs64(
            *tensor, boundary=cfg.boundary)[2]
        # python floats: an np.float64 scalar would promote the whole f32
        # RHS to f64 under x64 (the forced-x64 CPU test environment)
        if isinstance(tensor_inv4, tuple):
            tensor_inv4 = tuple(float(v) for v in tensor_inv4)
        elif np.ndim(tensor_inv4) > 0:
            # curved-metric mixed weight (TorusGeometry.tensor_coeffs64:
            # inv4 is an (nx,) profile 1/(4 dx dy r ring)) — the LOCAL
            # slice rides params["inv4"] (sharded_params), so the static
            # closure value is just a marker here
            tensor_inv4 = "param"
        else:
            tensor_inv4 = float(tensor_inv4)
    tissue = getattr(problem, "obstacle_mask", None) is not None
    pole_gs = check_pole_mesh(problem, mesh, pad_spec)
    local_rhs = make_local_rhs(cfg, model, kind, pad_spec=pad_spec,
                               divergence=divergence,
                               forcing=problem.forcing,
                               tensor_inv4=tensor_inv4, tissue=tissue,
                               pole_gs=pole_gs)
    global_size = problem.y0.size   # physical count (see sim fn)
    dtype = jnp.dtype(cfg.dtype)

    def tensor_params(p):
        if tensor is None:
            return p
        # one seam-legged ring exchange per dispatch: the mixed terms
        # form fluxes at neighbour points, so Dxy needs the same
        # (physically-wrapped) 1-ring halo as the state
        return {**p, "_dxy_pad": halo_pad(
            p["dxy"],
            seam_y=pad_spec.seam_y() if padded else None,
            seam_x=pad_spec.seam_x() if padded else None)}

    rho_fn = None
    if cfg.method == "rkc2":
        from crdmodel_tpu.core.problem import make_rho_bound
        rho_fn = make_rho_bound(
            cfg, model, problem.geometry, dtype,
            max_reduce=lambda x: lax.pmax(x, (AXIS_Y, AXIS_X)),
            diffusion_field=problem.diffusion_field,
            diffusion_tensor=tensor,
            face_mask=getattr(problem, "face_mask", None))
        if padded:
            rho_fn = _mask_rho(rho_fn)

    fused = (maybe_fused_shard_step(problem, mesh,
                                    interpret=interpret_pallas,
                                    pad_spec=pad_spec)
             or maybe_fused_shard_divform(problem, mesh,
                                          interpret=interpret_pallas,
                                          pad_spec=pad_spec)
             or maybe_fused_shard_aniso(problem, mesh,
                                        interpret=interpret_pallas,
                                        pad_spec=pad_spec)
             or maybe_fused_shard_box3d(problem, mesh,
                                        interpret=interpret_pallas,
                                        pad_spec=pad_spec))
    frkc = maybe_fused_shard_rkc(problem, mesh, rho_fn,
                                 interpret=interpret_pallas,
                                 pad_spec=pad_spec)
    fimex = maybe_fused_shard_imex(problem, mesh, interpret=interpret_pallas,
                                   pad_spec=pad_spec)
    h_limit_fn = None
    if fused is not None:
        from crdmodel_tpu.integrate.erk import TABLEAUS
        step_err = lambda t, y, h, p, carry: (*fused.step_err(t, y, h, p), ())
        init_carry = lambda t, y, params: ()
        err_order = TABLEAUS[cfg.method].err_order
    elif fimex is not None:
        from crdmodel_tpu.integrate import imex as _imex
        step_err = lambda t, y, h, p, carry: (*fimex.step_err(t, y, h, p), ())
        init_carry = lambda t, y, params: ()
        err_order = _imex.ERR_ORDER
    elif frkc is not None:
        from crdmodel_tpu.integrate import rkc as _rkc
        step_err = frkc.step_err
        init_carry = lambda t, y, params: ()
        err_order = _rkc.ERR_ORDER
        h_limit_fn = frkc.h_limit
    else:
        rhs_split = (make_local_rhs(cfg, model, kind, split=True,
                                    pad_spec=pad_spec,
                                    divergence=divergence,
                                    forcing=problem.forcing,
                                    tensor_inv4=tensor_inv4, tissue=tissue,
                                    pole_gs=pole_gs)
                     if cfg.method == "ark324" else None)
        step_err, init_carry, err_order = make_stepper(
            cfg.method, local_rhs, cfg.rtol, cfg.atol, rho_fn, rhs_split)

    kernel = next((k for k in (fused, fimex, frkc) if k is not None), None)
    _, param_specs = sharded_params(problem, pad_spec)
    state_spec = _state_spec(problem)
    scalar = P()
    stats_spec = (scalar, scalar, scalar, scalar)

    def one_interval_local(t, y, h, errp, status, tout, first, params):
        reduce_fn = _make_reduce(params if padded else None)
        p = {**tensor_params(params), "_seg_end": tout}
        if kernel is not None:
            p = kernel.prepare_params(p)
            y = kernel.pad(y)
        fc0 = init_carry(t, y, p)
        t, y, h, errp, stats = integrate_interval(
            step_err, t, y, h, errp, tout, p,
            err_order=err_order, max_steps=cfg.max_steps,
            global_size=global_size, reduce_fn=reduce_fn, carry0=fc0,
            status0=status, first_interval=first, h_limit_fn=h_limit_fn)
        if kernel is not None:
            y = kernel.unpad(y)
        return t, y, h, errp, stats

    one_interval = jax.jit(jax.shard_map(
        one_interval_local, mesh=mesh,
        in_specs=(scalar, state_spec, scalar, scalar, scalar, scalar,
                  scalar, param_specs),
        out_specs=(scalar, state_spec, scalar, scalar, stats_spec),
        check_vma=not interpret_pallas,  # see make_sharded_simulation_fn
    ))

    def h0_local(y, params):
        reduce_fn = _make_reduce(params if padded else None)
        t0 = jnp.asarray(0.0, dtype)
        tout0 = params["_h0_tout"]
        p = {**tensor_params({k: v for k, v in params.items()
                              if k != "_h0_tout"}),
             "_seg_end": tout0}
        f0 = local_rhs(t0, y, p)
        return _initial_step(local_rhs, t0, y, f0, p, tout0,
                             cfg.rtol, cfg.atol, err_order, reduce_fn,
                             global_size)

    h0_fn = jax.jit(jax.shard_map(
        h0_local, mesh=mesh,
        in_specs=(state_spec, {**param_specs, "_h0_tout": scalar}),
        out_specs=scalar,
    ))

    one_interval_free = snap_at = None
    if cfg.step_mode == "normal":
        # ARK_NORMAL streaming under shard_map: the free-running interval
        # carries the dense-output bracket (plain global arrays between
        # dispatches; kernel-padded only inside the loop), and snapshots
        # are cubic-Hermite interpolations whose endpoint RHS evals run the
        # halo-exchanged local_rhs — same policy as the in-jit scan
        # (integrate/erk.py) and sim.simulate_streaming.
        from crdmodel_tpu.integrate.erk import (hermite_interpolate,
                                                integrate_interval_free)

        def one_free_local(t, y, h, errp, status, tout, first,
                           br_t, br_y, cap, params):
            reduce_fn = _make_reduce(params if padded else None)
            p = {**tensor_params(params), "_seg_end": tout}
            if kernel is not None:
                p = kernel.prepare_params(p)
                y = kernel.pad(y)
                br_y = kernel.pad(br_y)
            fc0 = init_carry(t, y, p)
            t, y, h, errp, br, stats = integrate_interval_free(
                step_err, t, y, h, errp, tout, p,
                err_order=err_order, max_steps=cfg.max_steps,
                global_size=global_size, reduce_fn=reduce_fn, carry0=fc0,
                status0=status, first_interval=first,
                h_limit_fn=h_limit_fn, bracket0=(br_t, br_y), t_cap=cap)
            br_t, br_y = br
            if kernel is not None:
                y = kernel.unpad(y)
                br_y = kernel.unpad(br_y)
            return t, y, h, errp, br_t, br_y, stats

        one_interval_free = jax.jit(jax.shard_map(
            one_free_local, mesh=mesh,
            in_specs=(scalar, state_spec, scalar, scalar, scalar, scalar,
                      scalar, scalar, state_spec, scalar, param_specs),
            out_specs=(scalar, state_spec, scalar, scalar, scalar,
                       state_spec, stats_spec),
            check_vma=not interpret_pallas,
        ))

        def snap_local(br_t, br_y, t, y, tout, params):
            p = {**tensor_params(params), "_seg_end": tout}
            return hermite_interpolate(local_rhs, br_t, br_y, t, y, tout, p)

        snap_at = jax.jit(jax.shard_map(
            snap_local, mesh=mesh,
            in_specs=(scalar, state_spec, scalar, state_spec, scalar,
                      param_specs),
            out_specs=state_spec,
        ))
    return one_interval, h0_fn, one_interval_free, snap_at


def simulate_sharded_streaming(cfg: SimConfig, mesh: Optional[Mesh] = None,
                               n_devices: Optional[int] = None,
                               problem: Optional[Problem] = None,
                               on_snapshot=None,
                               progress: bool = False,
                               checkpoint_every: Optional[int] = None,
                               checkpoint_dir: Optional[str] = None,
                               resume_dir: Optional[str] = None,
                               checkpoint_backend: str = "npz",
                               host_offload: bool = False,
                               snapshot_mode: Optional[str] = None
                               ) -> SimResult:
    """Streaming (per-interval dispatch) sharded run — the production-scale
    driver: bounded device-time per dispatch, incremental snapshots.

    checkpoint_every=N + checkpoint_dir write a per-shard checkpoint after
    every N output intervals; resume_dir resumes from one. A resumed run's
    SimResult holds only the POST-resume snapshots (touts aligned
    accordingly): at scale, prior rows live in the streamed output files.
    checkpoint_backend selects the format: "npz" (per-shard npz files +
    manifest, io/checkpoint.py::save_sharded_checkpoint) or "orbax"
    (sharding-aware zarr, save_orbax_checkpoint). host_offload=True pulls
    each snapshot to host as produced (bounded device memory for long
    runs); without an on_snapshot writer the pull is asynchronous, same
    policy as sim.simulate_streaming. snapshot_mode ('device'/'host'/
    'none') overrides explicitly; 'none' captures nothing and the
    trajectory holds only the final state (throughput/soak runs).
    """
    if checkpoint_backend not in ("npz", "orbax"):
        raise ValueError(f"checkpoint_backend must be 'npz' or 'orbax', "
                         f"got {checkpoint_backend!r}")
    if snapshot_mode is None:
        snapshot_mode = "host" if host_offload else "device"
    if snapshot_mode not in ("device", "host", "none"):
        raise ValueError(f"snapshot_mode={snapshot_mode!r}; expected "
                         "'device', 'host', or 'none'")
    if snapshot_mode == "none" and on_snapshot is not None:
        raise ValueError("snapshot_mode='none' captures nothing; "
                         "on_snapshot would never fire")
    host_offload = snapshot_mode == "host"
    problem = problem if problem is not None else build_problem(cfg)
    if mesh is None:
        mesh = make_mesh(n_devices=n_devices, grid_shape=(cfg.ny, cfg.nx))
    dtype = jnp.dtype(cfg.dtype)
    pad_spec = mesh_pad_spec(cfg, mesh)
    params, _ = sharded_params(problem, pad_spec)
    one_interval, h0_fn, one_interval_free, snap_at = \
        make_sharded_interval_fn(problem, mesh)
    normal = cfg.step_mode == "normal"

    def physical(y):
        # snapshots/trajectory rows are PHYSICAL fields; the padded array
        # stays internal to the stepping state and checkpoints
        return pad_spec.unpad_field(y) if pad_spec is not None else y
    touts = output_times(cfg)

    from crdmodel_tpu.integrate.erk import SolveStats, merge_stops
    from crdmodel_tpu.core.problem import solver_breakpoints
    breakpoints = list(solver_breakpoints(cfg, problem.forcing))
    stop_times, is_output = merge_stops(touts, breakpoints)
    from crdmodel_tpu.sim import make_normal_stream_plan
    plan = (make_normal_stream_plan(zip(stop_times, is_output), breakpoints)
            if normal else None)

    nt = len(touts)
    t_start = time.perf_counter()
    if resume_dir is not None:
        from crdmodel_tpu.io.checkpoint import (load_orbax_checkpoint,
                                                load_sharded_checkpoint)
        load = (load_orbax_checkpoint if checkpoint_backend == "orbax"
                else load_sharded_checkpoint)
        ck = load(resume_dir, cfg, mesh)
        k_start = int(ck["k_out"])
        y = jnp.asarray(ck["y"], dtype)
        t = jnp.asarray(ck["t"], dtype)
        h = jnp.asarray(ck["h"], dtype)
        errp = jnp.asarray(ck["err_prev"], dtype)
        br_t = jnp.asarray(ck.get("br_t", ck["t"]), dtype)
        br_y = (jnp.asarray(ck["br_y"], dtype) if ck.get("br_y") is not None
                else y)
        if pad_spec is not None:
            # re-derive pad cells from the physical field: the XLA padded
            # path carries frozen pads, the fused mirror-pad kernels carry
            # live wrapped copies — a checkpoint may hold either, and the
            # wrap-fill is the one layout both paths accept as-is
            y = pad_spec.pad_field(pad_spec.unpad_field(y))
            br_y = pad_spec.pad_field(pad_spec.unpad_field(br_y))
        acc = {k: np.array(ck["stats"][k], dtype=np.int64)
               for k in ("steps", "accepted", "rejected", "status")}
        snaps = []
    else:
        k_start = 0
        # commit the initial state to the mesh sharding up front so shard
        # consumers (ShardedReferenceWriter, checkpoints) see device shards
        # from snapshot 0 on
        y0_full = (pad_spec.pad_field(problem.y0) if pad_spec is not None
                   else problem.y0)
        y = jax.device_put(
            y0_full,
            jax.sharding.NamedSharding(mesh, P(None, AXIS_Y, AXIS_X)))
        t = jnp.asarray(0.0, dtype)
        h = h0_fn(y, {**params, "_h0_tout": jnp.asarray(stop_times[0], dtype)})
        errp = jnp.asarray(1.0, dtype)
        br_t, br_y = t, y
        acc = {k: np.zeros(nt, dtype=np.int64)
               for k in ("steps", "accepted", "rejected", "status")}
        snaps = []
        if snapshot_mode != "none":
            snaps.append(np.asarray(physical(y)) if host_offload
                         else physical(y))
        if on_snapshot is not None:
            on_snapshot(0, physical(y))
    status = jnp.asarray(0, jnp.int32)

    state = {"t": t, "y": y, "h": h, "errp": errp, "status": status,
             "br_t": br_t, "br_y": br_y}

    def maybe_checkpoint(k_done):
        if checkpoint_every and checkpoint_dir and \
                k_done % checkpoint_every == 0 and k_done < nt:
            from crdmodel_tpu.io.checkpoint import (save_orbax_checkpoint,
                                                    save_sharded_checkpoint)
            save = (save_orbax_checkpoint if checkpoint_backend == "orbax"
                    else save_sharded_checkpoint)
            save(checkpoint_dir, cfg, mesh, k_done, state["y"],
                 float(state["t"]), float(state["h"]),
                 float(state["errp"]), acc,
                 br_t=float(state["br_t"]) if normal else None,
                 br_y=state["br_y"] if normal else None)

    def step_to(stop, first, k_out):
        if normal and plan[float(stop)][0]:
            cap = jnp.asarray(plan[float(stop)][1], dtype)
            (state["t"], state["y"], state["h"], state["errp"],
             state["br_t"], state["br_y"],
             (ns, na, nr, state["status"])) = one_interval_free(
                state["t"], state["y"], state["h"], state["errp"],
                state["status"], jnp.asarray(stop, dtype),
                jnp.asarray(first), state["br_t"], state["br_y"], cap,
                params)
        else:
            (state["t"], state["y"], state["h"], state["errp"],
             (ns, na, nr, state["status"])) = one_interval(
                state["t"], state["y"], state["h"], state["errp"],
                state["status"], jnp.asarray(stop, dtype),
                jnp.asarray(first), params)
            if normal:
                state["br_t"], state["br_y"] = state["t"], state["y"]
        acc["steps"][k_out] += int(ns)
        acc["accepted"][k_out] += int(na)
        acc["rejected"][k_out] += int(nr)
        acc["status"][k_out] = max(acc["status"][k_out],
                                   int(state["status"]))
        return int(state["status"])

    def on_output(k_done):
        if snapshot_mode == "none":
            return
        if normal:
            snap = physical(snap_at(
                state["br_t"], state["br_y"], state["t"], state["y"],
                jnp.asarray(float(touts[k_done - 1]), dtype), params))
        else:
            snap = physical(state["y"])
        if not host_offload:
            snaps.append(snap)
        elif on_snapshot is not None:
            snaps.append(np.asarray(snap))
        else:
            # async host pull: kick the copy now, materialise one output
            # later so it overlaps the next interval's compute (same
            # policy as sim.py::_run_streaming_loop.offload)
            try:
                snap.copy_to_host_async()
            except AttributeError:
                pass
            snaps.append(snap)
            for i in range(len(snaps) - 1):
                if not isinstance(snaps[i], np.ndarray):
                    snaps[i] = np.asarray(snaps[i])
        if on_snapshot is not None:
            on_snapshot(k_done, snap)

    from crdmodel_tpu.sim import drive_stream_loop
    drive_stream_loop(list(zip(stop_times, is_output)), nt, k_start,
                      resume_dir is None, dtype, step_to,
                      lambda: float(state["t"]), on_output,
                      maybe_checkpoint, progress, t_start)

    wall = time.perf_counter() - t_start
    if snapshot_mode == "none":
        traj = jnp.stack([physical(state["y"])])
        touts_out = np.asarray([float(state["t"])])
    elif snaps:
        traj = np.stack([np.asarray(s) for s in snaps]) if host_offload \
            else jnp.stack(snaps)
    else:
        # resumed run whose first interval failed: no snapshots, but the
        # caller still gets a SimResult carrying the failure stats
        traj = jnp.zeros((0,) + tuple(problem.y0.shape), dtype)
    stats = SolveStats(steps=jnp.asarray(acc["steps"]),
                       accepted=jnp.asarray(acc["accepted"]),
                       rejected=jnp.asarray(acc["rejected"]),
                       status=jnp.asarray(acc["status"]))
    if snapshot_mode == "none":
        pass
    elif resume_dir is not None:
        touts_out = touts[k_start:k_start + traj.shape[0]]
    else:
        touts_out = np.concatenate([[0.0], touts[:traj.shape[0] - 1]])
    return SimResult(cfg=cfg, problem=problem, trajectory=traj,
                     touts=touts_out, stats=stats, wall_time=wall)


def simulate_sharded(cfg: SimConfig, mesh: Optional[Mesh] = None,
                     n_devices: Optional[int] = None,
                     problem: Optional[Problem] = None) -> SimResult:
    """Drop-in sharded variant of sim.simulate()."""
    problem = problem if problem is not None else build_problem(cfg)
    if mesh is None:
        mesh = make_mesh(n_devices=n_devices, grid_shape=(cfg.ny, cfg.nx))
    pad_spec = mesh_pad_spec(cfg, mesh)
    params, _ = sharded_params(problem, pad_spec)
    run, touts = make_sharded_simulation_fn(problem, mesh)
    y0 = (pad_spec.pad_field(problem.y0) if pad_spec is not None
          else problem.y0)
    t_start = time.perf_counter()
    traj, stats = run(y0, params)
    # block_until_ready is a NO-OP on the axon TPU backend; sync by pulling
    # a scalar (utils/profiling.py::device_sync)
    from crdmodel_tpu.utils.profiling import device_sync
    device_sync(traj)
    wall = time.perf_counter() - t_start
    if pad_spec is not None:
        traj = pad_spec.unpad_field(traj)
    full_traj = jnp.concatenate([problem.y0[None], traj], axis=0)
    return SimResult(cfg=cfg, problem=problem, trajectory=full_traj,
                     touts=np.concatenate([[0.0], touts]), stats=stats,
                     wall_time=wall)
