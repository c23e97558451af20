"""Problem assembly: config -> (rhs, initial state, params).

This is the model/driver layer (SURVEY.md L3) rebuilt as data + pure
functions: one `build_problem` replaces the four monolith `main()`s' shared
setup (ICs at src/FHNmodel_torus.cpp:284-354 and the three siblings; beta
ramp and boundary freeze inside each `f`).

RHS semantics (exact reference parity, src/FHNmodel_torus.cpp:504-667):
  ydot[0] = D*Lap(y[0]) + reaction_0     (diffusion acts on variable 0 only)
  ydot[1] =               reaction_1
  if t < tBoundary: rows at global j==0 and j==ny-1 are frozen (ydot=0, both
    variables — overrides diffusion too; src/FHNmodel_torus.cpp:643-653).
  justDiffusion==1 skips the entire reaction block *including the freeze*
    (src/GoldbeterModel_torus.cpp:668-721).

The rhs signature is rhs(t, state, params) with params a small pytree
(currently the scalar-or-field `b`), so parameter sweeps are a `jax.vmap`
over params + state with the same compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import Grid, Geometry, make_geometry
from crdmodel_tpu.models.base import ReactionModel, get_model
from crdmodel_tpu.ops.stencil import (anisotropic_laplacian,
                                      anisotropic_laplacian3,
                                      divergence_laplacian,
                                      divergence_laplacian3, flat_laplacian,
                                      torus_laplacian)


@dataclasses.dataclass(frozen=True)
class Problem:
    cfg: SimConfig
    model: ReactionModel
    geometry: Geometry
    rhs: Callable          # rhs(t, state, params) -> dstate, state (nvars, ny, nx)
    y0: jnp.ndarray        # (nvars, ny, nx)
    params: dict           # {"b": scalar or (ny, 1) field}
    steady_state: tuple    # background fixed point used in ICs
    # spatially-varying diffusion coefficient (float64 numpy, broadcastable
    # to (ny, nx)) when cfg.coupling != "none" or an explicit field was
    # passed to build_problem; None = the reference's constant-D stencil.
    # Kept on the Problem so the sharded drivers and kernel-eligibility
    # gates can see it (theta-only torus/revolution fields remap onto the
    # profile kernels; everything else runs the generic divergence fused
    # kernel, ops/pallas_divform.py, for the ERK methods and XLA for
    # rkc2/ark324 — kernel_common.needs_divform).
    diffusion_field: object = None
    # anisotropic diffusion tensor (Dxx, Dyy, Dxy) — float64 numpy arrays
    # broadcastable to (ny, nx); flat + torus surfaces (torus: physical
    # orthonormal-frame components, round 5). Switches the operator
    # to the conservative 9-point anisotropic form
    # (ops/stencil.py::anisotropic_laplacian). Mutually exclusive with
    # diffusion_field/coupling; fused kernels decline (XLA path).
    diffusion_tensor: object = None
    # optional time-dependent forcing term forcing(t, state, params) ->
    # dstate, added to the RHS after kinetics+diffusion (and masked by the
    # boundary freeze like everything else). This is the framework's door
    # for non-autonomous dynamics — pacing protocols, periodic stimuli —
    # while registered kinetics stay autonomous (models/base.py AUTONOMY
    # CONTRACT): the fused kernels decline when a forcing is present and
    # the XLA path evaluates it at true stage times t + C[i]*h. Spatial
    # arrays it closes over must be full-grid; under shard_map pass them
    # through params (with extra_param_specs) instead.
    forcing: object = None
    # no-flux boundaries / internal obstacles (beyond-reference): the
    # (oE, oW, oN, oS) face-openness masks (grid.py::face_openness) that
    # zero divergence-form face coefficients across closed faces, and the
    # bool (ny, nx) tissue mask (True = active medium) whose False cells
    # are inert walls (zero flux through every adjoining face AND frozen
    # kinetics — they hold their initial value exactly). face_mask is
    # non-None whenever cfg.boundary != "periodic" or an obstacle_mask was
    # passed; the divergence fused kernel runs these for the ERK methods
    # (ops/pallas_divform.py; rkc2/ark324 + sharded take the XLA path).
    obstacle_mask: object = None
    face_mask: object = None
    # compiled-driver cache: repeated simulate()/simulate_streaming() calls
    # on the same Problem reuse their jitted closures instead of recompiling
    cache: dict = dataclasses.field(default_factory=dict, repr=False,
                                    compare=False)

    @property
    def grid(self) -> Grid:
        return self.geometry.grid


def beta_field(cfg: SimConfig, dtype) -> jnp.ndarray:
    """The bifurcation parameter as used in the RHS: scalar BETA, or the
    linear-in-y ramp b(y) = betaMin + y*(betaMax-betaMin)/(YMAX-YMIN)
    (reference src/FHNmodel_torus.cpp:625-632), shape (ny, 1) for broadcast.
    """
    if cfg.vary_beta == 0:
        return jnp.asarray(cfg.beta, dtype=dtype)
    y = np.float64(cfg.ymin) + np.arange(cfg.ny, dtype=np.float64) * cfg.dy
    b = cfg.beta_min + y * (cfg.beta_max - cfg.beta_min) / (cfg.ymax - cfg.ymin)
    return jnp.asarray(b, dtype=dtype)[:, None]


def diffusion_field_from_cfg(cfg: SimConfig, geometry: Geometry):
    """The D(x) field implied by cfg.coupling, or None for constant D.

    coupling="curvature": D(theta) = diffusion * C(theta)/mean(C) where C is
    the Kneer et al. (2014) coupling-strength profile the reference computes
    for visualisation only (util/GenCurvatureCoupling.py:29-43,90; see
    viz/curvature.py::coupling_strength). Normalising by the theta-average
    keeps the mean diffusivity at cfg.diffusion so runs are comparable with
    the constant-D operator. Returned as float64 numpy, shape (nx,).
    """
    if cfg.coupling == "none":
        return None
    from crdmodel_tpu.viz.curvature import coupling_strength
    g = geometry.grid
    th = g.xmin + np.arange(g.nx, dtype=np.float64) * g.dx
    C = coupling_strength(th, geometry.r, geometry.R)
    return np.float64(cfg.diffusion) * C / np.mean(C)


def initial_state(cfg: SimConfig, model: ReactionModel, steady: tuple,
                  dtype) -> jnp.ndarray:
    """Initial conditions, (nvars, ny, nx). Reproduces SURVEY.md C9 exactly.

    Computed in float64 numpy (setup-time, not traced) then cast.
    ic_type==2 uses an explicit jax PRNG key instead of the reference's
    unseeded per-rank rand() (src/GoldbeterModel_torus.cpp:409-410) —
    distribution reproduced (uniform [0, 1.4]), bitstream deliberately not.
    """
    nx, ny = cfg.nx, cfg.ny
    xx = cfg.xmin + np.arange(nx, dtype=np.float64) * cfg.dx   # (nx,)
    yy = cfg.ymin + np.arange(ny, dtype=np.float64) * cfg.dy   # (ny,)
    X = xx[None, :]   # (1, nx)
    Y = yy[:, None]   # (ny, 1)

    wave_len = (cfg.ymax - cfg.ymin) * cfg.wave_length
    wave_wid = (cfg.xmax - cfg.xmin) * cfg.wave_width

    if cfg.surface in ("torus", "revolution"):
        # segment centred at theta=pi (inside) or wrapping theta=0 (outside)
        # (src/FHNmodel_torus.cpp:284-300); closed revolution surfaces share
        # the torus's v in [0, 2pi] convention
        if cfg.wave_inside == 1:
            wxmin = np.pi - wave_wid / 2.0
            wxmax = np.pi + wave_wid / 2.0
            in_x = (X >= wxmin) & (X <= wxmax)
        else:
            wxmin = -wave_wid / 2.0 + (cfg.xmax - cfg.xmin)
            wxmax = wave_wid / 2.0
            in_x = (X >= wxmin) | (X <= wxmax)
    elif cfg.capped:
        # capped (sphere-like) surfaces: v in (0, pi) does not wrap; the
        # segment straddles the equator v = pi/2 (waveInside is moot — no
        # seam to wrap across)
        wxmin = np.pi / 2.0 - wave_wid / 2.0
        wxmax = np.pi / 2.0 + wave_wid / 2.0
        in_x = (X >= wxmin) & (X <= wxmax)
    else:
        # flat: segment centred at width/2 (src/FHNmodel_flat.cpp:280-282)
        mid = cfg.surface_width / 2.0
        wxmin = mid - wave_wid / 2.0
        wxmax = mid + wave_wid / 2.0
        in_x = (X >= wxmin) & (X <= wxmax)

    bg = np.zeros((model.nvars, ny, nx), dtype=np.float64)

    if cfg.model == "fhn":
        if cfg.vary_beta == 1:
            # all-ones field (src/FHNmodel_torus.cpp:349-352)
            bg[:] = 1.0
        else:
            us, vs = steady
            seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
            bg[0] = np.where(seg, us + 2.0, us)
            bg[1] = np.where(seg, vs + 1.5, vs)
    elif cfg.model == "goldbeter":
        zs, ys = steady
        if cfg.vary_beta == 0:
            if cfg.surface == "torus":
                # y in [wl, 2wl] (src/GoldbeterModel_torus.cpp:347,363)
                seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
            else:
                # y in [2wl, 3wl] (src/GoldbeterModel_flat.cpp:328)
                seg = in_x & (Y >= 2.0 * wave_len) & (Y <= 3.0 * wave_len)
            bg[0] = np.where(seg, zs + 1.0, zs)
            bg[1] = np.where(seg, ys + 1.0, ys)
        else:
            if cfg.ic_type == 0:
                bg[0], bg[1] = 0.4, 1.6
            elif cfg.ic_type == 1:
                # torus icType=1 uses the AND form even for waveInside=0
                # (src/GoldbeterModel_torus.cpp:392); flat identical
                seg = ((X >= wxmin) & (X <= wxmax)
                       & (Y >= 2.0 * wave_len) & (Y <= 3.0 * wave_len))
                bg[0] = np.where(seg, 1.4, 0.4)
                bg[1] = np.where(seg, 2.6, 1.6)
            elif cfg.ic_type == 2:
                key = jax.random.PRNGKey(cfg.rng_seed)
                k0, k1 = jax.random.split(key)
                bg[0] = 1.4 * np.asarray(
                    jax.random.uniform(k0, (ny, nx), dtype=jnp.float32), np.float64)
                bg[1] = 1.4 * np.asarray(
                    jax.random.uniform(k1, (ny, nx), dtype=jnp.float32), np.float64)
            else:
                raise ValueError(f"icType must be 0/1/2, got {cfg.ic_type}")
    elif cfg.model == "grayscott":
        # beyond-reference model: trivial state (1, 0) everywhere; the wave
        # segment seeds a patch of (0.5, 0.25) from which patterns grow
        # (Pearson 1993's standard seeding)
        seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
        bg[0] = np.where(seg, 0.5, 1.0)
        bg[1] = np.where(seg, 0.25, 0.0)
    elif cfg.model == "brusselator":
        # beyond-reference model: homogeneous Turing-unstable steady state
        # (A, b/A); the wave segment carries a finite activator bump from
        # which stripes/spots develop (random ic_type=2 also works via the
        # goldbeter-style path below if ever needed)
        us, vs = steady
        seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
        bg[0] = np.where(seg, us + 0.5, us)
        bg[1] = vs
    elif cfg.model == "sir":
        # beyond-reference model: susceptible background (1, 0, 0); the wave
        # segment seeds an infected patch from which the epidemic front
        # propagates (Noble 1974 plague-wave setup)
        seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
        bg[0] = np.where(seg, 0.9, 1.0)
        bg[1] = np.where(seg, 0.1, 0.0)
        bg[2] = 0.0
    elif cfg.model == "lambdaomega":
        # beyond-reference model: background on the homogeneous limit cycle
        # (1, 0); the wave segment flips the oscillation phase by pi, and a
        # quarter-cycle band below breaks the symmetry so the phase defects
        # at the segment ends seed counter-rotating spirals
        seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
        bg[0] = np.where(seg, -1.0, 1.0)
        bg[1] = np.where(np.broadcast_to(Y < wave_len, seg.shape), 1.0, 0.0)
        bg[0] = np.where(np.broadcast_to(Y < wave_len, seg.shape), 0.0, bg[0])
    elif cfg.model == "oregonator":
        # beyond-reference model: excitable rest state (us, us); the wave
        # segment excites u with a refractory (v-elevated) band below it so
        # the front is broken on one side, like the barkley seed
        us, vs = steady
        seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
        bg[0] = np.where(seg, 0.8, us)
        bg[1] = np.where(np.broadcast_to(Y < wave_len, seg.shape),
                         vs + 0.3, vs)
    elif cfg.model == "aliev_panfilov":
        # beyond-reference model: rest state (0,0); the wave segment
        # depolarises u=1 with a refractory (recovery-current-elevated,
        # v=2) band below it so the excitation front is broken on one
        # side — the standard cardiac rotor seed (cross-field S1-S2
        # protocol's outcome, same shape as the barkley seed)
        seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
        bg[0] = np.where(seg, 1.0, 0.0)
        bg[1] = np.where(np.broadcast_to(Y < wave_len, seg.shape), 2.0, 0.0)
    elif cfg.model == "barkley":
        # beyond-reference model: rest state (0,0); the wave segment excites
        # u=1 with a refractory band (v=a/2) below it so the excitation
        # front is broken on one side — the standard spiral-wave seed
        from crdmodel_tpu.models.barkley import A as _A
        seg = in_x & (Y >= wave_len) & (Y <= 2.0 * wave_len)
        bg[0] = np.where(seg, 1.0, 0.0)
        bg[1] = np.where(np.broadcast_to(Y < wave_len, seg.shape),
                         _A / 2.0, 0.0)
    else:
        raise ValueError(cfg.model)

    if cfg.surface == "box":
        # 3-D box: the 2-D wave-segment pattern extruded along z — a
        # z-invariant slab seed. For the broken-front excitable seeds
        # (barkley / aliev_panfilov) the extrusion is exactly the standard
        # scroll-wave initiation: the 2-D spiral core becomes a straight
        # filament spanning the depth axis.
        bg = np.broadcast_to(bg[:, None],
                             (model.nvars, cfg.nz, ny, nx)).copy()

    return jnp.asarray(bg, dtype=dtype)


def pole_bands_spec(cfg: SimConfig, geometry: Geometry):
    """Contiguous (start, stop, g) runs of phi-coarsened rings, or () when
    pole coarsening is off / inapplicable (cfg.pole_coarsen,
    core/grid.py::RevolutionGeometry.pole_group_sizes)."""
    if not getattr(cfg, "pole_coarsen", 0) \
            or not getattr(geometry, "capped", False):
        return ()
    g_arr = geometry.pole_group_sizes()
    bands = []
    i = 0
    nx = geometry.grid.nx
    while i < nx:
        if g_arr[i] > 1:
            j = i
            while j < nx and g_arr[j] == g_arr[i]:
                j += 1
            bands.append((i, j, int(g_arr[i])))
            i = j
        else:
            i += 1
    return tuple(bands)


def _pole_bands(cfg, geometry, diffusion_field, dtype, face_mask=None,
                diffusion_tensor=None):
    """(bands, face_coeffs) for the pole-coarsened operator, or None when
    coarsening is off. bands = ((col_slice, g, coeff (w,)), ...) with
    coeff = aN/g^2 (the block phi-Laplacian weight D/(rho g dy)^2);
    face_coeffs = the fine flux form with phi faces zeroed on coarsened
    rings."""
    spec = pole_bands_spec(cfg, geometry)
    if not spec:
        return None
    if face_mask is not None:
        raise ValueError("pole_coarsen does not compose with no-flux/"
                         "obstacle face masks (the block operator assumes "
                         "ring-constant phi coefficients)")
    if np.ndim(diffusion_field) > 1:
        raise ValueError("pole_coarsen needs an x-profile (or constant) "
                         "diffusion field")
    aE64, aW64, aN64, aS64 = geometry.divergence_coeffs64(diffusion_field)
    nx = geometry.grid.nx
    fine = np.ones(nx, dtype=np.float64)
    for i, j, _g in spec:
        fine[i:j] = 0.0
    face_coeffs = (jnp.asarray(aE64, dtype), jnp.asarray(aW64, dtype),
                   jnp.asarray(aN64 * fine, dtype),
                   jnp.asarray(aS64 * fine, dtype))
    bands = tuple((slice(i, j), g,
                   jnp.asarray(aN64[i:j] / (g * g), dtype))
                  for i, j, g in spec)
    return bands, face_coeffs


def make_rhs(cfg: SimConfig, model: ReactionModel, geometry: Geometry, dtype,
             split: bool = False, diffusion_field=None, forcing=None,
             diffusion_tensor=None, face_mask=None, obstacle_mask=None):
    """Build rhs(t, state, params) for the full (unsharded) grid.

    split=True returns (rhs_ex, rhs_im) — the explicit (diffusion) and
    implicit (pointwise reaction) parts for the ark324 IMEX integrator
    (integrate/imex.py), with the boundary freeze applied to each part
    separately so rhs_ex + rhs_im equals the composed rhs bitwise
    (where(m, a+b, 0) == where(m, a, 0) + where(m, b, 0)).

    diffusion_field: optional D(x) array (broadcastable to (ny, nx)) — the
    operator switches to the conservative flux form
    (ops/stencil.py::divergence_laplacian); diffusion_ratios still scale
    per-variable.

    diffusion_tensor: optional (Dxx, Dyy, Dxy) SPD tensor field — the
    anisotropic conservative 9-point operator
    (ops/stencil.py::anisotropic_laplacian; flat + torus surfaces — the
    torus form is metric-weighted, grid.py::TorusGeometry.tensor_coeffs64).

    face_mask: optional (oE, oW, oN, oS) openness masks
    (grid.py::face_openness — no-flux boundaries / obstacle walls); forces
    the divergence path (requires diffusion_field, which build_problem
    defaults to the constant cfg.diffusion). obstacle_mask: bool (ny, nx),
    True = active tissue; False cells get ydot = 0 (frozen walls; their
    zero contribution to the WRMS error norm slightly relaxes the
    effective tolerance, exactly like the reference's frozen boundary
    rows, src/FHNmodel_torus.cpp:643-653)."""
    if face_mask is not None and diffusion_field is None \
            and diffusion_tensor is None:
        raise ValueError("face_mask needs the divergence operator — pass "
                         "diffusion_field (build_problem defaults it to "
                         "the constant cfg.diffusion)")
    if diffusion_tensor is not None:
        face_t, mixed_np, inv_w = geometry.tensor_coeffs64(
            *diffusion_tensor, boundary=cfg.boundary)
        face_t = tuple(jnp.asarray(a, dtype) for a in face_t)
        if len(face_t) == 6:
            # 3-D box: full 3x3 tensor, 19-point operator
            mixed_c = tuple(jnp.asarray(a, dtype) for a in mixed_np)
            invs_c = tuple(jnp.asarray(a, dtype) for a in inv_w)

            def lap(u, _):
                return anisotropic_laplacian3(u, face_t, mixed_c, invs_c)
        else:
            dxy_c = jnp.asarray(mixed_np, dtype)
            inv4_c = jnp.asarray(inv_w, dtype)

            def lap(u, _):
                return anisotropic_laplacian(u, face_t, dxy_c, inv4_c)

        coeffs = None
    elif diffusion_field is not None:
        pole_bands = _pole_bands(cfg, geometry, diffusion_field, dtype,
                                 face_mask=face_mask,
                                 diffusion_tensor=diffusion_tensor)
        if pole_bands is not None:
            bands, face_coeffs = pole_bands
            # group bands by DISTINCT g into full-width (1, nx) coeff
            # profiles (zero off-band, like the sharded path's
            # _pole_c_{g} params): at 384-mesh the 14 per-band
            # slice + at[].add full-array read-modify-writes cost ~34 us
            # per RHS eval on-chip (90% of the eval — PERF_NOTES round-5
            # "sphere band path") — 7 full-width reductions + ONE
            # accumulated add move strictly less memory, and the values
            # are bitwise identical (row means are column-independent;
            # off-band columns contribute exact 0.0 * lapb)
            nx_g = geometry.grid.nx
            gmap: dict = {}
            for sl, g, c in bands:
                prof = gmap.setdefault(int(g), np.zeros((1, nx_g)))
                prof[0, sl] = np.asarray(c, np.float64)
            g_profs = tuple((g, jnp.asarray(v, dtype))
                            for g, v in sorted(gmap.items()))

            def lap(u, _):
                # reduced (pole-coarsened) grid: fine 5-point flux form
                # with the phi faces zeroed on coarsened rings, plus the
                # conservative Galerkin block operator per distinct group
                # size — fine-cell rate = broadcast of the block-mean
                # Laplacian, coeff aN/g^2 (core/grid.py::pole_group_sizes)
                out = divergence_laplacian(u, face_coeffs)
                term = None
                for g, c in g_profs:
                    nyg = u.shape[-2] // g
                    ub = u.reshape(u.shape[:-2]
                                   + (nyg, g, u.shape[-1])).mean(-2)
                    lapb = (jnp.roll(ub, -1, -2) - 2.0 * ub
                            + jnp.roll(ub, 1, -2))
                    tg = c * jnp.repeat(lapb, g, axis=-2)
                    term = tg if term is None else term + tg
                return out if term is None else out + term
        else:
            face_coeffs = geometry.divergence_coeffs(diffusion_field, dtype,
                                                     face_mask=face_mask)
            # 3-D box: six faces, 7-point conservative operator
            div_op = (divergence_laplacian3 if len(face_coeffs) == 6
                      else divergence_laplacian)

            def lap(u, _):
                return div_op(u, face_coeffs)

        coeffs = None
    else:
        coeffs = geometry.stencil_coeffs(dtype)
        lap = torus_laplacian if geometry.kind == "torus" else flat_laplacian
    ny = geometry.grid.ny
    just_diffusion = bool(cfg.just_diffusion)
    t_boundary = float(cfg.t_boundary)
    has_freeze = (t_boundary > 0.0) and not just_diffusion

    # interior-row mask: zero at global rows j==0 and j==ny-1
    edge = np.ones((ny, 1), dtype=bool)
    edge[0, 0] = False
    edge[-1, 0] = False
    interior_rows = jnp.asarray(edge)

    tissue_m = None
    if obstacle_mask is not None:
        tissue_m = jnp.asarray(np.broadcast_to(
            np.asarray(obstacle_mask, dtype=bool), geometry.grid.shape))

    def mask_tissue(ydot):
        if tissue_m is None:
            return ydot
        return jnp.where(tissue_m, ydot, 0.0)

    dvars = tuple(model.diffusive_vars)
    ratios = tuple(model.diffusion_ratios)

    def diffusion_terms(state, params=None):
        """Per-variable diffusion: lap(var)*ratio for diffusive vars, 0
        otherwise, stacked to state shape. An optional params["dscale"]
        scalar rescales the whole operator (coefficients are linear in D,
        core/grid.py) — the hook that makes the diffusion coefficient
        vmappable for sweeps (sweep.py::sweep_configs) without recompiling
        the stencil per value."""
        out = []
        for v in range(model.nvars):
            if v in dvars:
                r = ratios[dvars.index(v)]
                term = lap(state[v], coeffs)
                out.append(term if r == 1.0 else r * term)
            else:
                out.append(jnp.zeros_like(state[v]))
        diff = jnp.stack(out)
        if isinstance(params, dict) and "dscale" in params:
            diff = params["dscale"] * diff
        return diff

    def apply_freeze(t, params, ydot):
        # The freeze releases at t==tBoundary, a discontinuity the
        # integrator handles by segmenting at tBoundary (sim.py passes it
        # as a breakpoint). A segment *ending* at or before tBoundary is
        # wholly on the frozen piece (its final stage evaluates exactly at
        # the segment end, which must still be frozen); otherwise fall
        # back to the reference's pure t < tBoundary rule
        # (src/FHNmodel_torus.cpp:643-653).
        seg_end = params.get("_seg_end") if isinstance(params, dict) else None
        if seg_end is not None:
            freeze_now = (t < t_boundary) | (seg_end <= t_boundary)
        else:
            freeze_now = t < t_boundary
        frozen = jnp.where(interior_rows, ydot, 0.0)
        return jnp.where(freeze_now, frozen, ydot)

    def rhs(t, state, params):
        diff = diffusion_terms(state, params)
        if forcing is not None:
            diff = diff + forcing(t, state, params)
        if just_diffusion:
            return mask_tissue(diff)
        ydot = model.kinetics(state, params["b"]) + diff
        if has_freeze:
            ydot = apply_freeze(t, params, ydot)
        return mask_tissue(ydot)

    if not split:
        return rhs

    def rhs_ex(t, state, params):
        # forcing joins the EXPLICIT part: it is time-dependent but not
        # stiff, and keeping it out of rhs_im preserves the pointwise
        # autonomous Newton stages (integrate/imex.py design note)
        diff = diffusion_terms(state, params)
        if forcing is not None:
            diff = diff + forcing(t, state, params)
        if not just_diffusion and has_freeze:
            diff = apply_freeze(t, params, diff)
        return mask_tissue(diff)

    def rhs_im(t, state, params):
        if just_diffusion:
            return jnp.zeros_like(state)
        ydot = model.kinetics(state, params["b"])
        if has_freeze:
            ydot = apply_freeze(t, params, ydot)
        return mask_tissue(ydot)

    return rhs_ex, rhs_im


def make_rho_bound(cfg: SimConfig, model: ReactionModel, geometry: Geometry,
                   dtype, max_reduce=None, diffusion_field=None,
                   diffusion_tensor=None, face_mask=None):
    """Spectral-radius bound rho(t, y, params) for the RKC2 stabilized
    integrator: static Gershgorin bound of the diffusion operator (variable
    0 only) + the model's pointwise kinetics Jacobian bound over the grid.

    The model's jac_bound returns the *pointwise* Gershgorin field (same
    trailing shape as state[0]); the grid max is taken here. Member-batched
    sweeps need no special handling: the whole stepper (including this
    bound) is vmapped over the member axis, so jnp.max reduces per member
    automatically (sweep.py batch_mode="members").

    max_reduce: optional scalar max-reduction applied to the kinetics bound
    (under shard_map: lambda x: lax.pmax(x, axes) so every device agrees on
    the stage count)."""
    if diffusion_tensor is not None:
        # anisotropic: axis part as the divergence bound below; each mixed
        # pair has zero diagonal and 8 off-diagonal entries of magnitude
        # <= max|Dab|/(4 da db) per row, adding 2 * max|Dab|/(da db) to
        # the Gershgorin radius (safe over-bound). 2-D: one pair (xy);
        # 3-D box: three pairs (xy, xz, yz)
        face_t, mixed_np, inv_w = geometry.tensor_coeffs64(
            *diffusion_tensor, boundary=cfg.boundary)
        row_sum = 0.0
        for a in face_t:
            row_sum = row_sum + a
        rho_diff = float(2.0 * np.max(row_sum))
        if len(face_t) == 6:
            for dab, inv in zip(mixed_np, inv_w):
                rho_diff += float(8.0 * inv * np.max(np.abs(dab)))
        else:
            # inv_w is a scalar (flat) or an (nx,) metric profile (torus):
            # max over the profile keeps the Gershgorin over-bound safe
            rho_diff += float(8.0 * np.max(np.asarray(inv_w))
                              * np.max(np.abs(mixed_np)))
    elif diffusion_field is not None:
        # divergence form: diag magnitude = sum of face coefficients, and the
        # off-diagonal row sum equals it, so Gershgorin gives 2*max row sum
        # (face_mask zeros closed faces — no-flux boundaries / obstacle
        # walls shrink the bound, never grow it). Works for any face count:
        # 4 on surfaces, 6 on the 3-D box.
        faces = geometry.divergence_coeffs64(diffusion_field, face_mask)
        if len(faces) == 4:
            aE, aW, aN, aS = faces
        spec = pole_bands_spec(cfg, geometry)
        if spec:
            # reduced grid: coarsened rings' phi operator is the Galerkin
            # block form with coefficient aN/g^2, whose Gershgorin radius
            # replaces the fine 4*aN — this is the whole point: the bound
            # drops from the polar ~nx^4 scale to the equatorial scale
            geff = np.ones(geometry.grid.nx, dtype=np.float64)
            for i, j, g in spec:
                geff[i:j] = float(g * g)
            rho_diff = float(2.0 * np.max(aE + aW + (aN + aS) / geff))
        else:
            row_sum = 0.0
            for a in faces:
                row_sum = row_sum + a
            rho_diff = float(2.0 * np.max(row_sum))
    elif geometry.kind == "torus":
        coeffs = geometry.stencil_coeffs(jnp.float64)
        c_asym, c_th, c_phi = (np.asarray(c) for c in coeffs)
        rho_diff = float(4.0 * np.max(c_th) + 4.0 * np.max(c_phi)
                         + 2.0 * np.max(np.abs(c_asym)))
    else:
        coeffs = geometry.stencil_coeffs(jnp.float64)
        cu1, cu2, _ = (float(np.asarray(c)) for c in coeffs)
        rho_diff = 4.0 * cu1 + 4.0 * cu2
    rho_diff *= max(model.diffusion_ratios)
    just_diffusion = bool(cfg.just_diffusion)
    if model.jac_bound is None and not just_diffusion:
        raise ValueError(f"model {model.name} has no jac_bound; "
                         "rkc2 unsupported")

    def rho(t, y, params):
        r = jnp.asarray(rho_diff, dtype)
        if not just_diffusion:
            jb = model.jac_bound(y, params["b"]).astype(dtype)
            jb = jnp.max(jb)
            if max_reduce is not None:
                jb = max_reduce(jb)
            r = r + jb
        return r

    return rho


def solver_breakpoints(cfg, forcing=None) -> tuple:
    """Times the integrator must step exactly to: the tBoundary freeze
    release (reference src/FHNmodel_torus.cpp:643-653 — a known RHS
    discontinuity, SURVEY.md) plus any declared forcing discontinuities
    (core/forcing.py pulse edges). Sorted, open interval (0, t_final)."""
    pts = set()
    if 0.0 < cfg.t_boundary < cfg.t_final and not cfg.just_diffusion:
        pts.add(float(cfg.t_boundary))
    from crdmodel_tpu.core.forcing import SeparableForcing
    if isinstance(forcing, SeparableForcing):
        for e in forcing.breakpoints:
            if 0.0 < e < cfg.t_final:
                pts.add(float(e))
    return tuple(sorted(pts))


def build_problem(cfg: SimConfig, diffusion_field=None,
                  forcing=None, diffusion_tensor=None,
                  obstacle_mask=None, profile=None) -> Problem:
    """diffusion_field: optional absolute D(x) array (scalar/(nx,)/(ny,nx))
    switching diffusion to the conservative variable-coefficient operator;
    when omitted, cfg.coupling may imply one (diffusion_field_from_cfg).

    obstacle_mask: optional bool array broadcastable to (ny, nx), True =
    active tissue. False cells are inert obstacles: zero flux through
    every adjoining face (hard no-flux walls, grid.py::face_openness) and
    frozen kinetics — they hold their initial value exactly. Composes
    with cfg.boundary no-flux domain edges. Both force the conservative
    divergence operator (diffusion_field defaults to the constant
    cfg.diffusion); ERK methods run them through the fused divergence
    kernel (ops/pallas_divform.py), rkc2/ark324 take the XLA path.

    diffusion_tensor: anisotropic SPD tensor field, mutually exclusive
    with diffusion_field/coupling; cfg.diffusion is ignored (the tensor
    carries the absolute diffusivities). Flat surface: (Dxx, Dyy, Dxy),
    entries scalar or broadcastable to (ny, nx) — the 9-point operator.
    3-D box: the full 3x3 tensor (Dxx, Dyy, Dzz, Dxy, Dxz, Dyz), entries
    broadcastable to (nz, ny, nx) — the 19-point operator
    (ops/stencil.py::anisotropic_laplacian3; volumetric fiber fields,
    e.g. transmural fiber rotation). Periodic boundaries only.

    forcing: optional forcing(t, state, params) -> dstate (see Problem).
    NOTE: API-injected fields/tensors/forcing are not part of the
    checkpoint config fingerprint (io/checkpoint.py covers cfg-derived
    physics only) — resuming with a different injected term is the
    caller's contract.

    profile: (rho, z) or (rho, z, (drho, dz)) callables for the generic
    revolution surfaces (cfg.surface in {"revolution",
    "revolution_capped"}; core/grid.py::RevolutionGeometry.from_profile).
    Same fingerprint caveat as the other API-injected terms."""
    cfg = cfg.validate()
    dtype = jnp.dtype(cfg.dtype)
    model = get_model(cfg.model)
    if profile is not None and cfg.surface not in ("revolution",
                                                   "revolution_capped"):
        raise ValueError("profile= is only meaningful for the generic "
                         f"revolution surfaces, not surface={cfg.surface!r}")
    geometry = make_geometry(cfg, profile=profile)
    if diffusion_tensor is not None:
        if diffusion_field is not None or cfg.coupling != "none":
            raise ValueError("diffusion_tensor is mutually exclusive with "
                             "diffusion_field / coupling")
        if geometry.kind in ("flat", "torus", "revolution"):
            if len(diffusion_tensor) != 3:
                raise ValueError("diffusion_tensor must be (Dxx, Dyy, Dxy) "
                                 "on 2-D surfaces (physical "
                                 "orthonormal-frame components)")
            if getattr(cfg, "pole_coarsen", 0):
                raise ValueError("diffusion_tensor does not compose with "
                                 "pole_coarsen (the Galerkin band "
                                 "operator assumes ring-constant phi "
                                 "coefficients)")
        elif geometry.kind == "box":
            if len(diffusion_tensor) != 6:
                raise ValueError("diffusion_tensor must be "
                                 "(Dxx, Dyy, Dzz, Dxy, Dxz, Dyz) on the "
                                 "3-D box")
        else:
            raise ValueError("diffusion_tensor needs a flat, torus, "
                             "revolution or box surface")
        diffusion_tensor = tuple(
            np.asarray(c, dtype=np.float64) for c in diffusion_tensor)
        # SPD validation happens in tensor_coeffs64; build them once here
        # so bad tensors fail at build time, not first step
        geometry.tensor_coeffs64(*diffusion_tensor,
                                 boundary=cfg.boundary)
    if diffusion_field is None:
        if diffusion_tensor is not None:
            diffusion_field = None   # the tensor IS the operator; no
                                     # box/revolution constant-D default
        else:
            diffusion_field = diffusion_field_from_cfg(cfg, geometry)
        if diffusion_field is None and diffusion_tensor is None \
                and geometry.kind in ("revolution", "box"):
            # revolution surfaces and the 3-D box have no hand-expanded
            # stencil form: they always take the conservative divergence
            # operator, with the constant cfg.diffusion as the field
            diffusion_field = np.float64(cfg.diffusion)
    else:
        diffusion_field = np.asarray(diffusion_field, dtype=np.float64)
        if not np.all(diffusion_field >= 0.0):
            raise ValueError("diffusion_field must be non-negative")
        try:
            np.broadcast_to(diffusion_field, geometry.grid.shape)
        except ValueError:
            raise ValueError(
                f"diffusion_field shape {diffusion_field.shape} does not "
                f"broadcast to the grid {geometry.grid.shape}")
    face_mask = None
    if diffusion_tensor is not None and obstacle_mask is not None:
        raise ValueError("obstacle_mask is unsupported with "
                         "diffusion_tensor (mixed terms need mask-aware "
                         "one-sided differencing); no-flux DOMAIN "
                         "boundaries compose via "
                         "tensor_coeffs64(boundary=...)")
    if (cfg.boundary != "periodic" or obstacle_mask is not None) \
            and diffusion_tensor is None:
        if obstacle_mask is not None:
            obstacle_mask = np.asarray(obstacle_mask, dtype=bool)
            try:
                obstacle_mask = np.broadcast_to(obstacle_mask,
                                                geometry.grid.shape).copy()
            except ValueError:
                raise ValueError(
                    f"obstacle_mask shape {obstacle_mask.shape} does not "
                    f"broadcast to the grid {geometry.grid.shape}")
            if not obstacle_mask.any():
                raise ValueError("obstacle_mask is all-False (no tissue)")
        from crdmodel_tpu.core.grid import face_openness, face_openness3
        if cfg.surface == "box":
            face_mask = face_openness3(cfg.nz, cfg.ny, cfg.nx, cfg.boundary,
                                       obstacle_mask)
        else:
            face_mask = face_openness(cfg.ny, cfg.nx, cfg.boundary,
                                      obstacle_mask)
        if diffusion_field is None:
            # closed faces live in the face coefficients, so the operator
            # must take the divergence form even for constant D
            diffusion_field = np.float64(cfg.diffusion)
    from crdmodel_tpu.core.forcing import SeparableForcing
    if isinstance(forcing, SeparableForcing) and cfg.surface != "box" \
            and any(st.zprof is not None for st in forcing.stimuli):
        raise ValueError("Stimulus.zprof is a depth profile for 3-D box "
                         "surfaces only (core/forcing.py)")
    steady = model.steady_state(cfg.beta)
    y0 = initial_state(cfg, model, steady, dtype)
    rhs = make_rhs(cfg, model, geometry, dtype,
                   diffusion_field=diffusion_field, forcing=forcing,
                   diffusion_tensor=diffusion_tensor,
                   face_mask=face_mask, obstacle_mask=obstacle_mask)
    params = {"b": beta_field(cfg, dtype)}
    return Problem(cfg=cfg, model=model, geometry=geometry, rhs=rhs,
                   y0=y0, params=params, steady_state=steady,
                   diffusion_field=diffusion_field, forcing=forcing,
                   diffusion_tensor=diffusion_tensor,
                   obstacle_mask=obstacle_mask, face_mask=face_mask)
