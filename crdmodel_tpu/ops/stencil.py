"""Periodic diffusion stencils (XLA path — the correctness oracle).

Replaces the reference's 9-region (interior/4 faces/4 corners) hand-unrolled
loops with halo buffers (reference src/FHNmodel_torus.cpp:526-615,
src/FHNmodel_flat.cpp:489-566) by whole-array `jnp.roll` shifts: on a single
device the periodic wrap IS the reference's MPI halo exchange (each rank's
Wrecv holds its west neighbour's east column; with periods={1,1} the global
composition is exactly a circular shift).

Axis convention: arrays are (..., ny, nx) — axis -1 is theta/x ("i", E/W
neighbours), axis -2 is phi/y ("j", N/S neighbours), matching the plot
scripts' reassembled (nt, ny, nx) layout (util/FHNmodel/plot_FHNmodel_flat.py:60-86).
"""

from __future__ import annotations

import jax.numpy as jnp


def shift_w(u):
    """u[..., j, i-1] (west neighbour, periodic)."""
    return jnp.roll(u, 1, axis=-1)


def shift_e(u):
    """u[..., j, i+1] (east neighbour, periodic)."""
    return jnp.roll(u, -1, axis=-1)


def shift_s(u):
    """u[..., j-1, i] (south neighbour, periodic)."""
    return jnp.roll(u, 1, axis=-2)


def shift_n(u):
    """u[..., j+1, i] (north neighbour, periodic)."""
    return jnp.roll(u, -1, axis=-2)


def flat_laplacian(u, coeffs):
    """D * 5-point Laplacian on a flat periodic rectangle.

    coeffs = (cu1, cu2, cu3) with cu1=D/dx^2, cu2=D/dy^2, cu3=-2(cu1+cu2)
    (reference src/FHNmodel_flat.cpp:489-500).
    """
    cu1, cu2, cu3 = coeffs
    return (cu1 * (shift_w(u) + shift_e(u))
            + cu2 * (shift_s(u) + shift_n(u))
            + cu3 * u)


def torus_laplacian(u, coeffs):
    """D * Laplace–Beltrami on the torus parametric grid.

    coeffs = (c_asym, c_theta, c_phi), 1-D theta profiles of shape (nx,)
    broadcast over rows (see TorusGeometry.stencil_coeffs; reference
    src/FHNmodel_torus.cpp:535-537):

      out = c_asym*(uE - uW) + c_theta*(uE - 2u + uW) + c_phi*(uN - 2u + uS)
    """
    c_asym, c_theta, c_phi = coeffs
    uw, ue = shift_w(u), shift_e(u)
    us, un = shift_s(u), shift_n(u)
    return (c_asym * (ue - uw)
            + c_theta * (ue - 2.0 * u + uw)
            + c_phi * (un - 2.0 * u + us))


def divergence_laplacian(u, face_coeffs):
    """Conservative variable-coefficient diffusion div(D grad u).

    face_coeffs = (aE, aW, aN, aS) from Geometry.divergence_coeffs — all
    metric and D(x) factors folded into per-face coefficients at setup, so
    the hot path is four fused multiply-adds per point like the constant-D
    stencils. Written in difference form (exactly zero for constant u).

    This is the operator behind coupling="curvature" (the Kneer et al. 2014
    curvature-modulated coupling the reference computes in
    util/GenCurvatureCoupling.py:29-43 but never feeds back into a
    simulation) and user-supplied diffusion fields.
    """
    aE, aW, aN, aS = face_coeffs
    return (aE * (shift_e(u) - u) + aW * (shift_w(u) - u)
            + aN * (shift_n(u) - u) + aS * (shift_s(u) - u))


def divergence_from_padded(up, face_coeffs):
    """divergence_laplacian over an explicitly haloed block (..., nyl+2,
    nxl+2); face_coeffs are the LOCAL centre blocks (face coefficients are
    indexed at the centre point, so they need no halo — like the metric
    profiles in laplacian_from_padded)."""
    aE, aW, aN, aS = face_coeffs
    u = up[..., 1:-1, 1:-1]
    uw = up[..., 1:-1, 0:-2]
    ue = up[..., 1:-1, 2:]
    us = up[..., 0:-2, 1:-1]
    un = up[..., 2:, 1:-1]
    return (aE * (ue - u) + aW * (uw - u)
            + aN * (un - u) + aS * (us - u))


def shift_d(u):
    """u[..., k-1, j, i] (down/depth- neighbour, periodic; box grids)."""
    return jnp.roll(u, 1, axis=-3)


def shift_u3(u):
    """u[..., k+1, j, i] (up/depth+ neighbour, periodic; box grids)."""
    return jnp.roll(u, -1, axis=-3)


def divergence_laplacian3(u, face_coeffs):
    """Conservative 7-point div(D grad u) on the 3-D box (..., nz, ny, nx).

    face_coeffs = (aE, aW, aN, aS, aU, aD) from BoxGeometry.divergence_coeffs
    (core/grid.py) — the 3-D extension of divergence_laplacian, same
    difference form (exactly zero for constant u), exactly conservative and
    self-adjoint by construction. Beyond-reference capability: the
    reference is strictly 2-D (src/FHNmodel_flat.cpp:489-566)."""
    aE, aW, aN, aS, aU, aD = face_coeffs
    return (aE * (shift_e(u) - u) + aW * (shift_w(u) - u)
            + aN * (shift_n(u) - u) + aS * (shift_s(u) - u)
            + aU * (shift_u3(u) - u) + aD * (shift_d(u) - u))


def divergence3_from_padded(up, face_coeffs):
    """divergence_laplacian3 over a block haloed in the TRAILING (y, x)
    axes only: (..., nz, nyl+2, nxl+2). The z axis is mesh-local (the box
    shards its y/x axes over the device mesh, z stays on-device —
    parallel/sharded.py), so z neighbours come from the local periodic
    roll; face coefficients are the LOCAL centre blocks."""
    aE, aW, aN, aS, aU, aD = face_coeffs
    u = up[..., 1:-1, 1:-1]
    uw = up[..., 1:-1, 0:-2]
    ue = up[..., 1:-1, 2:]
    us = up[..., 0:-2, 1:-1]
    un = up[..., 2:, 1:-1]
    ud = jnp.roll(u, 1, axis=-3)
    uu = jnp.roll(u, -1, axis=-3)
    return (aE * (ue - u) + aW * (uw - u)
            + aN * (un - u) + aS * (us - u)
            + aU * (uu - u) + aD * (ud - u))


def anisotropic_laplacian(u, face_coeffs, dxy, inv4):
    """Conservative anisotropic diffusion div(D grad u) on the flat
    periodic rectangle, D = [[Dxx, Dxy], [Dxy, Dyy]] (grid.py::
    FlatGeometry.tensor_coeffs64 — axis terms in face-flux form, mixed
    terms as the symmetric Ax(Dxy Ay u) + Ay(Dxy Ax u) with centred
    differences, exactly conservative + self-adjoint; 9-point stencil).

    Beyond-reference capability: fiber anisotropy (cardiac conduction
    with along- vs cross-fiber diffusivity; the reference is
    isotropic-only)."""
    axis = divergence_laplacian(u, face_coeffs)
    un, us = shift_n(u), shift_s(u)
    dys = un - us                               # 2 dy * (d u / dy)_ij
    fx = dxy * dys                              # Dxy_ij * ...
    t1 = shift_e(fx) - shift_w(fx)              # 2 dx * d/dx (Dxy u_y)
    dxs = shift_e(u) - shift_w(u)
    fy = dxy * dxs
    t2 = shift_n(fy) - shift_s(fy)
    return axis + inv4 * (t1 + t2)


def anisotropic_from_padded(up, face_coeffs, dxy_p, inv4):
    """anisotropic_laplacian over an explicitly haloed block (..., nyl+2,
    nxl+2). The mixed terms read the CORNER halo cells — the two-phase
    ppermute exchange fills them with the true diagonal neighbours
    (parallel/halo.py module docstring). dxy_p is the (nyl+2, nxl+2)
    haloed Dxy block: the fluxes Dxy*(du) are formed at neighbour points,
    so Dxy itself needs the same 1-ring halo as the state."""
    axis = divergence_from_padded(up, face_coeffs)
    dys = up[..., 2:, :] - up[..., 0:-2, :]     # rows j+1 - j-1, all cols
    fx = dxy_p[..., 1:-1, :] * dys
    t1 = fx[..., :, 2:] - fx[..., :, 0:-2]
    dxs = up[..., :, 2:] - up[..., :, 0:-2]
    fy = dxy_p[..., :, 1:-1] * dxs
    t2 = fy[..., 2:, :] - fy[..., 0:-2, :]
    return axis + inv4 * (t1 + t2)


def _mixed_pair(u, dab, axis_a, axis_b):
    """The symmetric mixed-derivative pair Aa(Dab * Ab u) + Ab(Dab * Aa u)
    with Aa/Ab the periodic centred first differences along axis_a/axis_b
    (unweighted: the caller multiplies by 1/(4 da db)). Same grouping as
    the 2-D mixed terms in anisotropic_laplacian."""
    da = jnp.roll(u, -1, axis_b) - jnp.roll(u, 1, axis_b)
    fa = dab * da
    t1 = jnp.roll(fa, -1, axis_a) - jnp.roll(fa, 1, axis_a)
    db = jnp.roll(u, -1, axis_a) - jnp.roll(u, 1, axis_a)
    fb = dab * db
    t2 = jnp.roll(fb, -1, axis_b) - jnp.roll(fb, 1, axis_b)
    return t1 + t2


def anisotropic_laplacian3(u, face_coeffs, mixed, invs):
    """Conservative 3-D anisotropic diffusion div(D grad u) on the
    periodic box, D a full SPD 3x3 tensor field (grid.py::
    BoxGeometry.tensor_coeffs64 — diagonal terms in 7-point face-flux
    form, three symmetric centred mixed pairs; 19-point stencil).

    mixed = (Dxy, Dxz, Dyz) full (nz, ny, nx) arrays; invs the matching
    1/(4 da db) weights. Beyond-reference capability: volumetric fiber
    anisotropy (transmurally rotating cardiac fiber fields)."""
    dxy, dxz, dyz = mixed
    ixy, ixz, iyz = invs
    return (divergence_laplacian3(u, face_coeffs)
            + ixy * _mixed_pair(u, dxy, -1, -2)
            + ixz * _mixed_pair(u, dxz, -1, -3)
            + iyz * _mixed_pair(u, dyz, -2, -3))


def anisotropic3_from_padded(up, face_coeffs, mixed_p, invs):
    """anisotropic_laplacian3 over a block haloed in the TRAILING (y, x)
    axes only: (..., nz, nyl+2, nxl+2) — the 3-D sharded-box layout (z is
    mesh-local, handled by local rolls like divergence3_from_padded).

    The xy mixed pair reads CORNER halo cells (filled by the two-phase
    ppermute exchange, parallel/halo.py); the xz/yz pairs need only the
    x/y face halos plus local z rolls. mixed_p = (Dxy_p, Dxz_p, Dyz_p),
    each carried with the SAME (y, x) 1-ring halo as the state (fluxes
    Dab*(du) are formed at neighbour points)."""
    axis = divergence3_from_padded(up, face_coeffs)
    dxy_p, dxz_p, dyz_p = mixed_p
    ixy, ixz, iyz = invs
    # xy pair — the 2-D anisotropic_from_padded slicing (t1 + t2 in the
    # exact _mixed_pair association, so sharded == unsharded bitwise)
    dys = up[..., 2:, :] - up[..., 0:-2, :]
    fx = dxy_p[..., 1:-1, :] * dys
    t1 = fx[..., :, 2:] - fx[..., :, 0:-2]
    dxs = up[..., :, 2:] - up[..., :, 0:-2]
    fy = dxy_p[..., :, 1:-1] * dxs
    t2 = fy[..., 2:, :] - fy[..., 0:-2, :]
    t_xy = t1 + t2
    # xz pair — z legs via local roll (axis -3), x legs via halo slices
    dzs = jnp.roll(up, -1, -3) - jnp.roll(up, 1, -3)
    fx = dxz_p[..., 1:-1, :] * dzs[..., 1:-1, :]
    t1 = fx[..., :, 2:] - fx[..., :, 0:-2]
    fz = dxz_p[..., 1:-1, 1:-1] * dxs[..., 1:-1, :]
    t2 = jnp.roll(fz, -1, -3) - jnp.roll(fz, 1, -3)
    t_xz = t1 + t2
    # yz pair — z legs via local roll, y legs via halo slices
    fy = dyz_p[..., :, 1:-1] * dzs[..., :, 1:-1]
    t1 = fy[..., 2:, :] - fy[..., 0:-2, :]
    fz = dyz_p[..., 1:-1, 1:-1] * dys[..., :, 1:-1]
    t2 = jnp.roll(fz, -1, -3) - jnp.roll(fz, 1, -3)
    t_yz = t1 + t2
    return axis + ixy * t_xy + ixz * t_xz + iyz * t_yz


def laplacian_from_padded(up, coeffs, kind):
    """Stencil over an explicitly haloed block up of shape (..., nyl+2, nxl+2).

    Used by the shard_map path: halo rows/cols come from `lax.ppermute`
    neighbour exchange (the reference's Exchange, src/FHNmodel_torus.cpp:775-950).
    Coefficient profiles are the *local* center-column slices (no halo needed:
    coefficients are evaluated at the centre point only).
    """
    u = up[..., 1:-1, 1:-1]
    uw = up[..., 1:-1, 0:-2]
    ue = up[..., 1:-1, 2:]
    us = up[..., 0:-2, 1:-1]
    un = up[..., 2:, 1:-1]
    if kind == "flat":
        cu1, cu2, cu3 = coeffs
        return cu1 * (uw + ue) + cu2 * (us + un) + cu3 * u
    c_asym, c_theta, c_phi = coeffs
    return (c_asym * (ue - uw)
            + c_theta * (ue - 2.0 * u + uw)
            + c_phi * (un - 2.0 * u + us))
