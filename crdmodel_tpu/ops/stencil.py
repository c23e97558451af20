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
