"""Stencil tests: roll-based operators vs an independent per-point loop
implementation of the reference discretisation, plus analytic convergence.
"""

import numpy as np
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import make_geometry
from crdmodel_tpu.ops.stencil import flat_laplacian, torus_laplacian, laplacian_from_padded


def loop_flat_laplacian(u, D, dx, dy):
    """Direct transcription of the reference 5-point stencil math with
    periodic wrap (src/FHNmodel_flat.cpp:489-500), per-point loops."""
    ny, nx = u.shape
    cu1 = D / dx**2
    cu2 = D / dy**2
    cu3 = -2.0 * (cu1 + cu2)
    out = np.zeros_like(u)
    for j in range(ny):
        for i in range(nx):
            uw = u[j, (i - 1) % nx]
            ue = u[j, (i + 1) % nx]
            us = u[(j - 1) % ny, i]
            un = u[(j + 1) % ny, i]
            out[j, i] = cu1 * (uw + ue) + cu2 * (us + un) + cu3 * u[j, i]
    return out


def loop_torus_laplacian(u, D, dx, dy, R, r, xmin=0.0):
    """Direct transcription of the torus metric stencil
    (src/FHNmodel_torus.cpp:535-537), per-point loops."""
    ny, nx = u.shape
    out = np.zeros_like(u)
    for j in range(ny):
        for i in range(nx):
            xx = xmin + i * dx
            uw = u[j, (i - 1) % nx]
            ue = u[j, (i + 1) % nx]
            us = u[(j - 1) % ny, i]
            un = u[(j + 1) % ny, i]
            ring = R + r * np.cos(xx)
            out[j, i] = (D * (-np.sin(xx) / (r * ring)) * (ue - uw) / (2 * dx)
                         + D * (1 / r**2) * (ue - 2 * u[j, i] + uw) / dx**2
                         + D * (1 / ring**2) * (un - 2 * u[j, i] + us) / dy**2)
    return out


def _rand_field(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((ny, nx))


def test_flat_matches_loop_reference():
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=13,
                    surface_width=20, surface_length=40, dtype="float64")
    geom = make_geometry(cfg)
    u = _rand_field(cfg.ny, cfg.nx)
    ours = np.asarray(flat_laplacian(jnp.asarray(u), geom.stencil_coeffs(jnp.float64)))
    ref = loop_flat_laplacian(u, cfg.diffusion, cfg.dx, cfg.dy)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_torus_matches_loop_reference():
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=17,
                    surface_width=20, surface_length=80, dtype="float64")
    geom = make_geometry(cfg)
    u = _rand_field(cfg.ny, cfg.nx, seed=1)
    ours = np.asarray(torus_laplacian(jnp.asarray(u), geom.stencil_coeffs(jnp.float64)))
    ref = loop_torus_laplacian(u, cfg.diffusion, cfg.dx, cfg.dy,
                               geom.R, geom.r)
    np.testing.assert_allclose(ours, ref, rtol=1e-11, atol=1e-12)


def test_flat_analytic_convergence_interior():
    """Interior points approximate D*(uxx+uyy) to O(h^2). Exclude the seam
    rows/cols where the duplicated-point periodic wrap (a reproduced
    reference quirk, src/FHNmodel_flat.cpp:230-231) is inconsistent."""
    errs = []
    for nx in (32, 64, 128):
        W = L = 2 * np.pi
        cfg = SimConfig(model="fhn", surface="flat", x_mesh=nx,
                        surface_width=W, surface_length=L, dtype="float64")
        geom = make_geometry(cfg)
        x = cfg.xmin + np.arange(cfg.nx) * cfg.dx
        y = cfg.ymin + np.arange(cfg.ny) * cfg.dy
        X, Y = np.meshgrid(x, y)
        u = np.sin(X) * np.cos(2 * Y)
        exact = cfg.diffusion * (-1 - 4) * u
        ours = np.asarray(flat_laplacian(jnp.asarray(u),
                                         geom.stencil_coeffs(jnp.float64)))
        interior = (slice(2, -2), slice(2, -2))
        errs.append(np.max(np.abs(ours[interior] - exact[interior])))
    # second-order: each doubling should cut error ~4x
    assert errs[1] < errs[0] / 3.0
    assert errs[2] < errs[1] / 3.0


def test_torus_analytic_laplace_beltrami_interior():
    """Against the analytic Laplace–Beltrami of f = cos(theta) on the torus:
    L f = sin^2/(r(R+r cos)) * ... — compute symbolically via finite check:
      L f = -sin(th)/(r(R+r cos th)) * f_th + f_thth/r^2  (f_phiphi = 0)
    with f = cos: f_th = -sin, f_thth = -cos
      L f = sin^2/(r(R+r cos)) - cos/r^2
    """
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=129,
                    surface_width=20, surface_length=80, dtype="float64")
    geom = make_geometry(cfg)
    R, r = geom.R, geom.r
    x = cfg.xmin + np.arange(cfg.nx) * cfg.dx
    th = np.broadcast_to(x[None, :], (cfg.ny, cfg.nx))
    u = np.cos(th)
    exact = cfg.diffusion * (np.sin(th) ** 2 / (r * (R + r * np.cos(th)))
                             - np.cos(th) / r**2)
    ours = np.asarray(torus_laplacian(jnp.asarray(u),
                                      geom.stencil_coeffs(jnp.float64)))
    # exclude the theta seam columns (duplicated point quirk)
    np.testing.assert_allclose(ours[:, 2:-2], exact[:, 2:-2],
                               rtol=0, atol=5e-4)


def test_padded_equals_roll():
    """laplacian_from_padded over a manually haloed full grid == roll path."""
    for surface in ("flat", "torus"):
        cfg = SimConfig(model="fhn", surface=surface, x_mesh=11,
                        surface_width=20, surface_length=40, dtype="float64")
        geom = make_geometry(cfg)
        coeffs = geom.stencil_coeffs(jnp.float64)
        u = jnp.asarray(_rand_field(cfg.ny, cfg.nx, seed=2))
        up = jnp.pad(u, 1, mode="wrap")
        got = laplacian_from_padded(up, coeffs, geom.kind)
        want = (torus_laplacian if surface == "torus" else flat_laplacian)(u, coeffs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)
