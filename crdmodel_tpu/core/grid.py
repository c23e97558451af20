"""Grid and surface geometry.

Layer 1 of the build plan (SURVEY.md §7): the reference's per-point
trigonometry inside the hot RHS loop (sin/cos recomputed per grid point per
stage, reference src/FHNmodel_torus.cpp:531-537) becomes precomputed 1-D
metric coefficient profiles broadcast over the grid — a TPU-first choice that
turns the curvilinear stencil into three fused multiply-adds per point.

Conventions reproduced exactly for parity with the reference:
  - Grid points at x_i = XMIN + i*dx for i in [0, nx), dx = (XMAX-XMIN)/(nx-1):
    the periodic seam point is duplicated (x_{nx-1} = XMAX identifies with
    x_0 = XMIN on the torus) — reference src/FHNmodel_torus.cpp:233-234.
  - Periodic wrap in BOTH directions (MPI Cartesian grid with periods={1,1},
    reference src/FHNmodel_torus.cpp:731-736).
  - Torus Laplace–Beltrami coefficients (reference src/FHNmodel_torus.cpp:535-537):
      L u = -sin(th)/(r(R+r cos th)) * u_th  +  (1/r^2) u_thth
            + 1/(R+r cos th)^2 * u_phiphi
    discretised with central differences; diffusion acts ONLY on variable 0.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static grid descriptor. Arrays are built lazily per-dtype."""

    nx: int
    ny: int
    xmin: float
    xmax: float
    ymin: float
    ymax: float

    @property
    def dx(self) -> float:
        return (self.xmax - self.xmin) / (self.nx - 1.0)

    @property
    def dy(self) -> float:
        return (self.ymax - self.ymin) / (self.ny - 1.0)

    def x_coords(self, dtype=jnp.float32) -> jnp.ndarray:
        """theta/x values, shape (nx,): x_i = XMIN + i*dx."""
        i = np.arange(self.nx, dtype=np.float64)
        return jnp.asarray(self.xmin + i * self.dx, dtype=dtype)

    def y_coords(self, dtype=jnp.float32) -> jnp.ndarray:
        """phi/y values, shape (ny,): y_j = YMIN + j*dy."""
        j = np.arange(self.ny, dtype=np.float64)
        return jnp.asarray(self.ymin + j * self.dy, dtype=dtype)

    @property
    def shape(self) -> tuple:
        return (self.ny, self.nx)


@dataclasses.dataclass(frozen=True)
class FlatGeometry:
    """Flat periodic rectangle: constant stencil coefficients.

    cu1 = D/dx^2, cu2 = D/dy^2, cu3 = -2(cu1+cu2)
    (reference src/FHNmodel_flat.cpp:489-491).
    """

    grid: Grid
    diffusion: float

    kind = "flat"

    def stencil_coeffs(self, dtype=jnp.float32):
        """Returns (cw_e, cn_s, cc) broadcastable over (ny, nx).

        ydot_u = cw_e*(uW+uE) + cn_s*(uS+uN) + cc*u
        """
        d = np.float64(self.diffusion)
        cu1 = d / np.float64(self.grid.dx) ** 2
        cu2 = d / np.float64(self.grid.dy) ** 2
        cu3 = -2.0 * (cu1 + cu2)
        return (
            jnp.asarray(cu1, dtype=dtype),
            jnp.asarray(cu2, dtype=dtype),
            jnp.asarray(cu3, dtype=dtype),
        )

    def gaussian_curvature(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((self.grid.nx,), dtype=dtype)


@dataclasses.dataclass(frozen=True)
class TorusGeometry:
    """Torus surface: theta-dependent metric coefficient profiles.

    The three per-column coefficients of the discrete Laplace–Beltrami
    operator (reference src/FHNmodel_torus.cpp:535-537), precomputed over the
    theta axis in float64 then cast:

      c_asym(th) = D * (-sin th) / (r (R + r cos th)) / (2 dx)
      c_theta    = D / (r^2 dx^2)                       (constant)
      c_phi(th)  = D / ((R + r cos th)^2 dy^2)

      ydot_u = c_asym*(uE - uW) + c_theta*(uE - 2u + uW) + c_phi*(uN - 2u + uS)

    where E/W are +/- theta neighbors (axis -1) and N/S are +/- phi neighbors
    (axis -2), periodic both ways.
    """

    grid: Grid
    diffusion: float
    R: float  # major radius = surfaceLength / 2pi
    r: float  # minor radius = surfaceWidth / 2pi

    kind = "torus"

    def _profiles64(self):
        g = self.grid
        th = self.grid.xmin + np.arange(g.nx, dtype=np.float64) * g.dx
        D = np.float64(self.diffusion)
        R, r = np.float64(self.R), np.float64(self.r)
        ring = R + r * np.cos(th)
        c_asym = D * (-np.sin(th) / (r * ring)) / (2.0 * g.dx)
        c_theta = np.full_like(th, D / (r * r * g.dx * g.dx))
        c_phi = D / (ring * ring * g.dy * g.dy)
        return c_asym, c_theta, c_phi

    def stencil_coeffs(self, dtype=jnp.float32):
        """Returns (c_asym, c_theta, c_phi), each shape (nx,)."""
        a, t, p = self._profiles64()
        return (
            jnp.asarray(a, dtype=dtype),
            jnp.asarray(t, dtype=dtype),
            jnp.asarray(p, dtype=dtype),
        )

    def gaussian_curvature(self, dtype=jnp.float32) -> jnp.ndarray:
        """K(theta) = cos(theta) / (r (R + r cos theta)), shape (nx,).

        (reference util/GenCurvatureCoupling.py:87)
        """
        g = self.grid
        th = g.xmin + np.arange(g.nx, dtype=np.float64) * g.dx
        K = np.cos(th) / (self.r * (self.R + self.r * np.cos(th)))
        return jnp.asarray(K, dtype=dtype)


Geometry = Union[FlatGeometry, TorusGeometry]


def make_grid(cfg: SimConfig) -> Grid:
    return Grid(nx=cfg.nx, ny=cfg.ny, xmin=cfg.xmin, xmax=cfg.xmax,
                ymin=cfg.ymin, ymax=cfg.ymax)


def make_geometry(cfg: SimConfig) -> Geometry:
    grid = make_grid(cfg)
    if cfg.surface == "torus":
        return TorusGeometry(grid=grid, diffusion=cfg.diffusion,
                             R=cfg.major_radius, r=cfg.minor_radius)
    return FlatGeometry(grid=grid, diffusion=cfg.diffusion)
