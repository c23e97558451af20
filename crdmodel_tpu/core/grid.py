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
    """Static grid descriptor. Arrays are built lazily per-dtype.

    nz > 0 marks a 3-D box grid (surface="box"): arrays gain a LEADING z
    axis, (nz, ny, nx) — the x/y axes keep their (..., ny, nx) trailing
    positions so every 2-D stencil/halo convention carries over unchanged."""

    nx: int
    ny: int
    xmin: float
    xmax: float
    ymin: float
    ymax: float
    nz: int = 0
    zmin: float = 0.0
    zmax: float = 0.0

    @property
    def dx(self) -> float:
        return (self.xmax - self.xmin) / (self.nx - 1.0)

    @property
    def dy(self) -> float:
        return (self.ymax - self.ymin) / (self.ny - 1.0)

    @property
    def dz(self) -> float:
        return (self.zmax - self.zmin) / (self.nz - 1.0)

    def x_coords(self, dtype=jnp.float32) -> jnp.ndarray:
        """theta/x values, shape (nx,): x_i = XMIN + i*dx."""
        i = np.arange(self.nx, dtype=np.float64)
        return jnp.asarray(self.xmin + i * self.dx, dtype=dtype)

    def y_coords(self, dtype=jnp.float32) -> jnp.ndarray:
        """phi/y values, shape (ny,): y_j = YMIN + j*dy."""
        j = np.arange(self.ny, dtype=np.float64)
        return jnp.asarray(self.ymin + j * self.dy, dtype=dtype)

    def z_coords(self, dtype=jnp.float32) -> jnp.ndarray:
        """depth values, shape (nz,): z_k = ZMIN + k*dz (box only)."""
        k = np.arange(self.nz, dtype=np.float64)
        return jnp.asarray(self.zmin + k * self.dz, dtype=dtype)

    @property
    def shape(self) -> tuple:
        if self.nz > 0:
            return (self.nz, self.ny, self.nx)
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

    def divergence_coeffs(self, dfield, dtype=jnp.float32, face_mask=None):
        """Face coefficients (aE, aW, aN, aS) of the conservative
        variable-coefficient operator div(D grad u) on the flat rectangle:

          L u = aE (uE - u) + aW (uW - u) + aN (uN - u) + aS (uS - u)

        with aE_ij = D_{i+1/2,j}/dx^2 (arithmetic face mean) etc. Exactly
        conservative (sum_ij L u = 0) and self-adjoint by construction.
        dfield: absolute D values, scalar / (nx,) / (ny, nx). Computed in
        float64, cast once (setup-time, like stencil_coeffs).
        face_mask: optional (oE, oW, oN, oS) openness masks
        (face_openness) — closed faces (no-flux boundaries / obstacle
        walls) zero the corresponding coefficients.
        """
        return tuple(jnp.asarray(a, dtype=dtype)
                     for a in self.divergence_coeffs64(dfield, face_mask))

    def divergence_coeffs64(self, dfield, face_mask=None):
        """The face coefficients as float64 numpy (for the spectral-radius
        bound and the kernel profile remap, which stay in f64 until their
        own cast)."""
        g = self.grid
        D = np.asarray(dfield, dtype=np.float64)
        if D.ndim < 2:
            # x-only (or constant) D: faces stay (nx,) profiles broadcast
            # over rows, like the torus metric coefficients — no (ny, nx)
            # arrays materialised
            D = np.broadcast_to(D, (g.nx,))
            De = 0.5 * (D + np.roll(D, -1))
            Dn = Ds = D
            aW_of = lambda aE: np.roll(aE, 1)
        else:
            D = np.broadcast_to(D, (g.ny, g.nx))
            De = 0.5 * (D + np.roll(D, -1, axis=-1))
            Dn = 0.5 * (D + np.roll(D, -1, axis=-2))
            Ds = np.roll(Dn, 1, axis=-2)
            aW_of = lambda aE: np.roll(aE, 1, axis=-1)
        inv_dx2 = 1.0 / np.float64(g.dx) ** 2
        inv_dy2 = 1.0 / np.float64(g.dy) ** 2
        aE = De * inv_dx2
        aW = aW_of(aE)
        aN = Dn * inv_dy2
        aS = Ds * inv_dy2
        return _apply_face_mask((aE, aW, aN, aS), face_mask)

    def tensor_coeffs64(self, dxx, dyy, dxy, boundary: str = "periodic"):
        """Coefficients of the anisotropic conservative operator
        div(D grad u), D = [[Dxx, Dxy], [Dxy, Dyy]] an SPD tensor field
        (fiber anisotropy — e.g. cardiac conduction, where the
        along-fiber diffusivity exceeds cross-fiber severalfold; the
        reference is isotropic-only).

        Discretisation (all second-order, periodic):
          axis terms    face-averaged flux form (divergence_coeffs64
                        structure): aE(uE-u) + aW(uW-u) + aN(uN-u) + aS(uS-u)
          mixed terms   Ax(Dxy * Ay u) + Ay(Dxy * Ax u) with Ax/Ay the
                        centred first differences. Since Ax^T = -Ax and
                        Ay^T = -Ay (periodic), the mixed sum is exactly
                        SYMMETRIC, and 1^T Ax = 0 makes it exactly
                        CONSERVATIVE — both hold to rounding for any
                        Dxy(x, y) (tests/test_anisotropic.py).

        Monotonicity caveat (standard for centred mixed terms): for
        anisotropy ratios where |Dxy| approaches sqrt(Dxx*Dyy) the stencil
        can produce small new extrema; SPD is validated at build time.

        boundary ("noflux"/"noflux_x"/"noflux_y"): closed domain walls —
        the diagonal faces at the walls carry zero coefficients (exactly
        like face_openness) and the mixed field Dxy is zeroed on the
        wall-adjacent LAYERS of each closed axis, so every centred
        difference that would span a wall multiplies zero. This keeps the
        operator exactly symmetric and conservative (zeroing coefficient
        fields preserves the Aa^T = -Aa structure); the mixed flux simply
        shuts off in the boundary layer (first-order locally, standard
        for centred mixed terms).

        Returns (face_coeffs(aE, aW, aN, aS), dxy_full (ny, nx), inv4)
        with inv4 = 1/(4 dx dy) — the mixed-term weight."""
        g = self.grid
        shape = (g.ny, g.nx)
        Dxx = np.broadcast_to(np.asarray(dxx, np.float64), shape)
        Dyy = np.broadcast_to(np.asarray(dyy, np.float64), shape)
        Dxy = np.broadcast_to(np.asarray(dxy, np.float64), shape).copy()
        if not (np.all(Dxx > 0.0) and np.all(Dyy > 0.0)
                and np.all(Dxx * Dyy - Dxy * Dxy >= -1e-14 * Dxx * Dyy)):
            raise ValueError("diffusion_tensor must be SPD pointwise "
                             "(Dxx>0, Dyy>0, Dxx*Dyy >= Dxy^2)")
        De = 0.5 * (Dxx + np.roll(Dxx, -1, axis=-1))
        Dn = 0.5 * (Dyy + np.roll(Dyy, -1, axis=-2))
        inv_dx2 = 1.0 / np.float64(g.dx) ** 2
        inv_dy2 = 1.0 / np.float64(g.dy) ** 2
        aE = (De * inv_dx2).copy()
        aN = (Dn * inv_dy2).copy()
        closed_x = boundary in ("noflux", "noflux_x")
        closed_y = boundary in ("noflux", "noflux_y")
        if closed_x:
            aE[..., -1] = 0.0
            Dxy[..., 0] = 0.0
            Dxy[..., -1] = 0.0
        if closed_y:
            aN[..., -1, :] = 0.0
            Dxy[..., 0, :] = 0.0
            Dxy[..., -1, :] = 0.0
        # aW/aS AFTER masking so the roll identities hold wall-aware
        aW = np.roll(aE, 1, axis=-1)
        aS = np.roll(aN, 1, axis=-2)
        inv4 = 1.0 / (4.0 * np.float64(g.dx) * np.float64(g.dy))
        return (aE, aW, aN, aS), Dxy, inv4


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

    def divergence_coeffs(self, dfield, dtype=jnp.float32, face_mask=None):
        """Face coefficients (aE, aW, aN, aS) of the conservative
        variable-coefficient Laplace–Beltrami operator
        div(D grad u) = (1/sqrt(g)) d_a(sqrt(g) D g^ab d_b u) on the torus
        metric (sqrt(g) = r*ring, g^thth = 1/r^2, g^phiphi = 1/ring^2,
        ring = R + r cos th — the same metric the reference expands
        non-conservatively at src/FHNmodel_torus.cpp:527-541):

          L u = aE (uE - u) + aW (uW - u) + aN (uN - u) + aS (uS - u)
          aE_i = ring(th_i + dx/2) * D_{i+1/2} / (r^2 dx^2 ring_i)
          aW_i = ring(th_i - dx/2) * D_{i-1/2} / (r^2 dx^2 ring_i)
          aN = D_{j+1/2} / (ring_i^2 dy^2),  aS = D_{j-1/2} / (ring_i^2 dy^2)

        (the phi-direction sqrt(g) cancels since theta is constant along a
        column). Exactly conservative in the ring_i row weight and
        self-adjoint: ring_i aE_i = ring_{i+1} aW_{i+1} by construction.
        Face D values are arithmetic means. The wrap face reuses the grid's
        duplicated-seam convention (x_{nx-1}+dx/2, matching the roll-based
        stencil's treatment of the seam point as a real grid point).
        dfield: absolute D values, scalar / (nx,) / (ny, nx).
        face_mask: optional openness masks (face_openness) — obstacle
        walls on the torus (no-flux domain boundaries are flat-only: the
        torus is closed). Masking the per-face coefficient keeps the
        ring-weighted conservation exact (oW = roll(oE), so both sides of
        a shared face close together).
        """
        return tuple(jnp.asarray(a, dtype=dtype)
                     for a in self.divergence_coeffs64(dfield, face_mask))

    def divergence_coeffs64(self, dfield, face_mask=None):
        """Float64 numpy face coefficients (see FlatGeometry)."""
        g = self.grid
        th = g.xmin + np.arange(g.nx, dtype=np.float64) * g.dx
        R, r = np.float64(self.R), np.float64(self.r)
        ring = R + r * np.cos(th)
        ring_e = R + r * np.cos(th + 0.5 * g.dx)          # face i+1/2
        cx = 1.0 / (r * r * np.float64(g.dx) ** 2)
        cy = 1.0 / (ring * ring * np.float64(g.dy) ** 2)   # (nx,)
        D = np.asarray(dfield, dtype=np.float64)
        if D.ndim < 2:
            # theta-only D (e.g. the curvature-coupling profile): all four
            # faces stay (nx,) profiles broadcast over rows
            D = np.broadcast_to(D, (g.nx,))
            De = 0.5 * (D + np.roll(D, -1))
            Dn = Ds = D
            roll_x = lambda a: np.roll(a, 1)
        else:
            D = np.broadcast_to(D, (g.ny, g.nx))
            De = 0.5 * (D + np.roll(D, -1, axis=-1))
            Dn = 0.5 * (D + np.roll(D, -1, axis=-2))
            Ds = np.roll(Dn, 1, axis=-2)
            roll_x = lambda a: np.roll(a, 1, axis=-1)
        flux_e = ring_e * De * cx                          # per east face
        aE = flux_e / ring
        aW = roll_x(flux_e) / ring
        aN = Dn * cy
        aS = Ds * cy
        return _apply_face_mask((aE, aW, aN, aS), face_mask)

    def row_weights(self) -> np.ndarray:
        """ring(th) = R + r cos th, shape (nx,): the sqrt(g)/r cell weight in
        which the divergence-form operator conserves sum(ring * u) exactly
        (the discrete surface integral up to the constant r dx dy factor)."""
        g = self.grid
        th = g.xmin + np.arange(g.nx, dtype=np.float64) * g.dx
        return self.R + self.r * np.cos(th)

    def tensor_coeffs64(self, dxx, dyy, dxy, boundary: str = "periodic"):
        """Anisotropic conservative Laplace–Beltrami operator on the torus
        metric — fiber fields on a curved surface (round 5, beyond both
        the reference and the round-3 flat tensor; the reference's
        curvature tooling, util/GenCurvatureCoupling.py:45-111, gestures
        at metric-coupled dynamics but never integrates anisotropy).

        D = [[Dxx, Dxy], [Dxy, Dyy]] is the SPD tensor in the PHYSICAL
        orthonormal frame (e_theta, e_phi). With scale factors h_x = r,
        h_y = ring = R + r cos th and J = h_x h_y:

          L u = (1/J) [ d_th( (ring/r) Dxx d_th u + Dxy d_ph u )
                      + d_ph( Dxy d_th u + (r/ring) Dyy d_ph u ) ]

        Discretisation mirrors the flat tensor_coeffs64 exactly:
          axis terms   the divergence_coeffs64 face-flux structure with
                       effective per-direction diffusivities — E/W faces
                       carry ring_{i+1/2} Dxx_{i+1/2} / (r^2 dx^2 ring_i)
                       (reduces bitwise to divergence_coeffs64 when
                       Dxx == Dyy and Dxy == 0); self-adjoint in the ring
                       row weight by construction
                       (ring_i aE_i = ring_{i+1} aW_{i+1});
          mixed terms  the flat centred pair Ax(Dxy Ay u) + Ay(Dxy Ax u)
                       with the PROFILE weight
                       inv4(th) = 1/(4 dx dy r ring(th)) — the (nx,)
                       generalisation of the flat scalar 1/(4 dx dy);
                       antisymmetry of Ax/Ay in the uniform lattice sum
                       makes ring-weighted symmetry and conservation
                       exact for any Dxy(phi, theta).

        The torus is closed: only boundary="periodic" is meaningful.
        Returns ((aE, aW, aN, aS), dxy_full (ny, nx), inv4 (nx,))."""
        if boundary != "periodic":
            raise ValueError("the torus surface is closed: tensor "
                             "boundaries other than 'periodic' do not "
                             "exist on it")
        g = self.grid
        shape = (g.ny, g.nx)
        Dxx = np.broadcast_to(np.asarray(dxx, np.float64), shape)
        Dyy = np.broadcast_to(np.asarray(dyy, np.float64), shape)
        Dxy = np.broadcast_to(np.asarray(dxy, np.float64), shape).copy()
        if not (np.all(Dxx > 0.0) and np.all(Dyy > 0.0)
                and np.all(Dxx * Dyy - Dxy * Dxy >= -1e-14 * Dxx * Dyy)):
            raise ValueError("diffusion_tensor must be SPD pointwise "
                             "(Dxx>0, Dyy>0, Dxx*Dyy >= Dxy^2)")
        th = g.xmin + np.arange(g.nx, dtype=np.float64) * g.dx
        R, r = np.float64(self.R), np.float64(self.r)
        ring = R + r * np.cos(th)
        ring_e = R + r * np.cos(th + 0.5 * g.dx)
        cx = 1.0 / (r * r * np.float64(g.dx) ** 2)
        cy = 1.0 / (ring * ring * np.float64(g.dy) ** 2)
        De = 0.5 * (Dxx + np.roll(Dxx, -1, axis=-1))
        Dn = 0.5 * (Dyy + np.roll(Dyy, -1, axis=-2))
        flux_e = ring_e * De * cx
        aE = flux_e / ring
        aW = np.roll(flux_e, 1, axis=-1) / ring
        aN = Dn * cy
        aS = np.roll(aN, 1, axis=-2)
        inv4 = 1.0 / (4.0 * np.float64(g.dx) * np.float64(g.dy) * r * ring)
        return (aE, aW, aN, aS), Dxy, inv4


@dataclasses.dataclass(frozen=True)
class RevolutionGeometry:
    """Generic surface of revolution — the torus's metric machinery as data
    (beyond-reference capability; the reference hardcodes two surfaces).

    Parametrised by (v, phi): position (rho(v) cos phi, rho(v) sin phi,
    z(v)), metric ds^2 = E(v) dv^2 + rho(v)^2 dphi^2 with E = rho'^2 + z'^2.
    Laplace–Beltrami in divergence form (the same expansion the reference
    hand-derives for the torus at src/FHNmodel_torus.cpp:527-541, with
    sqrt(g) = sqrt(E) rho):

      L u = 1/(sqrt(E) rho) d_v( (rho/sqrt(E)) D d_v u ) + (D/rho^2) u_phiphi

    discretised finite-volume on faces, so conservation (in the cell weight
    w = sqrt(E) rho) and self-adjointness hold by construction for ANY
    profile. The torus is the special case rho = R + r cos v, z = r sin v
    (tests pin the equivalence); the sphere is rho = R sin v, z = -R cos v.

    capped=True (sphere-like): the v-axis does not wrap — cells sit at
    v_i = (i+1/2)h (config.py xmin/xmax conventions), faces land exactly on
    v=0 and v=pi, and the END-FACE flux weights are forced to 0. Where
    rho -> 0 there (poles) this is the standard polar finite-volume closure
    — the pole is not a boundary, the face just has zero length; where
    rho > 0 it is a zero-flux (no-flux) cap (e.g. a cylinder with closed
    ends). Both exactly conservative. The array wrap in x (jnp.roll /
    ppermute halos) then carries only zero-coefficient faces, so every
    solver path — sharded, fused kernels — works unchanged.

    Pole accuracy (standard latitude-longitude finite-volume behaviour):
    axisymmetric fields keep full second order pointwise; modes varying in
    phi lose local order in the O(dx)-measure pole region (the 1/rho^2
    phi-term), while the SOLUTION still converges under refinement
    (tests/test_sphere.py::test_nonaxisymmetric_harmonic_solution_convergence
    measures error halving). The pole cells also set the diffusion CFL
    (aN ~ D/(rho_min dy)^2) — rkc2 is the right method for fine spheres.

    Profiles are sampled once at build time in float64 (cell centres and
    east faces); there is no per-point trig in the hot path, matching the
    torus design. No `stencil_coeffs`: revolution surfaces always take the
    conservative divergence operator (build_problem defaults
    diffusion_field to the constant cfg.diffusion).
    """

    grid: Grid
    diffusion: float
    rho_p: np.ndarray    # (nx,) rho at cell centres (float64)
    se_p: np.ndarray     # (nx,) sqrt(E) at cell centres
    flux_w_e: np.ndarray  # (nx,) rho/sqrt(E) at EAST faces (x_i + dx/2)
    kprof: np.ndarray    # (nx,) Gaussian curvature at cell centres
    capped: bool = False
    # profile callables, kept for visualisation (viz/torus_mesh.py::
    # revolution_mesh needs rho/z at mesh node positions); not used by the
    # solver, which consumes only the sampled arrays above
    rho_fn: object = dataclasses.field(default=None, compare=False)
    z_fn: object = dataclasses.field(default=None, compare=False)

    kind = "revolution"

    @staticmethod
    def from_profile(grid: Grid, diffusion: float, rho, z,
                     capped: bool = False, derivs=None,
                     d2: "tuple | None" = None) -> "RevolutionGeometry":
        """Build from profile callables rho(v), z(v) (vectorised over
        float64 arrays). derivs=(drho, dz) analytic first derivatives
        (optional; default 4th-order central differences, h ~ 1e-5 —
        metric accuracy ~1e-11, far below the O(dx^2) discretisation
        error). d2=(d2rho, d2z) second derivatives for the Gaussian
        curvature (optional; FD fallback)."""
        g = grid
        vp = np.asarray(np.float64(g.xmin)
                        + np.arange(g.nx, dtype=np.float64) * g.dx)
        ve = vp + 0.5 * g.dx

        if derivs is not None:
            drho, dz = derivs
        else:
            h = 1e-5
            def _fd(f):
                return lambda v: (8.0 * (f(v + h) - f(v - h))
                                  - (f(v + 2 * h) - f(v - 2 * h))) / (12.0 * h)
            drho, dz = _fd(rho), _fd(z)
        if d2 is not None:
            d2rho, d2z = d2
        else:
            h2 = 1e-4
            def _fd2(f):
                return lambda v: (f(v + h2) - 2.0 * f(v) + f(v - h2)) / (h2 * h2)
            d2rho, d2z = _fd2(rho), _fd2(z)

        def _se(v):
            return np.sqrt(np.asarray(drho(v), np.float64) ** 2
                           + np.asarray(dz(v), np.float64) ** 2)

        rho_p = np.asarray(rho(vp), np.float64) + np.zeros_like(vp)
        se_p = _se(vp) + np.zeros_like(vp)
        rho_e = np.asarray(rho(ve), np.float64) + np.zeros_like(ve)
        flux_w_e = rho_e / _se(ve)
        if capped:
            # the last east face sits exactly on v = pi (config staggering):
            # force its flux weight to 0 so the closure is EXACT even when
            # rho(pi) rounds to ~1e-16 instead of 0, and so rho>0 profiles
            # get hard no-flux caps. np.roll then feeds the same zero to
            # cell 0's west face (both end faces carry zero flux).
            flux_w_e = flux_w_e.copy()
            flux_w_e[-1] = 0.0
        if np.any(rho_p <= 0.0):
            raise ValueError("rho(v) must be positive at every cell centre "
                             "(capped surfaces keep cells off the axis by "
                             "the half-cell stagger)")
        # K = z'(rho' z'' - z' rho'') / (rho E^2)  (standard surface-of-
        # revolution formula; torus -> cos v/(r(R + r cos v)), the
        # reference's util/GenCurvatureCoupling.py:87; sphere -> 1/R^2)
        rp, zp = np.asarray(drho(vp), np.float64), np.asarray(dz(vp), np.float64)
        rpp, zpp = (np.asarray(d2rho(vp), np.float64),
                    np.asarray(d2z(vp), np.float64))
        E = rp * rp + zp * zp
        kprof = zp * (rp * zpp - zp * rpp) / (rho_p * E * E)
        return RevolutionGeometry(grid=g, diffusion=diffusion, rho_p=rho_p,
                                  se_p=se_p, flux_w_e=flux_w_e, kprof=kprof,
                                  capped=capped, rho_fn=rho, z_fn=z)

    @staticmethod
    def sphere(grid: Grid, diffusion: float, radius: float) -> "RevolutionGeometry":
        R = float(radius)
        return RevolutionGeometry.from_profile(
            grid, diffusion,
            rho=lambda v: R * np.sin(v), z=lambda v: -R * np.cos(v),
            capped=True,
            derivs=(lambda v: R * np.cos(v), lambda v: R * np.sin(v)),
            d2=(lambda v: -R * np.sin(v), lambda v: R * np.cos(v)))

    def gaussian_curvature(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.asarray(self.kprof, dtype=dtype)

    def row_weights(self) -> np.ndarray:
        """w(v) = sqrt(E) rho — the cell weight (surface area element per
        dv dphi) in which the operator conserves sum(w * u) exactly."""
        return self.se_p * self.rho_p

    def pole_group_sizes(self) -> np.ndarray:
        """(nx,) power-of-2 phi-coarsening group sizes for the reduced
        (pole-coarsened) grid (cfg.pole_coarsen=1): the smallest g with
        rho_i * g >= rho_max / 2, so every coarsened ring's effective phi
        cell width g*rho_i*dy stays within a factor ~2 of the widest
        ring's. g divides ny (clamped down to the largest power of 2 that
        does, and to ny//4). Equatorial rings get g=1 (untouched). The
        climate-model "reduced grid" answer to the lat-lon pole tax: the
        phi stencil coefficient D/(g rho dy)^2 — and with it the diffusion
        spectral radius — stays at the equatorial scale instead of growing
        ~nx^4 (docs/PERF_NOTES.md "Sphere pole CFL anatomy")."""
        ny = self.grid.ny
        rho_max = float(np.max(self.rho_p))
        g = np.ones(self.grid.nx, dtype=np.int64)
        need = rho_max / (2.0 * self.rho_p)
        mask = need > 1.0
        g[mask] = 2 ** np.ceil(np.log2(need[mask])).astype(np.int64)
        g_cap = 1
        while g_cap * 2 <= ny // 4 and ny % (g_cap * 2) == 0:
            g_cap *= 2
        g = np.minimum(g, g_cap)
        # clamp each to the largest power of 2 dividing ny
        for i in np.nonzero(g > 1)[0]:
            while ny % g[i]:
                g[i] //= 2
        return g

    def divergence_coeffs(self, dfield, dtype=jnp.float32, face_mask=None):
        """Face coefficients (aE, aW, aN, aS) of div(D grad u); see
        FlatGeometry/TorusGeometry — identical contract, generic metric."""
        return tuple(jnp.asarray(a, dtype=dtype)
                     for a in self.divergence_coeffs64(dfield, face_mask))

    def divergence_coeffs64(self, dfield, face_mask=None):
        """Float64 numpy face coefficients:

          aE_i = (rho/sqrt(E))|_{i+1/2} D_{i+1/2} / (w_i dx^2)
          aW_i = (rho/sqrt(E))|_{i-1/2} D_{i-1/2} / (w_i dx^2)
          aN = D_{j+1/2} / (rho_i^2 dy^2),  aS likewise

        with w_i = sqrt(E)_i rho_i, so w_i aE_i = w_{i+1} aW_{i+1}
        (self-adjoint + conservative in w). For the torus profile this
        reproduces TorusGeometry.divergence_coeffs64 to rounding."""
        g = self.grid
        w = self.se_p * self.rho_p
        cx = 1.0 / np.float64(g.dx) ** 2
        cy = 1.0 / (self.rho_p * self.rho_p * np.float64(g.dy) ** 2)
        D = np.asarray(dfield, dtype=np.float64)
        if D.ndim < 2:
            D = np.broadcast_to(D, (g.nx,))
            De = 0.5 * (D + np.roll(D, -1))
            Dn = Ds = D
            roll_x = lambda a: np.roll(a, 1)
        else:
            D = np.broadcast_to(D, (g.ny, g.nx))
            De = 0.5 * (D + np.roll(D, -1, axis=-1))
            Dn = 0.5 * (D + np.roll(D, -1, axis=-2))
            Ds = np.roll(Dn, 1, axis=-2)
            roll_x = lambda a: np.roll(a, 1, axis=-1)
        flux_e = self.flux_w_e * De * cx
        aE = flux_e / w
        aW = roll_x(flux_e) / w
        aN = Dn * cy
        aS = Ds * cy
        return _apply_face_mask((aE, aW, aN, aS), face_mask)

    def tensor_coeffs64(self, dxx, dyy, dxy, boundary: str = "periodic"):
        """Anisotropic conservative tensor operator on ANY surface of
        revolution (round 5) — the TorusGeometry.tensor_coeffs64
        construction generalised to the sampled metric profiles: scale
        factors h_v = sqrt(E)(v), h_phi = rho(v), cell weight
        w = sqrt(E) rho. D in the PHYSICAL orthonormal (e_v, e_phi)
        frame:

          L u = (1/w) [ d_v( (rho/sqrt(E)) Dxx d_v u + Dxy d_ph u )
                      + d_ph( Dxy d_v u + (sqrt(E)/rho) Dyy d_ph u ) ]

        axis terms: the divergence_coeffs64 face-flux structure with
        per-direction diffusivities (bitwise scalar reduction); mixed
        terms: the centred pair under the (nx,) profile weight
        inv4(v) = 1/(4 dx dy w(v)), w-weighted symmetric + conservative
        by the antisymmetric-difference argument.

        capped=True (sphere-like): the end v-faces already carry zero
        flux (flux_w_e closure); the mixed field Dxy is zeroed on the
        two cap-adjacent v-COLUMNS — exactly the flat noflux_x layer
        treatment — so every centred difference spanning a cap (or the
        array wrap, which is not a physical neighbourhood) multiplies
        zero. Standard first-order-at-the-cap behaviour; note the
        physical frame itself degenerates AT a pole (rho -> 0), so
        pole-adjacent fiber fields should taper like any lat-lon code's.
        Does not compose with pole_coarsen (build_problem rejects).

        Returns ((aE, aW, aN, aS), dxy_full (ny, nx), inv4 (nx,))."""
        if boundary != "periodic":
            raise ValueError("revolution surfaces are closed (caps are "
                             "built into the metric): tensor boundaries "
                             "other than 'periodic' do not exist")
        g = self.grid
        shape = (g.ny, g.nx)
        Dxx = np.broadcast_to(np.asarray(dxx, np.float64), shape)
        Dyy = np.broadcast_to(np.asarray(dyy, np.float64), shape)
        Dxy = np.broadcast_to(np.asarray(dxy, np.float64), shape).copy()
        if not (np.all(Dxx > 0.0) and np.all(Dyy > 0.0)
                and np.all(Dxx * Dyy - Dxy * Dxy >= -1e-14 * Dxx * Dyy)):
            raise ValueError("diffusion_tensor must be SPD pointwise "
                             "(Dxx>0, Dyy>0, Dxx*Dyy >= Dxy^2)")
        w = self.se_p * self.rho_p
        cx = 1.0 / np.float64(g.dx) ** 2
        cy = 1.0 / (self.rho_p * self.rho_p * np.float64(g.dy) ** 2)
        De = 0.5 * (Dxx + np.roll(Dxx, -1, axis=-1))
        Dn = 0.5 * (Dyy + np.roll(Dyy, -1, axis=-2))
        flux_e = self.flux_w_e * De * cx   # end faces zero when capped
        aE = flux_e / w
        aW = np.roll(flux_e, 1, axis=-1) / w
        aN = Dn * cy
        aS = np.roll(aN, 1, axis=-2)
        if self.capped:
            Dxy[..., 0] = 0.0
            Dxy[..., -1] = 0.0
        inv4 = 1.0 / (4.0 * np.float64(g.dx) * np.float64(g.dy) * w)
        return (aE, aW, aN, aS), Dxy, inv4


@dataclasses.dataclass(frozen=True)
class BoxGeometry:
    """3-D rectangular volume [0,W] x [0,L] x [0,depth] — volumetric tissue
    (beyond-reference capability: the reference is strictly 2-D,
    src/FHNmodel_flat.cpp:489-566; scroll waves / transmural propagation
    need a depth axis).

    The diffusion operator is ALWAYS the conservative face-coefficient
    divergence form (7-point): six face arrays (aE, aW, aN, aS, aU, aD)
    with aE = D_{i+1/2}/dx^2 etc. (arithmetic face means), exactly
    conservative and self-adjoint by construction — the 3-D extension of
    FlatGeometry.divergence_coeffs64, with the same face-mask hook for
    no-flux domain walls and 3-D obstacle scars (face_openness3). Axis
    layout: z leads ((nz, ny, nx)); E/W = x (axis -1), N/S = y (axis -2),
    U/D = z (axis -3). There is no hand-expanded constant-coefficient
    stencil form (same policy as RevolutionGeometry): build_problem
    defaults diffusion_field to the constant cfg.diffusion.
    """

    grid: Grid
    diffusion: float

    kind = "box"

    def gaussian_curvature(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((self.grid.nx,), dtype=dtype)

    def divergence_coeffs(self, dfield, dtype=jnp.float32, face_mask=None):
        """Face coefficients (aE, aW, aN, aS, aU, aD) of div(D grad u) on
        the box; see FlatGeometry.divergence_coeffs — same contract, six
        faces. Shapes stay broadcast-minimal: scalars for constant D
        (x-profile (nx,) D fields likewise stay profiles), (nz, ny, nx)
        for full fields; face_mask entries multiply in (face_openness3)."""
        return tuple(jnp.asarray(a, dtype=dtype)
                     for a in self.divergence_coeffs64(dfield, face_mask))

    def divergence_coeffs64(self, dfield, face_mask=None):
        """Float64 numpy face coefficients (aE, aW, aN, aS, aU, aD)."""
        g = self.grid
        inv_dx2 = 1.0 / np.float64(g.dx) ** 2
        inv_dy2 = 1.0 / np.float64(g.dy) ** 2
        inv_dz2 = 1.0 / np.float64(g.dz) ** 2
        D = np.asarray(dfield, dtype=np.float64)
        if D.ndim == 0:
            De = Dn = Du = D
            roll_x = roll_y = roll_z = lambda a: a
        elif D.ndim == 1:
            # x-profile D(x): E/W faces are x-face means; N/S and U/D
            # faces sit at the same x, so they keep the centre value
            D = np.broadcast_to(D, (g.nx,))
            De = 0.5 * (D + np.roll(D, -1))
            Dn = Du = D
            roll_x = lambda a: np.roll(a, 1)
            roll_y = roll_z = lambda a: a
        else:
            D = np.broadcast_to(D, (g.nz, g.ny, g.nx))
            De = 0.5 * (D + np.roll(D, -1, axis=-1))
            Dn = 0.5 * (D + np.roll(D, -1, axis=-2))
            Du = 0.5 * (D + np.roll(D, -1, axis=-3))
            roll_x = lambda a: np.roll(a, 1, axis=-1)
            roll_y = lambda a: np.roll(a, 1, axis=-2)
            roll_z = lambda a: np.roll(a, 1, axis=-3)
        aE = De * inv_dx2
        aN = Dn * inv_dy2
        aU = Du * inv_dz2
        faces = (aE, roll_x(aE), aN, roll_y(aN), aU, roll_z(aU))
        return _apply_face_mask(faces, face_mask)

    def tensor_coeffs64(self, dxx, dyy, dzz, dxy, dxz, dyz,
                        boundary: str = "periodic"):
        """Coefficients of the 3-D anisotropic conservative operator
        div(D grad u), D = [[Dxx,Dxy,Dxz],[Dxy,Dyy,Dyz],[Dxz,Dyz,Dzz]] an
        SPD tensor field — volumetric fiber anisotropy (e.g. cardiac
        tissue, where conduction along the myofiber axis exceeds
        cross-fiber conduction severalfold and the fiber direction
        rotates transmurally; the reference is 2-D isotropic-only).

        The 3-D extension of FlatGeometry.tensor_coeffs64, same
        discretisation per term (second-order, periodic):
          diagonal terms  face-averaged flux form (the 7-point
                          divergence_coeffs64 structure)
          mixed terms     Aa(Dab * Ab u) + Ab(Dab * Aa u) per axis pair
                          (xy, xz, yz) with Aa the centred first
                          differences — exactly symmetric (Aa^T = -Aa)
                          and conservative (1^T Aa = 0) for any Dab field

        SPD is validated pointwise by Sylvester's criterion; the centred
        mixed terms keep the 2-D monotonicity caveat.

        boundary ("noflux"/"noflux_x"/"noflux_y"/"noflux_z"): closed
        walls — zero diagonal faces at the walls, and each mixed field
        Dab zeroed on the wall-adjacent layers of its two axes when
        closed (see FlatGeometry.tensor_coeffs64's note: symmetry and
        conservation are preserved; the mixed flux shuts off in the
        boundary layer). noflux_z is the ventricular-slab configuration
        (bounded wall thickness, periodic in-plane).

        Returns (face_coeffs6, (Dxy, Dxz, Dyz) full (nz, ny, nx) arrays,
        (inv4_xy, inv4_xz, inv4_yz)) with inv4_ab = 1/(4 da db) — the
        mixed-term weights (ops/stencil.py::anisotropic_laplacian3)."""
        g = self.grid
        shape = (g.nz, g.ny, g.nx)
        Dxx = np.broadcast_to(np.asarray(dxx, np.float64), shape)
        Dyy = np.broadcast_to(np.asarray(dyy, np.float64), shape)
        Dzz = np.broadcast_to(np.asarray(dzz, np.float64), shape)
        Dxy = np.broadcast_to(np.asarray(dxy, np.float64), shape)
        Dxz = np.broadcast_to(np.asarray(dxz, np.float64), shape)
        Dyz = np.broadcast_to(np.asarray(dyz, np.float64), shape)
        m2 = Dxx * Dyy - Dxy * Dxy
        det = (Dxx * (Dyy * Dzz - Dyz * Dyz)
               - Dxy * (Dxy * Dzz - Dyz * Dxz)
               + Dxz * (Dxy * Dyz - Dyy * Dxz))
        scale = Dxx * Dyy * Dzz
        if not (np.all(Dxx > 0.0) and np.all(Dyy > 0.0)
                and np.all(Dzz > 0.0)
                and np.all(m2 >= -1e-14 * Dxx * Dyy)
                and np.all(det >= -1e-14 * scale)):
            raise ValueError("diffusion_tensor must be SPD pointwise "
                             "(Sylvester: Dxx>0, Dyy>0, Dzz>0, "
                             "Dxx*Dyy>=Dxy^2, det(D)>=0)")
        De = 0.5 * (Dxx + np.roll(Dxx, -1, axis=-1))
        Dn = 0.5 * (Dyy + np.roll(Dyy, -1, axis=-2))
        Du = 0.5 * (Dzz + np.roll(Dzz, -1, axis=-3))
        aE = (De / np.float64(g.dx) ** 2).copy()
        aN = (Dn / np.float64(g.dy) ** 2).copy()
        aU = (Du / np.float64(g.dz) ** 2).copy()
        Dxy = Dxy.copy()
        Dxz = Dxz.copy()
        Dyz = Dyz.copy()
        closed_x = boundary in ("noflux", "noflux_x")
        closed_y = boundary in ("noflux", "noflux_y")
        closed_z = boundary in ("noflux", "noflux_z")
        if closed_x:
            aE[..., -1] = 0.0
            for Dab in (Dxy, Dxz):
                Dab[..., 0] = 0.0
                Dab[..., -1] = 0.0
        if closed_y:
            aN[..., -1, :] = 0.0
            for Dab in (Dxy, Dyz):
                Dab[..., 0, :] = 0.0
                Dab[..., -1, :] = 0.0
        if closed_z:
            aU[-1, ...] = 0.0
            for Dab in (Dxz, Dyz):
                Dab[0, ...] = 0.0
                Dab[-1, ...] = 0.0
        # rolled faces AFTER masking so the roll identities hold wall-aware
        faces = (aE, np.roll(aE, 1, axis=-1), aN, np.roll(aN, 1, axis=-2),
                 aU, np.roll(aU, 1, axis=-3))
        dx, dy, dz = (np.float64(g.dx), np.float64(g.dy), np.float64(g.dz))
        invs = (1.0 / (4.0 * dx * dy), 1.0 / (4.0 * dx * dz),
                1.0 / (4.0 * dy * dz))
        return faces, (Dxy, Dxz, Dyz), invs


def face_openness3(nz: int, ny: int, nx: int, boundary: str = "periodic",
                   tissue=None):
    """0/1 face-openness masks (oE, oW, oN, oS, oU, oD) for the 3-D box
    divergence operator, or None when every face is open — the 3-D
    extension of face_openness below (same conservation/self-adjointness
    guarantees: oW = roll_x(oE) etc., so both sides of a shared face close
    together).

    boundary="noflux" closes ALL six domain walls; "noflux_x"/"noflux_y"/
    "noflux_z" close one axis pair. tissue: bool broadcastable to
    (nz, ny, nx), True = active medium — every face touching a non-tissue
    cell closes (3-D obstacle scars). Mask shapes stay broadcast-minimal:
    (nx,) for x-edge masks, (ny, 1) for y, (nz, 1, 1) for z, full
    (nz, ny, nx) once a tissue mask is present."""
    if boundary == "periodic" and tissue is None:
        return None
    oE = np.ones(nx, dtype=np.float64)
    oW = np.ones(nx, dtype=np.float64)
    oN = np.ones((ny, 1), dtype=np.float64)
    oS = np.ones((ny, 1), dtype=np.float64)
    oU = np.ones((nz, 1, 1), dtype=np.float64)
    oD = np.ones((nz, 1, 1), dtype=np.float64)
    if boundary in ("noflux", "noflux_x"):
        oE[-1] = 0.0
        oW[0] = 0.0
    if boundary in ("noflux", "noflux_y"):
        oN[-1, 0] = 0.0
        oS[0, 0] = 0.0
    if boundary in ("noflux", "noflux_z"):
        oU[-1, 0, 0] = 0.0
        oD[0, 0, 0] = 0.0
    if tissue is not None:
        T = np.broadcast_to(np.asarray(tissue, dtype=bool), (nz, ny, nx))
        oE = oE * (T & np.roll(T, -1, axis=-1))
        oW = oW * (T & np.roll(T, 1, axis=-1))
        oN = oN * (T & np.roll(T, -1, axis=-2))
        oS = oS * (T & np.roll(T, 1, axis=-2))
        oU = oU * (T & np.roll(T, -1, axis=-3))
        oD = oD * (T & np.roll(T, 1, axis=-3))
    return oE, oW, oN, oS, oU, oD


def face_openness(ny: int, nx: int, boundary: str = "periodic",
                  tissue=None):
    """0/1 face-openness masks (oE, oW, oN, oS) for the divergence-form
    operator, float64, or None when every face is open.

    A closed face carries zero flux: multiplying the face coefficients of
    div(D grad u) by these masks implements no-flux (reflecting / Neumann)
    DOMAIN BOUNDARIES (boundary="noflux"/"noflux_x"/"noflux_y" closes the
    corresponding domain edges) and internal OBSTACLE WALLS (tissue: bool
    (ny, nx), True = active medium — every face touching a non-tissue cell
    closes) exactly, as a zero-flux finite-volume condition. Conservation
    and self-adjointness are preserved by construction: the masks satisfy
    oW = roll_x(oE) and oS = roll_y(oN), so both sides of a shared face
    close together. Beyond-reference capability (the reference is
    periodic-only, src/FHNmodel_flat.cpp:489-566 with periods={1,1});
    riding the face coefficients means the sharded paths need NO halo
    changes — wrap/ppermute values at closed faces are multiplied by zero.

    Shapes are kept minimal for broadcast against the (nx,)-profile face
    coefficients: (nx,) for x-edge masks, (ny, 1) for y-edge masks,
    (ny, nx) once a tissue mask is present.
    """
    if boundary == "periodic" and tissue is None:
        return None
    oE = np.ones(nx, dtype=np.float64)
    oW = np.ones(nx, dtype=np.float64)
    oN = np.ones((ny, 1), dtype=np.float64)
    oS = np.ones((ny, 1), dtype=np.float64)
    if boundary in ("noflux", "noflux_x"):
        oE[-1] = 0.0
        oW[0] = 0.0
    if boundary in ("noflux", "noflux_y"):
        oN[-1, 0] = 0.0
        oS[0, 0] = 0.0
    if tissue is not None:
        T = np.broadcast_to(np.asarray(tissue, dtype=bool), (ny, nx))
        oE = oE * (T & np.roll(T, -1, axis=-1))
        oW = oW * (T & np.roll(T, 1, axis=-1))
        oN = oN * (T & np.roll(T, -1, axis=-2))
        oS = oS * (T & np.roll(T, 1, axis=-2))
    return oE, oW, oN, oS


def _apply_face_mask(faces, face_mask):
    if face_mask is None:
        return faces
    return tuple(a * o for a, o in zip(faces, face_mask))


Geometry = Union[FlatGeometry, TorusGeometry, RevolutionGeometry,
                 BoxGeometry]


def make_grid(cfg: SimConfig) -> Grid:
    return Grid(nx=cfg.nx, ny=cfg.ny, xmin=cfg.xmin, xmax=cfg.xmax,
                ymin=cfg.ymin, ymax=cfg.ymax,
                nz=cfg.nz, zmin=cfg.zmin, zmax=cfg.zmax)


def make_geometry(cfg: SimConfig, profile=None) -> Geometry:
    """profile: for the generic revolution surfaces, (rho, z) or
    (rho, z, (drho, dz)) — see RevolutionGeometry.from_profile. Closed
    ("revolution") profiles must be 2pi-periodic callables (the seam face
    is evaluated at 2pi + dx/2, like TorusGeometry's ring_e)."""
    grid = make_grid(cfg)
    if cfg.surface == "box":
        return BoxGeometry(grid=grid, diffusion=cfg.diffusion)
    if cfg.surface == "torus":
        return TorusGeometry(grid=grid, diffusion=cfg.diffusion,
                             R=cfg.major_radius, r=cfg.minor_radius)
    if cfg.surface == "sphere":
        return RevolutionGeometry.sphere(grid, cfg.diffusion,
                                         cfg.major_radius)
    if cfg.surface in ("revolution", "revolution_capped"):
        if profile is None:
            raise ValueError(
                f"surface={cfg.surface!r} needs a profile: "
                "build_problem(cfg, profile=(rho, z)) or "
                "(rho, z, (drho, dz))")
        rho, z = profile[0], profile[1]
        derivs = profile[2] if len(profile) > 2 else None
        return RevolutionGeometry.from_profile(
            grid, cfg.diffusion, rho, z,
            capped=(cfg.surface == "revolution_capped"), derivs=derivs)
    return FlatGeometry(grid=grid, diffusion=cfg.diffusion)
