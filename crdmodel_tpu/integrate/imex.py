"""IMEX additive Runge-Kutta integration: implicit reaction, explicit diffusion.

The reference integrates everything explicitly (ARKode with fi=NULL,
src/FHNmodel_torus.cpp:362), so reaction-stiff models — Goldbeter's Hill
kinetics with VM2=65/VM3=500 (src/GoldbeterModel_torus.cpp:67-78) put
eigenvalues of O(100-1000) in the kinetics Jacobian — force tiny steps even
where the solution is smooth. SUNDIALS ships an IMEX mode the reference never
uses; this module builds it the TPU-native way, exploiting the structure of
reaction-diffusion systems:

  y' = f_E(y) + f_I(y),   f_E = diffusion (spatially coupled, non-stiff at
                                moderate grids), treated EXPLICITLY
                          f_I = reaction (pointwise, stiff), treated
                                IMPLICITLY

Because f_I is pointwise, each implicit stage solve decomposes into nx*ny
independent nvars x nvars nonlinear systems — solved by a vectorized modified
Newton iteration with a closed-form per-point linear solve (nvars <= 3).  No
halo exchange, no collectives, no global linear algebra: under `shard_map`
the implicit solve is embarrassingly parallel and the only cross-device
traffic remains the explicit stencil's halo plus the step-control psums.
This is the design payoff of the split: the same property does NOT hold for
implicit diffusion, which would need a global elliptic solve per stage.

Scheme: ARK3(2)4L[2]SA (Kennedy & Carpenter 2003) — ARKode's own default
3rd-order IMEX pair (4 stages, ESDIRK implicit part, L-stable: R(inf)=0,
embedded 2nd-order error weights shared by both tables). Coefficients are
verified against the order conditions, including the additive coupling
conditions b@A_E@c = b@A_I@c = 1/6, in tests/test_imex.py.

Stepper protocol (shared with erk/rkc): step_err(t, y, h, params, carry) ->
(y_new, err_ss, carry), so the adaptive driver, breakpoint segmentation,
sharding reductions, sweeps and streaming all work unchanged.

Nonlinear convergence folds into the error test: err_ss includes the last
Newton update's scaled square sum weighted by (1/NEWTON_TOL)^2, so a step
whose Newton iteration has not converged to NEWTON_TOL (in the same WRMS
metric as the error test, SUNDIALS-style epsNewt) fails the accept test and
is retried with smaller h — one global reduction covers both tests, keeping
cross-device control flow identical without extra collectives.
"""

from __future__ import annotations

from fractions import Fraction as _F
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

ERR_ORDER = 3          # local error estimate ~ O(h^3): controller exponent 1/3
NEWTON_ITERS = 3       # modified-Newton iterations per implicit stage
NEWTON_TOL = 0.1       # required WRMS size of the last Newton update
                       # (SUNDIALS nonlinear safety epsNewt-style)

# --- ARK3(2)4L[2]SA coefficients (exact rationals -> float64) ---------------
_G = _F(1767732205903, 4055673282236)          # gamma (diagonal of the DIRK)

_C = [_F(0), 2 * _G, _F(3, 5), _F(1)]

_AE = [
    [_F(0)] * 4,
    [2 * _G, _F(0), _F(0), _F(0)],
    [_F(5535828885825, 10492691773637), _F(788022342437, 10882634858940),
     _F(0), _F(0)],
    [_F(6485989280629, 16251701735622), _F(-4246266847089, 9704473918619),
     _F(10755448449292, 10357097424841), _F(0)],
]

_AI = [
    [_F(0)] * 4,
    [_G, _G, _F(0), _F(0)],
    [_F(2746238789719, 10658868560708), _F(-640167445237, 6845629431997),
     _G, _F(0)],
    [_F(1471266399579, 7840856788654), _F(-4482444167858, 7529755066697),
     _F(11266239266428, 11593286722821), _G],
]

# shared propagating weights (= last DIRK row: stiffly accurate) and the
# embedded 2nd-order weights, shared by both tables
_B = [_F(1471266399579, 7840856788654), _F(-4482444167858, 7529755066697),
      _F(11266239266428, 11593286722821), _G]
_BHAT = [_F(2756255671327, 12835298489170),
         _F(-10771552573575, 22201958757719),
         _F(9247589265047, 10645013368117),
         _F(2193209047091, 5459859503100)]

STAGES = 4
GAMMA = float(_G)
C = [float(x) for x in _C]
AE = [[float(x) for x in row] for row in _AE]
AI = [[float(x) for x in row] for row in _AI]
B = [float(x) for x in _B]
D = [float(b - bh) for b, bh in zip(_B, _BHAT)]   # error weights b - bhat


def tableau_arrays():
    """float64 (AE, AI, b, bhat, c) for the order-condition tests."""
    return (np.array(AE), np.array(AI), np.array(B),
            np.array([float(x) for x in _BHAT]), np.array(C))


def pointwise_jacobian(f, t, y, params):
    """Jacobian of a POINTWISE vector field f(t, y, params) wrt the leading
    (variable) axis of y, shape (nvars_out, nvars_in, *space).

    One jvp per variable: the tangent is a one-hot along axis 0 broadcast over
    space, so column b of the per-point Jacobian comes out as a full field.
    Exact (AD), costs nvars evaluations of f.
    """
    nvars = y.shape[0]
    fn = lambda s: f(t, s, params)
    cols = []
    for b in range(nvars):
        e = jnp.zeros_like(y).at[b].set(1.0)
        _, col = jax.jvp(fn, (y,), (e,))
        cols.append(col)
    return jnp.stack(cols, axis=1)


def solve_pointwise(m, r):
    """Solve m @ x = r per spatial point: m (n, n, *space), r (n, *space).

    Closed-form (Cramer) for n <= 3 — fully vectorized elementwise VPU code,
    no batched LU. Falls back to jnp.linalg.solve for larger systems.
    """
    n = r.shape[0]
    if n == 1:
        return r / m[0, 0]
    if n == 2:
        det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
        x0 = (m[1, 1] * r[0] - m[0, 1] * r[1]) / det
        x1 = (m[0, 0] * r[1] - m[1, 0] * r[0]) / det
        return jnp.stack([x0, x1])
    if n == 3:
        c00 = m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1]
        c01 = m[1, 2] * m[2, 0] - m[1, 0] * m[2, 2]
        c02 = m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]
        det = m[0, 0] * c00 + m[0, 1] * c01 + m[0, 2] * c02
        c10 = m[0, 2] * m[2, 1] - m[0, 1] * m[2, 2]
        c11 = m[0, 0] * m[2, 2] - m[0, 2] * m[2, 0]
        c12 = m[0, 1] * m[2, 0] - m[0, 0] * m[2, 1]
        c20 = m[0, 1] * m[1, 2] - m[0, 2] * m[1, 1]
        c21 = m[0, 2] * m[1, 0] - m[0, 0] * m[1, 2]
        c22 = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
        x0 = (c00 * r[0] + c10 * r[1] + c20 * r[2]) / det
        x1 = (c01 * r[0] + c11 * r[1] + c21 * r[2]) / det
        x2 = (c02 * r[0] + c12 * r[1] + c22 * r[2]) / det
        return jnp.stack([x0, x1, x2])
    mb = jnp.moveaxis(m, (0, 1), (-2, -1))
    rb = jnp.moveaxis(r, 0, -1)[..., None]
    xb = jnp.linalg.solve(mb, rb)[..., 0]
    return jnp.moveaxis(xb, -1, 0)


def make_imex_step_err(f_ex: Callable, f_im: Callable, rtol, atol,
                       newton_iters: int = NEWTON_ITERS,
                       full_newton: bool = True):
    """(step_err, init_carry) with the framework stepper protocol.

    f_ex(t, y, params): the explicit part (diffusion; may use halos under
    shard_map). f_im(t, y, params): the implicit part — must be POINTWISE in
    space (the reaction), so its Jacobian is block-diagonal per point.

    Each implicit stage solves  Y = rhs_known + h*gamma*f_im(t_i, Y)  by
    vectorized Newton. full_newton=True (default) re-evaluates the per-point
    Jacobian every iteration — quadratic convergence, which is what lets the
    controller run h far beyond the explicit stability limit in the
    stiffness-dominated regime (a frozen Jacobian converges only linearly
    with rate ~ h*gamma*|J(Y)-J(pred)| and stalls exactly where IMEX should
    win; measured on Goldbeter at rtol 1e-2). The extra cost is nvars jvp
    evaluations per iteration of a POINTWISE function — VPU-cheap next to
    the stencil. full_newton=False freezes the Jacobian at the stage
    predictor (modified Newton, SUNDIALS-style). The stage slope is
    recovered algebraically, k_I = (Y - rhs_known)/(h*gamma), exactly
    consistent with the converged Y.
    """

    def init_carry(t, y, params):
        return ()

    def step_err(t, y, h, params, carry):
        dtype = y.dtype
        w = 1.0 / (rtol * jnp.abs(y) + atol)
        hg = h * GAMMA
        nvars = y.shape[0]
        eye = jnp.reshape(jnp.eye(nvars, dtype=dtype),
                          (nvars, nvars) + (1,) * (y.ndim - 1))

        kE = [f_ex(t, y, params)]
        kI = [f_im(t, y, params)]
        delta_ss = jnp.asarray(0.0, dtype)

        for i in range(1, STAGES):
            rhs_known = y
            for j in range(i):
                if AE[i][j] != 0.0:
                    rhs_known = rhs_known + (h * AE[i][j]) * kE[j]
                if AI[i][j] != 0.0:
                    rhs_known = rhs_known + (h * AI[i][j]) * kI[j]
            ti = t + C[i] * h

            yi = rhs_known + hg * kI[i - 1]        # stage predictor
            m = None
            dy = jnp.zeros_like(y)
            for _ in range(newton_iters):
                if m is None or full_newton:
                    jac = pointwise_jacobian(f_im, ti, yi, params)
                    m = eye - hg * jac
                resid = yi - hg * f_im(ti, yi, params) - rhs_known
                dy = solve_pointwise(m, -resid)
                yi = yi + dy
            # convergence contribution: last update in the error-test metric
            scaled_dy = dy * w
            delta_ss = delta_ss + jnp.sum(scaled_dy * scaled_dy)

            kE.append(f_ex(ti, yi, params))
            kI.append((yi - rhs_known) / hg)

        y_new = y
        err = jnp.zeros_like(y)
        for j in range(STAGES):
            k_sum = kE[j] + kI[j]
            if B[j] != 0.0:
                y_new = y_new + (h * B[j]) * k_sum
            if D[j] != 0.0:
                err = err + (h * D[j]) * k_sum
        scaled = err * w
        err_ss = (jnp.sum(scaled * scaled)
                  + (1.0 / NEWTON_TOL) ** 2 * delta_ss)
        return y_new, err_ss, ()

    return step_err, init_carry
