"""RKC2: stabilized explicit Runge–Kutta–Chebyshev integration.

The reference is purely explicit (ARKode ERK) and therefore diffusion-CFL
limited: refining the grid k× in each dimension shrinks the stable step k²×
while the accuracy-limited step barely moves, so fine-grid runs burn almost
all their stages on stability. RKC2 (Sommeijer–Shampine–Verwer 1997) extends
the real-axis stability interval to ~0.65·s² with s first-order-cost stages,
recovering accuracy-limited stepping at s ≈ sqrt(h·rho/0.65) — the standard
stabilized method for parabolic reaction–diffusion, and a capability the
reference lacks entirely.

Fits the framework's stepper protocol (see erk.make_default_step_err):
  step_err(t, y, h, params, carry) -> (y_new, err_ss, carry)
with carry = f(t, y) (the previous step's end derivative doubles as the next
start derivative, like FSAL), so the adaptive driver, breakpoint handling,
sharding reductions and trajectory capture all work unchanged.

The stage count s is chosen per step from a spectral-radius bound
rho(t, y, params) (analytic: diffusion Gershgorin + per-model kinetics
Jacobian bound, core/problem.py::make_rho_bound) — all inside jit via
lax.fori_loop over traced s.

Damped recurrence (eps = 2/13):
  w0 = 1 + eps/s²,  w1 = T'_s(w0)/T''_s(w0)
  b_j = T''_j(w0)/T'_j(w0)²  (j>=2), b_0 = b_1 = b_2
  Y_0 = y,  Y_1 = Y_0 + h·mu1·F_0,  mu1 = b_1·w1
  Y_j = (1-mu_j-nu_j)·Y_0 + mu_j·Y_{j-1} + nu_j·Y_{j-2}
        + h·mut_j·F(Y_{j-1}) + h·gt_j·F_0
    mu_j = 2 b_j w0/b_{j-1}, nu_j = -b_j/b_{j-2},
    mut_j = 2 b_j w1/b_{j-1}, gt_j = -(1 - b_{j-1} T_{j-1}(w0))·mut_j
  error estimate: est = 0.8 (y - y_new) + 0.4 h (F_0 + F(y_new))   (order 2)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

EPS_DAMP = 2.0 / 13.0
STAB_FACTOR = 0.65          # stable real interval ~ 0.653 s^2 with damping
S_MAX = 256
ERR_ORDER = 3               # est ~ O(h^3): controller exponent 1/3 (RKC code)


def _cheb_scalars(s, w0):
    """T_s(w0), T'_s(w0), T''_s(w0) for traced integer s >= 2."""

    def body(j, st):
        tm2, tm1, dm2, dm1, d2m2, d2m1 = st
        t = 2 * w0 * tm1 - tm2
        d = 2 * w0 * dm1 - dm2 + 2 * tm1
        d2 = 2 * w0 * d2m1 - d2m2 + 4 * dm1
        return (tm1, t, dm1, d, d2m1, d2)

    # start from T_0, T_1
    st0 = (jnp.ones_like(w0), w0,
           jnp.zeros_like(w0), jnp.ones_like(w0),
           jnp.zeros_like(w0), jnp.zeros_like(w0))
    st = jax.lax.fori_loop(2, s + 1, body, st0)
    return st[1], st[3], st[5]


def choose_stages(h, rho):
    """Smallest s with stability interval covering h*rho."""
    s = jnp.ceil(jnp.sqrt(jnp.maximum(h * rho, 0.0) / STAB_FACTOR + 1.0))
    return jnp.clip(s.astype(jnp.int32) + 1, 2, S_MAX)


def h_max_for(rho):
    """Largest step coverable with S_MAX stages."""
    return STAB_FACTOR * (S_MAX - 1) ** 2 / jnp.maximum(rho, 1e-30)


def make_rkc2_step_err(rhs: Callable, rho_fn: Callable, rtol, atol,
                       stage_sync=None):
    """Returns (step_err, init_carry) with the erk stepper protocol.

    stage_sync(s) -> s: optional cross-shard max on the per-step stage
    count — the composed ensemble mesh (parallel/ensemble.py) runs
    members in collective lockstep, and the stage fori_loop contains the
    halo exchange, so every member must execute the SAME trip count.
    Taking the max is always stable (the Chebyshev stability interval
    grows with s) and stays second-order, but members forced above their
    own requirement take a slightly different (equally valid) step than
    they would solo — a documented divergence, like the fused kernel's
    stage-budget h cap."""

    def init_carry(t, y, params):
        return rhs(t, y, params)

    def step_err(t, y, h, params, f0):
        dtype = y.dtype
        one = jnp.asarray(1.0, dtype)
        rho = rho_fn(t, y, params).astype(dtype)
        s = choose_stages(h, rho)
        if stage_sync is not None:
            s = stage_sync(s)
        sf = s.astype(dtype)
        w0 = one + EPS_DAMP / (sf * sf)
        ts, dts, d2ts = _cheb_scalars(s, w0)
        w1 = dts / d2ts

        # b_0 = b_1 = b_2 = T2''/(T2')^2 with T2 = 2 w0^2 - 1 (RKC convention)
        t2 = 2 * w0 * w0 - one
        dt2 = 4 * w0
        d2t2 = jnp.asarray(4.0, dtype)
        b2 = d2t2 / (dt2 * dt2)
        mu1 = b2 * w1
        y1 = y + (h * mu1) * f0

        # stage loop j = 2..s, carrying (Y_{j-1}, Y_{j-2}) and the
        # Chebyshev/b histories at j-1, j-2
        def body(j, st):
            yjm1, yjm2, tjm1, tjm2, djm1, djm2, d2jm1, d2jm2, bjm1, bjm2 = st
            tj = 2 * w0 * tjm1 - tjm2
            dj = 2 * w0 * djm1 - djm2 + 2 * tjm1
            d2j = 2 * w0 * d2jm1 - d2jm2 + 4 * djm1
            bj = d2j / (dj * dj)
            mu = 2 * bj * w0 / bjm1
            nu = -bj / bjm2
            mut = 2 * bj * w1 / bjm1
            ajm1 = one - bjm1 * tjm1
            gt = -ajm1 * mut
            # stage time c_{j-1}: w1 T''_{j-1}/T'_{j-1} (c_1 = c_2/4, paper)
            cjm1 = jnp.where(j == 2, 0.25 * w1 / w0,
                             w1 * d2jm1 / jnp.maximum(djm1, 1e-300))
            fy = rhs(t + cjm1 * h, yjm1, params)
            yj = ((one - mu - nu) * y + mu * yjm1 + nu * yjm2
                  + (h * mut) * fy + (h * gt) * f0)
            return (yj, yjm1, tj, tjm1, dj, djm1, d2j, d2jm1, bj, bjm1)

        st0 = (y1, y,
               w0, one,                     # T_1, T_0
               one, jnp.zeros_like(w0),     # T'_1, T'_0
               jnp.zeros_like(w0), jnp.zeros_like(w0),  # T''_1, T''_0
               b2, b2)                      # b_1, b_0
        st = jax.lax.fori_loop(2, s + 1, body, st0)
        y_new = st[0]

        f1 = rhs(t + h, y_new, params)
        est = 0.8 * (y - y_new) + (0.4 * h) * (f0 + f1)
        w = 1.0 / (rtol * jnp.abs(y) + atol)
        scaled = est * w
        return y_new, jnp.sum(scaled * scaled), f1

    return step_err, init_carry
