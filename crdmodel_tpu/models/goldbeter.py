"""Goldbeter minimal Ca2+ oscillation model (cytosolic Z, store Y).

    v2 = VM2 Z^n / (K2^n + Z^n)
    v3 = VM3 Y^m Z^p / ((KR^m + Y^m)(KA^p + Z^p))
    Z' = v0 + v1 b - v2 + v3 + kf Y - k Z
    Y' = v2 - v3 - kf Y

Constants and kinetics match the reference code
(src/GoldbeterModel_torus.cpp:67-78,694-716). The reference's header comment
`Y' = v2 + v3 + kf Y` (src/GoldbeterModel_torus.cpp:6) disagrees with its own
code; code wins.

Steady state: the reference shells out to a Python BDF integrator per MPI rank
(popen "SolveGoldbeterODE.py <beta>", src/GoldbeterModel_torus.cpp:253-261),
integrating backwards in time when beta lies in the oscillatory window
0.289 < beta < 0.774 to land near the *unstable* fixed point
(util/GoldbeterModel/SolveGoldbeterODE.py:59-67). The fixed point is the same
algebraic object either way, and it has a closed-to-scalar form:

    Z' + Y' = v0 + v1 b - k Z  =>  Zs = (v0 + v1 b)/k        (exact)
    Y' = 0: g(Y) = v2(Zs) - v3(Y, Zs) - kf Y = 0, g strictly decreasing in Y
            => unique root, found by bisection+Newton.

We compute that root directly — deliberate divergence from the reference's
integrate-for-50-time-units approximation; agrees with it to the integration
tolerance (validated in tests against scipy BDF).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from crdmodel_tpu.models.base import ReactionModel, register_model

V0 = 1.0
K = 10.0
KF = 1.0
V1 = 7.3
VM2 = 65.0
VM3 = 500.0
K2 = 1.0
KR = 2.0
KA = 0.9
M = 2.0
N = 2.0
P = 4.0


def _v2(Z):
    # n=2: integer-power chains instead of pow() — XLA lowers float-exponent
    # pow to exp/log (~1e-8 relative error and a transcendental per point);
    # squaring is exact and one VPU multiply. The reference calls pow() 8x
    # per grid point per stage (src/GoldbeterModel_torus.cpp:694-695).
    Zn = Z * Z
    return VM2 * Zn / (K2 * K2 + Zn)


def _v3(Z, Y):
    # m=2, p=4
    Ym = Y * Y
    Z2 = Z * Z
    Zp = Z2 * Z2
    return VM3 * Ym * Zp / ((KR * KR + Ym) * (KA ** 4 + Zp))


def kinetics(state, b):
    """state: (2, ...) array [Z, Y]; b: scalar or field broadcastable to Z."""
    Z, Y = state[0], state[1]
    v2 = _v2(Z)
    v3 = _v3(Z, Y)
    dZ = V0 + V1 * b - v2 + v3 + KF * Y - K * Z
    dY = v2 - v3 - KF * Y
    return jnp.stack([dZ, dY])


def steady_state(beta: float):
    """Exact fixed point via Zs = (v0 + v1*beta)/k and a 1-D root solve in Y.

    g(Y) = v2(Zs) - v3(Zs, Y) - kf*Y is strictly decreasing (v3 increasing in
    Y), so bisection on [0, v2(Zs)/kf] always converges; polished with Newton.
    Computed in float64 numpy at setup time (not traced).
    """
    Zs = (V0 + V1 * float(beta)) / K
    v2s = float(_np_v2(Zs))

    def g(Y):
        return v2s - _np_v3(Zs, Y) - KF * Y

    lo, hi = 0.0, max(v2s / KF, 1e-12)
    # g(0) = v2s >= 0, g(hi) <= -v3 <= 0: bracket guaranteed
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if g(mid) > 0.0:
            lo = mid
        else:
            hi = mid
    Ys = 0.5 * (lo + hi)
    return (Zs, Ys)


def _np_v2(Z):
    Zn = np.float64(Z) ** N
    return VM2 * Zn / (K2 ** N + Zn)


def _np_v3(Z, Y):
    Ym = np.float64(Y) ** M
    Zp = np.float64(Z) ** P
    return VM3 * Ym * Zp / ((KR ** M + Ym) * (KA ** P + Zp))


# Oscillatory window bounds noted in the reference config
# (data/GoldbeterModelArgs.ini:25) and used for the backward-time rule
# (util/GoldbeterModel/SolveGoldbeterODE.py:60).
OSC_BETA_MIN = 0.289
OSC_BETA_MAX = 0.774


def jac_bound(state, b):
    """Gershgorin bound on the kinetics Jacobian over the grid.

      dv2/dZ = 2 VM2 K2^2 Z / (K2^2+Z^2)^2
      dv3/dZ = 4 VM3 gY KA^4 Z^3 / (KA^4+Z^4)^2,  gY = Y^2/(KR^2+Y^2)
      dv3/dY = 2 VM3 gZ KR^2 Y / (KR^2+Y^2)^2,    gZ = Z^4/(KA^4+Z^4)
      J = [[-dv2dZ + dv3dZ - k, dv3dY + kf],
           [ dv2dZ - dv3dZ,    -dv3dY - kf]]
    """
    Z, Y = state[0], state[1]
    Z2 = Z * Z
    Z4 = Z2 * Z2
    Y2 = Y * Y
    dv2 = 2.0 * VM2 * (K2 * K2) * Z / (K2 * K2 + Z2) ** 2
    gY = Y2 / (KR * KR + Y2)
    gZ = Z4 / (KA ** 4 + Z4)
    dv3_dZ = 4.0 * VM3 * gY * (KA ** 4) * Z * Z2 / (KA ** 4 + Z4) ** 2
    dv3_dY = 2.0 * VM3 * gZ * (KR * KR) * Y / (KR * KR + Y2) ** 2
    row1 = jnp.abs(-dv2 + dv3_dZ - K) + jnp.abs(dv3_dY + KF)
    row2 = jnp.abs(dv2 - dv3_dZ) + jnp.abs(dv3_dY + KF)
    return jnp.maximum(row1, row2)


MODEL = register_model(
    ReactionModel(
        name="goldbeter",
        nvars=2,
        var_names=("Z", "Y"),
        kinetics=kinetics,
        steady_state=steady_state,
        jac_bound=jac_bound,
    )
)
