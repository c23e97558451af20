"""Adaptive embedded explicit Runge–Kutta integrator (the ARKode replacement).

Rebuilds the reference's time-integration runtime (SURVEY.md L2: SUNDIALS
ARKode with explicit-only RHS, rtol=1e-5/atol=1e-10, <=200000 internal steps
per output interval, ARK_NORMAL outer loop — reference
src/FHNmodel_torus.cpp:356-373,413-478) as a jit-compiled `lax.while_loop`
with SUNDIALS-semantics WRMS error control:

  wrms(e; y) = sqrt( mean_i ( e_i / (rtol*|y_i| + atol) )^2 ),  accept if <= 1

The mean runs over ALL solution components (both variables, full global
grid), which on the reference side is the hidden per-step MPI allreduce inside
N_VWrmsNorm (src/FHNmodel_torus.cpp:281). Here the reduction is injectable:
`reduce_fn=jnp.sum` on one device, `lambda x: lax.psum(x, axes)` under
shard_map — guaranteeing every device takes identical accept/reject and
step-size decisions (the distributed-correctness core, SURVEY.md §7).

Deliberate divergence: ARKode's ARK_NORMAL steps *past* tout and interpolates
the dense output back; we instead clamp the final step to land exactly on
tout (TSTOP-style). Both are within integrator tolerance of each other.

Tableaus: Bogacki–Shampine 3(2) (default — lowest cost per step at these
tolerances), Zonneveld 4(3) (ARKode's default 4th-order ERK table, for
behavioural parity), Dormand–Prince 5(4).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Tableau:
    name: str
    order: int        # order of the propagating solution
    err_order: int    # order of the local error estimate (= embedded order + 1)
    a: np.ndarray     # (s, s) strictly lower triangular
    b: np.ndarray     # (s,)  propagating weights
    bhat: np.ndarray  # (s,)  embedded weights
    c: np.ndarray     # (s,)

    @property
    def stages(self) -> int:
        return len(self.b)

    @property
    def fsal(self) -> bool:
        """First-same-as-last: last stage of an accepted step equals the
        first stage of the next (a[-1] == b and c[-1] == 1)."""
        return bool(np.allclose(self.a[-1], self.b) and np.isclose(self.c[-1], 1.0))


def _tab(name, order, err_order, a, b, bhat, c):
    return Tableau(name, order, err_order,
                   np.array(a, dtype=np.float64),
                   np.array(b, dtype=np.float64),
                   np.array(bhat, dtype=np.float64),
                   np.array(c, dtype=np.float64))


BS32 = _tab(
    "bs32", 3, 3,
    a=[[0, 0, 0, 0],
       [1 / 2, 0, 0, 0],
       [0, 3 / 4, 0, 0],
       [2 / 9, 1 / 3, 4 / 9, 0]],
    b=[2 / 9, 1 / 3, 4 / 9, 0],
    bhat=[7 / 24, 1 / 4, 1 / 3, 1 / 8],
    c=[0, 1 / 2, 3 / 4, 1],
)

# ARKode's default explicit 4th-order table (Zonneveld 1963), behavioural
# parity with the reference's ARKodeInit(..., f, NULL, ...) default.
ZONNEVELD43 = _tab(
    "zonneveld43", 4, 4,
    a=[[0, 0, 0, 0, 0],
       [1 / 2, 0, 0, 0, 0],
       [0, 1 / 2, 0, 0, 0],
       [0, 0, 1, 0, 0],
       [5 / 32, 7 / 32, 13 / 32, -1 / 32, 0]],
    b=[1 / 6, 1 / 3, 1 / 3, 1 / 6, 0],
    bhat=[-1 / 2, 7 / 3, 7 / 3, 13 / 6, -16 / 3],
    c=[0, 1 / 2, 1 / 2, 1, 3 / 4],
)

DOPRI54 = _tab(
    "dopri54", 5, 5,
    a=[[0, 0, 0, 0, 0, 0, 0],
       [1 / 5, 0, 0, 0, 0, 0, 0],
       [3 / 40, 9 / 40, 0, 0, 0, 0, 0],
       [44 / 45, -56 / 15, 32 / 9, 0, 0, 0, 0],
       [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0, 0],
       [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0, 0],
       [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0]],
    b=[35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0],
    bhat=[5179 / 57600, 0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40],
    c=[0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1, 1],
)

TABLEAUS = {"bs32": BS32, "zonneveld43": ZONNEVELD43, "dopri54": DOPRI54}

# step-size controller: ARKode's default PID with its constants
# (k1=0.58, k2=0.21, k3=0.1, bias=1.5, safety=0.96) — matching the
# reference's controller equilibrium (err ~ 0.5) so step counts track
# ARKode's instead of over-resolving (a plain PI(0.7,0.4) with safety 0.9
# equilibrates at err ~ 0.35, ~13% more steps for accuracy nobody asked for)
SAFETY = 0.96
PID_K1 = 0.58
PID_K2 = 0.21
PID_K3 = 0.1
ERR_BIAS = 1.5
ETA_MIN = 0.1
ETA_MAX_FIRST = 10000.0   # ARKode etamx1
ETA_MAX = 10.0
ETA_REJECT_MAX = 0.9


class SolveStats(NamedTuple):
    steps: jnp.ndarray     # internal steps attempted per output interval
    accepted: jnp.ndarray
    rejected: jnp.ndarray
    status: jnp.ndarray    # 0 ok; 1 max-steps exceeded; 2 dt underflow


def _sel(c, a, b):
    """jnp.where(c, a, b) with a member-batched flag c broadcast against
    state arrays: c (B,) selects along the leading axis of a (B, ...).
    Scalar c (the single-run case) is plain where."""
    if getattr(c, "ndim", 0) and getattr(a, "ndim", 0) > c.ndim:
        c = c.reshape(c.shape + (1,) * (a.ndim - c.ndim))
    return jnp.where(c, a, b)


def wrms_norm(e, y, rtol, atol, reduce_fn=jnp.sum, global_size=None):
    """SUNDIALS weighted RMS norm of error e with weights from solution y."""
    w = 1.0 / (rtol * jnp.abs(y) + atol)
    ss = reduce_fn(jnp.square(e * w))
    n = global_size if global_size is not None else e.size
    return jnp.sqrt(ss / n)


def _initial_step(rhs, t0, y0, f0, params, tout, rtol, atol,
                  err_order, reduce_fn, global_size):
    """Hairer-style automatic initial step size (replaces ARKode's internal
    h0 estimation; exact parity is not required — any reasonable h0 is
    corrected by the controller within a few steps)."""
    def nrm(v, ref):
        return wrms_norm(v, ref, rtol, atol, reduce_fn, global_size)

    d0 = nrm(y0, y0)
    d1 = nrm(f0, y0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-35))
    h0 = jnp.minimum(h0, jnp.abs(tout - t0))
    y1 = y0 + h0 * f0
    f1 = rhs(t0 + h0, y1, params)
    d2 = nrm(f1 - f0, y0) / jnp.maximum(h0, 1e-35)
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(dmax <= 1e-15,
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(dmax, 1e-35)) ** (1.0 / err_order))
    h = jnp.minimum(100.0 * h0, h1)
    h = jnp.minimum(h, jnp.abs(tout - t0))
    return jnp.where(jnp.isfinite(h) & (h > 0), h, 1e-6).astype(y0.dtype)


def make_erk_step(tableau: Tableau, rhs: Callable):
    """Return step(t, y, h, params) -> (y_new, err_vec).

    Stages are unrolled in Python (static, <=7) so XLA fuses the whole step.
    This is the simple standalone stepper (used by the driver compile check);
    the integration loops use make_default_step_err below, which adds FSAL
    stage reuse for BS3(2)/DOPRI5(4).

    Coefficients are baked in as Python floats (weakly typed) so an f32
    state stays f32 even under jax_enable_x64 — np.float64 scalars would
    promote every stage combination to f64.
    """
    s = tableau.stages
    a = tableau.a.tolist()
    b = tableau.b.tolist()
    d = (tableau.b - tableau.bhat).tolist()
    c = tableau.c.tolist()

    def step(t, y, h, params):
        ks = []
        for i in range(s):
            yi = y
            for j in range(i):
                if a[i][j] != 0.0:
                    yi = yi + (h * a[i][j]) * ks[j]
            ks.append(rhs(t + c[i] * h, yi, params))
        y_new = y
        err = jnp.zeros_like(y)
        for i in range(s):
            if b[i] != 0.0:
                y_new = y_new + (h * b[i]) * ks[i]
            if d[i] != 0.0:
                err = err + (h * d[i]) * ks[i]
        return y_new, err

    return step


def make_default_step_err(tableau: Tableau, rhs: Callable, rtol, atol):
    """XLA-path stepper: (step_err, init_carry).

      step_err(t, y, h, params, carry) -> (y_new, err_ss, new_carry)
      init_carry(t, y, params) -> carry

    err_ss is the local sum of squared WRMS-scaled errors. For FSAL tableaus
    (BS3(2), DOPRI5(4): last stage row equals b, c_s = 1) the carry holds
    f(t, y) — the previous accepted step's final stage — eliminating one RHS
    evaluation per step (25% of BS3's stage work). The integrate loop keeps
    the old carry on rejected steps, where (t, y) are unchanged and the
    cached stage stays valid. The fused Pallas kernel (ops/pallas_step.py)
    uses an empty carry.
    """
    s = tableau.stages
    # Python floats (weak types): keep f32 state f32 under jax_enable_x64
    a, b, c = tableau.a.tolist(), tableau.b.tolist(), tableau.c.tolist()
    d = (tableau.b - tableau.bhat).tolist()
    fsal = tableau.fsal

    def _stages(t, y, h, params, k1):
        ks = [k1]
        for i in range(1, s):
            yi = y
            for j in range(i):
                if a[i][j] != 0.0:
                    yi = yi + (h * a[i][j]) * ks[j]
            ks.append(rhs(t + c[i] * h, yi, params))
        y_new = y
        err = jnp.zeros_like(y)
        for i in range(s):
            if b[i] != 0.0:
                y_new = y_new + (h * b[i]) * ks[i]
            if d[i] != 0.0:
                err = err + (h * d[i]) * ks[i]
        return y_new, err, ks[-1]

    if fsal:
        def init_carry(t, y, params):
            return rhs(t, y, params)

        def step_err(t, y, h, params, carry):
            y_new, err_vec, k_last = _stages(t, y, h, params, carry)
            w = 1.0 / (rtol * jnp.abs(y) + atol)
            scaled = err_vec * w
            return y_new, jnp.sum(scaled * scaled), k_last
    else:
        def init_carry(t, y, params):
            return ()

        def step_err(t, y, h, params, carry):
            k1 = rhs(t, y, params)
            y_new, err_vec, _ = _stages(t, y, h, params, k1)
            w = 1.0 / (rtol * jnp.abs(y) + atol)
            scaled = err_vec * w
            return y_new, jnp.sum(scaled * scaled), ()

    return step_err, init_carry


def integrate_interval(step_err, t0, y0, h_init, err_prev_init, tout, params,
                       *, err_order, max_steps, global_size,
                       reduce_fn=jnp.sum, carry0=(),
                       first_interval=False, status0=None,
                       h_limit_fn=None, return_carry=False, sync_fn=None):
    """Integrate from (t0, y0) to tout with adaptive steps.

    step_err(t, y, h, params, carry) -> (y_new, err_ss, new_carry) where
    err_ss is the local sum of squared WRMS-scaled errors (see
    make_default_step_err) and carry is the stepper's cross-step cache (FSAL
    stage). The loop keeps the old carry on rejected steps — (t, y) are
    unchanged there, so a cached f(t, y) stays valid.

    Returns (t, y, h, err_prev, stats_tuple). All control-flow decisions are
    functions of reduce_fn-global scalars, so under shard_map every device
    agrees. A nonzero incoming status0 makes the interval a no-op (sticky
    failure: the reference breaks its output loop on solver failure,
    src/FHNmodel_torus.cpp:430-435).

    first_interval: True (or a traced bool) on the run's FIRST interval —
    relaxes the growth cap to ETA_MAX_FIRST for the very first accepted
    step's h-update (ARKode's etamx1=10000: the automatic h0 estimate is
    deliberately conservative and the first update is allowed to correct it
    in one jump). May be a traced scalar so jitted callers can thread it
    through scan without a second while_loop compile.

    h_limit_fn(t, y, params) -> scalar: optional hard cap on the attempted
    step (e.g. the fused RKC kernel's stability coverage for its static
    stage budget, ops/pallas_rkc.py). The controller may propose larger h;
    every attempt is clamped before stepping, so t advances by the clamped
    amount and the error test sees the step actually taken.

    Member-batched mode (the TPU sweep path, integrate_to_outputs
    n_members): t0/h_init/err_prev_init/status0 may be (B,) vectors with
    y0 (B, ...) and a member-vmapped step_err returning (B,) err sums —
    ONE while_loop carries every member, each keeping its own step size,
    accept/reject decisions and failure status (masked once finished), so
    per-member step sequences are identical to B separate runs. reduce_fn
    must then be the identity (the vmapped stepper already reduced each
    member's grid axes) and the loop runs until every member reaches tout.

    sync_fn(go: bool) -> bool: optional cross-shard OR on the loop
    condition — the composed ensemble mesh (parallel/ensemble.py) runs
    members in LOCKSTEP so halo/psum collectives stay matched across
    member-submeshes with divergent per-member progress: finished members
    spin through `active`-masked no-op iterations (the body already
    freezes their state) until the slowest member reaches tout.
    """
    dtype = y0.dtype
    inv_q = 1.0 / float(err_order)
    eps = float(jnp.finfo(dtype).eps)
    first_flag = (None if first_interval is False or first_interval is None
                  else jnp.asarray(first_interval))

    def cond(state):
        t, y, h, errs, fc, nstep, nacc, nrej, status = state
        go = jnp.any((t < tout) & (status == 0) & (nstep < max_steps))
        return go if sync_fn is None else sync_fn(go)

    def body(state):
        t, y, h, errs, fc, nstep, nacc, nrej, status = state
        ep, epp = errs
        # per-member liveness: in the scalar case `cond` already guarantees
        # this is True, so the masking below is free; in member-batched mode
        # a finished/failed member's state must stay frozen
        active = (t < tout) & (status == 0) & (nstep < max_steps)
        hs = jnp.where(t + h >= tout, tout - t, h)
        if h_limit_fn is not None:
            hs = jnp.minimum(hs, h_limit_fn(t, y, params).astype(dtype))
        last = hs >= tout - t

        y_new, err_ss, fc_new = step_err(t, y, hs, params, fc)
        err = jnp.sqrt(reduce_fn(err_ss) / global_size).astype(dtype)
        err = jnp.where(jnp.isfinite(err), err, jnp.asarray(jnp.inf, dtype))
        raw_accept = err <= 1.0
        accept = raw_accept & active

        # ARKode-style PID step-size update (biased error history)
        err_c = jnp.maximum(err, 1e-10)
        eta = (SAFETY
               * (ERR_BIAS * err_c) ** (-PID_K1 * inv_q)
               * (ERR_BIAS * ep) ** (PID_K2 * inv_q)
               * (ERR_BIAS * epp) ** (-PID_K3 * inv_q))
        if first_flag is None:
            eta_max = ETA_MAX
        else:
            # etamx1 applies to the first accepted step's update only
            eta_max = jnp.where(first_flag & (nacc == 0),
                                ETA_MAX_FIRST, ETA_MAX).astype(dtype)
        eta_acc = jnp.clip(eta, ETA_MIN, eta_max)
        eta_rej = jnp.clip(eta, ETA_MIN, ETA_REJECT_MAX)
        # when the step was clamped only to land on tout (`last`), the tiny hs
        # says nothing about the error-limited step size: keep the unclamped h
        # as memory for the next interval (otherwise every interval boundary
        # collapses h and a single rejection near hmin fakes a dt underflow)
        h_grow = hs * eta_acc
        h_acc = jnp.where(last, jnp.maximum(h, h_grow), h_grow)
        h_next = jnp.where(active, jnp.where(raw_accept, h_acc, hs * eta_rej),
                           h)

        t_next = jnp.where(accept, jnp.where(last, tout, t + hs), t)
        y_next = _sel(accept, y_new, y)
        ep_next = jnp.where(accept, err_c, ep)
        epp_next = jnp.where(accept, ep, epp)
        fc_next = jax.tree_util.tree_map(
            lambda new, old: _sel(accept, new, old), fc_new, fc)

        # dt underflow: step no longer advances time
        hmin = 16.0 * eps * jnp.maximum(jnp.abs(t), 1.0)
        status_next = jnp.where(active & (~raw_accept) & (h_next < hmin),
                                jnp.asarray(2, jnp.int32), status)

        return (t_next, y_next, h_next, (ep_next, epp_next), fc_next,
                nstep + active.astype(jnp.int32),
                nacc + accept.astype(jnp.int32),
                nrej + (active & ~raw_accept).astype(jnp.int32),
                status_next)

    t0 = jnp.asarray(t0)
    zero = jnp.zeros(jnp.shape(t0), jnp.int32)
    s0 = (zero if status0 is None
          else jnp.broadcast_to(jnp.asarray(status0, jnp.int32), zero.shape))
    err_prev_init = jnp.asarray(err_prev_init, dtype)
    one = jnp.ones_like(err_prev_init)
    state0 = (t0.astype(dtype), y0, h_init.astype(dtype),
              (err_prev_init, one), carry0, zero, zero, zero, s0)
    t, y, h, (ep, _), fc, nstep, nacc, nrej, status = jax.lax.while_loop(
        cond, body, state0)
    # max-steps exhaustion without reaching tout
    status = jnp.where((t < tout) & (status == 0), jnp.asarray(1, jnp.int32),
                       status)
    if return_carry:
        # the stepper's final cross-step cache — e.g. the h-sequence
        # recorder threaded through the carry (differentiable.py replay)
        return t, y, h, ep, (nstep, nacc, nrej, status), fc
    return t, y, h, ep, (nstep, nacc, nrej, status)


def integrate_interval_free(step_err, t0, y0, h_init, err_prev_init, tout,
                            params, *, err_order, max_steps, global_size,
                            reduce_fn=jnp.sum, carry0=(), bracket0=None,
                            first_interval=False, status0=None,
                            h_limit_fn=None, t_cap=None, sync_fn=None):
    """ARK_NORMAL-style interval: step FREELY until t >= tout (no clamping;
    the accepted step may overshoot), tracking the last accepted step's
    bracket (t_lo, y_lo) so the caller can densely interpolate the solution
    at tout (ARKode steps past tout and interpolates back,
    src/FHNmodel_torus.cpp:423 with ARK_NORMAL; integrate_interval's
    TSTOP-style clamping is the framework default).

    bracket0: (t_lo, y_lo) carried in from the previous interval — if t0 is
    already past tout (one big step crossed several output times), the loop
    body never runs and the incoming bracket still brackets tout.

    t_cap: optional scalar time the overshoot must NOT cross — the next RHS
    discontinuity (breakpoint) after tout. A free step would otherwise
    integrate the wrong smooth piece across it by up to a full step length.
    Steps clamped only by the cap keep the unclamped h as controller memory
    (same rationale as integrate_interval's `last` handling). Pass +inf (or
    None) when no breakpoint lies ahead.

    Returns (t, y, h, err_prev, (t_lo, y_lo), stats_tuple).
    """
    dtype = y0.dtype
    inv_q = 1.0 / float(err_order)
    eps = float(jnp.finfo(dtype).eps)
    first_flag = (None if first_interval is False or first_interval is None
                  else jnp.asarray(first_interval))
    if bracket0 is None:
        bracket0 = (t0.astype(dtype), y0)

    def cond(state):
        t, y, h, errs, fc, br, nstep, nacc, nrej, status = state
        go = (t < tout) & (status == 0) & (nstep < max_steps)
        return go if sync_fn is None else sync_fn(go)

    def body(state):
        t, y, h, errs, fc, br, nstep, nacc, nrej, status = state
        ep, epp = errs
        # liveness mask: always True without sync_fn (cond guarantees it);
        # under lockstep member sync a finished member's devices keep
        # executing matched collectives with their state frozen here
        active = (t < tout) & (status == 0) & (nstep < max_steps)
        hs = h
        if h_limit_fn is not None:
            hs = jnp.minimum(hs, h_limit_fn(t, y, params).astype(dtype))
        if t_cap is not None:
            at_cap = t + hs >= t_cap
            hs = jnp.where(at_cap, t_cap.astype(dtype) - t, hs)

        y_new, err_ss, fc_new = step_err(t, y, hs, params, fc)
        err = jnp.sqrt(reduce_fn(err_ss) / global_size).astype(dtype)
        err = jnp.where(jnp.isfinite(err), err, jnp.asarray(jnp.inf, dtype))
        raw_accept = err <= 1.0
        accept = raw_accept & active

        err_c = jnp.maximum(err, 1e-10)
        eta = (SAFETY
               * (ERR_BIAS * err_c) ** (-PID_K1 * inv_q)
               * (ERR_BIAS * ep) ** (PID_K2 * inv_q)
               * (ERR_BIAS * epp) ** (-PID_K3 * inv_q))
        if first_flag is None:
            eta_max = ETA_MAX
        else:
            eta_max = jnp.where(first_flag & (nacc == 0),
                                ETA_MAX_FIRST, ETA_MAX).astype(dtype)
        h_grow = hs * jnp.clip(eta, ETA_MIN, eta_max)
        if t_cap is not None:
            # cap-clamped steps say nothing about the error-limited h
            h_grow = jnp.where(at_cap, jnp.maximum(h, h_grow), h_grow)
        h_next = jnp.where(active,
                           jnp.where(raw_accept, h_grow,
                                     hs * jnp.clip(eta, ETA_MIN,
                                                   ETA_REJECT_MAX)),
                           h)

        t_next = jnp.where(accept, t + hs, t)
        y_next = jnp.where(accept, y_new, y)
        # bracket: the state at the START of the accepted step
        br_next = (jnp.where(accept, t, br[0]),
                   jnp.where(accept, y, br[1]))
        ep_next = jnp.where(accept, err_c, ep)
        epp_next = jnp.where(accept, ep, epp)
        fc_next = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old), fc_new, fc)

        hmin = 16.0 * eps * jnp.maximum(jnp.abs(t), 1.0)
        status_next = jnp.where(active & (~raw_accept) & (h_next < hmin),
                                jnp.asarray(2, jnp.int32), status)
        return (t_next, y_next, h_next, (ep_next, epp_next), fc_next,
                br_next, nstep + active.astype(jnp.int32),
                nacc + accept.astype(jnp.int32),
                nrej + (active & ~raw_accept).astype(jnp.int32),
                status_next)

    zero = jnp.asarray(0, jnp.int32)
    s0 = zero if status0 is None else jnp.asarray(status0, jnp.int32)
    one = jnp.asarray(1.0, dtype)
    state0 = (t0.astype(dtype), y0, h_init.astype(dtype),
              (err_prev_init.astype(dtype), one), carry0,
              (bracket0[0].astype(dtype), bracket0[1]),
              zero, zero, zero, s0)
    t, y, h, (ep, _), _, br, nstep, nacc, nrej, status = jax.lax.while_loop(
        cond, body, state0)
    status = jnp.where((t < tout) & (status == 0), jnp.asarray(1, jnp.int32),
                       status)
    return t, y, h, ep, br, (nstep, nacc, nrej, status)


def hermite_interpolate(rhs, t_lo, y_lo, t_hi, y_hi, tout, params):
    """Cubic Hermite dense output on [t_lo, t_hi] evaluated at tout —
    ARKode's default dense-output degree (3). Endpoint derivatives are
    recomputed via rhs (2 evals per OUTPUT time, negligible next to the
    step loop). Degenerate/undershot brackets fall back to y_hi."""
    dtype = y_hi.dtype
    d = (t_hi - t_lo).astype(dtype)
    ok = (d > 0) & (t_hi >= tout)
    d_safe = jnp.where(ok, d, jnp.asarray(1.0, dtype))
    s = jnp.clip((tout.astype(dtype) - t_lo) / d_safe, 0.0, 1.0)
    f_lo = rhs(t_lo, y_lo, params)
    f_hi = rhs(t_hi, y_hi, params)
    h00 = (1 + 2 * s) * (1 - s) ** 2
    h10 = s * (1 - s) ** 2
    h01 = s * s * (3 - 2 * s)
    h11 = s * s * (s - 1)
    y_out = (h00 * y_lo + h01 * y_hi
             + (h10 * d_safe) * f_lo + (h11 * d_safe) * f_hi)
    return jnp.where(ok, y_out, y_hi)


def integrate_interval_batched(step_err, K, t0, y0, h_init, errs0, tout,
                               params, *, err_order, max_steps, global_size,
                               reduce_fn=jnp.sum, carry0=(), status0=None):
    """Speculative K-step batches in pure XLA: each while iteration takes K
    sub-steps with a FROZEN step size, then selects the longest accepted
    prefix — all K states stay inside one XLA fusion, so a mid-batch
    rejection costs only the wasted tail compute (no replay).

    Each sub-step is still individually validated against the WRMS test, so
    the tolerance contract is identical to integrate_interval — only the h
    *sequence* differs (h updates once per batch, conservatively: an
    overgrown h poisons a whole batch). Batches run while t + K*h stays
    inside the interval; the tail is finished by the per-step loop.

    Opt-in (cfg.speculative_k): on the canonical travelling-wave problem the
    per-step loop measured FASTER end to end — frozen-h batches reject more
    where h wants agility (docs/PERF_NOTES.md); suited to long smooth runs.

    errs0 = (ep, epp) controller history. Returns like integrate_interval.
    """
    dtype = y0.dtype
    inv_q = 1.0 / float(err_order)

    def cond(state):
        t, y, h, errs, fc, nstep, nacc, nrej, status = state
        return ((t + K * h <= tout) & (t < tout) & (status == 0)
                & (nstep < max_steps))

    def body(state):
        t, y, h, errs, fc, nstep, nacc, nrej, status = state
        ep, epp = errs
        ys = [y]
        fcs = [fc]
        es = []
        for j in range(K):
            yn, ss, fcn = step_err(t + j * h, ys[-1], h, params, fcs[-1])
            ys.append(yn)
            fcs.append(fcn)
            es.append(reduce_fn(ss))
        # vectorised tail: per-sub-step sqrt/where ops cost ~1-2 us each
        # inside a device loop on this backend (PERF_NOTES round-5
        # "small-grid floor"), so finish the K error norms in three vector
        # ops and select the committed state with ONE dynamic index into
        # the stacked sub-step states instead of K full-state selects
        evec = jnp.sqrt(jnp.stack(es) / global_size).astype(dtype)
        evec = jnp.where(jnp.isfinite(evec), evec,
                         jnp.asarray(jnp.inf, dtype))
        acc = jnp.cumprod((evec <= 1.0).astype(jnp.int32))
        prefix = jnp.sum(acc, dtype=jnp.int32)

        y_next = jax.lax.dynamic_index_in_dim(jnp.stack(ys), prefix,
                                              keepdims=False)
        fc_next = jax.tree_util.tree_map(
            lambda *leaves: jax.lax.dynamic_index_in_dim(
                jnp.stack(leaves), prefix, keepdims=False), *fcs)
        t_next = t + prefix.astype(dtype) * h

        all_ok = prefix == K
        e_last = jnp.maximum(evec[jnp.maximum(prefix - 1, 0)], 1e-10)
        e_prev = jnp.where(prefix > 1,
                           evec[jnp.maximum(prefix - 2, 0)], ep)
        e_rej = jnp.maximum(evec[jnp.minimum(prefix, K - 1)], 1e-10)
        e_ctl = jnp.where(all_ok, e_last, e_rej)
        e1 = jnp.where(all_ok, e_prev, e_last)
        eta = (SAFETY * (ERR_BIAS * e_ctl) ** (-PID_K1 * inv_q)
               * (ERR_BIAS * jnp.maximum(e1, 1e-10)) ** (PID_K2 * inv_q)
               * (ERR_BIAS * jnp.maximum(ep, 1e-10)) ** (-PID_K3 * inv_q))
        # growth cap: one oversized h rejects a whole batch, so stay
        # conservative near the controller equilibrium (err ~ 0.5) but ramp
        # fast while errors are far below target (startup h0 recovery)
        grow_cap = jnp.where(e_ctl < 0.1, ETA_MAX, 1.4)
        eta_acc = jnp.clip(0.95 * eta, ETA_MIN, grow_cap)
        eta_rej = jnp.clip(eta, ETA_MIN, ETA_REJECT_MAX)
        h_next = h * jnp.where(all_ok, eta_acc, eta_rej)

        ep_next = jnp.where(prefix > 0, e_last, ep)
        epp_next = jnp.where(prefix > 0, jnp.where(prefix > 1, e_prev, ep),
                             epp)

        eps = jnp.finfo(dtype).eps
        hmin = 16.0 * eps * jnp.maximum(jnp.abs(t), 1.0)
        status_next = jnp.where((~all_ok) & (h_next < hmin),
                                jnp.asarray(2, jnp.int32), status)
        attempted = prefix + (~all_ok).astype(jnp.int32)
        return (t_next, y_next, h_next, (ep_next, epp_next), fc_next,
                nstep + attempted, nacc + prefix,
                nrej + (~all_ok).astype(jnp.int32), status_next)

    zero = jnp.asarray(0, jnp.int32)
    s0 = zero if status0 is None else jnp.asarray(status0, jnp.int32)
    state0 = (t0.astype(dtype), y0, h_init.astype(dtype), errs0, carry0,
              zero, zero, zero, s0)
    t, y, h, errs, fc, nstep, nacc, nrej, status = jax.lax.while_loop(
        cond, body, state0)

    # tail: per-step loop to land exactly on tout
    t, y, h, ep, (ns2, na2, nr2, status) = integrate_interval(
        step_err, t, y, h, errs[0], tout, params,
        err_order=err_order, max_steps=max_steps, global_size=global_size,
        reduce_fn=reduce_fn, carry0=fc, status0=status)
    return t, y, h, ep, (nstep + ns2, nacc + na2, nrej + nr2, status)


def integrate_interval_kernel_batched(kcall, K, t0, y0, h_init, errs0, tout,
                                      params, *, err_order, max_steps,
                                      global_size, reduce_fn=jnp.sum,
                                      status0=None, tail_step_err=None,
                                      tail_carry0=()):
    """integrate_interval_batched semantics with the K-step mega-kernel
    (ops/pallas_kstep.py): one kernel call takes K frozen-h sub-steps in a
    single HBM pass and returns (y_K, per-sub-step error sums). Each
    sub-step is validated against the WRMS test; on a mid-batch rejection a
    recovery call re-invokes the kernel with n_commit=prefix (deterministic
    recompute — a few % of batches). Controller logic identical to
    integrate_interval_batched. The interval tail (t + K*h past tout) runs
    the per-step loop with tail_step_err (the single-step fused kernel,
    same padded state representation).
    """
    dtype = y0.dtype
    inv_q = 1.0 / float(err_order)

    def cond(state):
        t, y, h, errs, nstep, nacc, nrej, status = state
        return ((t + K * h <= tout) & (t < tout) & (status == 0)
                & (nstep < max_steps))

    def body(state):
        t, y, h, errs, nstep, nacc, nrej, status = state
        ep, epp = errs
        yK, sss = kcall(t, y, h, K, params)
        # ONE vectorised reduce over the strip axis — per-sub-step loops of
        # tiny reduce/sqrt/where ops cost ~1-2 us EACH inside a device loop
        # on this backend (docs/PERF_NOTES.md round-5 "small-grid floor"),
        # which at K=10 dwarfed the kernel itself
        # (plain jnp.sum, not reduce_fn: the K-step kernel path is single-
        # chip only — sim.py builds it outside shard_map — so the strip
        # axis sum needs no collective / pad masking)
        evec = jnp.sqrt(jnp.sum(sss, axis=0) / global_size).astype(dtype)
        evec = jnp.where(jnp.isfinite(evec), evec,
                         jnp.asarray(jnp.inf, dtype))
        acc = jnp.cumprod((evec <= 1.0).astype(jnp.int32))
        prefix = jnp.sum(acc, dtype=jnp.int32)
        all_ok = prefix == K

        # commit the longest accepted prefix: recovery is a deterministic
        # recompute behind lax.cond. (Round-5 measured the alternatives at
        # 400x100 on-chip: an UNCONDITIONAL second kernel call costs ~60 us
        # per batch in the dependent chain — +16 ms over the cond at K=10 —
        # while the cond charges ~10 ms per run; both documented in
        # PERF_NOTES "round-5 small-grid floor".)
        y_next = jax.lax.cond(
            all_ok, lambda: yK,
            lambda: kcall(t, y, h, prefix, params)[0])
        t_next = t + prefix.astype(dtype) * h

        # controller: same structure/constants as integrate_interval_batched
        e_last = jnp.maximum(evec[jnp.maximum(prefix - 1, 0)], 1e-10)
        e_prev = jnp.where(prefix > 1, evec[jnp.maximum(prefix - 2, 0)], ep)
        e_rej = jnp.maximum(evec[jnp.minimum(prefix, K - 1)], 1e-10)
        e_ctl = jnp.where(all_ok, e_last, e_rej)
        e1 = jnp.where(all_ok, e_prev, e_last)
        eta = (SAFETY * (ERR_BIAS * e_ctl) ** (-PID_K1 * inv_q)
               * (ERR_BIAS * jnp.maximum(e1, 1e-10)) ** (PID_K2 * inv_q)
               * (ERR_BIAS * jnp.maximum(ep, 1e-10)) ** (-PID_K3 * inv_q))
        grow_cap = jnp.where(e_ctl < 0.1, ETA_MAX, 1.4).astype(dtype)
        eta_acc = jnp.clip(0.95 * eta, ETA_MIN, grow_cap)
        eta_rej = jnp.clip(eta, ETA_MIN, ETA_REJECT_MAX)
        h_next = h * jnp.where(all_ok, eta_acc, eta_rej)

        ep_next = jnp.where(prefix > 0, e_last, ep)
        epp_next = jnp.where(prefix > 0, jnp.where(prefix > 1, e_prev, ep),
                             epp)

        eps = jnp.finfo(dtype).eps
        hmin = 16.0 * eps * jnp.maximum(jnp.abs(t), 1.0)
        status_next = jnp.where((~all_ok) & (h_next < hmin),
                                jnp.asarray(2, jnp.int32), status)
        attempted = prefix + (~all_ok).astype(jnp.int32)
        return (t_next, y_next, h_next, (ep_next, epp_next),
                nstep + attempted, nacc + prefix,
                nrej + (~all_ok).astype(jnp.int32), status_next)

    zero = jnp.asarray(0, jnp.int32)
    s0 = zero if status0 is None else jnp.asarray(status0, jnp.int32)
    state0 = (t0.astype(dtype), y0, h_init.astype(dtype), errs0,
              zero, zero, zero, s0)
    t, y, h, errs, nstep, nacc, nrej, status = jax.lax.while_loop(
        cond, body, state0)

    # tail: land exactly on tout with the per-step fused kernel
    t, y, h, ep, (ns2, na2, nr2, status) = integrate_interval(
        tail_step_err, t, y, h, errs[0], tout, params,
        err_order=err_order, max_steps=max_steps, global_size=global_size,
        reduce_fn=reduce_fn, carry0=tail_carry0, status0=status)
    return t, y, h, ep, (nstep + ns2, nacc + na2, nrej + nr2, status)


def make_stepper(method, rhs, rtol, atol, rho_fn=None, rhs_split=None,
                 stage_sync=None):
    """Resolve a method name to (step_err, init_carry, err_order) — the
    stepper protocol shared by erk tableaus, rkc2 and the ark324 IMEX pair.

    rhs_split: (f_ex, f_im) explicit/implicit parts summing to rhs, required
    by method 'ark324' (core/problem.py::make_rhs(split=True)).
    stage_sync: rkc2 only — cross-shard stage-count max for collective
    lockstep (rkc.make_rkc2_step_err)."""
    if method == "rkc2":
        from crdmodel_tpu.integrate import rkc
        if rho_fn is None:
            raise ValueError("method 'rkc2' needs rho_fn")
        step_err, init_carry = rkc.make_rkc2_step_err(rhs, rho_fn, rtol, atol,
                                                      stage_sync=stage_sync)
        return step_err, init_carry, rkc.ERR_ORDER
    if method == "ark324":
        from crdmodel_tpu.integrate import imex
        if rhs_split is None:
            raise ValueError("method 'ark324' needs rhs_split=(f_ex, f_im)")
        step_err, init_carry = imex.make_imex_step_err(
            rhs_split[0], rhs_split[1], rtol, atol)
        return step_err, init_carry, imex.ERR_ORDER
    tableau = TABLEAUS[method] if isinstance(method, str) else method
    step_err, init_carry = make_default_step_err(tableau, rhs, rtol, atol)
    return step_err, init_carry, tableau.err_order


def merge_stops(touts, breakpoints, t0=0.0):
    """Merge static breakpoint times into the output-time list.

    Returns (stop_times (n,), is_output (n,) bool): integration halts exactly
    at every stop; non-output stops are RHS-discontinuity breakpoints whose
    sub-interval stats belong to the next real output interval.
    """
    touts_np = np.asarray(touts, dtype=np.float64)
    stops = [(float(t), True) for t in touts_np]
    # capture the run's end BEFORE appending: reading stops[-1] inside the
    # loop compared each breakpoint against the previously APPENDED one,
    # silently dropping every breakpoint after the first (harmless for the
    # single-tBoundary case this was written for; fatal for multi-edge
    # forcing pulse trains — a stimulus whose edges vanish from the stop
    # list is integrated as OFF by the segment gate)
    t_end = stops[-1][0]
    for bp in breakpoints:
        bp = float(bp)
        if bp <= t0 or bp >= t_end:
            continue
        if any(np.isclose(bp, t) for t, _ in stops):
            continue
        stops.append((bp, False))
    stops.sort(key=lambda p: p[0])
    return (np.array([t for t, _ in stops], dtype=np.float64),
            np.array([o for _, o in stops], dtype=bool))


def integrate_to_outputs(rhs, y0, params, t0, touts, *,
                         rtol, atol, method="bs32", max_steps=200_000,
                         reduce_fn=jnp.sum, global_size=None,
                         breakpoints=(), step_err=None, init_carry=None,
                         y_loop0=None, capture=None, spec_k=0, rho_fn=None,
                         kstep_call=None, h_limit_fn=None, rhs_split=None,
                         step_mode="tstop", err_order=None,
                         n_members=0, params_axes=None, sync_fn=None,
                         stage_sync=None):
    """ARK_NORMAL-equivalent outer loop: integrate through each output time,
    emitting the solution at every tout (reference src/FHNmodel_torus.cpp:413-478).

    touts: 1-D array (static values) of strictly increasing output times
    (T0 excluded). Returns (traj, stats): traj (len(touts), *capture shape);
    stats arrays per output interval.

    breakpoints: static times where the RHS is known to be discontinuous in t
    (e.g. the absorbing-boundary turn-off at tBoundary). Integration stops
    exactly at each breakpoint and restarts, so every integration segment sees
    a smooth RHS. The reference instead brute-forces ARKode across the
    discontinuity (burning rejected steps and, in f32, risking dt underflow —
    observed on the canonical FHN torus config); stepping to the breakpoint is
    strictly more robust and costs nothing. Breakpoint sub-intervals' step
    counts are attributed to the enclosing output interval.

    Custom loop representations (e.g. the Pallas fused step's lane-padded
    state): pass step_err (the fused step), y_loop0 (y0 in loop
    representation), and capture (loop representation -> output snapshot).
    h0 estimation always runs on the plain y0 via rhs.

    step_mode: "tstop" (default) clamps the final step onto each output
    time; "normal" reproduces ARKode's ARK_NORMAL semantics — steps run
    FREELY past each tout and the snapshot is cubic-Hermite dense output
    (ARKode's default interpolation degree) at tout, so the step-size
    sequence is never perturbed by the output schedule
    (src/FHNmodel_torus.cpp:423). Breakpoints stay exact stops in both
    modes (the RHS is discontinuous there; interpolating across one would
    be wrong — and the reference's brute-forcing of tBoundary is the
    behaviour we deliberately improve on). "normal" composes with the
    fused-kernel loop representations (the bracket is carried in loop
    representation; dense output interpolates the capture()-ed plain
    fields with 2 plain-RHS evals per output time) but not with
    speculative K-step batching.

    n_members=B: member-batched mode (the TPU parameter-sweep path,
    sweep.py batch_mode="members"). y0 is (B, *state_shape); params is a
    dict whose member-varying entries carry a leading B axis, marked by
    params_axes (a pytree of 0/None matching params, vmap convention). The
    single-member stepper is vmapped ONLY over the step function — the
    adaptive while_loop itself carries (B,) control state with per-member
    masking (see integrate_interval) — sidestepping the pathological
    XLA-TPU compile of jax.vmap over the whole loop nest
    (sweep.py::_resolve_batch_mode, measured 2026-08-17). Per-member step
    sequences match B separate runs; returns traj (Nt, B, *state_shape)
    and per-member stats arrays (Nt, B).

    Fully jittable; the scan body shares one compiled while_loop.
    """
    dtype = y0.dtype
    if global_size is None:
        global_size = y0[0].size if n_members else y0.size
    if sync_fn is not None and (spec_k or kstep_call is not None):
        raise ValueError("sync_fn (cross-member lockstep) does not compose "
                         "with speculative K-step batching")
    if step_err is None:
        step_err, init_carry, err_order = make_stepper(
            method, rhs, rtol, atol, rho_fn, rhs_split,
            stage_sync=stage_sync)
    else:
        # caller-supplied steppers (fused kernels) should pass err_order
        # explicitly; the fallback covers the tableau name
        if err_order is None:
            err_order = (TABLEAUS[method].err_order
                         if isinstance(method, str) and method in TABLEAUS
                         else method.err_order
                         if hasattr(method, "err_order") else 3)
        if init_carry is None:
            init_carry = lambda t, y, params: ()
    if n_members:
        # member-batched mode: vmap the STEPPER over the member axis, keep
        # the while_loop hand-batched (see docstring). Fused kernels /
        # speculative batching keep their own representations and are not
        # member-foldable here.
        if (y_loop0 is not None or capture is not None or spec_k
                or kstep_call is not None or h_limit_fn is not None):
            raise ValueError("n_members needs the plain XLA state "
                             "representation (no fused kernel / spec_k / "
                             "h_limit_fn)")
        if step_mode != "tstop":
            raise ValueError("n_members supports step_mode='tstop' only")
        if not isinstance(params, dict):
            raise ValueError("n_members needs dict params (with params_axes "
                             "marking the member-batched entries)")
        pax = (params_axes if params_axes is not None
               else {k: None for k in params})
        pax_seg = {**pax, "_seg_end": None}
        rhs_one = rhs
        rhs = jax.vmap(rhs_one, in_axes=(0, 0, pax_seg))
        step_err = jax.vmap(step_err, in_axes=(0, 0, 0, pax_seg, 0))
        init_carry = jax.vmap(init_carry, in_axes=(0, 0, pax_seg))
        # the vmapped stepper already reduced each member's grid axes to a
        # (B,) sum; the loop's reduce must keep the member axis
        reduce_fn = lambda x: x
    if y_loop0 is None:
        y_loop0 = y0
    if capture is None:
        capture = lambda y: y

    stop_times, is_output = merge_stops(touts, breakpoints,
                                        float(np.asarray(t0)))
    # each merged interval contributes its stats to the output interval it
    # falls inside (breakpoint segments belong to the *next* real output)
    seg_ids = np.cumsum(is_output) - is_output.astype(int)
    out_idx = np.nonzero(is_output)[0]
    touts_np = np.asarray(touts, dtype=np.float64)
    stops = list(zip(stop_times, is_output))

    def seg_params(tout):
        # Segment-aware RHS support: rhs may branch on which smooth piece it
        # is integrating (e.g. the boundary freeze) via params["_seg_end"],
        # because stage times touch both endpoints of a segment and a pure
        # function of t cannot distinguish the frozen piece's final stage at
        # t==tBoundary from the released piece's first stage at the same t.
        if isinstance(params, dict):
            return {**params, "_seg_end": tout}
        return params

    t0 = jnp.asarray(t0, dtype)
    tout0 = jnp.asarray(stop_times[0], dtype)
    if n_members:
        t0s = jnp.full((n_members,), t0, dtype)
        p0 = seg_params(tout0)
        f0 = rhs(t0s, y0, p0)
        t0_sc, pax_h0 = t0, {**(params_axes or {k: None for k in params}),
                             "_seg_end": None}
        h0 = jax.vmap(
            lambda y, f, p: _initial_step(
                rhs_one, t0_sc, y, f, p, tout0, rtol, atol, err_order,
                jnp.sum, global_size),
            in_axes=(0, 0, pax_h0))(y0, f0, p0)
        t0 = t0s
    else:
        f0 = rhs(t0, y0, seg_params(tout0))
        h0 = _initial_step(rhs, t0, y0, f0, seg_params(tout0), tout0,
                           rtol, atol, err_order, reduce_fn, global_size)
        if h_limit_fn is not None:
            h0 = jnp.minimum(h0, h_limit_fn(t0, y_loop0,
                                            seg_params(tout0)).astype(dtype))

    if step_mode not in ("tstop", "normal"):
        raise ValueError(f"step_mode must be tstop|normal, got {step_mode!r}")
    if step_mode == "normal":
        if spec_k or kstep_call is not None:
            raise ValueError("step_mode='normal' does not support "
                             "speculative K-step batching (its h sequence "
                             "is already output-schedule-free)")
        # breakpoints must stay EXACT stops even in free-running mode: a
        # stop coinciding with one is clamped (merge_stops keeps such a
        # stop as output-only, so is_output alone cannot detect it), and
        # every free interval's overshoot is capped at the next breakpoint
        # so no accepted step integrates the wrong smooth piece across the
        # discontinuity
        bps = sorted(float(b) for b in breakpoints)
        is_bp = np.array([any(np.isclose(s, b) for b in bps)
                          for s in stop_times])
        caps = np.array([min([b for b in bps
                              if b > s and not np.isclose(b, s)],
                             default=np.inf) for s in stop_times])
        use_free = is_output & ~is_bp
        all_free = bool(np.all(use_free))

        def scan_body_normal(carry, inp):
            tout, free_f, cap, is_first = inp
            t, y, h, errp, status, br_t, br_y = carry
            p = seg_params(tout)
            fc0 = init_carry(t, y, p)
            common = dict(err_order=err_order, max_steps=max_steps,
                          global_size=global_size, reduce_fn=reduce_fn,
                          h_limit_fn=h_limit_fn, sync_fn=sync_fn)

            def free_fn(args):
                t, y, h, errp, status = args
                t, y, h, errp, br, stats = integrate_interval_free(
                    step_err, t, y, h, errp, tout, p, carry0=fc0,
                    bracket0=(br_t, br_y), first_interval=is_first,
                    status0=status, t_cap=cap, **common)
                return (t, y, h, errp, br[0], br[1], *stats)

            def clamp_fn(args):
                t, y, h, errp, status = args
                t, y, h, errp, stats = integrate_interval(
                    step_err, t, y, h, errp, tout, p, carry0=fc0,
                    first_interval=is_first, status0=status, **common)
                # post-stop bracket is degenerate; hermite falls back to y
                return (t, y, h, errp, t, y, *stats)

            args = (t, y, h, errp, status)
            if all_free:
                out = free_fn(args)
            else:
                out = jax.lax.cond(free_f, free_fn, clamp_fn, args)
            t, y, h, errp, br_t, br_y, ns, na, nr, status = out
            # the bracket lives in the LOOP representation (a fused kernel's
            # lane-padded state); dense output interpolates on the plain
            # fields — 2 plain-RHS evals per OUTPUT time, negligible
            snap = hermite_interpolate(rhs, br_t, capture(br_y),
                                       t, capture(y), tout, p)
            return ((t, y, h, errp, status, br_t, br_y),
                    (snap, ns, na, nr, status))

        errp0 = jnp.asarray(1.0, dtype)
        zero = jnp.asarray(0, jnp.int32)
        is_first = jnp.arange(len(stop_times)) == 0
        (_, (traj, nstep, nacc, nrej, status)) = jax.lax.scan(
            scan_body_normal,
            (t0, y_loop0, h0, errp0, zero, t0, y_loop0),
            (jnp.asarray(stop_times, dtype), jnp.asarray(use_free),
             jnp.asarray(caps, dtype), is_first))
        if len(stops) != len(touts_np):
            nseg = len(touts_np)
            seg = jnp.asarray(seg_ids)
            nstep = jax.ops.segment_sum(nstep, seg, num_segments=nseg)
            nacc = jax.ops.segment_sum(nacc, seg, num_segments=nseg)
            nrej = jax.ops.segment_sum(nrej, seg, num_segments=nseg)
            status = jax.ops.segment_max(status, seg, num_segments=nseg)
            traj = traj[jnp.asarray(out_idx)]
        return traj, SolveStats(steps=nstep, accepted=nacc, rejected=nrej,
                                status=status)

    def scan_body(carry, inp):
        tout, is_first = inp
        t, y, h, errp, status = carry
        p = seg_params(tout)
        # fresh stepper cache per segment: the RHS may differ across a
        # breakpoint (freeze release), invalidating a cached FSAL stage
        fc0 = init_carry(t, y, p)
        if kstep_call is not None and spec_k and spec_k > 1:
            t, y, h, errp, stats = integrate_interval_kernel_batched(
                kstep_call, int(spec_k), t, y, h,
                (errp, jnp.asarray(1.0, dtype)), tout, p,
                err_order=err_order, max_steps=max_steps,
                reduce_fn=reduce_fn, global_size=global_size,
                status0=status, tail_step_err=step_err, tail_carry0=fc0)
        elif spec_k and spec_k > 1:
            t, y, h, errp, stats = integrate_interval_batched(
                step_err, int(spec_k), t, y, h,
                (errp, jnp.asarray(1.0, dtype)), tout, p,
                err_order=err_order, carry0=fc0,
                max_steps=max_steps, reduce_fn=reduce_fn,
                global_size=global_size, status0=status)
        else:
            t, y, h, errp, stats = integrate_interval(
                step_err, t, y, h, errp, tout, p,
                err_order=err_order, carry0=fc0,
                max_steps=max_steps, reduce_fn=reduce_fn,
                global_size=global_size, status0=status,
                first_interval=is_first, h_limit_fn=h_limit_fn,
                sync_fn=sync_fn)
        return (t, y, h, errp, stats[-1]), (capture(y), *stats)

    bshape = (n_members,) if n_members else ()
    errp0 = jnp.ones(bshape, dtype)
    zero = jnp.zeros(bshape, jnp.int32)
    is_first = jnp.arange(len(stop_times)) == 0  # etamx1 on the run's start
    (_, _, _, _, _), (traj, nstep, nacc, nrej, status) = jax.lax.scan(
        scan_body, (t0, y_loop0, h0, errp0, zero),
        (jnp.asarray(stop_times, dtype), is_first))

    if len(stops) != len(touts_np):
        nseg = len(touts_np)
        seg = jnp.asarray(seg_ids)
        nstep = jax.ops.segment_sum(nstep, seg, num_segments=nseg)
        nacc = jax.ops.segment_sum(nacc, seg, num_segments=nseg)
        nrej = jax.ops.segment_sum(nrej, seg, num_segments=nseg)
        status = jax.ops.segment_max(status, seg, num_segments=nseg)
        traj = traj[jnp.asarray(out_idx)]
    return traj, SolveStats(steps=nstep, accepted=nacc, rejected=nrej,
                            status=status)
