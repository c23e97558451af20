"""Integrator tests: known solutions + tolerance behaviour."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.integrate.erk import (
    TABLEAUS, integrate_to_outputs, make_erk_step, wrms_norm,
)


def test_tableau_consistency():
    for name, tab in TABLEAUS.items():
        # row-sum condition c_i = sum_j a_ij and order-1 condition sum b = 1
        np.testing.assert_allclose(tab.a.sum(axis=1), tab.c, atol=1e-14)
        np.testing.assert_allclose(tab.b.sum(), 1.0, atol=1e-14)
        np.testing.assert_allclose(tab.bhat.sum(), 1.0, atol=1e-12)
        assert np.allclose(np.triu(tab.a), 0.0), f"{name} not explicit"


@pytest.mark.parametrize("method", ["bs32", "zonneveld43", "dopri54"])
def test_exponential_decay(method):
    rhs = lambda t, y, p: -y
    y0 = jnp.ones((1,), dtype=jnp.float64)
    touts = np.linspace(0.25, 2.0, 8)
    traj, stats = integrate_to_outputs(rhs, y0, {}, 0.0, touts,
                                       rtol=1e-8, atol=1e-12, method=method)
    assert np.all(np.asarray(stats.status) == 0)
    np.testing.assert_allclose(np.asarray(traj)[:, 0], np.exp(-touts),
                               rtol=1e-6)


def test_oscillator_order():
    """Harmonic oscillator: tighter rtol must give smaller error."""
    rhs = lambda t, y, p: jnp.stack([y[1], -y[0]])
    y0 = jnp.asarray([1.0, 0.0], dtype=jnp.float64)
    touts = np.array([2 * np.pi])
    errs = []
    for rtol in (1e-4, 1e-6, 1e-8):
        traj, stats = integrate_to_outputs(rhs, y0, {}, 0.0, touts,
                                           rtol=rtol, atol=1e-12, method="bs32")
        assert np.all(np.asarray(stats.status) == 0)
        errs.append(abs(float(traj[0, 0]) - 1.0))
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 1e-6


def test_time_dependent_rhs():
    """y' = cos(t), y(0)=0 -> y = sin(t): exercises the c_i*h stage times."""
    rhs = lambda t, y, p: jnp.cos(t) * jnp.ones_like(y)
    y0 = jnp.zeros((1,), dtype=jnp.float64)
    touts = np.array([0.5, 1.0, 1.5])
    traj, _ = integrate_to_outputs(rhs, y0, {}, 0.0, touts,
                                   rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(traj)[:, 0], np.sin(touts), atol=1e-7)


def test_params_threading():
    rhs = lambda t, y, p: -p["k"] * y
    y0 = jnp.ones((1,), dtype=jnp.float64)
    traj, _ = integrate_to_outputs(rhs, y0, {"k": jnp.asarray(2.0)}, 0.0,
                                   np.array([1.0]), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(float(traj[0, 0]), np.exp(-2.0), rtol=1e-6)


def test_max_steps_flag():
    """A stiff-ish problem with absurdly low max_steps must flag status=1
    (the reference's 200000-step cap, src/FHNmodel_torus.cpp:372)."""
    rhs = lambda t, y, p: -1000.0 * (y - jnp.sin(t))
    y0 = jnp.zeros((1,), dtype=jnp.float64)
    traj, stats = integrate_to_outputs(rhs, y0, {}, 0.0, np.array([10.0]),
                                       rtol=1e-8, atol=1e-12, max_steps=5)
    assert int(stats.status[0]) == 1


def test_wrms_norm_definition():
    e = jnp.asarray([1.0, -2.0], dtype=jnp.float64)
    y = jnp.asarray([10.0, 100.0], dtype=jnp.float64)
    rtol, atol = 1e-2, 1e-3
    w = 1.0 / (rtol * np.abs(np.asarray(y)) + atol)
    want = np.sqrt(np.mean((np.asarray(e) * w) ** 2))
    got = float(wrms_norm(e, y, rtol, atol))
    assert np.isclose(got, want, rtol=1e-14)


def test_step_matches_scipy_rk45_single_step():
    """One DOPRI54 step must match the textbook update (scipy RK45 uses the
    same tableau)."""
    import scipy.integrate as si

    def f(t, y):
        return np.array([y[1], -np.sin(y[0])])

    rhs = lambda t, y, p: jnp.stack([y[1], -jnp.sin(y[0])])
    step = make_erk_step(TABLEAUS["dopri54"], rhs)
    y0 = jnp.asarray([0.3, -0.2], dtype=jnp.float64)
    h = 0.05
    y1, _ = step(jnp.asarray(0.0), y0, jnp.asarray(h), {})

    # manual tableau evaluation in numpy
    tab = TABLEAUS["dopri54"]
    ks = []
    y0n = np.asarray(y0)
    for i in range(tab.stages):
        yi = y0n + h * sum(tab.a[i, j] * ks[j] for j in range(i))
        ks.append(f(tab.c[i] * h, yi))
    want = y0n + h * sum(tab.b[i] * ks[i] for i in range(tab.stages))
    np.testing.assert_allclose(np.asarray(y1), want, rtol=1e-14)


def test_jit_and_fwd_diff_compatible():
    """The whole driver is jittable and forward-mode differentiable w.r.t.
    params (a capability the reference cannot express). Reverse mode through
    lax.while_loop is unsupported by JAX; use jacfwd."""
    rhs = lambda t, y, p: -p["k"] * y

    def loss(k):
        traj, _ = integrate_to_outputs(rhs, jnp.ones((1,), jnp.float64),
                                       {"k": k}, 0.0, np.array([1.0]),
                                       rtol=1e-6, atol=1e-10)
        return traj[0, 0]

    g = jax.jit(jax.jacfwd(loss))(jnp.asarray(1.0, jnp.float64))
    # d/dk exp(-k) at k=1 = -exp(-1)
    np.testing.assert_allclose(float(g), -np.exp(-1.0), rtol=1e-3)


def test_h_limit_fn_caps_steps_and_lands_on_tout():
    """h_limit_fn (the fused RKC kernel's stability-cap hook) clamps every
    attempted step; the run still lands exactly on each output time and the
    solution stays correct."""
    rhs = lambda t, y, p: -y
    y0 = jnp.ones((4,), dtype=jnp.float64)
    touts = np.array([0.5, 1.0])

    traj_free, stats_free = integrate_to_outputs(
        rhs, y0, {}, 0.0, touts, rtol=1e-6, atol=1e-9)
    cap = 0.011
    traj_cap, stats_cap = integrate_to_outputs(
        rhs, y0, {}, 0.0, touts, rtol=1e-6, atol=1e-9,
        h_limit_fn=lambda t, y, p: jnp.asarray(cap, y.dtype))

    # capped run takes at least ceil(1.0/cap) steps; uncapped takes fewer
    assert int(np.sum(np.asarray(stats_cap.steps))) >= int(np.ceil(1.0 / cap))
    assert int(np.sum(np.asarray(stats_free.steps))) < \
        int(np.sum(np.asarray(stats_cap.steps)))
    # both land exactly on tout: solution equals exp(-t) to tolerance
    for traj in (traj_free, traj_cap):
        np.testing.assert_allclose(np.asarray(traj[:, 0]),
                                   np.exp(-touts), rtol=1e-5)
    assert np.all(np.asarray(stats_cap.status) == 0)


def test_h_limit_fn_state_dependent():
    """A state-dependent cap (like a spectral-radius bound) is re-evaluated
    each attempt."""
    rhs = lambda t, y, p: -y
    y0 = jnp.ones((4,), dtype=jnp.float64)
    touts = np.array([1.0])

    def cap(t, y, p):
        # loosens as the solution decays: 0.01 at |y|=1 up to 0.1
        return 0.01 / jnp.clip(jnp.max(jnp.abs(y)), 0.1, 1.0)

    traj, stats = integrate_to_outputs(
        rhs, y0, {}, 0.0, touts, rtol=1e-6, atol=1e-9, h_limit_fn=cap)
    assert np.all(np.asarray(stats.status) == 0)
    np.testing.assert_allclose(np.asarray(traj[0, 0]), np.exp(-1.0),
                               rtol=1e-5)
    # stricter early cap means more steps than a constant loose cap
    _, stats_loose = integrate_to_outputs(
        rhs, y0, {}, 0.0, touts, rtol=1e-6, atol=1e-9,
        h_limit_fn=lambda t, y, p: jnp.asarray(0.1, y.dtype))
    assert int(np.sum(np.asarray(stats.steps))) > \
        int(np.sum(np.asarray(stats_loose.steps)))


def test_merge_stops_keeps_every_breakpoint():
    """Regression (round 4): merge_stops compared each breakpoint against
    the previously APPENDED stop instead of the run's end, silently
    dropping every breakpoint after the first — fatal for multi-edge
    forcing pulse trains (segments straddled the dropped edges and the
    segment gate integrated the pulse as OFF)."""
    from crdmodel_tpu.integrate.erk import merge_stops
    touts = np.arange(5.0, 125.0, 5.0)
    st, io = merge_stops(touts, [1.0, 2.0, 58.0, 59.0])
    for bp in (1.0, 2.0, 58.0, 59.0):
        assert np.any(np.isclose(st, bp)), bp
    assert len(st) == len(touts) + 4
    assert not io[np.isclose(st, 2.0)].any()
    # coinciding stop stays output-only; out-of-range breakpoints dropped
    st2, io2 = merge_stops([1.0, 2.0], [1.0, 0.0, 2.0, 3.0])
    assert list(st2) == [1.0, 2.0] and io2.all()
