"""Model kinetics and steady-state tests (oracles from SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp
from scipy.optimize import brentq

from crdmodel_tpu.models import get_model
from crdmodel_tpu.models import goldbeter as gb


def test_fhn_fixed_point_is_equilibrium():
    model = get_model("fhn")
    for beta in [0.5, 1.0, 1.25, 2.0]:
        us, vs = model.steady_state(beta)
        state = jnp.asarray([[[us]], [[vs]]], dtype=jnp.float64)
        dot = model.kinetics(state, beta)
        np.testing.assert_allclose(np.asarray(dot), 0.0, atol=1e-12)


def test_fhn_analytic_values():
    model = get_model("fhn")
    us, vs = model.steady_state(1.25)
    assert us == -1.25
    assert np.isclose(vs, 1.25 ** 3 - 3 * 1.25)


@pytest.mark.parametrize("beta", [0.1, 0.289, 0.4, 0.6, 0.774, 0.9])
def test_goldbeter_steady_state_is_equilibrium(beta):
    model = get_model("goldbeter")
    zs, ys = model.steady_state(beta)
    state = jnp.asarray([[[zs]], [[ys]]], dtype=jnp.float64)
    dot = np.asarray(model.kinetics(state, beta))
    np.testing.assert_allclose(dot, 0.0, atol=1e-8)


def test_goldbeter_steady_state_vs_scipy_root():
    """Independent root solve: Zs=(v0+v1 b)/k exactly; Ys via brentq."""
    for beta in [0.2, 0.4, 0.85]:
        zs, ys = gb.steady_state(beta)
        zs_exact = (gb.V0 + gb.V1 * beta) / gb.K
        assert np.isclose(zs, zs_exact, rtol=1e-14)
        g = lambda Y: float(gb._np_v2(zs_exact) - gb._np_v3(zs_exact, Y) - gb.KF * Y)
        ys_ref = brentq(g, 0.0, gb._np_v2(zs_exact) / gb.KF + 1.0, xtol=1e-14)
        assert np.isclose(ys, ys_ref, atol=1e-10)


def test_goldbeter_steady_state_vs_reference_integration():
    """Reproduce the reference's popen'd bootstrap
    (util/GoldbeterModel/SolveGoldbeterODE.py): BDF from (0.6,1.2), backward
    in time when 0.289<beta<0.774, and check it lands on our algebraic FP."""

    def rhs(t, y, beta):
        Z, Y = y
        v2 = gb.VM2 * Z**2 / (gb.K2**2 + Z**2)
        v3 = gb.VM3 * Y**2 * Z**4 / ((gb.KR**2 + Y**2) * (gb.KA**4 + Z**4))
        return [gb.V0 + gb.V1 * beta - v2 + v3 + gb.KF * Y - gb.K * Z,
                v2 - v3 - gb.KF * Y]

    for beta, backward in [(0.4, True), (0.85, False)]:
        t_end = -50.0 if backward else 50.0
        sol = solve_ivp(rhs, (0.0, t_end), [0.6, 1.2], method="BDF",
                        args=(beta,), rtol=1e-10, atol=1e-12)
        assert sol.success
        zs, ys = gb.steady_state(beta)
        np.testing.assert_allclose(sol.y[:, -1], [zs, ys], rtol=2e-4, atol=2e-4)


def test_goldbeter_oscillatory_window():
    """beta inside (0.28895, 0.77427) -> FP unstable (oscillations);
    outside -> stable (data/GoldbeterModelArgs.ini:25)."""

    def jacobian_eigs(beta):
        zs, ys = gb.steady_state(beta)
        eps = 1e-7

        def f(Z, Y):
            v2 = gb._np_v2(Z)
            v3 = gb._np_v3(Z, Y)
            return np.array([gb.V0 + gb.V1 * beta - v2 + v3 + gb.KF * Y - gb.K * Z,
                             v2 - v3 - gb.KF * Y])

        J = np.zeros((2, 2))
        J[:, 0] = (f(zs + eps, ys) - f(zs - eps, ys)) / (2 * eps)
        J[:, 1] = (f(zs, ys + eps) - f(zs, ys - eps)) / (2 * eps)
        return np.linalg.eigvals(J)

    assert np.max(np.real(jacobian_eigs(0.4))) > 0     # unstable -> oscillatory
    assert np.max(np.real(jacobian_eigs(0.2))) < 0     # stable
    assert np.max(np.real(jacobian_eigs(0.9))) < 0     # stable
