"""0-D ODE tools (P9 parity) tests."""

import os

import numpy as np
from scipy.integrate import solve_ivp

from crdmodel_tpu.models import get_model
from crdmodel_tpu.models.ode_tools import plot_model_ode, solve_model_ode


def test_backward_integration_lands_on_unstable_fp():
    # beta=0.4 is in the oscillatory window -> backward-time rule
    t, traj = solve_model_ode("goldbeter", 0.4)
    assert t[-1] < 0  # integrated backwards
    zs, ys = get_model("goldbeter").steady_state(0.4)
    np.testing.assert_allclose(traj[-1], [zs, ys], atol=1e-4)


def test_forward_integration_lands_on_stable_fp():
    t, traj = solve_model_ode("goldbeter", 0.85)
    assert t[-1] == 50.0
    zs, ys = get_model("goldbeter").steady_state(0.85)
    np.testing.assert_allclose(traj[-1], [zs, ys], atol=1e-6)


def test_trajectory_matches_scipy():
    from crdmodel_tpu.models import goldbeter as gb

    def rhs(t, y):
        Z, Y = y
        v2 = gb.VM2 * Z**2 / (gb.K2**2 + Z**2)
        v3 = gb.VM3 * Y**2 * Z**4 / ((gb.KR**2 + Y**2) * (gb.KA**4 + Z**4))
        return [gb.V0 + gb.V1 * 0.85 - v2 + v3 + gb.KF * Y - gb.K * Z,
                v2 - v3 - gb.KF * Y]

    t, traj = solve_model_ode("goldbeter", 0.85, t_final=2.0, n_out=20)
    sol = solve_ivp(rhs, (0, 2.0), [0.6, 1.2], t_eval=t[1:],
                    rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(traj[1:], sol.y.T, atol=1e-6)


def test_plot(tmp_path):
    p = plot_model_ode("goldbeter", 0.4, str(tmp_path / "ode.png"),
                       t_final=5.0, n_out=50)
    assert os.path.exists(p)
