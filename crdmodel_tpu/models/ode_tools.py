"""0-D model ODE tools (P9 equivalent: util/GoldbeterModel/SolveGoldbeterODE.py).

The reference shells out to a scipy BDF script to (a) find the Goldbeter
steady state (we compute it algebraically, models/goldbeter.py) and (b) plot
the Z/Y trajectories. This module reproduces the full script capability with
the framework's own integrator: integrate the 0-D kinetics from the
reference's initial condition (0.6, 1.2), backwards in time when beta lies in
the oscillatory window (landing on the unstable fixed point,
SolveGoldbeterODE.py:59-67), and render the two-panel trajectory figure.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from crdmodel_tpu.integrate.erk import integrate_to_outputs
from crdmodel_tpu.models.base import get_model
from crdmodel_tpu.models.goldbeter import OSC_BETA_MIN, OSC_BETA_MAX


def solve_model_ode(model_name: str, beta: float, y0=(0.6, 1.2),
                    t_final: Optional[float] = None, n_out: int = 500,
                    rtol: float = 1e-8, atol: float = 1e-10):
    """Integrate the 0-D kinetics; returns (t (n_out,), traj (n_out, nvars)).

    For goldbeter with beta in the oscillatory window the reference
    integrates backwards to t=-50 (unstable-FP hunt); reproduced via time
    reversal y' = -f(y).
    """
    model = get_model(model_name)
    backward = (model_name == "goldbeter"
                and OSC_BETA_MIN < beta < OSC_BETA_MAX)
    if t_final is None:
        t_final = 50.0
    sign = -1.0 if backward else 1.0

    def rhs(t, y, params):
        return sign * model.kinetics(y[:, None, None],
                                     params["b"])[:, 0, 0]

    touts = np.linspace(t_final / n_out, t_final, n_out)
    y0 = jnp.asarray(y0, dtype=jnp.float64 if jnp.zeros(
        ()).dtype == jnp.float64 else jnp.float32)
    traj, stats = integrate_to_outputs(
        rhs, y0, {"b": jnp.asarray(beta, y0.dtype)}, 0.0, touts,
        rtol=rtol, atol=atol, method="dopri54")
    if int(np.asarray(stats.status).max()) != 0:
        raise RuntimeError(f"0-D integration failed: "
                           f"{np.asarray(stats.status)}")
    t = sign * np.concatenate([[0.0], touts])
    full = np.concatenate([np.asarray(y0)[None], np.asarray(traj)], axis=0)
    return t, full


def plot_model_ode(model_name: str, beta: float, out_path: str, **kw) -> str:
    """The reference script's two-panel trajectory figure
    (SolveGoldbeterODE.py:96-108)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model = get_model(model_name)
    t, traj = solve_model_ode(model_name, beta, **kw)
    fig, axes = plt.subplots(model.nvars, 1, figsize=(7, 8), sharex=True)
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.plot(t, traj[:, i])
        ax.set_ylabel(model.var_names[i])
    np.atleast_1d(axes)[-1].set_xlabel("Time")
    fig.suptitle(f"{model_name} 0-D trajectories, beta={beta:g}")
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
