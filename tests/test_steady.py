"""Newton-Krylov steady states + Arnoldi stability (crdmodel_tpu/steady.py).

Oracles: analytic uniform fixed points; an exact circulant-lattice
cross-check of the matrix-free Arnoldi eigensolver against the 0-D
Jacobian (for a homogeneous state on the flat periodic grid the discrete
diffusion operator is circulant, so the full 2-D spectrum is exactly the
union over lattice modes (m_x, m_y) of eig(J - (kx2_eff + ky2_eff) D) with
k2_eff = (2 - 2 cos(2 pi m / n))/dx^2); and direct stationarity (simulate
from the polished state: it must not move).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu import simulate
from crdmodel_tpu.steady import (is_linearly_stable, leading_eigenvalues,
                                 solve_steady_state)
from crdmodel_tpu.models import stability as st


def fhn_cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=32, surface_width=20.0,
                surface_length=40.0, beta=1.25, dtype="float64")
    base.update(kw)
    return SimConfig(**base)


def brusselator_cfg(**kw):
    base = dict(model="brusselator", surface="flat", x_mesh=48,
                surface_width=40.0, surface_length=40.0, diffusion=0.2,
                beta=1.9, wave_length=0.2, wave_width=0.3, t_final=400.0,
                output_timestep=4, dtype="float64", rtol=1e-6, atol=1e-9)
    base.update(kw)
    return SimConfig(**base)


class TestNewtonKrylov:
    def test_uniform_from_perturbation_matches_analytic(self):
        prob = build_problem(fhn_cfg())
        rng = np.random.default_rng(0)
        y0 = prob.y0 + 0.05 * jnp.asarray(rng.standard_normal(prob.y0.shape))
        y, info = solve_steady_state(prob, y0=y0)
        assert info["converged"], info
        us, vs = prob.steady_state
        np.testing.assert_allclose(np.asarray(y[0]), us, atol=1e-7)
        np.testing.assert_allclose(np.asarray(y[1]), vs, atol=1e-7)

    def test_goldbeter_uniform(self):
        cfg = fhn_cfg(model="goldbeter", beta=0.85)  # outside osc window
        prob = build_problem(cfg)
        y0 = jnp.broadcast_to(
            jnp.asarray(prob.steady_state)[:, None, None] * 1.05,
            prob.y0.shape)
        y, info = solve_steady_state(prob, y0=y0)
        assert info["converged"]
        np.testing.assert_allclose(np.asarray(y[0]), prob.steady_state[0],
                                   atol=1e-7)

    def test_residual_history_decreases(self):
        prob = build_problem(fhn_cfg())
        y0 = prob.y0 + 0.05
        _, info = solve_steady_state(prob, y0=y0)
        h = info["history"]
        assert all(b < a for a, b in zip(h, h[1:]))

    def test_forcing_rejected(self):
        prob = build_problem(fhn_cfg(surface="flat"),
                             forcing=lambda t, y, p: jnp.zeros_like(y))
        with pytest.raises(ValueError, match="forcing"):
            solve_steady_state(prob)


class TestPatternPolish:
    @pytest.fixture(scope="class")
    def polished(self):
        cfg = brusselator_cfg()
        prob = build_problem(cfg)
        res = simulate(cfg, problem=prob)
        assert res.ok
        y, info = solve_steady_state(prob, y0=res.trajectory[-1], tol=1e-10)
        return cfg, prob, y, info

    def test_converges_to_nontrivial_pattern(self, polished):
        cfg, prob, y, info = polished
        assert info["converged"], info
        assert info["residual_rms"] < 1e-10
        # a real Turing pattern, not the homogeneous state
        assert float(jnp.std(y[0])) > 0.3

    def test_polished_state_is_stationary_under_simulation(self, polished):
        """The decisive check: simulate from the polished state — it must
        not move (beyond integrator tolerance over a short horizon)."""
        cfg, prob, y, info = polished
        cfg2 = dataclasses.replace(cfg, t_final=2.0, output_timestep=2)
        prob2 = dataclasses.replace(build_problem(cfg2), y0=y)
        res = simulate(cfg2, problem=prob2)
        assert res.ok
        drift = float(jnp.max(jnp.abs(res.trajectory[-1] - y)))
        assert drift < 1e-6, drift


class TestArnoldi:
    def test_matches_circulant_lattice_spectrum(self):
        """Exact oracle: homogeneous state on the flat periodic grid. The
        discrete diffusion operator is circulant, so the leading eigenvalue
        of the full (2*ny*nx) Jacobian equals the max over lattice modes of
        max Re eig(J0 - (kx2_eff + ky2_eff) D)."""
        cfg = brusselator_cfg(x_mesh=24)
        prob = build_problem(cfg)
        y = jnp.broadcast_to(
            jnp.asarray(prob.steady_state, dtype=jnp.float64)[:, None, None],
            prob.y0.shape)
        lead = leading_eigenvalues(prob, y, k=4)

        J0 = st.kinetics_jacobian("brusselator", prob.steady_state, cfg.beta)
        D = st.diffusion_matrix("brusselator", cfg.diffusion)
        nx, ny = cfg.nx, cfg.ny
        dx, dy = cfg.dx, cfg.dy
        kx2 = (2.0 - 2.0 * np.cos(2 * np.pi * np.arange(nx) / nx)) / dx ** 2
        ky2 = (2.0 - 2.0 * np.cos(2 * np.pi * np.arange(ny) / ny)) / dy ** 2
        best = -np.inf
        for a in kx2:
            lam = np.array([np.max(np.real(np.linalg.eigvals(
                J0 - (a + b) * D))) for b in ky2])
            best = max(best, float(np.max(lam)))
        assert abs(float(np.real(lead[0])) - best) < 1e-6, (lead[0], best)

    def test_uniform_stability_classification(self):
        # fhn at beta=1.25: homogeneous state stable (and no Turing band)
        prob = build_problem(fhn_cfg(surface="flat"))
        y = jnp.broadcast_to(
            jnp.asarray(prob.steady_state, dtype=jnp.float64)[:, None, None],
            prob.y0.shape)
        assert is_linearly_stable(prob, y)
        # brusselator at b=1.9 with D_v=8D_u: Turing-unstable uniform state
        prob2 = build_problem(brusselator_cfg(x_mesh=24))
        y2 = jnp.broadcast_to(
            jnp.asarray(prob2.steady_state,
                        dtype=jnp.float64)[:, None, None], prob2.y0.shape)
        assert not is_linearly_stable(prob2, y2)
