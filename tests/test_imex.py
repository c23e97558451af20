"""IMEX ARK3(2)4L[2]SA integrator (integrate/imex.py).

The reference never exercises SUNDIALS' IMEX mode (explicit-only ARKodeInit,
src/FHNmodel_torus.cpp:362); this is a framework capability beyond the
reference, so the oracles are mathematical: the published order conditions,
AD-vs-finite-difference Jacobians, scipy at tight tolerance, and the
framework's own verified explicit integrators.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rhs
from crdmodel_tpu.integrate import imex
from crdmodel_tpu.integrate.erk import integrate_to_outputs
from crdmodel_tpu.sim import output_times, simulate


def test_tableau_order_conditions():
    """ARK3(2)4L[2]SA: both tables consistent (row sums = c), 3rd order with
    the additive coupling conditions, embedded order exactly 2, and the
    implicit part L-stable (R(inf) = 0)."""
    ae, ai, b, bhat, c = imex.tableau_arrays()
    np.testing.assert_allclose(ae.sum(axis=1), c, atol=1e-15)
    np.testing.assert_allclose(ai.sum(axis=1), c, atol=1e-15)
    # order 3 (shared b, c: additive conditions reduce to these)
    assert abs(b.sum() - 1.0) < 1e-14
    assert abs(b @ c - 0.5) < 1e-14
    assert abs(b @ c**2 - 1.0 / 3.0) < 1e-14
    assert abs(b @ ae @ c - 1.0 / 6.0) < 1e-14
    assert abs(b @ ai @ c - 1.0 / 6.0) < 1e-14
    # embedded order 2 but NOT 3 (it must differ from b at O(h^3))
    assert abs(bhat.sum() - 1.0) < 1e-14
    assert abs(bhat @ c - 0.5) < 1e-14
    assert abs(bhat @ c**2 - 1.0 / 3.0) > 1e-3
    # ESDIRK with gamma diagonal; stiffly accurate (last row = b)
    np.testing.assert_allclose(np.diag(ai)[1:], imex.GAMMA, atol=1e-15)
    np.testing.assert_allclose(ai[-1], b, atol=1e-15)
    # L-stability: R(inf) = 1 - b^T A^{-1} 1 over the nonzero block
    r_inf = 1.0 - b[1:] @ np.linalg.solve(ai[1:, 1:], np.ones(3))
    assert abs(r_inf) < 1e-12


def test_pointwise_jacobian_matches_finite_differences():
    """AD per-point Jacobian of the goldbeter kinetics vs central FD."""
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=8,
                    surface_width=20, surface_length=40, beta=0.5,
                    dtype="float64")
    p = build_problem(cfg)
    _, f_im = make_rhs(cfg, p.model, p.geometry, jnp.float64, split=True)
    rng = np.random.default_rng(2)
    y = jnp.asarray(0.5 + rng.uniform(0.1, 1.0, p.y0.shape))
    t = jnp.asarray(0.3)
    jac = np.asarray(imex.pointwise_jacobian(f_im, t, y, p.params))
    eps = 1e-6
    for bvar in range(p.model.nvars):
        e = jnp.zeros_like(y).at[bvar].set(eps)
        fd = (np.asarray(f_im(t, y + e, p.params))
              - np.asarray(f_im(t, y - e, p.params))) / (2 * eps)
        np.testing.assert_allclose(jac[:, bvar], fd, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_solve_pointwise(n):
    rng = np.random.default_rng(n)
    m = rng.standard_normal((n, n, 5, 7)) + 3.0 * np.eye(n)[:, :, None, None]
    r = rng.standard_normal((n, 5, 7))
    x = np.asarray(imex.solve_pointwise(jnp.asarray(m), jnp.asarray(r)))
    # verify m @ x == r per point
    mx = np.einsum("ab...,b...->a...", m, x)
    np.testing.assert_allclose(mx, r, rtol=1e-10, atol=1e-10)


def test_convergence_order_three():
    """Fixed-h self-convergence on the semi-discrete FHN system: halving h
    must cut the error ~8x (order 3)."""
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=10,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.0, output_timestep=1, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    p = build_problem(cfg)
    f_ex, f_im = make_rhs(cfg, p.model, p.geometry, jnp.float64, split=True)
    step_err, _ = imex.make_imex_step_err(f_ex, f_im, cfg.rtol, cfg.atol,
                                          newton_iters=7)

    def run_fixed(nsteps, T=0.5):
        h = jnp.asarray(T / nsteps, jnp.float64)
        y = p.y0
        t = jnp.asarray(0.0, jnp.float64)
        for _ in range(nsteps):
            y, _, _ = step_err(t, y, h, p.params, ())
            t = t + h
        return np.asarray(y)

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(jnp.asarray(t), y, p.params)).ravel()

    ref = solve_ivp(rhs_flat, (0.0, 0.5),
                    np.asarray(p.y0, np.float64).ravel(),
                    method="RK45", rtol=1e-12, atol=1e-13).y[:, -1]
    errs = [np.max(np.abs(run_fixed(n).ravel() - ref)) for n in (8, 16, 32)]
    orders = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert np.all(orders > 2.5), (errs, orders)


def test_ark324_vs_scipy_oracle():
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=12,
                    surface_width=20, surface_length=40,
                    t_final=1.0, output_timestep=2, beta=0.85,
                    wave_length=0.1, wave_width=0.5, dtype="float64",
                    rtol=1e-7, atol=1e-10, method="ark324")
    res = simulate(cfg)
    assert res.ok
    p = res.problem

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(jnp.asarray(t), y, p.params)).ravel()

    touts = output_times(cfg)
    sol = solve_ivp(rhs_flat, (0.0, float(touts[-1])),
                    np.asarray(p.y0, np.float64).ravel(),
                    method="RK45", t_eval=touts, rtol=1e-9, atol=1e-12)
    assert sol.success
    want = sol.y.T.reshape((len(touts),) + p.y0.shape)
    np.testing.assert_allclose(np.asarray(res.trajectory[1:]), want,
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("model,surface,kwargs", [
    ("fhn", "torus", dict(vary_beta=1, beta_min=0.7, beta_max=1.7,
                          t_boundary=1.0)),
    ("goldbeter", "torus", dict(beta=0.5)),
    ("sir", "flat", dict(beta=3.0)),          # 3-var: 3x3 pointwise solve
])
def test_ark324_matches_bs32(model, surface, kwargs):
    """Full composition (freeze, varyBeta ramp, torus metric, 3-variable
    kinetics) agrees with the verified explicit path at tolerance."""
    base = dict(model=model, surface=surface, x_mesh=12,
                surface_width=20, surface_length=40,
                t_final=2.0, output_timestep=2, dtype="float64",
                rtol=1e-6, atol=1e-10, **kwargs)
    r1 = simulate(SimConfig(**base, method="bs32"))
    r2 = simulate(SimConfig(**base, method="ark324"))
    assert r1.ok and r2.ok
    np.testing.assert_allclose(np.asarray(r2.trajectory),
                               np.asarray(r1.trajectory),
                               rtol=0, atol=5e-4)


def test_sir_mass_invariant_under_ark324():
    """The exact total-mass invariant (pointwise-conserving kinetics +
    integral-conserving periodic diffusion) survives the implicit solve —
    a whole-pipeline oracle (models/sir.py, tests/test_sir.py)."""
    cfg = SimConfig(model="sir", surface="flat", x_mesh=12,
                    surface_width=20, surface_length=40, beta=3.0,
                    t_final=2.0, output_timestep=2, dtype="float64",
                    rtol=1e-7, atol=1e-10, method="ark324")
    res = simulate(cfg)
    assert res.ok
    total = np.asarray(res.trajectory).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(total, total[0], rtol=1e-7)


def test_step_advantage_on_stiff_kinetics():
    """On the excitable-regime Goldbeter system ark324 must take
    meaningfully fewer steps than the explicit method at equal tolerance."""
    base = dict(model="goldbeter", surface="flat", x_mesh=24,
                surface_width=20, surface_length=40,
                t_final=4.0, output_timestep=4, beta=0.85,
                wave_length=0.2, wave_width=0.5, dtype="float64",
                rtol=1e-5, atol=1e-10)
    s_exp = simulate(SimConfig(**base, method="bs32")).total_steps()
    s_imex = simulate(SimConfig(**base, method="ark324")).total_steps()
    assert s_imex < 0.75 * s_exp, (s_imex, s_exp)


def test_ark324_just_diffusion():
    """justDiffusion: the implicit part vanishes; the scheme degenerates to
    its explicit table and must still conserve mass on the flat surface."""
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=16,
                    surface_width=20, surface_length=40, beta=0.85,
                    t_final=2.0, output_timestep=2, just_diffusion=1,
                    dtype="float64", rtol=1e-8, atol=1e-12, method="ark324")
    res = simulate(cfg)
    assert res.ok
    z = res.field(0)
    mass = z.sum(axis=(1, 2))
    np.testing.assert_allclose(mass, mass[0], rtol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 1)])
def test_ark324_sharded_matches_single_device(mesh_shape):
    """The shard-local Newton solve (no halo in the implicit part) must
    reproduce the single-device run — SURVEY.md §4(d) applied to IMEX."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded
    cfg = SimConfig(model="goldbeter", surface="torus", x_mesh=16,
                    surface_width=20, surface_length=40, beta=0.85,
                    t_final=1.0, output_timestep=2, dtype="float64",
                    rtol=1e-6, atol=1e-10, method="ark324")
    res1 = simulate(cfg)
    assert res1.ok
    res8 = simulate_sharded(cfg, mesh=make_mesh(shape=mesh_shape))
    assert res8.ok
    np.testing.assert_allclose(np.asarray(res8.trajectory),
                               np.asarray(res1.trajectory),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(res8.stats.steps),
                                  np.asarray(res1.stats.steps))


def test_ark324_streaming_matches_batch():
    """The interval-streaming driver (sim.simulate_streaming) through the
    IMEX stepper must reproduce the one-dispatch batch run."""
    from crdmodel_tpu.sim import simulate_streaming
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=12,
                    surface_width=20, surface_length=40, beta=0.85,
                    t_final=1.0, output_timestep=2, t_boundary=0.4,
                    dtype="float64", rtol=1e-6, atol=1e-10, method="ark324")
    batch = simulate(cfg)
    stream = simulate_streaming(cfg)
    assert batch.ok and stream.ok
    np.testing.assert_allclose(np.asarray(stream.trajectory),
                               np.asarray(batch.trajectory),
                               rtol=1e-10, atol=1e-10)
    assert stream.total_steps() == batch.total_steps()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ark324_sharded_streaming_matches_batch():
    """Sharded per-interval dispatch (the production-scale driver) with the
    shard-local Newton solve."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = SimConfig(model="goldbeter", surface="torus", x_mesh=16,
                    surface_width=20, surface_length=40, beta=0.85,
                    t_final=1.0, output_timestep=2, dtype="float64",
                    rtol=1e-6, atol=1e-10, method="ark324")
    batch = simulate(cfg)
    stream = simulate_sharded_streaming(cfg, mesh=make_mesh(shape=(2, 4)))
    assert batch.ok and stream.ok
    np.testing.assert_allclose(np.asarray(stream.trajectory),
                               np.asarray(batch.trajectory),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("model,surface", [
    ("fhn", "torus"), ("goldbeter", "torus"), ("sir", "flat"),
])
def test_fused_imex_kernel_interpreter_matches_xla(model, surface):
    """ops/pallas_imex.py through the Pallas interpreter vs the XLA IMEX
    step at identical (t, y, h) — the fused kernel mirrors
    make_imex_step_err line by line."""
    from crdmodel_tpu.ops import pallas_imex
    beta = {"fhn": 1.25, "goldbeter": 0.5, "sir": 3.0}[model]
    cfg = SimConfig(model=model, surface=surface, x_mesh=16,
                    surface_width=20, surface_length=80,
                    t_boundary=1.0, t_final=2.0, beta=beta,
                    dtype="float32", rtol=1e-5, atol=1e-8)
    p = build_problem(cfg)
    assert pallas_imex.is_imex_supported(p, jnp.float32)
    f_ex, f_im = make_rhs(cfg, p.model, p.geometry, jnp.float32, split=True)
    se_xla, _ = imex.make_imex_step_err(f_ex, f_im, cfg.rtol, cfg.atol)
    fused = pallas_imex.build_fused_imex_step(p, jnp.float32,
                                              interpret=True)
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.asarray(p.y0)
                    + 0.05 * rng.standard_normal(p.y0.shape), jnp.float32)
    # (t, seg_end) pairs on each side of tBoundary=1.0 — segments never
    # straddle the discontinuity (integrate/erk.py breakpoints), which is
    # what licenses the kernel's per-segment freeze scalar
    for t_val, seg_end in ((0.3, 0.8), (1.3, 2.0)):
        params = {**p.params, "_seg_end": jnp.asarray(seg_end, jnp.float32)}
        t = jnp.asarray(t_val, jnp.float32)
        h = jnp.asarray(0.01, jnp.float32)
        y1, ss1, _ = jax.jit(se_xla)(t, y, h, params, ())
        y2p, ss2 = fused.step_err(t, fused.pad(y), h, params)
        np.testing.assert_allclose(np.asarray(fused.unpad(y2p)),
                                   np.asarray(y1), rtol=0, atol=5e-7)
        np.testing.assert_allclose(float(ss2), float(ss1), rtol=1e-4)
