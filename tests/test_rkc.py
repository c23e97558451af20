"""RKC2 stabilized integrator tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem, make_rho_bound
from crdmodel_tpu.integrate.erk import integrate_to_outputs
from crdmodel_tpu.integrate.rkc import choose_stages, make_rkc2_step_err
from crdmodel_tpu.sim import simulate


def test_stage_selection():
    # h*rho = 0 -> minimum stages; large h*rho -> s ~ sqrt(h rho / 0.65)
    assert int(choose_stages(jnp.asarray(1e-6), jnp.asarray(1.0))) >= 2
    s = int(choose_stages(jnp.asarray(1.0), jnp.asarray(1000.0)))
    assert 38 <= s <= 45  # sqrt(1000/0.65) ~ 39.2


def test_rkc_prothero_robinson():
    """Stiff relaxation to a smooth manifold (non-autonomous: exercises the
    RKC stage times): accuracy within tolerance, no blow-up."""
    lam = 2000.0
    rhs = lambda t, y, p: -lam * (y - jnp.cos(t)) - jnp.sin(t)
    rho = lambda t, y, p: jnp.asarray(lam, y.dtype)
    y0 = jnp.zeros((4,), jnp.float64)
    touts = np.array([1.0, 2.0])
    traj, stats = integrate_to_outputs(
        rhs, y0, {}, 0.0, touts, rtol=1e-5, atol=1e-8, method="rkc2",
        rho_fn=rho)
    assert int(np.asarray(stats.status).max()) == 0
    assert abs(float(traj[-1, 0]) - np.cos(2.0)) < 1e-4
    assert int(np.sum(np.asarray(stats.steps))) < 4000


def test_rkc_heat_equation_vs_bs32_stability_limited():
    """justDiffusion heat mode on a fine grid at production tolerance: the
    explicit method is diffusion-CFL limited while rkc2 steps at accuracy —
    measured 29 vs 154 steps at these settings."""
    base = dict(model="goldbeter", surface="flat", x_mesh=400,
                surface_width=20, surface_length=40, just_diffusion=1,
                t_final=1.0, output_timestep=1, dtype="float64",
                rtol=1e-4, atol=1e-7)
    r_bs = simulate(SimConfig(**base, method="bs32"))
    r_rkc = simulate(SimConfig(**base, method="rkc2"))
    assert r_bs.ok and r_rkc.ok
    np.testing.assert_allclose(np.asarray(r_rkc.trajectory),
                               np.asarray(r_bs.trajectory),
                               rtol=5e-3, atol=5e-3)
    assert r_rkc.total_steps() < 0.4 * r_bs.total_steps(), (
        r_rkc.total_steps(), r_bs.total_steps())


def test_rkc_fhn_reaction_diffusion_vs_scipy():
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=20,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.5, output_timestep=2, method="rkc2",
                    dtype="float64", rtol=1e-6, atol=1e-10)
    res = simulate(cfg)
    assert res.ok
    p = res.problem

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(jnp.asarray(t), y, p.params),
                          dtype=np.float64).ravel()

    sol = solve_ivp(rhs_flat, (0.0, 1.5),
                    np.asarray(p.y0, dtype=np.float64).ravel(),
                    method="RK45", t_eval=res.touts[1:], rtol=1e-9,
                    atol=1e-12)
    want = sol.y.T.reshape((2,) + p.y0.shape)
    np.testing.assert_allclose(np.asarray(res.trajectory[1:]), want,
                               atol=2e-4)


def test_rho_bound_dominates_numeric_jacobian():
    """The analytic Gershgorin bound must exceed the true spectral radius of
    the full RHS Jacobian (sampled numerically on a tiny grid)."""
    cfg = SimConfig(model="goldbeter", surface="torus", x_mesh=8,
                    surface_width=20, surface_length=40, beta=0.4,
                    dtype="float64")
    p = build_problem(cfg)
    rho_fn = make_rho_bound(cfg, p.model, p.geometry, jnp.float64)
    rng = np.random.default_rng(0)
    y = jnp.asarray(0.2 + rng.random(p.y0.shape))
    rho = float(rho_fn(jnp.asarray(0.0), y, p.params))

    f = lambda yf: np.asarray(
        p.rhs(jnp.asarray(0.0), jnp.asarray(yf.reshape(p.y0.shape)),
              p.params)).ravel()
    y0 = np.asarray(y).ravel()
    n = y0.size
    J = np.zeros((n, n))
    f0 = f(y0)
    eps = 1e-7
    for i in range(n):
        dy = y0.copy()
        dy[i] += eps
        J[:, i] = (f(dy) - f0) / eps
    lam_max = np.max(np.abs(np.linalg.eigvals(J)))
    assert rho >= 0.95 * lam_max, (rho, lam_max)


def test_rkc_streaming():
    from crdmodel_tpu.sim import simulate_streaming
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=16,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.0, output_timestep=2, method="rkc2",
                    dtype="float64", rtol=1e-6, atol=1e-10)
    res = simulate_streaming(cfg)
    assert res.ok


def test_fused_rkc_variant_plan():
    """Multi-strip wrapped-row DMAs need strip depth >= halo P; grids
    whose largest admissible strip divisor is shallower than P=24 used to
    fall back to the XLA path entirely (review finding: ny=1616 picks
    S=16 < 24 with 101 strips) — the shallow P=8 variant now covers them
    with the stage count capped at 7 (h_limit follows s_cap)."""
    import jax.numpy as jnp
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.ops import pallas_rkc
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=404,
                    surface_width=20, surface_length=80,
                    beta=1.25, dtype="float32", rtol=1e-5, atol=1e-8,
                    method="rkc2")
    p = build_problem(cfg)
    assert cfg.ny == 1616
    plan = pallas_rkc.variant_plan(cfg.ny, cfg.nx, p.model.nvars)
    assert plan == [(16, 16)]     # P=24 needs S>=24; 1616 tops out at S=16
    assert pallas_rkc.is_rkc_supported(p, jnp.float32)
    # a clean power-of-two grid qualifies at full depth
    cfg2 = SimConfig(model="fhn", surface="torus", x_mesh=256,
                     surface_width=20, surface_length=80,
                     beta=1.25, dtype="float32", rtol=1e-5, atol=1e-8,
                     method="rkc2")
    p2 = build_problem(cfg2)
    assert pallas_rkc.is_rkc_supported(p2, jnp.float32)
    assert pallas_rkc.variant_plan(cfg2.ny, cfg2.nx, 2)[0][0] == pallas_rkc.P_RKC
    # ultra-wide rows where even the S=8 floor overruns VMEM stay XLA
    assert pallas_rkc.variant_plan(5000, 20000, 2) == []


def test_static_stage_tables_match_recurrence():
    """The build-time f64 coefficient tables (pallas_rkc.py::
    static_stage_tables) must equal the in-jit recurrence
    (rkc_stage_coeffs) for every stage count the kernels can request."""
    import jax.numpy as jnp
    from crdmodel_tpu.ops import pallas_rkc
    mu1_tab, ctab_tab = pallas_rkc.static_stage_tables(23, jnp.float64)
    for s in (2, 3, 7, 15, 23):
        mu1, ctab = pallas_rkc.rkc_stage_coeffs(jnp.asarray(s, jnp.int32),
                                                jnp.float64)
        np.testing.assert_allclose(float(mu1_tab[s]), float(mu1),
                                   rtol=1e-13)
        np.testing.assert_allclose(np.asarray(ctab_tab[s]),
                                   np.asarray(ctab), rtol=1e-12, atol=1e-15)


def test_fused_rkc_column_blocked_matches_xla():
    """The column-blocked layout (pallas_rkc.py::choose_blocking nb>1):
    pad/unpad roundtrip, and one fused step — through BOTH the deep and
    shallow blocked variants — against the XLA stepper. A small VMEM
    budget makes nb=1 top out at P=16 so blocking engages on a small
    grid; the cross-block halo refresh is what the equivalence check
    actually exercises (every interior column within P_RKC of a block
    edge reads neighbour-block data)."""
    from crdmodel_tpu.core.problem import build_problem, make_rhs
    from crdmodel_tpu.ops import pallas_rkc

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=256,
                    surface_width=20, surface_length=20,
                    beta=1.25, t_boundary=1.0, t_final=2.0,
                    dtype="float32", rtol=1e-5, atol=1e-8, method="rkc2")
    p = build_problem(cfg)
    old_budget = pallas_rkc.VMEM_BUDGET
    pallas_rkc.VMEM_BUDGET = 1536 * 1024
    try:
        nb, plan = pallas_rkc.choose_blocking(cfg.ny, cfg.nx,
                                              p.model.nvars)
        assert nb == 2 and plan[0][0] == pallas_rkc.P_RKC and len(plan) == 2
        fused = pallas_rkc.build_fused_rkc_step(p, jnp.float32,
                                                interpret=True)
    finally:
        pallas_rkc.VMEM_BUDGET = old_budget

    rng = np.random.default_rng(2)
    y = jnp.asarray(np.asarray(p.y0)
                    + 0.05 * rng.standard_normal(p.y0.shape), jnp.float32)
    yp = fused.pad(y)
    assert yp.shape[1] == 2                   # (nvars, nb, ny, Wp)
    np.testing.assert_array_equal(np.asarray(fused.unpad(yp)),
                                  np.asarray(y))

    rho_fn = make_rho_bound(cfg, p.model, p.geometry, jnp.float32)
    rhs = make_rhs(cfg, p.model, p.geometry, jnp.float32)
    step_xla, init_carry = make_rkc2_step_err(rhs, rho_fn, cfg.rtol,
                                              cfg.atol)
    params = {**p.params, "_seg_end": jnp.asarray(0.8, jnp.float32)}
    t = jnp.asarray(0.3, jnp.float32)
    rho = float(rho_fn(t, y, params))
    for h_val, branch in ((15.0 / rho, "shallow"), (200.0 / rho, "deep")):
        h = jnp.asarray(h_val, jnp.float32)
        s = int(choose_stages(h, jnp.asarray(rho, jnp.float32)))
        assert (s <= 7) == (branch == "shallow"), (s, branch)
        f0 = init_carry(t, y, params)
        y1, ss1, _ = jax.jit(step_xla)(t, y, h, params, f0)
        y2p, ss2, _ = fused.step_err(t, yp, h, params)
        np.testing.assert_allclose(np.asarray(fused.unpad(y2p)),
                                   np.asarray(y1), rtol=0, atol=1e-4)
        np.testing.assert_allclose(float(ss2), float(ss1), rtol=1e-3)


def test_fused_rkc_halo_variants_match_xla():
    """Both halo-depth variants of the fused RKC kernel (deep P=24 and
    shallow P=8, ops/pallas_rkc.py::variant_plan) against the XLA stepper
    at identical (t, y, h), through the Pallas interpreter. A small VMEM
    budget forces the two-variant plan on a small grid; h is chosen so the
    stage count lands in each variant's range (s <= 7 selects shallow)."""
    from crdmodel_tpu.core.problem import build_problem, make_rhs
    from crdmodel_tpu.ops import pallas_rkc

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=64,
                    surface_width=20, surface_length=20,
                    beta=1.25, t_boundary=1.0, t_final=2.0,
                    dtype="float32", rtol=1e-5, atol=1e-8, method="rkc2")
    p = build_problem(cfg)
    old_budget = pallas_rkc.VMEM_BUDGET
    pallas_rkc.VMEM_BUDGET = 768 * 1024
    try:
        plan = pallas_rkc.variant_plan(cfg.ny, cfg.nx, p.model.nvars)
        assert len(plan) == 2 and plan[0][0] == pallas_rkc.P_RKC
        fused = pallas_rkc.build_fused_rkc_step(p, jnp.float32,
                                                interpret=True)
    finally:
        pallas_rkc.VMEM_BUDGET = old_budget

    rho_fn = make_rho_bound(cfg, p.model, p.geometry, jnp.float32)
    rhs = make_rhs(cfg, p.model, p.geometry, jnp.float32)
    step_xla, init_carry = make_rkc2_step_err(rhs, rho_fn, cfg.rtol,
                                              cfg.atol)
    rng = np.random.default_rng(1)
    y = jnp.asarray(np.asarray(p.y0)
                    + 0.05 * rng.standard_normal(p.y0.shape), jnp.float32)
    params = {**p.params, "_seg_end": jnp.asarray(0.8, jnp.float32)}
    t = jnp.asarray(0.3, jnp.float32)
    rho = float(rho_fn(t, y, params))
    for h_val, branch in ((20.0 / rho, "shallow"), (250.0 / rho, "deep")):
        h = jnp.asarray(h_val, jnp.float32)
        s = int(choose_stages(h, jnp.asarray(rho, jnp.float32)))
        assert (s <= 7) == (branch == "shallow"), (s, branch)
        f0 = init_carry(t, y, params)
        y1, ss1, _ = jax.jit(step_xla)(t, y, h, params, f0)
        y2p, ss2, _ = fused.step_err(t, fused.pad(y), h, params)
        # f32 accumulation-order drift across the Chebyshev recurrence:
        # measured 5e-6 at s=7, 3.1e-5 at s=21 (same domain as the shard
        # kernels' documented fused-vs-XLA drift); err sums agree ~1e-6 rel
        np.testing.assert_allclose(np.asarray(fused.unpad(y2p)),
                                   np.asarray(y1), rtol=0, atol=1e-4)
        np.testing.assert_allclose(float(ss2), float(ss1), rtol=1e-3)
