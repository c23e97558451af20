"""Fused Pallas step kernel vs the XLA step — real-TPU validation.

Run directly: python -m pytest tests/tpu/ -q
(the main suite under tests/conftest.py forces the CPU backend and skips these)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig, config_from_ini
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.integrate.erk import TABLEAUS, make_erk_step
from crdmodel_tpu.ops.pallas_step import build_fused_step, is_supported


def _compare(cfg, t=0.5, h=1e-3, seg_end=1.0):
    p = build_problem(cfg)
    tab = TABLEAUS["bs32"]
    assert is_supported(p, tab, jnp.float32)
    fs = build_fused_step(p, tab)
    params = {**p.params, "_seg_end": jnp.float32(seg_end)}

    yp = fs.pad(p.y0)
    ynew_p, ss_p = jax.jit(fs.step_err)(
        jnp.float32(t), yp, jnp.float32(h), params)
    ynew_p = np.asarray(fs.unpad(ynew_p))

    step = jax.jit(make_erk_step(tab, p.rhs))
    ynew_x, errv = step(jnp.float32(t), p.y0, jnp.float32(h), params)
    w = 1.0 / (cfg.rtol * jnp.abs(p.y0) + cfg.atol)
    ss_x = float(jnp.sum((errv * w) ** 2))
    return ynew_p, np.asarray(ynew_x), float(ss_p), ss_x


@pytest.mark.parametrize("surface", ["flat", "torus"])
@pytest.mark.parametrize("model,beta", [("fhn", 1.25), ("goldbeter", 0.85),
                                        ("grayscott", 0.03), ("sir", 1.5)])
def test_kernel_matches_xla_step(model, surface, beta):
    cfg = SimConfig(model=model, surface=surface, x_mesh=40,
                    surface_width=20, surface_length=40, beta=beta,
                    t_boundary=2.0, dtype="float32")
    ynew_p, ynew_x, ss_p, ss_x = _compare(cfg)
    np.testing.assert_array_equal(ynew_p, ynew_x)  # bitwise
    assert np.isclose(ss_p, ss_x, rtol=1e-4)


def test_kernel_matches_on_canonical_fhn_torus():
    cfg = config_from_ini("/root/reference/data/FHNmodelArgs.ini",
                          model="fhn", surface="torus")
    ynew_p, ynew_x, ss_p, ss_x = _compare(cfg, seg_end=10.0)  # frozen segment
    np.testing.assert_array_equal(ynew_p, ynew_x)
    assert np.isclose(ss_p, ss_x, rtol=1e-4)
    # released segment (freeze off)
    ynew_p, ynew_x, ss_p, ss_x = _compare(cfg, t=40.0, seg_end=40.0)
    np.testing.assert_array_equal(ynew_p, ynew_x)


def test_padded_representation_closure():
    """Two consecutive kernel steps must equal two XLA steps — the halo
    refresh keeps the padded representation consistent across steps."""
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=40,
                    surface_width=20, surface_length=40, beta=1.25,
                    dtype="float32")
    p = build_problem(cfg)
    tab = TABLEAUS["bs32"]
    fs = build_fused_step(p, tab)
    params = {**p.params, "_seg_end": jnp.float32(1.0)}
    h = jnp.float32(5e-4)

    yp = fs.pad(p.y0)
    y1p, _ = jax.jit(fs.step_err)(jnp.float32(0.0), yp, h, params)
    y2p, _ = jax.jit(fs.step_err)(jnp.float32(0.0), y1p, h, params)

    step = jax.jit(make_erk_step(tab, p.rhs))
    y1x, _ = step(jnp.float32(0.0), p.y0, h, params)
    y2x, _ = step(jnp.float32(0.0), y1x, h, params)

    np.testing.assert_array_equal(np.asarray(fs.unpad(y2p)), np.asarray(y2x))


def test_full_sim_with_pallas_matches_xla():
    cfg = config_from_ini("/root/reference/data/GoldbeterModelArgs.ini",
                          model="goldbeter", surface="torus", use_pallas=True,
                          ic_type=0, vary_beta=0)
    from crdmodel_tpu.sim import simulate
    res_p = simulate(cfg)
    assert res_p.ok
    cfg_x = config_from_ini("/root/reference/data/GoldbeterModelArgs.ini",
                            model="goldbeter", surface="torus",
                            use_pallas=False, ic_type=0, vary_beta=0)
    res_x = simulate(cfg_x)
    assert res_x.ok
    a, b = np.asarray(res_p.trajectory), np.asarray(res_x.trajectory)
    # independent step sequences agree to integrator tolerance
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


def test_kernel_runtime_overrides_match_rebuilt_kernel():
    """The serial-sweep runtime inputs (_fused_b / dscale, sweep.py): a
    kernel built for beta=b0 called with overrides for (b1, d1) must be
    bitwise the kernel BUILT for (b1, d1) — beta and the stencil scale are
    call inputs, not baked constants."""
    import dataclasses
    base = SimConfig(model="fhn", surface="torus", x_mesh=40,
                     surface_width=20, surface_length=40, beta=1.1,
                     diffusion=0.12, t_boundary=2.0, dtype="float32")
    # D doubled: a power-of-two dscale keeps c0*ds bitwise equal to
    # the coefficients built from the doubled D (both linear in D)
    other = dataclasses.replace(base, beta=1.45, diffusion=0.24)
    tab = TABLEAUS["bs32"]
    p0 = build_problem(base)
    p1 = build_problem(other)
    fs0 = build_fused_step(p0, tab)
    fs1 = build_fused_step(p1, tab)
    seg = {"_seg_end": jnp.float32(1.0)}
    y = fs0.pad(p1.y0)

    ov = {**p0.params, **seg,
          "_fused_b": jnp.full((1, 1), other.beta, jnp.float32),
          "dscale": jnp.float32(other.diffusion / base.diffusion)}
    ynew_o, ss_o = jax.jit(fs0.step_err)(
        jnp.float32(0.5), y, jnp.float32(1e-3), ov)
    ynew_r, ss_r = jax.jit(fs1.step_err)(
        jnp.float32(0.5), y, jnp.float32(1e-3), {**p1.params, **seg})
    np.testing.assert_array_equal(np.asarray(ynew_o), np.asarray(ynew_r))
    # error weights are built from rtol/atol only; sums must agree to f32
    # reassociation tolerance (the dscale multiply reorders the product)
    assert np.isclose(float(ss_o), float(ss_r), rtol=1e-5)
