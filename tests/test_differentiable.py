"""Differentiable simulation (crdmodel_tpu/differentiable.py): gradients
through the fixed-step solver, validated against central finite differences
of the same forward program."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.differentiable import (make_differentiable, make_forward_fn,
                                         validate_steps)


def _cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=10, surface_width=20,
                surface_length=40, t_final=0.5, output_timestep=1,
                beta=1.25, dtype="float64", rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def test_fixed_step_matches_adaptive():
    err = validate_steps(_cfg(), n_steps=256, atol=1e-5)
    assert err < 1e-5


def test_grad_beta_matches_finite_differences():
    cfg = _cfg()
    sim = make_differentiable(cfg, n_steps=64,
                              loss_fn=lambda y: jnp.sum(y[0] ** 2))
    p0 = dict(sim.problem.params)
    loss0, g = sim.value_and_grad(p0, sim.problem.y0)
    assert np.isfinite(float(loss0))
    eps = 1e-6
    def loss_at(b):
        return float(sim.value_and_grad(
            {**p0, "b": jnp.asarray(b, jnp.float64)}, sim.problem.y0)[0])
    fd = (loss_at(cfg.beta + eps) - loss_at(cfg.beta - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g["b"]), fd, rtol=1e-5)


def test_grad_diffusion_matches_finite_differences():
    cfg = _cfg()
    sim = make_differentiable(cfg, n_steps=64,
                              loss_fn=lambda y: jnp.mean(y[0] ** 2))
    p0 = {**sim.problem.params, "dscale": jnp.asarray(1.0, jnp.float64)}
    loss0, g = sim.value_and_grad(p0, sim.problem.y0)
    eps = 1e-6
    def loss_at(ds):
        return float(sim.value_and_grad(
            {**p0, "dscale": jnp.asarray(ds, jnp.float64)},
            sim.problem.y0)[0])
    fd = (loss_at(1.0 + eps) - loss_at(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g["dscale"]), fd, rtol=1e-5)
    # the diffusion gradient must actually be nonzero on a structured field
    assert abs(float(g["dscale"])) > 1e-8


def test_grad_beta_ramp_field():
    """With varyBeta the parameter is the full (ny,1) ramp — the gradient
    is a field (spatial sensitivity), shape-preserved."""
    cfg = _cfg(vary_beta=1, beta_min=0.7, beta_max=1.7)
    sim = make_differentiable(cfg, n_steps=64,
                              loss_fn=lambda y: jnp.sum(y[0] ** 2))
    _, g = sim.value_and_grad(dict(sim.problem.params), sim.problem.y0)
    assert g["b"].shape == sim.problem.params["b"].shape
    assert np.all(np.isfinite(np.asarray(g["b"])))
    assert float(jnp.max(jnp.abs(g["b"]))) > 0


def test_checkpoint_blocks_change_nothing():
    """sqrt-checkpointing is a memory schedule, not a numerics change."""
    cfg = _cfg()
    p = build_problem(cfg)
    f1 = jax.jit(make_forward_fn(p, 64, block_size=8))
    f2 = jax.jit(make_forward_fn(p, 64, block_size=64))
    y1 = f1(p.params, p.y0)
    y2 = f2(p.params, p.y0)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # gradients too
    g1 = jax.jit(jax.grad(lambda pp: jnp.sum(
        make_forward_fn(p, 64, block_size=8)(pp, p.y0) ** 2)))(p.params)
    g2 = jax.jit(jax.grad(lambda pp: jnp.sum(
        make_forward_fn(p, 64, block_size=64)(pp, p.y0) ** 2)))(p.params)
    np.testing.assert_allclose(float(g1["b"]), float(g2["b"]), rtol=1e-12)


def test_rejects_adaptive_only_methods():
    with pytest.raises(ValueError, match="explicit tableau"):
        make_forward_fn(build_problem(_cfg(method="rkc2")), 16)


def test_gradient_descent_recovers_beta():
    """End-to-end inverse problem: recover the beta that produced a target
    final field by gradient descent — the flagship use case."""
    cfg = _cfg(t_final=0.3)
    target_beta = 1.4
    p_true = build_problem(dataclasses.replace(cfg, beta=target_beta))
    fwd = jax.jit(make_forward_fn(p_true, 64))
    # same ICs for target and fits: sensitivity isolated to the kinetics
    y0 = p_true.y0
    target = fwd(p_true.params, y0)

    sim = make_differentiable(
        cfg, 64, loss_fn=lambda y: jnp.mean((y - target) ** 2),
        problem=p_true)
    b = jnp.asarray(1.1, jnp.float64)
    lr = 60.0   # ~Newton-scaled for this loss's measured curvature
    for _ in range(60):
        loss, g = sim.value_and_grad({"b": b}, y0)
        b = b - lr * g["b"]
    assert abs(float(b) - target_beta) < 1e-3, float(b)


def test_adaptive_replay_reproduces_adaptive_exactly():
    """The recorded-h replay must reproduce the recording run's final state
    bitwise: rejected attempts never changed (t, y, carry), the recorder
    rides the reverted carry, and zero-padded h entries are exact no-ops."""
    from crdmodel_tpu.differentiable import (make_replay_fn,
                                             record_adaptive_steps)
    cfg = _cfg(t_final=1.0)
    p = build_problem(cfg)
    y_final, h_seq, n_acc = record_adaptive_steps(cfg, n_max=512, problem=p)
    assert 0 < n_acc < 512
    assert float(jnp.sum(jnp.asarray(h_seq)[n_acc:])) == 0.0
    replay = jax.jit(make_replay_fn(cfg, h_seq, problem=p))
    y_replay = replay(p.params, p.y0)
    np.testing.assert_array_equal(np.asarray(y_replay), np.asarray(y_final))


def test_adaptive_grad_matches_finite_differences():
    from crdmodel_tpu.differentiable import adaptive_value_and_grad
    cfg = _cfg(t_final=0.5)
    p = build_problem(cfg)
    vag, y_final = adaptive_value_and_grad(
        cfg, lambda y: jnp.sum(y[0] ** 2), n_max=512, problem=p)
    loss0, g = vag(dict(p.params), p.y0)
    np.testing.assert_allclose(float(loss0),
                               float(jnp.sum(y_final[0] ** 2)), rtol=1e-12)
    eps = 1e-6
    def loss_at(b):
        return float(vag({"b": jnp.asarray(b, jnp.float64)}, p.y0)[0])
    fd = (loss_at(cfg.beta + eps) - loss_at(cfg.beta - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g["b"]), fd, rtol=1e-5)


def test_adaptive_replay_guards():
    from crdmodel_tpu.differentiable import record_adaptive_steps
    with pytest.raises(ValueError, match="tableau"):
        record_adaptive_steps(_cfg(method="rkc2"))
    with pytest.raises(ValueError, match="t_boundary"):
        record_adaptive_steps(_cfg(t_boundary=0.2))
    with pytest.raises(ValueError, match="n_max"):
        record_adaptive_steps(_cfg(t_final=2.0), n_max=8)
