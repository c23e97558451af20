"""Speculative K-step mega-kernel (ops/pallas_kstep.py) — real-TPU tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.integrate.erk import TABLEAUS
from crdmodel_tpu.ops import pallas_kstep
from crdmodel_tpu.sim import make_simulation_fn


def _cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=160, surface_width=20.0,
                surface_length=80.0, t_final=2.0, output_timestep=2,
                vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=1.0,
                dtype="float32", rtol=1e-5, atol=1e-8, use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def test_kstep_single_batch_matches_two_plain_steps():
    """n_commit=K kernel result == two sequential single fused steps with
    the same frozen h (bitwise: same stage arithmetic, FSAL exact)."""
    from crdmodel_tpu.ops import pallas_step
    cfg = _cfg()
    p = build_problem(cfg)
    tab = TABLEAUS["bs32"]
    assert pallas_kstep.is_kstep_supported(p, tab, jnp.float32, 2)
    ks = pallas_kstep.build_fused_kstep(p, tab, 2)
    fs = pallas_step.build_fused_step(p, tab)
    params = {**p.params, "_seg_end": jnp.float32(2.0)}
    h = jnp.float32(1e-4)
    yp = ks.pad(p.y0)

    yk, sss = jax.jit(lambda y: ks.call(jnp.float32(1.5), y, h, 2, params))(yp)
    y1, ss1 = jax.jit(lambda y: fs.step_err(jnp.float32(1.5), y, h, params))(yp)
    y2, ss2 = jax.jit(lambda y: fs.step_err(jnp.float32(1.5), y, h, params))(y1)
    np.testing.assert_array_equal(np.asarray(ks.unpad(yk)),
                                  np.asarray(fs.unpad(y2)))
    np.testing.assert_allclose(float(jnp.sum(sss[:, 0])), float(ss1),
                               rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(sss[:, 1])), float(ss2),
                               rtol=1e-6)
    # n_commit=1 returns the first step's state
    yk1, _ = jax.jit(lambda y: ks.call(jnp.float32(1.5), y, h, 1, params))(yp)
    np.testing.assert_array_equal(np.asarray(ks.unpad(yk1)),
                                  np.asarray(fs.unpad(y1)))
    # n_commit=0 is the identity
    yk0, _ = jax.jit(lambda y: ks.call(jnp.float32(1.5), y, h, 0, params))(yp)
    np.testing.assert_array_equal(np.asarray(ks.unpad(yk0)),
                                  np.asarray(p.y0))


def test_kstep_full_run_matches_per_step_at_tolerance():
    cfg = _cfg()
    import dataclasses
    res = {}
    for sk in (0, 2):
        c = dataclasses.replace(cfg, speculative_k=sk)
        p = build_problem(c)
        run, _ = make_simulation_fn(p)
        traj, stats = run(p.y0, p.params)
        assert np.all(np.asarray(stats.status) == 0)
        res[sk] = np.asarray(traj)
    # different h sequences, same tolerance contract
    np.testing.assert_allclose(res[0], res[2], rtol=1e-3, atol=5e-3)


@pytest.mark.parametrize("K", [5, 10])
def test_deep_halo_kstep_matches_sequential_steps(K):
    """Round-5 deep-halo K-step (halo_for widens P to 16/32): the K-batch
    result is bitwise K sequential single fused steps built with the SAME
    halo (shared padded layout), and mid-batch n_commit selects exact
    prefixes."""
    from crdmodel_tpu.ops import pallas_step
    cfg = _cfg()
    p = build_problem(cfg)
    tab = TABLEAUS["bs32"]
    P = pallas_kstep.halo_for(tab, K)
    assert P == {5: 16, 10: 32}[K]
    assert pallas_kstep.is_kstep_supported(p, tab, jnp.float32, K)
    ks = pallas_kstep.build_fused_kstep(p, tab, K)
    fs = pallas_step.build_fused_step(p, tab, halo=P)
    params = {**p.params, "_seg_end": jnp.float32(2.0)}
    h = jnp.float32(1e-4)
    yp = ks.pad(p.y0)
    yk, sss = jax.jit(
        lambda y: ks.call(jnp.float32(1.5), y, h, K, params))(yp)
    stepf = jax.jit(lambda y: fs.step_err(jnp.float32(1.5), y, h, params))
    y = yp
    ss_seq = []
    for _ in range(K):
        y, ss = stepf(y)
        ss_seq.append(float(ss))
    np.testing.assert_array_equal(np.asarray(ks.unpad(yk)),
                                  np.asarray(fs.unpad(y)))
    np.testing.assert_allclose(
        [float(jnp.sum(sss[:, j])) for j in range(K)], ss_seq, rtol=1e-6)
    # mid-batch commit: n_commit=3 == 3 plain steps
    yk3, _ = jax.jit(
        lambda y: ks.call(jnp.float32(1.5), y, h, 3, params))(yp)
    y3 = yp
    for _ in range(3):
        y3, _ = stepf(y3)
    np.testing.assert_array_equal(np.asarray(ks.unpad(yk3)),
                                  np.asarray(fs.unpad(y3)))


def test_deep_kstep_full_run_matches_per_step_at_tolerance():
    """End-to-end speculative_k=5 (deep halo) vs per-step: same tolerance
    contract, trajectories agree to tolerance-level error."""
    cfg = _cfg()
    res = {}
    for sk in (0, 5):
        c = dataclasses.replace(cfg, speculative_k=sk)
        p = build_problem(c)
        run, _ = make_simulation_fn(p)
        traj, stats = run(p.y0, p.params)
        assert np.all(np.asarray(stats.status) == 0)
        res[sk] = np.asarray(traj)
    np.testing.assert_allclose(res[0], res[5], rtol=1e-3, atol=5e-3)
