"""ARK_NORMAL behavioural-parity mode (step_mode="normal"): free-running
steps + cubic-Hermite dense output at output times, vs the default
TSTOP-style clamping (integrate/erk.py::integrate_interval_free,
hermite_interpolate). Reference: ARKode(mem, tout, y, &t, ARK_NORMAL)
steps past tout and interpolates (src/FHNmodel_torus.cpp:423)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate, simulate_streaming, output_times


def _cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=12, surface_width=20,
                surface_length=40, t_final=2.0, output_timestep=4,
                beta=1.25, dtype="float64", rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def test_normal_matches_tstop_within_tolerance():
    r_t = simulate(_cfg(step_mode="tstop"))
    r_n = simulate(_cfg(step_mode="normal"))
    assert r_t.ok and r_n.ok
    np.testing.assert_allclose(np.asarray(r_n.trajectory),
                               np.asarray(r_t.trajectory),
                               rtol=0, atol=5e-5)


def test_normal_dense_output_vs_scipy():
    """Hermite snapshots at touts must match scipy dense output at the
    integrator tolerance — interpolation must not degrade accuracy."""
    cfg = _cfg(model="goldbeter", beta=0.85, t_final=1.0, output_timestep=4,
               rtol=1e-7, step_mode="normal")
    res = simulate(cfg)
    assert res.ok
    p = res.problem

    def rhs_flat(t, yflat):
        y = jnp.asarray(yflat.reshape(p.y0.shape))
        return np.asarray(p.rhs(jnp.asarray(t), y, p.params)).ravel()

    touts = output_times(cfg)
    sol = solve_ivp(rhs_flat, (0.0, float(touts[-1])),
                    np.asarray(p.y0, np.float64).ravel(),
                    method="RK45", t_eval=touts, rtol=1e-10, atol=1e-12)
    assert sol.success
    want = sol.y.T.reshape((len(touts),) + p.y0.shape)
    np.testing.assert_allclose(np.asarray(res.trajectory[1:]), want,
                               rtol=0, atol=1e-4)


def test_normal_keeps_breakpoints_exact():
    """tBoundary stays an exact stop in normal mode: the frozen rows hold
    their ICs bit-for-bit until the release."""
    cfg = _cfg(t_boundary=1.0, step_mode="normal", output_timestep=4)
    res = simulate(cfg)
    assert res.ok
    u = res.field(0)
    # outputs at 0.5 and 1.0 are inside/at the frozen window
    for k in (1, 2):
        np.testing.assert_allclose(u[k, 0, :], u[0, 0, :], atol=1e-12)
        np.testing.assert_allclose(u[k, -1, :], u[0, -1, :], atol=1e-12)
    # after release the boundary rows must move
    assert np.max(np.abs(u[-1, 0, :] - u[0, 0, :])) > 1e-6


def test_normal_step_sequence_not_perturbed_by_outputs():
    """The whole point of ARK_NORMAL: the step-size sequence is independent
    of the output schedule, so many-output runs cost no extra steps."""
    few = simulate(_cfg(step_mode="normal", output_timestep=2))
    many = simulate(_cfg(step_mode="normal", output_timestep=16))
    assert few.ok and many.ok
    # only the automatic h0 estimate couples (weakly) to the first tout;
    # measured 63 vs 64 here while tstop pays 64 -> 75
    assert abs(many.total_steps() - few.total_steps()) <= 2
    # tstop mode, by contrast, pays for landing on each tout
    clamped = simulate(_cfg(step_mode="tstop", output_timestep=16))
    assert many.total_steps() <= clamped.total_steps()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_normal_sharded_matches_single_device():
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded
    cfg = _cfg(surface="torus", x_mesh=16, t_boundary=0.5,
               step_mode="normal", t_final=1.0, output_timestep=2)
    r1 = simulate(cfg)
    r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)))
    assert r1.ok and r8.ok
    np.testing.assert_allclose(np.asarray(r8.trajectory),
                               np.asarray(r1.trajectory),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(r8.stats.steps),
                                  np.asarray(r1.stats.steps))


def test_normal_mode_guards():
    with pytest.raises(ValueError, match="step_mode"):
        SimConfig(model="fhn", surface="flat", x_mesh=8, surface_width=20,
                  surface_length=40, step_mode="nope").validate()


def test_normal_streaming_matches_batch():
    """ARK_NORMAL streaming (free intervals + bracket state across
    dispatches) reproduces the in-jit batch scan bitwise: same interval
    ops, same bracket threading (VERDICT r2 #4)."""
    cfg = _cfg(step_mode="normal", t_boundary=0.9, output_timestep=4)
    rb = simulate(cfg)
    rs = simulate_streaming(cfg)
    assert rb.ok and rs.ok
    np.testing.assert_allclose(np.asarray(rs.trajectory),
                               np.asarray(rb.trajectory),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(rs.stats.steps),
                                  np.asarray(rb.stats.steps))


def test_normal_streaming_checkpoint_resume(tmp_path):
    """Normal-mode checkpoints persist the dense-output bracket, so a
    resumed run's interpolated snapshots (and step counts) are bitwise the
    uninterrupted run's."""
    from crdmodel_tpu.io.checkpoint import load_checkpoint, resume_streaming
    cfg = _cfg(step_mode="normal", t_boundary=0.9, output_timestep=4,
               t_final=2.0)
    full = simulate_streaming(cfg)
    assert full.ok
    ck = str(tmp_path / "ck.npz")
    simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck)
    data = load_checkpoint(ck, cfg)
    assert "br_t" in data and "br_y" in data  # bracket persisted
    res = resume_streaming(cfg, ck)
    assert res.ok
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(res.stats.steps),
                                  np.asarray(full.stats.steps))


def test_normal_checkpoint_refuses_other_step_mode(tmp_path):
    """step_mode is part of the config fingerprint: a normal-mode
    checkpoint must not silently continue a tstop run (the h sequences
    diverge)."""
    from crdmodel_tpu.io.checkpoint import resume_streaming
    cfg = _cfg(step_mode="normal", output_timestep=4)
    ck = str(tmp_path / "ck.npz")
    simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck)
    import dataclasses
    with pytest.raises(ValueError, match="different problem"):
        resume_streaming(dataclasses.replace(cfg, step_mode="tstop"), ck)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_normal_sharded_streaming_matches_single():
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = _cfg(surface="torus", x_mesh=16, t_boundary=0.5,
               step_mode="normal", t_final=1.0, output_timestep=2)
    r1 = simulate(cfg)
    r8 = simulate_sharded_streaming(cfg, mesh=make_mesh(shape=(2, 4)))
    assert r1.ok and r8.ok
    np.testing.assert_allclose(np.asarray(r8.trajectory),
                               np.asarray(r1.trajectory),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(r8.stats.steps),
                                  np.asarray(r1.stats.steps))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_normal_sharded_checkpoint_resume(tmp_path):
    """Sharded normal-mode checkpoint carries the bracket per shard; resume
    continues bitwise (npz backend)."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = _cfg(surface="torus", x_mesh=16, t_boundary=0.5,
               step_mode="normal", t_final=2.0, output_timestep=4)
    mesh = make_mesh(shape=(2, 4))
    full = simulate_sharded_streaming(cfg, mesh=mesh)
    assert full.ok
    ckdir = str(tmp_path / "ck")
    simulate_sharded_streaming(cfg, mesh=mesh, checkpoint_every=2,
                               checkpoint_dir=ckdir)
    res = simulate_sharded_streaming(cfg, mesh=mesh, resume_dir=ckdir)
    assert res.ok
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory[3:]),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(res.stats.steps),
                                  np.asarray(full.stats.steps))


@pytest.mark.parametrize("method", ["rkc2", "ark324"])
def test_normal_mode_other_steppers(method):
    """Free-running mode is stepper-agnostic (the bracket/interp layer sits
    above the stepper protocol)."""
    cfg = _cfg(model="goldbeter", beta=0.85, t_final=1.0,
               output_timestep=2, method=method, step_mode="normal")
    r_n = simulate(cfg)
    import dataclasses
    r_t = simulate(dataclasses.replace(cfg, step_mode="tstop"))
    assert r_n.ok and r_t.ok
    np.testing.assert_allclose(np.asarray(r_n.trajectory),
                               np.asarray(r_t.trajectory),
                               rtol=0, atol=1e-4)


def test_normal_breakpoint_coinciding_with_output():
    """A tBoundary that lands exactly on an output time must stay an EXACT
    stop in normal mode (merge_stops folds it into the output stop; the
    free-running scan must detect and clamp it — review finding r2)."""
    cfg = _cfg(t_boundary=1.0, step_mode="normal", output_timestep=4)
    res = simulate(cfg)
    assert res.ok
    u = res.field(0)
    for k in (1, 2):   # outputs at 0.5 and 1.0 are within/at the freeze
        np.testing.assert_allclose(u[k, 0, :], u[0, 0, :], atol=1e-12)
    assert np.max(np.abs(u[-1, 0, :] - u[0, 0, :])) > 1e-6
    # and the whole run agrees with tstop mode at tolerance
    r_t = simulate(_cfg(t_boundary=1.0, step_mode="tstop",
                        output_timestep=4))
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(r_t.trajectory),
                               rtol=0, atol=5e-5)


def test_normal_no_overshoot_across_breakpoint():
    """A free interval whose overshoot would cross a later breakpoint must
    cap the step there: with a non-output tBoundary and coarse outputs, the
    normal-mode run still matches tstop at integrator tolerance (the
    uncapped bug integrates the frozen RHS past the release, an O(h) error
    outside rtol)."""
    kw = dict(t_boundary=0.9, output_timestep=2, t_final=2.0)
    r_n = simulate(_cfg(step_mode="normal", **kw))
    r_t = simulate(_cfg(step_mode="tstop", **kw))
    assert r_n.ok and r_t.ok
    np.testing.assert_allclose(np.asarray(r_n.trajectory),
                               np.asarray(r_t.trajectory),
                               rtol=0, atol=5e-5)


def test_sweep_honors_step_mode():
    """sweep_configs must run members in the config's step_mode (review
    finding r2): normal-mode sweep members equal normal-mode single runs."""
    import dataclasses
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg(step_mode="normal", t_final=1.0, output_timestep=2)
    betas = [1.1, 1.25]
    res = sweep_configs(cfg, [{"beta": b} for b in betas])
    assert res.ok()
    for i, b in enumerate(betas):
        single = simulate(dataclasses.replace(cfg, beta=b))
        np.testing.assert_allclose(np.asarray(res.trajectories[i]),
                                   np.asarray(single.trajectory),
                                   rtol=1e-7, atol=1e-8)


def test_cli_run_normal_mode(tmp_path):
    """`run --set step_mode=normal` must route to the batch driver instead
    of crashing in the streaming driver (review finding r2)."""
    import os
    import subprocess
    import sys as _sys
    ini = tmp_path / "t.ini"
    ini.write_text("""[Parameters]
diffusion = 0.12
beta = 1.25
surfaceWidth = 20
surfaceLength = 40
waveLength = 0.1
waveWidth = 0.5
waveInside = 1
outputTimestep = 2
tBoundary = 0
tFinal = 0.5
xMesh = 10

[System]
includeAllVars = 0
varyBeta = 0
""")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [_sys.executable, "-m", "crdmodel_tpu", "run", str(ini),
         "--model", "fhn", "--surface", "flat", "--dtype", "float64",
         "--set", "step_mode=normal",
         "--outdir", str(tmp_path / "out"), "--quiet"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo})
    assert out.returncode == 0, out.stdout + out.stderr
    assert (tmp_path / "out" / "FHNmodel_flat_u.000.txt").exists()
