"""Sweep driver + streaming driver + CLI tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate, simulate_streaming
from crdmodel_tpu.sweep import sweep_beta


def _cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=12, surface_width=20,
                surface_length=40, t_final=1.0, output_timestep=2,
                beta=1.25, dtype="float64", rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def test_sweep_matches_individual_runs():
    cfg = _cfg()
    betas = [0.9, 1.25, 1.8]
    res = sweep_beta(cfg, betas)
    assert res.ok()
    assert res.trajectories.shape[0] == 3
    for i, b in enumerate(betas):
        import dataclasses
        single = simulate(dataclasses.replace(cfg, beta=b))
        np.testing.assert_allclose(np.asarray(res.trajectories[i]),
                                   np.asarray(single.trajectory),
                                   rtol=1e-7, atol=1e-8)


def test_sweep_rejects_varybeta():
    with pytest.raises(ValueError):
        sweep_beta(_cfg(vary_beta=1), [0.1, 0.2])


def test_streaming_matches_batch():
    cfg = _cfg(t_boundary=0.4)  # include a breakpoint
    batch = simulate(cfg)
    seen = []
    stream = simulate_streaming(cfg, on_snapshot=lambda k, y: seen.append(k))
    assert stream.ok
    assert seen == [0, 1, 2]
    np.testing.assert_allclose(np.asarray(stream.trajectory),
                               np.asarray(batch.trajectory),
                               rtol=1e-9, atol=1e-10)
    assert stream.total_steps() == batch.total_steps()


def test_cli_steadystate_contract():
    """Output format `[Zs] [Ys]` parsed exactly like the reference's fscanf
    (src/GoldbeterModel_torus.cpp:258)."""
    out = subprocess.run(
        [sys.executable, "-m", "crdmodel_tpu", "steadystate", "0.85"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0
    line = out.stdout.strip().splitlines()[-1]
    assert line.startswith("[") and "] [" in line
    zs = float(line.split("] [")[0][1:])
    ys = float(line.split("] [")[1][:-1])
    from crdmodel_tpu.models import get_model
    want = get_model("goldbeter").steady_state(0.85)
    assert np.isclose(zs, want[0]) and np.isclose(ys, want[1])


def test_cli_run_pipeline(tmp_path):
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
betaMin = 0.7
betaMax = 1.7

[System]
includeAllVars = 1
varyBeta = 0
""")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "crdmodel_tpu", "run", str(ini),
         "--model", "fhn", "--surface", "flat", "--dtype", "float64",
         "--outdir", str(tmp_path / "out"), "--npz", "--quiet",
         "--trace", str(tmp_path / "trace")],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": repo})
    assert out.returncode == 0, out.stdout + out.stderr
    outdir = tmp_path / "out"
    assert (outdir / "FHNmodel_flat_subdomain.000.txt").exists()
    assert (outdir / "FHNmodel_flat_u.000.txt").exists()
    assert (outdir / "FHNmodel_flat_v.000.txt").exists()
    assert (outdir / "FHNmodel_flat.npz").exists()
    # --trace wrote a TensorBoard-format profile session
    assert (tmp_path / "trace" / "plugins" / "profile").is_dir()


def test_pod_scale_sweep_sharded_mesh():
    """BASELINE.json's pod-scale combination: vmapped parameter batch over a
    spatially sharded mesh — must match the unsharded sweep."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from crdmodel_tpu.parallel.mesh import make_mesh
    cfg = _cfg(x_mesh=16)
    betas = [0.9, 1.25]
    plain = sweep_beta(cfg, betas)
    sharded = sweep_beta(cfg, betas, mesh=make_mesh(shape=(2, 4)))
    assert plain.ok() and sharded.ok()
    np.testing.assert_allclose(np.asarray(sharded.trajectories),
                               np.asarray(plain.trajectories),
                               rtol=1e-10, atol=1e-10)


def test_sweep_configs_diffusion_matches_individual_runs():
    """D sweeps ride the traced dscale scalar; scaling after the stencil vs
    baking D into the coefficients differs by ~1 ulp, so tolerance is loose
    relative to the beta-sweep test (which is op-identical)."""
    import dataclasses
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg()
    ds = [0.06, 0.12, 0.24]
    res = sweep_configs(cfg, [{"diffusion": d} for d in ds])
    assert res.ok()
    for i, d in enumerate(ds):
        single = simulate(dataclasses.replace(cfg, diffusion=d))
        np.testing.assert_allclose(np.asarray(res.trajectories[i]),
                                   np.asarray(single.trajectory),
                                   rtol=0, atol=1e-6)


def test_sweep_configs_wave_geometry_exact():
    """Wave-geometry members differ only in ICs -> op-identical to single
    runs, tight tolerance."""
    import dataclasses
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg()
    overrides = [{"wave_width": 0.3}, {"wave_width": 0.5, "wave_length": 0.2}]
    res = sweep_configs(cfg, overrides)
    assert res.ok()
    for i, o in enumerate(overrides):
        single = simulate(dataclasses.replace(cfg, **o))
        np.testing.assert_allclose(np.asarray(res.trajectories[i]),
                                   np.asarray(single.trajectory),
                                   rtol=1e-7, atol=1e-8)


def test_sweep_configs_cross_product_beta_diffusion():
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg()
    members = [{"beta": b, "diffusion": d}
               for b in (0.9, 1.25) for d in (0.06, 0.12)]
    res = sweep_configs(cfg, members)
    assert res.ok()
    assert res.trajectories.shape[0] == 4
    assert res.members == tuple(members)
    # beta=0.9 members must differ from beta=1.25 members
    assert not np.allclose(np.asarray(res.trajectories[0]),
                           np.asarray(res.trajectories[2]))


def test_sweep_configs_rejects_bad_keys():
    from crdmodel_tpu.sweep import sweep_configs
    with pytest.raises(ValueError, match="not sweepable"):
        sweep_configs(_cfg(), [{"x_mesh": 20}])
    with pytest.raises(ValueError, match="vary_beta"):
        sweep_configs(_cfg(vary_beta=1), [{"beta": 0.5}])
    with pytest.raises(ValueError, match="rkc2"):
        sweep_configs(_cfg(method="rkc2"), [{"diffusion": 0.1}])


def test_sweep_configs_ark324():
    """Sweeps compose with the IMEX integrator (vmapped pointwise Newton)."""
    import dataclasses
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg(model="goldbeter", beta=0.85, method="ark324")
    betas = [0.85, 0.95]
    res = sweep_configs(cfg, [{"beta": b} for b in betas])
    assert res.ok()
    single = simulate(dataclasses.replace(cfg, beta=betas[1]))
    np.testing.assert_allclose(np.asarray(res.trajectories[1]),
                               np.asarray(single.trajectory),
                               rtol=1e-7, atol=1e-8)


def test_sweep_configs_sharded_diffusion():
    """Pod-scale combination with a D axis: vmapped members over a sharded
    mesh, dscale threaded through shard_map as a replicated scalar."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg(x_mesh=16)
    members = [{"diffusion": 0.06}, {"diffusion": 0.12}]
    plain = sweep_configs(cfg, members)
    sharded = sweep_configs(cfg, members, mesh=make_mesh(shape=(2, 4)))
    assert plain.ok() and sharded.ok()
    np.testing.assert_allclose(np.asarray(sharded.trajectories),
                               np.asarray(plain.trajectories),
                               rtol=1e-10, atol=1e-10)


def test_sweep_serial_matches_vmap():
    """batch_mode='serial' (the TPU default: one compiled member program,
    host loop) must reproduce the vmapped batch exactly."""
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg()
    members = [{"beta": 0.9, "diffusion": 0.06}, {"beta": 1.25}]
    v = sweep_configs(cfg, members, batch_mode="vmap")
    s = sweep_configs(cfg, members, batch_mode="serial")
    assert v.ok() and s.ok()
    np.testing.assert_array_equal(np.asarray(s.trajectories),
                                  np.asarray(v.trajectories))
    np.testing.assert_array_equal(np.asarray(s.stats.steps),
                                  np.asarray(v.stats.steps))
    with pytest.raises(ValueError, match="batch_mode"):
        sweep_configs(cfg, members, batch_mode="nope")


def test_sweep_members_matches_vmap():
    """batch_mode='members' (the TPU-resident batched sweep: member axis
    hand-batched inside ONE lax.while_loop, integrate_to_outputs n_members)
    must reproduce the vmapped batch exactly — same trajectories AND the
    same per-member step/accept/reject sequences (the lockstep masking
    keeps every member's adaptive decisions identical to a solo run)."""
    from crdmodel_tpu.sweep import sweep_configs
    cfg = _cfg(t_boundary=0.4)   # include a breakpoint segment
    members = [{"beta": 0.9, "diffusion": 0.06}, {"beta": 1.25},
               {"beta": 1.8, "diffusion": 0.12}]
    v = sweep_configs(cfg, members, batch_mode="vmap")
    m = sweep_configs(cfg, members, batch_mode="members")
    assert v.ok() and m.ok()
    np.testing.assert_array_equal(np.asarray(m.trajectories),
                                  np.asarray(v.trajectories))
    for field in ("steps", "accepted", "rejected", "status"):
        np.testing.assert_array_equal(np.asarray(getattr(m.stats, field)),
                                      np.asarray(getattr(v.stats, field)))


@pytest.mark.parametrize("method", ["rkc2", "ark324"])
def test_sweep_members_methods(method):
    """The member-batched loop must serve every stepper protocol: the RKC2
    Chebyshev stage loop (per-member traced stage counts under the stepper
    vmap) and the ark324 IMEX Newton stages."""
    from crdmodel_tpu.sweep import sweep_beta
    cfg = _cfg(method=method)
    betas = [0.9, 1.4]
    v = sweep_beta(cfg, betas, batch_mode="vmap")
    m = sweep_beta(cfg, betas, batch_mode="members")
    assert v.ok() and m.ok()
    np.testing.assert_array_equal(np.asarray(m.trajectories),
                                  np.asarray(v.trajectories))
    np.testing.assert_array_equal(np.asarray(m.stats.steps),
                                  np.asarray(v.stats.steps))


def test_sweep_members_rejects_mesh():
    """members mode folds the batch into the single-device program; a
    sharded sweep must be asked for explicitly (vmap/serial)."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.sweep import sweep_configs
    with pytest.raises(ValueError, match="members"):
        sweep_configs(_cfg(), [{"beta": 0.9}], mesh=make_mesh(shape=(2, 4)),
                      batch_mode="members")
