"""Checkpoint/resume tests."""

import dataclasses

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.io.checkpoint import (
    config_fingerprint, load_checkpoint, resume_streaming,
)
from crdmodel_tpu.sim import simulate_streaming


def _cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=12, surface_width=20,
                surface_length=40, t_final=1.0, output_timestep=4,
                beta=1.25, t_boundary=0.3, dtype="float64",
                rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def test_fingerprint_sensitivity():
    cfg = _cfg()
    assert config_fingerprint(cfg) == config_fingerprint(_cfg())
    assert config_fingerprint(cfg) != config_fingerprint(_cfg(beta=1.3))
    # non-physics knobs don't change the fingerprint
    assert config_fingerprint(cfg) == config_fingerprint(
        dataclasses.replace(cfg, use_pallas=True))


def test_resume_matches_uninterrupted(tmp_path):
    cfg = _cfg()
    full = simulate_streaming(cfg)
    assert full.ok

    # checkpoint_every=2 with nt=4 writes a single mid-run checkpoint at k=2
    ck = str(tmp_path / "ck.npz")
    simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck)
    data = load_checkpoint(ck, cfg)
    assert int(data["k_out"]) == 2
    assert data["snapshots"].shape[0] == 3  # IC + 2 outputs

    # resume (as if the original run had crashed after k=2) and finish
    res = resume_streaming(cfg, ck)
    assert res.ok
    assert res.trajectory.shape[0] == full.trajectory.shape[0]
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory),
                               rtol=1e-12, atol=1e-12)


def test_resume_refuses_wrong_config(tmp_path):
    cfg = _cfg()
    ck = str(tmp_path / "ck.npz")
    simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck)
    with pytest.raises(ValueError, match="different problem"):
        resume_streaming(_cfg(beta=0.5), ck)


def test_resume_non_representable_times(tmp_path):
    """Resume skips completed intervals by COUNT: with f32 and touts not
    exactly representable (t_final=2.1, nt=3 -> 0.7, 1.4, 2.1) a time
    comparison re-runs the checkpointed interval and duplicates its snapshot
    (ADVICE r1 medium)."""
    cfg = _cfg(t_final=2.1, output_timestep=3, t_boundary=0.0,
               dtype="float32", rtol=1e-4, atol=1e-7)
    full = simulate_streaming(cfg)
    assert full.ok

    ck = str(tmp_path / "ck.npz")
    simulate_streaming(cfg, checkpoint_every=1, checkpoint_path=ck)
    data = load_checkpoint(ck, cfg)
    assert int(data["k_out"]) == 2  # last mid-run checkpoint (k<nt)

    res = resume_streaming(cfg, ck)
    assert res.ok
    assert res.trajectory.shape[0] == full.trajectory.shape[0]
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory), rtol=0, atol=0)


def test_resume_with_breakpoint_after_checkpoint(tmp_path):
    """A tBoundary breakpoint between the resume point and the next output
    must still be honored (and one at/before the checkpoint skipped)."""
    cfg = _cfg(t_final=1.0, output_timestep=4, t_boundary=0.6)
    full = simulate_streaming(cfg)
    ck = str(tmp_path / "ck.npz")
    simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck)
    res = resume_streaming(cfg, ck)
    assert res.ok
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory),
                               rtol=1e-12, atol=1e-12)


def test_sharded_checkpoint_resume(tmp_path):
    """Per-shard checkpoint on the 8-device virtual mesh: every device's
    shard is written separately (no host gather) and resume reproduces the
    uninterrupted run's solver state and remaining snapshots exactly."""
    import glob

    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=1.0,
                    output_timestep=4, vary_beta=1, beta_min=0.7,
                    beta_max=1.7, t_boundary=0.3, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    mesh = make_mesh(shape=(2, 4))
    full = simulate_sharded_streaming(cfg, mesh=mesh)
    assert full.ok

    ckdir = str(tmp_path / "ck")
    simulate_sharded_streaming(cfg, mesh=mesh, checkpoint_every=2,
                               checkpoint_dir=ckdir)
    assert len(glob.glob(ckdir + "/y.p*.s*.npz")) == 8  # one per device

    res = simulate_sharded_streaming(cfg, mesh=mesh, resume_dir=ckdir)
    assert res.ok
    # post-resume snapshots = outputs 3 and 4
    assert res.trajectory.shape[0] == 2
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory[3:]),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(res.touts, full.touts[3:])
    np.testing.assert_array_equal(np.asarray(res.stats.steps),
                                  np.asarray(full.stats.steps))


def test_sharded_checkpoint_refuses_mismatches(tmp_path):
    from crdmodel_tpu.io.checkpoint import load_sharded_checkpoint
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=1.0,
                    output_timestep=4, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    mesh = make_mesh(shape=(2, 4))
    ckdir = str(tmp_path / "ck")
    simulate_sharded_streaming(cfg, mesh=mesh, checkpoint_every=2,
                               checkpoint_dir=ckdir)
    with pytest.raises(ValueError, match="different problem"):
        load_sharded_checkpoint(ckdir, dataclasses.replace(cfg, beta=0.5),
                                mesh)
    # a different MESH SHAPE is elastic resume, not a refusal: the loader
    # reassembles the saved global state and re-shards it (VERDICT r2 #5)
    ck = load_sharded_checkpoint(ckdir, cfg, make_mesh(shape=(4, 2)))
    same = load_sharded_checkpoint(ckdir, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(ck["y"]), np.asarray(same["y"]))


def test_orbax_checkpoint_resume(tmp_path):
    """Orbax backend: the state array stored as sharding-aware zarr; resume
    on the 8-device virtual mesh reproduces the uninterrupted run exactly."""
    import os

    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=1.0,
                    output_timestep=4, vary_beta=1, beta_min=0.7,
                    beta_max=1.7, t_boundary=0.3, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    mesh = make_mesh(shape=(2, 4))
    full = simulate_sharded_streaming(cfg, mesh=mesh)
    assert full.ok

    ckdir = str(tmp_path / "ck_orbax")
    simulate_sharded_streaming(cfg, mesh=mesh, checkpoint_every=2,
                               checkpoint_dir=ckdir,
                               checkpoint_backend="orbax")
    assert os.path.exists(os.path.join(ckdir, "manifest.json"))
    assert os.path.isdir(os.path.join(ckdir, "y"))

    res = simulate_sharded_streaming(cfg, mesh=mesh, resume_dir=ckdir,
                                     checkpoint_backend="orbax")
    assert res.ok
    assert res.trajectory.shape[0] == 2
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory[3:]),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_array_equal(np.asarray(res.stats.steps),
                                  np.asarray(full.stats.steps))


def test_orbax_checkpoint_restored_sharding(tmp_path):
    """load_orbax_checkpoint returns y with the requested mesh sharding and
    refuses fingerprint/mesh mismatches."""
    from crdmodel_tpu.io.checkpoint import load_orbax_checkpoint
    from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.5,
                    output_timestep=2, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    mesh = make_mesh(shape=(2, 4))
    ckdir = str(tmp_path / "ck_orbax2")
    simulate_sharded_streaming(cfg, mesh=mesh, checkpoint_every=1,
                               checkpoint_dir=ckdir,
                               checkpoint_backend="orbax")
    ck = load_orbax_checkpoint(ckdir, cfg, mesh)
    spec = ck["y"].sharding.spec
    assert tuple(spec) == (None, AXIS_Y, AXIS_X)
    with pytest.raises(ValueError, match="different problem"):
        load_orbax_checkpoint(ckdir, dataclasses.replace(cfg, beta=0.5), mesh)
    # elastic resume on a different mesh shape: orbax re-shards on restore
    ck2 = load_orbax_checkpoint(ckdir, cfg, make_mesh(shape=(4, 2)))
    assert tuple(ck2["y"].sharding.spec) == (None, AXIS_Y, AXIS_X)
    np.testing.assert_array_equal(np.asarray(ck2["y"]), np.asarray(ck["y"]))


@pytest.mark.parametrize("backend", ["npz", "orbax"])
@pytest.mark.parametrize("resume_shape", [(1, 8), (4, 2)])
def test_elastic_resume_different_mesh(tmp_path, backend, resume_shape):
    """Save on 2x4, resume on a different mesh shape: the continued
    trajectory equals the uninterrupted run (VERDICT r2 #5). Exact rows:
    the solver state is mesh-layout-independent (global arrays; psum'd
    control flow), so only reduction order could differ — and f64 WRMS
    sums here agree bitwise across these mesh shapes."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=1.0,
                    output_timestep=4, vary_beta=1, beta_min=0.7,
                    beta_max=1.7, t_boundary=0.3, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    mesh = make_mesh(shape=(2, 4))
    full = simulate_sharded_streaming(cfg, mesh=mesh)
    assert full.ok
    ckdir = str(tmp_path / "ck")
    simulate_sharded_streaming(cfg, mesh=mesh, checkpoint_every=2,
                               checkpoint_dir=ckdir,
                               checkpoint_backend=backend)
    res = simulate_sharded_streaming(cfg, mesh=make_mesh(shape=resume_shape),
                                     resume_dir=ckdir,
                                     checkpoint_backend=backend)
    assert res.ok
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory[3:]),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_array_equal(np.asarray(res.stats.steps),
                                  np.asarray(full.stats.steps))


def test_elastic_resume_uneven_grid(tmp_path):
    """Elastic resume when the grid divides NEITHER mesh evenly: the saved
    padded layout (2x3 mesh) is stripped to the physical grid and re-padded
    for the 3x2 mesh."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=14,  # 56x14
                    surface_width=20.0, surface_length=40.0, t_final=1.0,
                    output_timestep=4, t_boundary=0.3, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    mesh_a = make_mesh(shape=(2, 3))
    mesh_b = make_mesh(shape=(3, 2))
    full = simulate_sharded_streaming(cfg, mesh=mesh_a)
    assert full.ok
    ckdir = str(tmp_path / "ck")
    simulate_sharded_streaming(cfg, mesh=mesh_a, checkpoint_every=2,
                               checkpoint_dir=ckdir)
    res = simulate_sharded_streaming(cfg, mesh=mesh_b, resume_dir=ckdir)
    assert res.ok
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(full.trajectory[3:]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(res.stats.steps),
                                  np.asarray(full.stats.steps))


def test_streaming_host_offload_matches(tmp_path):
    """host_offload=True: snapshots pulled to host as produced (bounded
    device memory); trajectory is numpy and identical to the device-resident
    run, including through checkpoint/resume."""
    from crdmodel_tpu.io.checkpoint import resume_streaming

    cfg = _cfg()
    full = simulate_streaming(cfg)
    off = simulate_streaming(cfg, host_offload=True)
    assert off.ok
    assert isinstance(off.trajectory, np.ndarray)
    np.testing.assert_array_equal(np.asarray(off.trajectory),
                                  np.asarray(full.trajectory))

    ck = str(tmp_path / "ck_off.npz")
    simulate_streaming(cfg, checkpoint_every=2, checkpoint_path=ck,
                       host_offload=True)
    res = resume_streaming(cfg, ck, host_offload=True)
    assert res.ok
    np.testing.assert_array_equal(np.asarray(res.trajectory),
                                  np.asarray(full.trajectory))


def test_sharded_checkpoint_detects_mixed_rounds(tmp_path):
    """A save interrupted mid-overwrite leaves shards from two rounds; the
    loader must refuse (every shard carries its round id — review
    finding)."""
    import glob
    import os
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from crdmodel_tpu.io.checkpoint import (load_sharded_checkpoint,
                                            save_sharded_checkpoint)
    from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=16, surface_width=20,
                    surface_length=40, dtype="float64")
    mesh = make_mesh(shape=(2, 4))
    import jax.numpy as jnp
    y = jax.device_put(
        jnp.zeros((2, cfg.ny, cfg.nx)),
        NamedSharding(mesh, P(None, AXIS_Y, AXIS_X)))
    d = str(tmp_path / "ck")
    stats = {k: np.zeros(2, np.int64)
             for k in ("steps", "accepted", "rejected", "status")}
    save_sharded_checkpoint(d, cfg, mesh, 2, y, 0.5, 0.01, 1.0, stats)
    # simulate an interrupted later save: ONE shard advanced to round 4
    f = sorted(glob.glob(os.path.join(d, "y.p*.npz")))[0]
    with np.load(f) as z:
        data, starts = z["data"], z["starts"]
    np.savez_compressed(f, data=data, starts=starts,
                        k_out=np.asarray(4))
    with pytest.raises(ValueError, match="MIXED"):
        load_sharded_checkpoint(d, cfg, mesh)


def test_sharded_writer_append_mode(tmp_path):
    """append=True must preserve previously streamed rows (the resume
    workflow; the default truncates — review finding)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from crdmodel_tpu.io.trajectory import (ShardedReferenceWriter,
                                            read_reference_files)
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=16, surface_width=20,
                    surface_length=40, dtype="float64", include_all_vars=0)
    p = build_problem(cfg)
    mesh = make_mesh(shape=(2, 4))
    sh = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))
    d = str(tmp_path / "out")
    w1 = ShardedReferenceWriter(d, cfg, p.model, mesh)
    y0 = jax.device_put(p.y0, sh)
    w1(0, y0)
    w1(1, jax.device_put(p.y0 + 1.0, sh))
    # fresh writer (a resumed process) appending rows 2..
    w2 = ShardedReferenceWriter(d, cfg, p.model, mesh, append=True)
    w2(2, jax.device_put(p.y0 + 2.0, sh))
    traj, _ = read_reference_files(d, cfg.program_name, "u")
    assert traj.shape[0] == 3
    np.testing.assert_allclose(traj[2] - traj[0], 2.0, atol=1e-12)
    # and the default still truncates (fresh-run semantics)
    w3 = ShardedReferenceWriter(d, cfg, p.model, mesh)
    w3(0, y0)
    traj, _ = read_reference_files(d, cfg.program_name, "u")
    assert traj.shape[0] == 1


def test_elastic_recheckpoint_same_dir(tmp_path):
    """Checkpointing into the same directory after an elastic resume on a
    SMALLER mesh must not poison it (review finding r3): the save prunes
    this process's leftover higher-index shard files, and the loader
    ignores stale-round leftovers that the manifest round fully covers."""
    import glob

    from crdmodel_tpu.io.checkpoint import load_sharded_checkpoint
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=1.0,
                    output_timestep=4, t_boundary=0.3, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    ckdir = str(tmp_path / "ck")
    simulate_sharded_streaming(cfg, mesh=make_mesh(shape=(2, 4)),
                               checkpoint_every=2, checkpoint_dir=ckdir)
    assert len(glob.glob(ckdir + "/y.p*.s*.npz")) == 8
    # elastic resume on 4 devices, re-checkpointing into the SAME dir
    mesh_b = make_mesh(shape=(2, 2))
    res = simulate_sharded_streaming(cfg, mesh=mesh_b, resume_dir=ckdir,
                                     checkpoint_every=1,
                                     checkpoint_dir=ckdir)
    assert res.ok
    # single-process: the save pruned its own leftover s004..s007 files
    assert len(glob.glob(ckdir + "/y.p*.s*.npz")) == 4
    ck = load_sharded_checkpoint(ckdir, cfg, mesh_b)
    assert int(ck["k_out"]) == 3
    # a stale-round file from a process this host never saw must be
    # IGNORED as long as the manifest round is fully covered
    np.savez_compressed(ckdir + "/y.p009.s000.npz",
                        data=np.zeros((1, 1, 1)), starts=np.zeros(3, int),
                        k_out=np.asarray(999))
    ck2 = load_sharded_checkpoint(ckdir, cfg, mesh_b)
    np.testing.assert_array_equal(np.asarray(ck2["y"]), np.asarray(ck["y"]))


def test_streaming_snapshot_modes(tmp_path):
    """snapshot_mode: 'host' (async offload when no writer is attached —
    the device->host copy is kicked immediately and materialised one
    interval later, sim.py::_run_streaming_loop.offload) matches the
    device-resident run exactly; 'none' captures nothing and returns only
    the final state; invalid combinations are refused."""
    cfg = _cfg()
    full = simulate_streaming(cfg)
    # async host path (no on_snapshot): identical trajectory
    host = simulate_streaming(cfg, snapshot_mode="host")
    assert isinstance(host.trajectory, np.ndarray)
    np.testing.assert_array_equal(np.asarray(host.trajectory),
                                  np.asarray(full.trajectory))
    # none: one entry, the final state, steps bookkeeping intact
    none = simulate_streaming(cfg, snapshot_mode="none")
    assert none.ok
    assert none.trajectory.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(none.trajectory[0]),
                                  np.asarray(full.trajectory[-1]))
    np.testing.assert_array_equal(np.asarray(none.stats.steps),
                                  np.asarray(full.stats.steps))
    assert float(none.touts[0]) == float(cfg.t_final)
    with pytest.raises(ValueError, match="on_snapshot"):
        simulate_streaming(cfg, snapshot_mode="none",
                           on_snapshot=lambda k, y: None)
    with pytest.raises(ValueError, match="checkpoint"):
        simulate_streaming(cfg, snapshot_mode="none", checkpoint_every=2,
                           checkpoint_path=str(tmp_path / "ck.npz"))
    with pytest.raises(ValueError, match="snapshot_mode"):
        simulate_streaming(cfg, snapshot_mode="bogus")


def test_sharded_streaming_snapshot_modes():
    """Sharded streaming honours snapshot_mode: 'host' (async) matches
    'device' exactly; 'none' keeps only the final state."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming

    cfg = _cfg(x_mesh=16)
    mesh = make_mesh(n_devices=4, grid_shape=(cfg.ny, cfg.nx))
    dev = simulate_sharded_streaming(cfg, mesh=mesh)
    host = simulate_sharded_streaming(cfg, mesh=mesh, snapshot_mode="host")
    np.testing.assert_array_equal(np.asarray(host.trajectory),
                                  np.asarray(dev.trajectory))
    none = simulate_sharded_streaming(cfg, mesh=mesh, snapshot_mode="none")
    assert none.ok and none.trajectory.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(none.trajectory[0]),
                                  np.asarray(dev.trajectory[-1]))
    np.testing.assert_array_equal(np.asarray(none.stats.steps),
                                  np.asarray(dev.stats.steps))
