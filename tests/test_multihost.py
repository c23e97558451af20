"""Multi-host execution: 2 coordinated processes must match 1 process.

Spawns two real Python processes, each with 4 virtual CPU devices, that
jax.distributed-coordinate into one 8-device mesh spanning both — the JAX
equivalent of the reference's multi-node MPI world
(src/FHNmodel_torus.cpp:217-220) — and runs the sharded streaming driver.
Process 0's gathered trajectory must match the plain single-process
sharded run to f64 round-off.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]

from crdmodel_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nprocs, process_id=pid)
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from crdmodel_tpu.config import SimConfig
cfg = SimConfig(model="fhn", surface="torus", x_mesh=16, surface_width=20.0,
                surface_length=40.0, t_final=0.4, output_timestep=2,
                vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.2,
                dtype="float64", rtol=1e-6, atol=1e-10)
mesh = multihost.make_global_mesh((cfg.ny, cfg.nx), shape=(2, 4))
res = multihost.simulate_sharded_multihost(cfg, mesh=mesh)
assert res.ok, np.asarray(res.stats.status)
if jax.process_index() == 0:
    np.savez(out, trajectory=np.asarray(res.trajectory),
             steps=np.asarray(res.stats.steps))
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    out = str(tmp_path / "mh.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD, str(pid), "2", port, out],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se}"
    with np.load(out) as z:
        traj_mh = z["trajectory"]
        steps_mh = z["steps"]

    # single-process sharded reference on the same 2x4 mesh (8 local devices
    # forced by conftest)
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.4,
                    output_timestep=2, vary_beta=1, beta_min=0.7,
                    beta_max=1.7, t_boundary=0.2, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    res = simulate_sharded_streaming(cfg, mesh=make_mesh(shape=(2, 4)))
    assert res.ok
    np.testing.assert_array_equal(steps_mh, np.asarray(res.stats.steps))
    np.testing.assert_allclose(traj_mh, np.asarray(res.trajectory),
                               rtol=1e-13, atol=1e-13)


CHILD_CKPT = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]; ckdir = sys.argv[5]

from crdmodel_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nprocs, process_id=pid)

from crdmodel_tpu.config import SimConfig
cfg = SimConfig(model="fhn", surface="torus", x_mesh=16, surface_width=20.0,
                surface_length=40.0, t_final=0.4, output_timestep=4,
                vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.1,
                dtype="float64", rtol=1e-6, atol=1e-10)
mesh = multihost.make_global_mesh((cfg.ny, cfg.nx), shape=(2, 4))
full = multihost.simulate_sharded_multihost(cfg, mesh=mesh)
assert full.ok
multihost.simulate_sharded_multihost(cfg, mesh=mesh, checkpoint_every=2,
                                     checkpoint_dir=ckdir,
                                     checkpoint_backend="orbax")
res = multihost.simulate_sharded_multihost(cfg, mesh=mesh, resume_dir=ckdir,
                                           checkpoint_backend="orbax")
assert res.ok
if jax.process_index() == 0:
    np.savez(out, full=np.asarray(full.trajectory),
             resumed=np.asarray(res.trajectory),
             steps_full=np.asarray(full.stats.steps),
             steps_res=np.asarray(res.stats.steps),
             touts_res=np.asarray(res.touts))
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_orbax_checkpoint_resume(tmp_path):
    """Orbax checkpoint written collectively by 2 coordinated processes and
    resumed on the same process-spanning mesh: post-resume snapshots must
    equal the uninterrupted run's."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    out = str(tmp_path / "mh_ck.npz")
    ckdir = str(tmp_path / "ck")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD_CKPT, str(pid), "2", port, out, ckdir],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se}"
    with np.load(out) as z:
        # checkpoint at k_out=2 of 4 -> post-resume rows are outputs 3, 4
        assert z["resumed"].shape[0] == 2
        np.testing.assert_allclose(z["resumed"], z["full"][3:],
                                   rtol=1e-13, atol=1e-13)
        np.testing.assert_array_equal(z["steps_res"], z["steps_full"])
        np.testing.assert_allclose(z["touts_res"], [0.3, 0.4])


CHILD_WRITER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
outdir = sys.argv[4]

from crdmodel_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nprocs, process_id=pid)

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.io.trajectory import ShardedReferenceWriter
cfg = SimConfig(model="fhn", surface="torus", x_mesh=16, surface_width=20.0,
                surface_length=40.0, t_final=0.4, output_timestep=2,
                include_all_vars=1, dtype="float64", rtol=1e-6, atol=1e-10)
mesh = multihost.make_global_mesh((cfg.ny, cfg.nx), shape=(2, 4))
problem = build_problem(cfg)
writer = ShardedReferenceWriter(outdir, cfg, problem.model, mesh)
res = multihost.simulate_sharded_multihost(cfg, mesh=mesh, problem=problem,
                                           on_snapshot=writer, gather=False)
assert res.ok
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_sharded_writer(tmp_path):
    """gather=False + ShardedReferenceWriter: each process streams only its
    own devices' shards to reference-format files; the union reassembles to
    the single-process trajectory (the production pod IO path)."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    outdir = str(tmp_path / "shards")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD_WRITER, str(pid), "2", port, outdir],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se}"

    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.io.trajectory import probe_nprocs, read_reference_files
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.4,
                    output_timestep=2, include_all_vars=1,
                    dtype="float64", rtol=1e-6, atol=1e-10)
    assert probe_nprocs(outdir, cfg.program_name) == 8  # all shards present
    single = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)))
    for v, name in ((0, "u"), (1, "v")):
        arr, _ = read_reference_files(outdir, cfg.program_name, var=name)
        np.testing.assert_allclose(
            arr, np.asarray(single.trajectory)[:, v], rtol=0, atol=1e-15)


CHILD4 = CHILD.replace('assert jax.local_device_count() == 4',
                       'assert jax.local_device_count() == 2'
                       ).replace(
    'rtol=1e-6, atol=1e-10)',
    'rtol=1e-6, atol=1e-10, method="ark324")')


@pytest.mark.slow
def test_four_process_mesh_matches_single_process(tmp_path):
    """4 coordinated processes x 2 devices = the same 8-device mesh; run
    through the IMEX stepper (shard-local Newton) for good measure. The
    stronger DCN analogue: 4 'nodes' like the reference's mpirun -np 4
    (util/ShellScripts/runFHNmodelTorus.sh:6)."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    out = str(tmp_path / "mh4.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD4, str(pid), "4", port, out],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1, 2, 3)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se}"
    with np.load(out) as z:
        traj_mh = z["trajectory"]
        steps_mh = z["steps"]

    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.4,
                    output_timestep=2, vary_beta=1, beta_min=0.7,
                    beta_max=1.7, t_boundary=0.2, dtype="float64",
                    rtol=1e-6, atol=1e-10, method="ark324")
    ref = simulate_sharded_streaming(cfg, mesh=make_mesh(shape=(2, 4)))
    assert ref.ok
    np.testing.assert_allclose(traj_mh, np.asarray(ref.trajectory),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(steps_mh, np.asarray(ref.stats.steps))


CHILD_NORMAL = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]

from crdmodel_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nprocs, process_id=pid)

from crdmodel_tpu.config import SimConfig
cfg = SimConfig(model="fhn", surface="torus", x_mesh=16, surface_width=20.0,
                surface_length=40.0, t_final=0.4, output_timestep=2,
                vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.2,
                dtype="float64", rtol=1e-6, atol=1e-10, step_mode="normal")
mesh = multihost.make_global_mesh((cfg.ny, cfg.nx), shape=(2, 4))
res = multihost.simulate_sharded_multihost(cfg, mesh=mesh)
assert res.ok, np.asarray(res.stats.status)
if jax.process_index() == 0:
    np.savez(out, trajectory=np.asarray(res.trajectory),
             steps=np.asarray(res.stats.steps))
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_normal_mode_matches_single(tmp_path):
    """ARK_NORMAL streaming across a process-spanning mesh: free-running
    intervals + the dense-output bracket ride the multi-process mesh; the
    result must match the plain single-device batch-normal run."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    out = str(tmp_path / "mh_n.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD_NORMAL, str(pid), "2", port, out],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se}"
    with np.load(out) as z:
        traj_mh = z["trajectory"]
        steps_mh = z["steps"]

    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.sim import simulate
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.4,
                    output_timestep=2, vary_beta=1, beta_min=0.7,
                    beta_max=1.7, t_boundary=0.2, dtype="float64",
                    rtol=1e-6, atol=1e-10, step_mode="normal")
    res = simulate(cfg)
    assert res.ok
    np.testing.assert_array_equal(steps_mh, np.asarray(res.stats.steps))
    np.testing.assert_allclose(traj_mh, np.asarray(res.trajectory),
                               rtol=1e-12, atol=1e-12)


CHILD_ENSEMBLE = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]

from crdmodel_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nprocs, process_id=pid)
assert jax.device_count() == 8

from crdmodel_tpu.config import SimConfig
cfg = SimConfig(model="fhn", surface="torus", x_mesh=16, surface_width=20.0,
                surface_length=40.0, t_final=0.4, output_timestep=2,
                beta=1.25, dtype="float64", rtol=1e-6, atol=1e-10)
betas = [1.0, 1.05, 1.1, 1.15, 1.2, 1.25, 1.3, 1.35]
res = multihost.sweep_beta_multihost(cfg, betas)
if jax.process_index() == 0:
    np.savez(out, traj=np.asarray(res.trajectories),
             steps=np.asarray(res.stats.steps))
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_member_ensemble_sweep(tmp_path):
    """VERDICT r3 #8a: the 'member' ensemble axis spans PROCESSES — 8 beta
    members over 2 coordinated processes x 4 devices (DCN analogue of
    parallel/ensemble.py), matching the single-process vmap sweep."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    out = str(tmp_path / "mh_sweep.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD_ENSEMBLE, str(pid), "2", port, out],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se}"

    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.sweep import sweep_beta
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.4,
                    output_timestep=2, beta=1.25, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    betas = [1.0, 1.05, 1.1, 1.15, 1.2, 1.25, 1.3, 1.35]
    ref = sweep_beta(cfg, betas, batch_mode="vmap")
    with np.load(out) as z:
        np.testing.assert_array_equal(z["steps"],
                                      np.asarray(ref.stats.steps))
        np.testing.assert_allclose(z["traj"],
                                   np.asarray(ref.trajectories),
                                   rtol=1e-12, atol=1e-12)


CHILD_SAVE_ONLY = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]; ckdir = sys.argv[5]

from crdmodel_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nprocs, process_id=pid)

from crdmodel_tpu.config import SimConfig
cfg = SimConfig(model="fhn", surface="torus", x_mesh=16, surface_width=20.0,
                surface_length=40.0, t_final=0.4, output_timestep=4,
                vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.1,
                dtype="float64", rtol=1e-6, atol=1e-10)
mesh = multihost.make_global_mesh((cfg.ny, cfg.nx), shape=(2, 4))
full = multihost.simulate_sharded_multihost(cfg, mesh=mesh)
assert full.ok
multihost.simulate_sharded_multihost(cfg, mesh=mesh, checkpoint_every=2,
                                     checkpoint_dir=ckdir,
                                     checkpoint_backend="orbax")
if jax.process_index() == 0:
    np.savez(out, full=np.asarray(full.trajectory),
             steps_full=np.asarray(full.stats.steps))
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_elastic_resume_across_process_counts(tmp_path):
    """VERDICT r3 #8b: an orbax checkpoint written collectively by TWO
    processes resumes in ONE process — on the same mesh shape AND on a
    different one (elastic re-layout) — matching the uninterrupted
    2-process run exactly."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    out = str(tmp_path / "mh_save.npz")
    ckdir = str(tmp_path / "ck")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD_SAVE_ONLY, str(pid), "2", port, out,
         ckdir],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se}"
    with np.load(out) as z:
        full = z["full"]

    # resume in THIS single process (8 local devices) on the saved mesh
    # shape and on a different one
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.4,
                    output_timestep=4, vary_beta=1, beta_min=0.7,
                    beta_max=1.7, t_boundary=0.1, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    for shape in [(2, 4), (4, 2)]:
        res = simulate_sharded_streaming(cfg, mesh=make_mesh(shape=shape),
                                         resume_dir=ckdir,
                                         checkpoint_backend="orbax")
        assert res.ok
        assert np.asarray(res.trajectory).shape[0] == 2
        np.testing.assert_allclose(np.asarray(res.trajectory), full[3:],
                                   rtol=1e-12, atol=1e-12)
