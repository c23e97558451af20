"""Ensemble (member-axis) device-parallel sweeps — parallel/ensemble.py.

The reference's only sweep mechanism is separate mpirun launches
(/root/reference/README.md:29-34); these tests pin the device-sharded
generalisation: members distributed over a 'member' mesh axis, each device
(or spatial submesh) running the full single-member adaptive program.

Oracles: the vmapped sweep (bitwise-identical lockstep semantics,
tests/test_sweep.py pins IT against individual runs) and individual
simulate() runs. Composed member x spatial meshes run in collective
lockstep — per-member step counts must still match separate runs exactly,
EXCEPT composed rkc2, whose member-pmax'ed stage count is a documented
divergence (integration-tolerance match; identical members stay exact).
"""

import dataclasses

import jax
import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.parallel.ensemble import (make_ensemble_mesh,
                                            make_ensemble_sweep_fn)
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.sweep import sweep_beta, sweep_configs

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

BETAS6 = [0.9, 1.0, 1.1, 1.2, 1.3, 1.4]


def _cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=12, surface_width=20,
                surface_length=40, t_final=1.0, output_timestep=2,
                t_boundary=0.4, beta=1.25, dtype="float64",
                rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def _stats_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_member_only_matches_individual_runs():
    cfg = _cfg()
    betas = [0.9, 1.0, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6]
    res = sweep_beta(cfg, betas, mesh=make_ensemble_mesh(8))
    assert res.ok()
    for i, b in enumerate(betas):
        single = simulate(dataclasses.replace(cfg, beta=b))
        np.testing.assert_array_equal(np.asarray(res.trajectories[i]),
                                      np.asarray(single.trajectory))
        assert np.array_equal(np.asarray(res.stats.steps[i]),
                              np.asarray(single.stats.steps))


def test_member_fold_and_padding():
    # B=6 on a 4-member mesh: k=2 serial fold with 2 padded (dropped)
    # members on the last fold
    cfg = _cfg()
    ref = sweep_beta(cfg, BETAS6, batch_mode="vmap")
    res = sweep_beta(cfg, BETAS6, mesh=make_ensemble_mesh(4))
    assert res.trajectories.shape[0] == 6
    np.testing.assert_array_equal(np.asarray(res.trajectories),
                                  np.asarray(ref.trajectories))
    assert _stats_equal(ref.stats, res.stats)


def test_composed_member_spatial_lockstep():
    cfg = _cfg()
    ref = sweep_beta(cfg, BETAS6, batch_mode="vmap")
    res = sweep_beta(cfg, BETAS6,
                     mesh=make_ensemble_mesh(2, spatial_shape=(2, 2)))
    np.testing.assert_allclose(np.asarray(res.trajectories),
                               np.asarray(ref.trajectories),
                               rtol=0, atol=1e-12)
    # lockstep masking must leave per-member step sequences untouched
    assert _stats_equal(ref.stats, res.stats)


def test_composed_uneven_grid():
    # ny=13, nx=13 does not divide the 2x2 spatial submesh: pad-and-mask
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=13,
                    surface_width=20, surface_length=35, t_final=0.5,
                    output_timestep=2, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    assert cfg.ny % 2 == 1 and cfg.nx % 2 == 1
    ref = sweep_beta(cfg, BETAS6, batch_mode="vmap")
    res = sweep_beta(cfg, BETAS6,
                     mesh=make_ensemble_mesh(2, spatial_shape=(2, 2)))
    np.testing.assert_allclose(np.asarray(res.trajectories),
                               np.asarray(ref.trajectories),
                               rtol=0, atol=1e-12)
    assert _stats_equal(ref.stats, res.stats)


@pytest.mark.parametrize("mesh_kind", ["member", "composed"])
def test_diffusion_sweep(mesh_kind):
    cfg = _cfg()
    ovr = [{"diffusion": d} for d in (0.06, 0.12, 0.24)]
    mesh = (make_ensemble_mesh(4) if mesh_kind == "member"
            else make_ensemble_mesh(2, spatial_shape=(2, 2)))
    ref = sweep_configs(cfg, ovr, batch_mode="vmap")
    res = sweep_configs(cfg, ovr, mesh=mesh)
    np.testing.assert_allclose(np.asarray(res.trajectories),
                               np.asarray(ref.trajectories),
                               rtol=0, atol=1e-12)
    assert _stats_equal(ref.stats, res.stats)


@pytest.mark.parametrize("mesh_kind", ["member", "composed"])
def test_normal_mode(mesh_kind):
    cfg = _cfg(step_mode="normal")
    mesh = (make_ensemble_mesh(4) if mesh_kind == "member"
            else make_ensemble_mesh(2, spatial_shape=(2, 2)))
    ref = sweep_beta(cfg, BETAS6, batch_mode="vmap")
    res = sweep_beta(cfg, BETAS6, mesh=mesh)
    np.testing.assert_allclose(np.asarray(res.trajectories),
                               np.asarray(ref.trajectories),
                               rtol=0, atol=1e-12)
    assert _stats_equal(ref.stats, res.stats)


def test_rkc2_member_only_bitwise():
    cfg = _cfg(method="rkc2")
    res = sweep_beta(cfg, BETAS6, mesh=make_ensemble_mesh(4))
    assert res.ok()
    for i, b in enumerate(BETAS6):
        single = simulate(dataclasses.replace(cfg, beta=b))
        np.testing.assert_array_equal(np.asarray(res.trajectories[i]),
                                      np.asarray(single.trajectory))


def test_rkc2_composed_identical_members_exact():
    # identical members make the cross-member stage pmax an identity, so
    # the composed run must reproduce the plain spatially-sharded program
    # (and hence the solo step sequence) exactly
    cfg = _cfg(method="rkc2")
    betas = [1.2] * 2
    res = sweep_beta(cfg, betas,
                     mesh=make_ensemble_mesh(2, spatial_shape=(2, 2)))
    assert res.ok()
    single = simulate(dataclasses.replace(cfg, beta=1.2))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(res.trajectories[i]),
                                   np.asarray(single.trajectory),
                                   rtol=0, atol=1e-12)
        assert np.array_equal(np.asarray(res.stats.steps[i]),
                              np.asarray(single.stats.steps))


def test_rkc2_composed_stage_sync():
    # heterogeneous members on the composed mesh: the Chebyshev stage
    # count is pmax'ed over the member axis (collective lockstep), so a
    # member forced above its solo stage requirement takes a different but
    # equally valid step — solutions match solo runs to integration
    # tolerance, never bitwise (documented divergence,
    # parallel/sharded.py::build_local_run)
    cfg = _cfg(method="rkc2")
    res = sweep_beta(cfg, BETAS6,
                     mesh=make_ensemble_mesh(2, spatial_shape=(2, 2)))
    assert res.ok()
    for i, b in enumerate(BETAS6):
        single = simulate(dataclasses.replace(cfg, beta=b))
        np.testing.assert_allclose(np.asarray(res.trajectories[i]),
                                   np.asarray(single.trajectory),
                                   rtol=0, atol=5e-4)


@pytest.mark.parametrize("mesh_kind", ["member", "composed"])
def test_vary_beta_field_sweep(mesh_kind):
    # vary_beta: the (ny,1) ramp field b is identical across members while
    # diffusion sweeps — exercises the field-b member specs
    cfg = SimConfig(model="goldbeter", surface="torus", x_mesh=12,
                    surface_width=20, surface_length=40, t_final=0.2,
                    output_timestep=2, beta=0.4, vary_beta=1,
                    beta_min=0.1, beta_max=0.9, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    ovr = [{"diffusion": d} for d in (0.06, 0.12, 0.24)]
    mesh = (make_ensemble_mesh(4) if mesh_kind == "member"
            else make_ensemble_mesh(2, spatial_shape=(2, 2)))
    ref = sweep_configs(cfg, ovr, batch_mode="vmap")
    res = sweep_configs(cfg, ovr, mesh=mesh)
    np.testing.assert_allclose(np.asarray(res.trajectories),
                               np.asarray(ref.trajectories),
                               rtol=0, atol=1e-11)
    assert _stats_equal(ref.stats, res.stats)


def test_ark324_composed():
    # IMEX lockstep: fixed Newton iteration count keeps collectives matched
    cfg = _cfg(method="ark324", t_final=0.5)
    betas = [1.0, 1.2, 1.4]
    ref = sweep_beta(cfg, betas, batch_mode="vmap")
    res = sweep_beta(cfg, betas,
                     mesh=make_ensemble_mesh(2, spatial_shape=(2, 2)))
    np.testing.assert_allclose(np.asarray(res.trajectories),
                               np.asarray(ref.trajectories),
                               rtol=0, atol=1e-12)
    assert _stats_equal(ref.stats, res.stats)


def test_fused_interpreter_member_only():
    # the fused Pallas single-device step inside the member shard_map,
    # interpreter mode: must match the SAME fused program run per member
    # (runtime _fused_b input) bitwise
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.sim import make_run_fn
    import jax.numpy as jnp

    cfg = _cfg(dtype="float32", use_pallas=True, rtol=1e-4, atol=1e-7,
               t_final=0.5)
    problem = build_problem(cfg)
    betas = [1.1, 1.3]
    run_e, touts, _ = make_ensemble_sweep_fn(problem, make_ensemble_mesh(2),
                                             interpret=True)
    from crdmodel_tpu.sweep import sweep_configs as _sc  # ICs per member
    probs = [build_problem(dataclasses.replace(cfg, beta=b)) for b in betas]
    y0s = jnp.stack([p.y0 for p in probs])
    b = jnp.asarray(betas, jnp.float32)
    traj_e, stats_e = run_e(y0s, b, jnp.ones(2, jnp.float32))

    run1 = jax.jit(make_run_fn(problem, interpret=True)[0])
    for i, p in enumerate(probs):
        traj1, stats1 = run1(p.y0, {"b": b[i],
                                    "_fused_b": jnp.reshape(b[i], (1, 1))})
        # f32: jit-vs-shard_map compilation may reassociate elementwise
        # chains; step sequences must still match exactly
        np.testing.assert_allclose(np.asarray(traj_e[i]),
                                   np.asarray(traj1), rtol=0, atol=2e-6)
        assert np.array_equal(np.asarray(stats_e.steps[i]),
                              np.asarray(stats1.steps))


def test_fused_shard_kernels_composed_ensemble():
    # composed member x spatial mesh with the fused shard step kernel
    # (interpreter): lockstep-safe (fixed ppermute count per step), with
    # per-member beta AND diffusion riding prepare_params' runtime
    # _fused_b/_fused_coeffs inputs (ops/kernel_common.py dscale scaling).
    # Oracle: the same fused kernel on a plain 2x2 spatial mesh, one
    # member at a time.
    import jax.numpy as jnp
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (make_sharded_simulation_fn,
                                               sharded_params)
    from jax.sharding import PartitionSpec as P

    cfg = SimConfig(model="fhn", surface="flat", x_mesh=16,
                    surface_width=20, surface_length=40, t_final=0.5,
                    output_timestep=2, beta=1.25, dtype="float32",
                    use_pallas=True, rtol=1e-4, atol=1e-7)
    problem = build_problem(cfg)
    members = [(1.1, 1.0), (1.3, 2.0)]   # (beta, dscale)
    probs = [build_problem(dataclasses.replace(cfg, beta=b))
             for b, _ in members]
    y0s = jnp.stack([p.y0 for p in probs])
    b = jnp.asarray([m[0] for m in members], jnp.float32)
    ds = jnp.asarray([m[1] for m in members], jnp.float32)

    emesh = make_ensemble_mesh(2, spatial_shape=(2, 2))
    run_e, _, _ = make_ensemble_sweep_fn(problem, emesh, sweep_d=True,
                                         interpret=True)
    traj_e, stats_e = run_e(y0s, b, ds)

    smesh = make_mesh(shape=(2, 2))
    params0, _ = sharded_params(problem)
    run1, _ = make_sharded_simulation_fn(problem, smesh,
                                         interpret_pallas=True,
                                         extra_param_specs={"dscale": P()})
    for i, (bi, di) in enumerate(members):
        traj1, stats1 = run1(probs[i].y0,
                             {**params0, "b": jnp.asarray(bi, jnp.float32),
                              "dscale": jnp.asarray(di, jnp.float32)})
        np.testing.assert_allclose(np.asarray(traj_e[i]),
                                   np.asarray(traj1), rtol=0, atol=2e-6)
        assert np.array_equal(np.asarray(stats_e.steps[i]),
                              np.asarray(stats1.steps))


def test_cli_ensemble_sweep(tmp_path):
    from crdmodel_tpu.cli import main
    ini = tmp_path / "s.ini"
    ini.write_text("[Parameters]\ndiffusion = 0.12\nbeta = 1.25\n"
                   "surfaceWidth = 20\nsurfaceLength = 40\n"
                   "waveLength = 0.1\nwaveWidth = 0.5\nwaveInside = 1\n"
                   "outputTimestep = 2\ntBoundary = 0\ntFinal = 0.5\n"
                   "xMesh = 10\n[System]\nvaryBeta = 0\n")
    npz = tmp_path / "sweep.npz"
    rc = main(["sweep", str(ini), "--model", "fhn", "--surface", "flat",
               "--dtype", "float64", "--betas", "1.0:1.3:4",
               "--ensemble-devices", "2", "--ensemble-spatial", "2x2",
               "--npz", str(npz)])
    assert rc == 0
    data = np.load(npz)
    assert data["trajectories"].shape[0] == 4
    assert np.all(data["status"] == 0)


def test_batch_mode_validation():
    cfg = _cfg()
    with pytest.raises(ValueError, match="devices"):
        sweep_beta(cfg, BETAS6, batch_mode="devices")   # no member mesh
    with pytest.raises(ValueError, match="member"):
        sweep_beta(cfg, BETAS6, mesh=make_ensemble_mesh(4),
                   batch_mode="vmap")                   # member mesh: devices only
