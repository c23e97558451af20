"""Sharding correctness: single- vs multi-device equivalence (SURVEY.md §4d).

The same grid sharded 1x1 vs 2x4 (etc.) must match to float64 bitwise-level
tolerance — this replaces the reference's untestable MPI path, and runs on
the 8 virtual CPU devices forced in conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.ops.stencil import flat_laplacian, torus_laplacian
from crdmodel_tpu.parallel.halo import halo_pad
from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, balanced_dims, make_mesh
from crdmodel_tpu.parallel.sharded import (
    make_local_rhs, make_sharded_simulation_fn, sharded_params, simulate_sharded,
)
from crdmodel_tpu.sim import simulate
from jax.sharding import PartitionSpec as P

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_balanced_dims():
    assert balanced_dims(8, 1600, 400) in [(4, 2), (2, 4), (8, 1)]
    py, px = balanced_dims(8, 1600, 400)
    assert 1600 % py == 0 and 400 % px == 0
    # ANY (devices, grid) pair is accepted (reference SetupDecomp semantics,
    # src/FHNmodel_torus.cpp:750-755): non-dividing grids pad-and-mask
    assert balanced_dims(7, 10, 10) in [(7, 1), (1, 7)]
    py, px = balanced_dims(8, 39, 17)   # prefers balance among non-exact
    assert py * px == 8 and py <= 39 and px <= 17
    # exactly dividing factorisations still win when they exist
    assert balanced_dims(8, 40, 17) == (8, 1)
    with pytest.raises(ValueError):
        balanced_dims(64, 4, 4)   # no factorisation fits the grid


@pytest.mark.parametrize("mesh_shape", [(1, 1), (2, 4), (4, 2), (8, 1), (1, 8)])
def test_halo_pad_matches_wrap(mesh_shape):
    """shard_map halo_pad must equal single-device jnp.pad(mode='wrap')."""
    ny, nx = 16, 24
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    mesh = make_mesh(shape=mesh_shape)

    padded_blocks = jax.jit(jax.shard_map(
        lambda x: halo_pad(x)[None],  # leading axis to carry block identity
        mesh=mesh, in_specs=P(AXIS_Y, AXIS_X),
        out_specs=P(None, AXIS_Y, AXIS_X),
    ))(u)
    # reconstruct: each device's padded interior must match the wrap-pad of
    # the full array at its block position
    want_full = np.pad(np.asarray(u), 1, mode="wrap")
    py, px = mesh_shape
    nyl, nxl = ny // py, nx // px
    got = np.asarray(padded_blocks)
    # sharded out along py/px on axes 1,2: got has global shape (1, ny+2*py, nx+2*px)
    for iy in range(py):
        for ix in range(px):
            block = got[0, iy * (nyl + 2):(iy + 1) * (nyl + 2),
                        ix * (nxl + 2):(ix + 1) * (nxl + 2)]
            u_np = np.asarray(u)
            interior = u_np[iy * nyl:(iy + 1) * nyl, ix * nxl:(ix + 1) * nxl]
            np.testing.assert_array_equal(block[1:-1, 1:-1], interior)
            # halo rows: wrap of global
            np.testing.assert_array_equal(
                block[0, 1:-1],
                u_np[(iy * nyl - 1) % ny, ix * nxl:(ix + 1) * nxl])
            np.testing.assert_array_equal(
                block[-1, 1:-1],
                u_np[((iy + 1) * nyl) % ny, ix * nxl:(ix + 1) * nxl])
            np.testing.assert_array_equal(
                block[1:-1, 0],
                u_np[iy * nyl:(iy + 1) * nyl, (ix * nxl - 1) % nx])
            np.testing.assert_array_equal(
                block[1:-1, -1],
                u_np[iy * nyl:(iy + 1) * nyl, ((ix + 1) * nxl) % nx])


@pytest.mark.parametrize("surface,mesh_shape", [
    ("flat", (2, 4)), ("torus", (2, 4)), ("torus", (8, 1)), ("flat", (1, 8)),
])
def test_sharded_rhs_matches_global(surface, mesh_shape):
    cfg = SimConfig(model="fhn", surface=surface, x_mesh=16,
                    surface_width=20, surface_length=40, t_boundary=5.0,
                    vary_beta=1, beta_min=0.7, beta_max=1.7, dtype="float64")
    p = build_problem(cfg)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal(p.y0.shape))
    t = jnp.asarray(1.0)
    want = np.asarray(p.rhs(t, y, p.params))

    mesh = make_mesh(shape=mesh_shape)
    local_rhs = make_local_rhs(cfg, p.model, p.geometry.kind)
    params, specs = sharded_params(p)
    got = jax.jit(jax.shard_map(
        lambda yy, pp: local_rhs(t, yy, pp),
        mesh=mesh, in_specs=(P(None, AXIS_Y, AXIS_X), specs),
        out_specs=P(None, AXIS_Y, AXIS_X),
    ))(y, params)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("model,surface", [
    ("fhn", "flat"), ("fhn", "torus"), ("goldbeter", "torus"),
])
def test_sharded_simulation_matches_single_device(model, surface):
    """Full adaptive run on a 2x4 mesh vs the roll-based single-device path.
    Identical f64 arithmetic order is not guaranteed (psum tree vs jnp.sum),
    so tolerance is tight-but-not-bitwise."""
    beta = 1.25 if model == "fhn" else 0.85
    cfg = SimConfig(model=model, surface=surface, x_mesh=16,
                    surface_width=20, surface_length=40, beta=beta,
                    t_final=2.0, output_timestep=2, t_boundary=1.0,
                    dtype="float64", rtol=1e-6, atol=1e-10)
    res1 = simulate(cfg)
    assert res1.ok
    res8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)))
    assert res8.ok
    np.testing.assert_allclose(np.asarray(res8.trajectory),
                               np.asarray(res1.trajectory),
                               rtol=1e-9, atol=1e-9)
    # step-control decisions agree up to psum-vs-sum rounding flips near
    # err==1 (at most a couple of borderline accepts)
    assert np.abs(np.asarray(res8.stats.steps)
                  - np.asarray(res1.stats.steps)).max() <= 2


def test_sharded_simulation_with_breakpoint_freeze():
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20, surface_length=80,
                    t_final=3.0, output_timestep=3, t_boundary=1.7,
                    vary_beta=1, beta_min=0.7, beta_max=1.7,
                    dtype="float64", rtol=1e-6, atol=1e-10)
    res1 = simulate(cfg)
    res8 = simulate_sharded(cfg, mesh=make_mesh(shape=(4, 2)))
    assert res1.ok and res8.ok
    # the freeze-release interval is a stiff transient: a single
    # psum-rounding-flipped accept there compounds to ~integrator tolerance;
    # equivalence holds at the accuracy the tolerances promise (rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res8.trajectory),
                               np.asarray(res1.trajectory),
                               rtol=1e-5, atol=1e-6)


def test_sharded_rkc2_matches_single_device():
    """RKC2 under shard_map: stage counts from pmax'd rho bounds must agree
    across devices, matching the single-device run."""
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.0, output_timestep=2, method="rkc2",
                    dtype="float64", rtol=1e-6, atol=1e-10)
    res1 = simulate(cfg)
    res8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)))
    assert res1.ok and res8.ok
    np.testing.assert_allclose(np.asarray(res8.trajectory),
                               np.asarray(res1.trajectory),
                               rtol=1e-8, atol=1e-9)


def test_sharded_streaming_matches_batch():
    """Per-interval dispatch sharded driver == whole-run sharded driver."""
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20, surface_length=40, beta=1.25,
                    t_final=1.0, output_timestep=2, t_boundary=0.4,
                    dtype="float64", rtol=1e-6, atol=1e-10)
    mesh = make_mesh(shape=(2, 4))
    batch = simulate_sharded(cfg, mesh=mesh)
    seen = []
    stream = simulate_sharded_streaming(
        cfg, mesh=mesh, on_snapshot=lambda k, y: seen.append(k))
    assert batch.ok and stream.ok
    assert seen == [0, 1, 2]
    np.testing.assert_allclose(np.asarray(stream.trajectory),
                               np.asarray(batch.trajectory),
                               rtol=1e-12, atol=1e-12)
    assert stream.total_steps() == batch.total_steps()


# ---------------------------------------------------------------------------
# Fused multi-stage shard kernel (ops/pallas_shard_step.py), run through the
# Pallas interpreter on the virtual CPU mesh. One width-8 halo exchange per
# step feeds all RK stages in a single kernel; results must match the XLA
# per-stage path exactly (FHN measured bitwise; GB to f32 round-off).
# ---------------------------------------------------------------------------

def _fused_cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=64, surface_width=10.0,
                surface_length=20.0, t_final=0.2, output_timestep=2,
                beta=1.25, dtype="float32", rtol=1e-4, atol=1e-6,
                use_pallas=True)
    base.update(kw)
    return SimConfig(**base)


def _run_pair(cfg, mesh_shape=(2, 4)):
    import dataclasses
    mesh = make_mesh(shape=mesh_shape)
    problem = build_problem(cfg)
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh,
                                          interpret_pallas=True)
    traj_f, stats_f = run_f(problem.y0, params)
    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)
    return (np.asarray(traj_f), stats_f), (np.asarray(traj_x), stats_x)


def test_fused_shard_kernel_flat_bitwise():
    (tf, sf), (tx, sx) = _run_pair(_fused_cfg(t_boundary=0.1))
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    np.testing.assert_array_equal(tf, tx)


def test_fused_shard_kernel_torus_varybeta_freeze():
    cfg = _fused_cfg(surface="torus", surface_width=20.0, surface_length=40.0,
                     vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=0.1)
    (tf, sf), (tx, sx) = _run_pair(cfg)
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    np.testing.assert_array_equal(tf, tx)


def test_fused_shard_kernel_goldbeter():
    cfg = _fused_cfg(model="goldbeter", surface="torus", beta=0.4,
                     surface_width=20.0, surface_length=40.0)
    (tf, _), (tx, _) = _run_pair(cfg)
    np.testing.assert_allclose(tf, tx, rtol=0, atol=1e-5)


def test_fused_shard_kernel_grayscott_multispecies():
    """Gray-Scott diffuses BOTH species (diffusion_ratios (1.0, 0.5)) — the
    fused kernels' per-variable diffusion path must match the XLA per-stage
    sharded path bitwise."""
    cfg = _fused_cfg(model="grayscott", beta=0.03, t_final=0.5)
    (tf, sf), (tx, sx) = _run_pair(cfg)
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    np.testing.assert_array_equal(tf, tx)


def test_fused_shard_kernel_sir_nvars3():
    """SIR: nvars=3 with the DIFFUSING variable at index 1 — the fused
    kernels' per-variable diffusion must handle an offset species and a
    3-field state layout."""
    cfg = _fused_cfg(model="sir", beta=1.5, diffusion=1.0, t_final=1.0)
    (tf, sf), (tx, sx) = _run_pair(cfg)
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    # like goldbeter: the near-equilibrium error field makes the WRMS sum
    # reassociation-sensitive in f32, nudging the h sequence, and the
    # exponentially sharpening front amplifies it. Both paths measure
    # equidistant from the f64 oracle (1.8e-5 fused / 1.6e-5 XLA at Tf=1),
    # so the budget is controller rounding, not a kernel defect.
    np.testing.assert_allclose(tf, tx, rtol=0, atol=1e-4)


def test_fused_shard_kernel_grayscott_torus():
    cfg = _fused_cfg(model="grayscott", surface="torus", beta=0.03,
                     surface_width=20.0, surface_length=40.0, t_final=0.5)
    (tf, _), (tx, _) = _run_pair(cfg)
    np.testing.assert_allclose(tf, tx, rtol=0, atol=1e-6)


def test_fused_shard_kernel_matches_single_device():
    """Fused sharded result vs the plain single-device simulate()."""
    cfg = _fused_cfg(t_boundary=0.1)
    import dataclasses
    single = simulate(dataclasses.replace(cfg, use_pallas=False))
    (tf, sf), _ = _run_pair(cfg)
    full = np.concatenate([np.asarray(single.problem.y0)[None], tf], axis=0)
    np.testing.assert_allclose(full, np.asarray(single.trajectory),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (8, 1), (4, 2)])
def test_fused_shard_kernel_mesh_shapes(mesh_shape):
    """Degenerate and skewed meshes: 1-device axes must reduce to wrap.

    Tolerance is a few f32 ulps: at some shard widths XLA reassociates the
    error-norm partial sums, nudging h by an ulp (a halo bug would show up
    orders of magnitude larger — step counts must still agree exactly)."""
    cfg = _fused_cfg(x_mesh=64, surface_width=10.0,
                     surface_length=10.0 * max(2, mesh_shape[0]))
    if cfg.ny % mesh_shape[0] or cfg.nx % mesh_shape[1]:
        pytest.skip("grid does not factor over this mesh")
    (tf, sf), (tx, sx) = _run_pair(cfg, mesh_shape)
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=1e-6)


def test_fused_shard_interval_streaming_path():
    """make_sharded_interval_fn with the fused kernel: one output interval,
    identical to the XLA interval step."""
    import dataclasses
    from crdmodel_tpu.parallel.sharded import make_sharded_interval_fn
    cfg = _fused_cfg(t_boundary=0.1)
    mesh = make_mesh(shape=(2, 4))
    problem = build_problem(cfg)
    params, _ = sharded_params(problem)
    dtype = jnp.float32

    def run_one(p, interp):
        one, h0f, _, _ = make_sharded_interval_fn(p, mesh, interpret_pallas=interp)
        prm, _ = sharded_params(p)
        h = h0f(p.y0, {**prm, "_h0_tout": jnp.asarray(0.1, dtype)})
        return one(jnp.asarray(0.0, dtype), p.y0, h, jnp.asarray(1.0, dtype),
                   jnp.asarray(0, jnp.int32), jnp.asarray(0.1, dtype),
                   jnp.asarray(True), prm)

    t_f, y_f, h_f, _, st_f = run_one(problem, True)
    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    t_x, y_x, h_x, _, st_x = run_one(p2, False)
    assert int(st_f[3]) == 0 and int(st_x[3]) == 0
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_x))
    assert float(h_f) == float(h_x)


def test_fused_shard_kernel_normal_mode():
    """ARK_NORMAL + fused kernels (VERDICT r2 #4): the dense-output bracket
    rides the kernel's padded representation through the free-running loop;
    snapshots interpolate the plain (captured) fields. Must match the XLA
    normal-mode path bitwise like the tstop flat case."""
    cfg = _fused_cfg(t_boundary=0.1, step_mode="normal")
    (tf, sf), (tx, sx) = _run_pair(cfg)
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    np.testing.assert_array_equal(tf, tx)


def test_fused_shard_interval_free_normal_mode():
    """The streaming free-interval fn with the fused kernel (interpret):
    one free interval + Hermite snapshot, bitwise vs the XLA variant."""
    import dataclasses
    from crdmodel_tpu.parallel.sharded import make_sharded_interval_fn
    cfg = _fused_cfg(step_mode="normal")
    mesh = make_mesh(shape=(2, 4))
    dtype = jnp.float32

    def run_one(p, interp):
        one, h0f, free, snapf = make_sharded_interval_fn(
            p, mesh, interpret_pallas=interp)
        prm, _ = sharded_params(p)
        h = h0f(p.y0, {**prm, "_h0_tout": jnp.asarray(0.1, dtype)})
        z = jnp.asarray(0.0, dtype)
        t, y, h, errp, br_t, br_y, st = free(
            z, p.y0, h, jnp.asarray(1.0, dtype), jnp.asarray(0, jnp.int32),
            jnp.asarray(0.1, dtype), jnp.asarray(True), z, p.y0,
            jnp.asarray(jnp.inf, dtype), prm)
        snap = snapf(br_t, br_y, t, y, jnp.asarray(0.1, dtype), prm)
        return t, y, br_t, snap, st

    problem = build_problem(cfg)
    t_f, y_f, brt_f, s_f, st_f = run_one(problem, True)
    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    t_x, y_x, brt_x, s_x, st_x = run_one(p2, False)
    assert int(st_f[3]) == 0 and int(st_x[3]) == 0
    assert float(t_f) == float(t_x) and float(t_f) >= 0.1  # overshot tout
    assert float(brt_f) == float(brt_x)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_x))
    np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_x))


@pytest.mark.parametrize("method", ["rkc2", "ark324"])
def test_fused_shard_normal_mode_other_steppers(method):
    """ARK_NORMAL + the fused RKC2/IMEX shard kernels (the rkc2+normal
    combination crashed at trace time in round 2 — now a supported path)."""
    import dataclasses
    cfg = _fused_cfg(surface="torus", surface_width=20.0,
                     surface_length=40.0, t_boundary=0.2, t_final=0.4,
                     method=method, step_mode="normal")
    mesh = make_mesh(shape=(2, 2))
    problem = build_problem(cfg)
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh,
                                          interpret_pallas=True)
    traj_f, stats_f = run_f(problem.y0, params)
    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)
    assert int(np.max(np.asarray(stats_f.status))) == 0
    assert (int(np.sum(np.asarray(stats_f.steps)))
            == int(np.sum(np.asarray(stats_x.steps))))
    np.testing.assert_allclose(np.asarray(traj_f), np.asarray(traj_x),
                               rtol=0, atol=1e-5)


def test_fused_shard_rkc2_matches_xla():
    """Sharded fused RKC2 (one width-24 exchange feeding all Chebyshev
    stages) vs the XLA per-stage rkc2 path: same stage selection, same step
    counts, f32-tolerance trajectories."""
    import dataclasses
    cfg = _fused_cfg(surface="torus", surface_width=20.0,
                     surface_length=40.0, vary_beta=1, beta_min=0.7,
                     beta_max=1.7, t_boundary=0.2, t_final=0.4,
                     method="rkc2")
    mesh = make_mesh(shape=(2, 2))  # nyl=64, nxl=32 >= 24-deep halo
    problem = build_problem(cfg)
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh,
                                          interpret_pallas=True)
    traj_f, stats_f = run_f(problem.y0, params)
    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)
    assert np.all(np.asarray(stats_f.status) == 0)
    assert int(np.sum(np.asarray(stats_f.steps))) == \
        int(np.sum(np.asarray(stats_x.steps)))
    np.testing.assert_allclose(np.asarray(traj_f), np.asarray(traj_x),
                               rtol=0, atol=1e-4)


def test_fused_shard_rkc2_grayscott():
    """Sharded fused RKC2 with multi-species diffusion (Gray-Scott): the
    Chebyshev recurrence applies the per-variable ratios at every stage."""
    import dataclasses
    cfg = _fused_cfg(model="grayscott", beta=0.03, x_mesh=64,
                     surface_width=10.0, surface_length=20.0,
                     t_final=0.3, method="rkc2")
    mesh = make_mesh(shape=(2, 2))
    problem = build_problem(cfg)
    params, _ = sharded_params(problem)
    run_f, _ = make_sharded_simulation_fn(problem, mesh,
                                          interpret_pallas=True)
    traj_f, stats_f = run_f(problem.y0, params)
    p2 = build_problem(dataclasses.replace(cfg, use_pallas=False))
    run_x, _ = make_sharded_simulation_fn(p2, mesh)
    traj_x, stats_x = run_x(p2.y0, params)
    assert np.all(np.asarray(stats_f.status) == 0)
    assert int(np.sum(np.asarray(stats_f.steps))) == \
        int(np.sum(np.asarray(stats_x.steps)))
    np.testing.assert_allclose(np.asarray(traj_f), np.asarray(traj_x),
                               rtol=0, atol=1e-5)


# ---------------------------------------------------------------------------
# Fused sharded IMEX kernel (ops/pallas_shard_imex.py): one halo exchange per
# ark324 step, shard-local in-kernel Newton. Interpreter on the CPU mesh.
# ---------------------------------------------------------------------------

def test_fused_shard_imex_fhn_freeze():
    cfg = _fused_cfg(method="ark324", t_boundary=0.1)
    (tf, sf), (tx, sx) = _run_pair(cfg)
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    np.testing.assert_array_equal(tf, tx)


def test_fused_shard_imex_goldbeter_torus():
    cfg = _fused_cfg(method="ark324", model="goldbeter", surface="torus",
                     beta=0.4, surface_width=20.0, surface_length=40.0)
    (tf, _), (tx, _) = _run_pair(cfg)
    np.testing.assert_allclose(tf, tx, rtol=0, atol=1e-5)


def test_fused_shard_imex_sir_nvars3():
    cfg = _fused_cfg(method="ark324", model="sir", beta=1.5, diffusion=1.0,
                     t_final=1.0)
    (tf, sf), (tx, sx) = _run_pair(cfg)
    np.testing.assert_allclose(tf, tx, rtol=0, atol=1e-4)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (4, 2)])
def test_fused_shard_imex_mesh_shapes(mesh_shape):
    cfg = _fused_cfg(method="ark324", x_mesh=64, surface_width=10.0,
                     surface_length=10.0 * max(2, mesh_shape[0]))
    if cfg.ny % mesh_shape[0] or cfg.nx % mesh_shape[1]:
        pytest.skip("grid does not factor over this mesh")
    (tf, sf), (tx, sx) = _run_pair(cfg, mesh_shape)
    assert int(np.sum(np.asarray(sf.steps))) == int(np.sum(np.asarray(sx.steps)))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=1e-6)


def test_fused_shard_imex_matches_single_device():
    cfg = _fused_cfg(method="ark324", t_boundary=0.1)
    import dataclasses
    single = simulate(dataclasses.replace(cfg, use_pallas=False))
    (tf, sf), _ = _run_pair(cfg)
    full = np.concatenate([np.asarray(single.problem.y0)[None], tf], axis=0)
    np.testing.assert_allclose(full, np.asarray(single.trajectory),
                               rtol=1e-4, atol=1e-5)
