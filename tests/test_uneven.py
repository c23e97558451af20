"""Uneven-grid (pad-and-mask) decomposition: grids that do NOT divide the
device mesh must run and match the single-device solution.

The reference's SetupDecomp splits any grid over any rank count with uneven
integer blocks (src/FHNmodel_torus.cpp:750-755); shard_map requires equal
blocks, so the framework pads the grid to the mesh-divisible size, masks pad
cells out of the dynamics and norms, and repairs the physical periodic seam
with two extra ppermute legs (parallel/padding.py, parallel/halo.py seam fix,
parallel/sharded.py plumbing). These tests pin equivalence against the
single-device roll-based path at f64 on the 8 virtual CPU devices.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.parallel.halo import halo_pad
from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
from crdmodel_tpu.parallel.padding import compute_pad_spec
from crdmodel_tpu.parallel.sharded import simulate_sharded
from crdmodel_tpu.sim import simulate

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

# 39x13 on a 2x4 mesh pads to 40x16: both axes uneven (VERDICT r2 item 2's
# canonical example shape)
UNEVEN = dict(model="fhn", surface="torus", x_mesh=13, surface_width=20,
              surface_length=60, beta=1.25, t_final=1.0, output_timestep=2,
              dtype="float64", rtol=1e-6, atol=1e-10)


def test_pad_spec_geometry():
    spec = compute_pad_spec(39, 13, 2, 4)
    assert spec.active and spec.padded_shape == (40, 16)
    assert spec.y.blk == 20 and spec.x.blk == 4
    # last physical row 38 -> shard 1 local 18; last col 12 -> shard 3 local 0
    assert spec.seam_y() == (1, 18)
    assert spec.seam_x() == (3, 0)
    m = spec.valid_mask()
    assert m.shape == (40, 16) and m[:39, :13].all()
    assert not m[39:].any() and not m[:, 13:].any()
    # wrap fill + unpad roundtrip
    a = np.arange(39 * 13, dtype=np.float64).reshape(39, 13)
    ap = np.asarray(spec.pad_field(a))
    assert ap.shape == (40, 16)
    np.testing.assert_array_equal(ap[39, :13], a[0])   # wrap rows
    np.testing.assert_array_equal(ap[:39, 13:16], a[:, :3])   # wrap cols
    np.testing.assert_array_equal(np.asarray(spec.unpad_field(ap)), a)
    # even grids are inactive
    assert not compute_pad_spec(40, 16, 2, 4).active


def test_pad_spec_rejects_degenerate_axis():
    with pytest.raises(ValueError):
        compute_pad_spec(1, 16, 2, 4)


def test_seam_halo_matches_physical_wrap():
    """halo_pad with seam legs: every PHYSICAL cell of the padded sharded
    block must see the same neighbourhood as jnp.pad(mode='wrap') of the
    physical grid."""
    ny, nx = 39, 13
    spec = compute_pad_spec(ny, nx, 2, 4)
    rng = np.random.default_rng(7)
    u = rng.standard_normal((ny, nx))
    up = jnp.asarray(spec.pad_field(u))
    mesh = make_mesh(shape=(2, 4))

    blocks = jax.jit(jax.shard_map(
        lambda x: halo_pad(x, seam_y=spec.seam_y(), seam_x=spec.seam_x())[None],
        mesh=mesh, in_specs=P(AXIS_Y, AXIS_X),
        out_specs=P(None, AXIS_Y, AXIS_X)))(up)
    blocks = np.asarray(blocks)   # (1, 40+2*2, 16+2*4) block-concatenated

    want = np.pad(u, 1, mode="wrap")
    blk_y, blk_x = spec.y.blk, spec.x.blk
    for sy in range(2):
        for sx in range(4):
            blk = blocks[0][sy * (blk_y + 2):(sy + 1) * (blk_y + 2),
                            sx * (blk_x + 2):(sx + 1) * (blk_x + 2)]
            for ly in range(blk_y):
                for lx in range(blk_x):
                    gy, gx = sy * blk_y + ly, sx * blk_x + lx
                    if gy >= ny or gx >= nx:
                        continue   # pad cell: neighbourhood unused
                    # centre + the 4 stencil neighbours (halo-padded coords)
                    got = np.array([blk[ly + 1, lx + 1], blk[ly, lx + 1],
                                    blk[ly + 2, lx + 1], blk[ly + 1, lx],
                                    blk[ly + 1, lx + 2]])
                    ref = np.array([want[gy + 1, gx + 1], want[gy, gx + 1],
                                    want[gy + 2, gx + 1], want[gy + 1, gx],
                                    want[gy + 1, gx + 2]])
                    np.testing.assert_array_equal(got, ref,
                                                  err_msg=f"cell {gy},{gx}")


@pytest.mark.parametrize("name,changes,mesh_shape", [
    ("bs32", {}, (2, 4)),
    ("rkc2", {"method": "rkc2"}, (2, 4)),
    ("ark324", {"method": "ark324"}, (2, 4)),
    ("ramp+freeze", {"vary_beta": 1, "beta_min": 0.7, "beta_max": 1.7,
                     "t_boundary": 0.5}, (4, 2)),
    ("normal-mode", {"step_mode": "normal"}, (2, 4)),
    ("goldbeter-justdiff", {"model": "goldbeter", "beta": 0.4,
                            "just_diffusion": 1}, (2, 4)),
    ("x-even-y-uneven", {"x_mesh": 16, "surface_length": 65}, (2, 4)),
])
def test_uneven_matches_single_device(name, changes, mesh_shape):
    cfg = dataclasses.replace(SimConfig(**UNEVEN), **changes)
    r1 = simulate(cfg)
    r8 = simulate_sharded(cfg, mesh=make_mesh(shape=mesh_shape))
    assert r1.ok and r8.ok
    assert np.asarray(r8.trajectory).shape == np.asarray(r1.trajectory).shape
    np.testing.assert_allclose(np.asarray(r8.trajectory),
                               np.asarray(r1.trajectory),
                               rtol=1e-9, atol=1e-12)
    assert np.abs(np.asarray(r8.stats.steps)
                  - np.asarray(r1.stats.steps)).max() <= 2


def test_uneven_streaming_matches_batch():
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = SimConfig(**UNEVEN)
    mesh = make_mesh(shape=(2, 4))
    rb = simulate_sharded(cfg, mesh=mesh)
    rs = simulate_sharded_streaming(cfg, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(rs.trajectory),
                                  np.asarray(rb.trajectory))


def test_uneven_streaming_checkpoint_resume(tmp_path):
    """Save mid-run on an uneven grid, resume on the same mesh, match the
    uninterrupted run exactly."""
    from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
    cfg = dataclasses.replace(SimConfig(**UNEVEN), output_timestep=4)
    mesh = make_mesh(shape=(2, 4))
    full = simulate_sharded_streaming(cfg, mesh=mesh)
    ckdir = str(tmp_path / "ck")
    simulate_sharded_streaming(cfg, mesh=mesh, checkpoint_every=2,
                               checkpoint_dir=ckdir)
    resumed = simulate_sharded_streaming(cfg, mesh=mesh, resume_dir=ckdir)
    # resumed rows are the post-resume tail of the full trajectory
    tail = np.asarray(full.trajectory)[-resumed.trajectory.shape[0]:]
    np.testing.assert_array_equal(np.asarray(resumed.trajectory), tail)


def test_uneven_sweep_on_mesh():
    from crdmodel_tpu.sweep import sweep_beta
    cfg = dataclasses.replace(SimConfig(**UNEVEN), t_final=0.5,
                              output_timestep=1)
    betas = [1.1, 1.35]
    mesh = make_mesh(shape=(2, 4))
    swept = sweep_beta(cfg, betas, mesh=mesh)
    for i, b in enumerate(betas):
        r1 = simulate(dataclasses.replace(cfg, beta=b))
        assert np.asarray(swept.trajectories[i]).shape == \
            np.asarray(r1.trajectory).shape
        np.testing.assert_allclose(np.asarray(swept.trajectories[i]),
                                   np.asarray(r1.trajectory),
                                   rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# Mirror-pad fused shard kernels (VERDICT r3 #1): on padded grids the fused
# kernels run pad cells as LIVE bitwise copies of their wrapped physical
# sources (the n-periodic extension), so the deep-halo splice transport only
# needs two repaired strips per axis (parallel/halo.py::mirror_edges) and the
# error sums are masked to physical cells in-kernel. These pin the fused
# padded path against the XLA padded path on the same mesh (f32, Pallas
# interpreter) and the mirror invariant itself.
# ---------------------------------------------------------------------------

def _ext(u, n_pad, axis):
    n = u.shape[axis]
    reps = -(-n_pad // n)
    t = np.concatenate([u] * reps, axis=axis)
    sl = [slice(None)] * u.ndim
    sl[axis] = slice(0, n_pad)
    return t[tuple(sl)]


@pytest.mark.parametrize("n,size,blk,p", [
    (39, 4, 16, 8), (13, 2, 8, 8), (5, 8, 8, 8), (39, 1, 40, 8),
    (9, 4, 8, 8),
])
def test_mirror_halo_rows_matches_periodic_extension(n, size, blk, p):
    """mirror_halo_pad_rows must reproduce the n-periodic extension's halos
    for every shard — including pure-pad shards and w >= n."""
    from crdmodel_tpu.parallel.halo import mirror_halo_pad_rows
    rng = np.random.default_rng(3)
    u = rng.standard_normal((2, n, 7))
    up = _ext(u, size * blk, 1)
    mesh = make_mesh(shape=(size, 1))
    out = np.asarray(jax.jit(jax.shard_map(
        lambda x: mirror_halo_pad_rows(x, AXIS_Y, p, n, blk)[None],
        mesh=mesh, in_specs=P(None, AXIS_Y, None),
        out_specs=P(None, None, AXIS_Y, None)))(jnp.asarray(up)))[0]
    for s in range(size):
        blkv = out[:, s * (blk + 2 * p):(s + 1) * (blk + 2 * p), :]
        g0 = s * blk - p
        want = np.stack([u[:, (g0 + i) % n, :] for i in range(blk + 2 * p)],
                        axis=1)
        np.testing.assert_array_equal(blkv, want, err_msg=f"shard {s}")


def test_mirror_halo_cols_matches_periodic_extension():
    from crdmodel_tpu.parallel.halo import mirror_halo_pad_cols
    n, size, blk, p = 13, 2, 8, 8
    rng = np.random.default_rng(4)
    u = rng.standard_normal((2, 5, n))
    up = _ext(u, size * blk, 2)
    mesh = make_mesh(shape=(1, size))
    out = np.asarray(jax.jit(jax.shard_map(
        lambda x: mirror_halo_pad_cols(x, AXIS_X, p, n, blk)[None],
        mesh=mesh, in_specs=P(None, None, AXIS_X),
        out_specs=P(None, None, None, AXIS_X)))(jnp.asarray(up)))[0]
    for s in range(size):
        blkv = out[:, :, s * (blk + 2 * p):(s + 1) * (blk + 2 * p)]
        g0 = s * blk - p
        want = np.stack([u[:, :, (g0 + i) % n] for i in range(blk + 2 * p)],
                        axis=2)
        np.testing.assert_array_equal(blkv, want, err_msg=f"shard {s}")


# 51x17 torus on a 2x2 mesh: fused pads y 51->64 (blk 32), x 17->18 (blk 9)
FUSED_UNEVEN = dict(model="fhn", surface="torus", x_mesh=17, surface_width=20,
                    surface_length=60, beta=1.25, t_final=1.0,
                    output_timestep=2, dtype="float32", rtol=1e-4, atol=1e-6,
                    use_pallas=True)


def _run_fused_padded(cfg, mesh_shape):
    """(physical trajectory, padded trajectory, stats, pad_spec); asserts
    the fused kernel was actually selected."""
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_step,
        maybe_fused_shard_imex, mesh_pad_spec)
    from crdmodel_tpu.core.problem import build_problem
    mesh = make_mesh(shape=mesh_shape)
    problem = build_problem(cfg)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None and pad_spec.active
    if cfg.method == "ark324":
        sel = maybe_fused_shard_imex(problem, mesh, interpret=True,
                                     pad_spec=pad_spec)
    elif cfg.method != "rkc2":
        sel = maybe_fused_shard_step(problem, mesh, interpret=True,
                                     pad_spec=pad_spec)
    else:
        sel = object()   # rkc selection needs rho_fn; checked via steps
    assert sel is not None, "fused kernel not selected on the padded grid"
    from crdmodel_tpu.parallel.sharded import sharded_params
    params, _ = sharded_params(problem, pad_spec)
    run, _ = make_sharded_simulation_fn(problem, mesh, interpret_pallas=True)
    traj_p, stats = run(pad_spec.pad_field(problem.y0), params)
    return (np.asarray(pad_spec.unpad_field(traj_p)), np.asarray(traj_p),
            stats, pad_spec)


def _run_xla_padded(cfg, mesh_shape):
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    r = simulate_sharded(cfg_x, mesh=make_mesh(shape=mesh_shape))
    assert r.ok
    return np.asarray(r.trajectory)[1:], r.stats   # drop the IC row


@pytest.mark.parametrize("name,changes", [
    ("bs32", {}),
    ("ramp+freeze", {"vary_beta": 1, "beta_min": 0.7, "beta_max": 1.7,
                     "t_boundary": 0.4}),
    ("ark324", {"method": "ark324"}),
    ("normal-mode", {"step_mode": "normal"}),
])
def test_fused_padded_matches_xla_padded(name, changes):
    cfg = dataclasses.replace(SimConfig(**FUSED_UNEVEN), **changes)
    tf, tfp, sf, spec = _run_fused_padded(cfg, (2, 2))
    tx, sx = _run_xla_padded(cfg, (2, 2))
    assert int(np.max(np.asarray(sf.status))) == 0
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(sx.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)


def test_fused_padded_rkc2_matches_xla_padded():
    # rkc2's 24-deep halo needs blocks >= 24: 102x51 on (2, 2)
    cfg = dataclasses.replace(SimConfig(**FUSED_UNEVEN), method="rkc2",
                              x_mesh=51, surface_length=40)
    tf, tfp, sf, spec = _run_fused_padded(cfg, (2, 2))
    tx, sx = _run_xla_padded(cfg, (2, 2))
    assert int(np.max(np.asarray(sf.status))) == 0
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(sx.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)


def test_fused_padded_mirror_invariant():
    """Pad cells must remain BITWISE copies of their wrapped physical
    sources at every output time — the property the whole transport design
    rests on (ops/kernel_common.py::make_shard_halo_helpers docstring)."""
    cfg = SimConfig(**FUSED_UNEVEN)
    tf, tfp, sf, spec = _run_fused_padded(cfg, (2, 2))
    ny, nx = cfg.ny, cfg.nx
    nyp, nxp = spec.padded_shape
    want = _ext(_ext(tf, nyp, -2), nxp, -1)
    np.testing.assert_array_equal(tfp, want)


def test_fused_padded_39x13_on_8_devices():
    """The dryrun's canonical uneven case (39x13) on all 8 devices: an
    (8, 1) mesh gives 8-row blocks (y 39->64 mirror-padded), x unsharded."""
    cfg = dataclasses.replace(SimConfig(**FUSED_UNEVEN), x_mesh=13,
                              surface_length=60, t_final=0.5,
                              output_timestep=1)
    assert (cfg.ny, cfg.nx) == (39, 13)
    tf, tfp, sf, spec = _run_fused_padded(cfg, (8, 1))
    assert spec.padded_shape == (64, 13)
    tx, sx = _run_xla_padded(cfg, (8, 1))
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(sx.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)


@pytest.mark.parametrize("case", ["noflux", "obstacle", "field2d"])
def test_fused_padded_divform_matches_xla(case):
    """Mirror-pad + the divergence-form shard kernel: bounded tissue and
    2-D diffusion fields on uneven grids (the coefficient stack's halo is
    the mirror extension; closed faces multiply whatever arrives by 0)."""
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_divform,
        mesh_pad_spec, sharded_params)
    cfg = dataclasses.replace(SimConfig(**FUSED_UNEVEN), surface="flat",
                              surface_width=20.0, surface_length=60.0)
    build_kw = {}
    if case == "noflux":
        cfg = dataclasses.replace(cfg, boundary="noflux")
    elif case == "obstacle":
        mask = np.ones((cfg.ny, cfg.nx), bool)
        mask[20:30, 5:12] = False
        build_kw["obstacle_mask"] = mask
    else:
        rng = np.random.default_rng(11)
        build_kw["diffusion_field"] = 0.1 + 0.05 * rng.random(
            (cfg.ny, cfg.nx))
    mesh = make_mesh(shape=(2, 2))
    p_k = build_problem(cfg, **build_kw)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None and pad_spec.active
    assert maybe_fused_shard_divform(p_k, mesh, interpret=True,
                                     pad_spec=pad_spec) is not None
    params, _ = sharded_params(p_k, pad_spec)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tf, sf = run_f(pad_spec.pad_field(p_k.y0), params)
    tf = np.asarray(pad_spec.unpad_field(tf))

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, **build_kw)
    r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
    assert r_x.ok
    tx = np.asarray(r_x.trajectory)[1:]
    assert np.all(np.asarray(sf.status) == 0)
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(r_x.stats.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)
    if case == "obstacle":
        # scar cells hold their IC bitwise through the mirror-pad kernel
        ic = np.asarray(p_k.y0)[:, 20:30, 5:12]
        np.testing.assert_array_equal(tf[-1][:, 20:30, 5:12], ic)


@pytest.mark.parametrize("method", ["bs32", "rkc2"])
def test_fused_padded_box3d_matches_xla(method):
    """Mirror-pad + the z-streaming 3-D box shard kernels: an uneven
    (ny, nx) box volume keeps the fused path (VERDICT r3 #1's 3-D case)."""
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_box3d,
        mesh_pad_spec, sharded_params)
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=17,
                    surface_width=10.0, surface_length=30.0, y_mesh=51,
                    surface_depth=3.0, z_mesh=6, t_final=1.0,
                    output_timestep=2, beta=0.0, dtype="float32",
                    method=method, rtol=1e-4, atol=1e-7, boundary="noflux",
                    use_pallas=True)
    mesh = make_mesh(shape=(2, 2))
    p_k = build_problem(cfg)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None and pad_spec.active
    if method != "rkc2":
        assert maybe_fused_shard_box3d(p_k, mesh, interpret=True,
                                       pad_spec=pad_spec) is not None
    params, _ = sharded_params(p_k, pad_spec)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tf, sf = run_f(pad_spec.pad_field(p_k.y0), params)
    tf = np.asarray(pad_spec.unpad_field(tf))

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    r_x = simulate_sharded(cfg_x, mesh=mesh)
    assert r_x.ok
    tx = np.asarray(r_x.trajectory)[1:]
    assert np.all(np.asarray(sf.status) == 0)
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(r_x.stats.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)


def test_seam_halo_nine_point_neighbourhoods():
    """Round 5 (VERDICT r4 item 2): the two-phase seam-fixed exchange
    delivers the FULL 9-point neighbourhood — diagonals included — for
    every physical cell on a doubly-uneven grid. This is the fact that
    lets anisotropic tensors run on padded grids: the mixed terms read
    corner halo cells (ops/stencil.py::anisotropic_from_padded), and the
    column phase exchanges the already-seam-fixed row-padded block, so
    corners arrive carrying true diagonal values."""
    for (ny, nx, py, px) in [(39, 13, 2, 4), (10, 10, 4, 2), (8, 13, 2, 4)]:
        spec = compute_pad_spec(ny, nx, py, px)
        rng = np.random.default_rng(7)
        u = rng.standard_normal((ny, nx))
        up = jnp.asarray(spec.pad_field(u))
        mesh = make_mesh(shape=(py, px))
        blocks = np.asarray(jax.jit(jax.shard_map(
            lambda x: halo_pad(x, seam_y=spec.seam_y(),
                               seam_x=spec.seam_x())[None],
            mesh=mesh, in_specs=P(AXIS_Y, AXIS_X),
            out_specs=P(None, AXIS_Y, AXIS_X)))(up))
        want = np.pad(u, 1, mode="wrap")
        blk_y, blk_x = spec.y.blk, spec.x.blk
        for sy in range(py):
            for sx in range(px):
                blk = blocks[0][sy * (blk_y + 2):(sy + 1) * (blk_y + 2),
                                sx * (blk_x + 2):(sx + 1) * (blk_x + 2)]
                for ly in range(blk_y):
                    for lx in range(blk_x):
                        gy, gx = sy * blk_y + ly, sx * blk_x + lx
                        if gy >= ny or gx >= nx:
                            continue
                        np.testing.assert_array_equal(
                            blk[ly:ly + 3, lx:lx + 3],
                            want[gy:gy + 3, gx:gx + 3],
                            err_msg=f"{ny}x{nx} cell {gy},{gx}")


def _random_spd2(shape, rng):
    dxx = 0.1 + rng.random(shape)
    dyy = 0.1 + rng.random(shape)
    dxy = 0.9 * np.sqrt(dxx * dyy) * (2 * rng.random(shape) - 1)
    return dxx, dyy, dxy


@pytest.mark.parametrize("name,shape,mesh_shape", [
    ("both-axes-uneven", (25, 25), (2, 2)),
    ("y-uneven", (39, 16), (2, 4)),
])
def test_uneven_tensor_matches_single_device(name, shape, mesh_shape):
    """2-D anisotropic tensor diffusion on a non-dividing grid/mesh pair
    (round 5 lifts the sharded_params ValueError): exact equivalence with
    the single-device path, identical step counts. Reference analogue:
    uneven SetupDecomp blocks, src/FHNmodel_torus.cpp:750-755, which the
    reference handles for ANY operator."""
    from crdmodel_tpu.core.problem import build_problem
    ny, nx = shape
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=nx, y_mesh=ny,
                    surface_width=20, surface_length=20.0 * ny / nx,
                    t_final=0.5, output_timestep=2, beta=1.25,
                    dtype="float64", rtol=1e-6, atol=1e-10)
    assert (cfg.ny, cfg.nx) == shape
    rng = np.random.default_rng(3)
    tensor = _random_spd2(shape, rng)
    p1 = build_problem(cfg, diffusion_tensor=tensor)
    r1 = simulate(cfg, problem=p1)
    p8 = build_problem(cfg, diffusion_tensor=tensor)
    r8 = simulate_sharded(cfg, mesh=make_mesh(shape=mesh_shape),
                          problem=p8)
    assert r1.ok and r8.ok
    np.testing.assert_allclose(np.asarray(r8.trajectory),
                               np.asarray(r1.trajectory),
                               rtol=1e-9, atol=1e-12)
    assert np.array_equal(np.asarray(r8.stats.steps),
                          np.asarray(r1.stats.steps))


def test_uneven_tensor_3d_box_matches_single_device():
    """3x3 SPD box tensor (19-point operator, xz/yz mixed pairs) on an
    uneven grid: the stacked (Dxy, Dxz, Dyz) fields wrap-pad on the
    trailing (ny, nx) axes and their ONE ring exchange per dispatch
    carries the seam legs."""
    from crdmodel_tpu.core.problem import build_problem
    cfg = SimConfig(model="fhn", surface="box", x_mesh=13, y_mesh=10,
                    z_mesh=4, surface_width=20, surface_length=16,
                    surface_depth=6, t_final=0.3, output_timestep=1,
                    beta=1.25, dtype="float64", rtol=1e-6, atol=1e-10)
    rng = np.random.default_rng(5)
    shape = (cfg.nz, cfg.ny, cfg.nx)
    dxx = 0.1 + rng.random(shape)
    dyy = 0.1 + rng.random(shape)
    dzz = 0.1 + rng.random(shape)
    s = lambda a, b: 0.5 * np.sqrt(a * b) * (2 * rng.random(shape) - 1)
    tensor = (dxx, dyy, dzz, s(dxx, dyy), s(dxx, dzz), s(dyy, dzz))
    p1 = build_problem(cfg, diffusion_tensor=tensor)
    r1 = simulate(cfg, problem=p1)
    p8 = build_problem(cfg, diffusion_tensor=tensor)
    r8 = simulate_sharded(cfg, mesh=make_mesh(shape=(2, 4)), problem=p8)
    assert r1.ok and r8.ok
    np.testing.assert_allclose(np.asarray(r8.trajectory),
                               np.asarray(r1.trajectory),
                               rtol=1e-9, atol=1e-12)
    assert np.array_equal(np.asarray(r8.stats.steps),
                          np.asarray(r1.stats.steps))


def test_fused_padded_aniso_tensor_matches_xla():
    """Round 5 (VERDICT r4 item 2): the 2-D anisotropic tensor runs FUSED
    on an uneven grid — the Dxy field rides the mirror-haloed coefficient
    stack of the windowed-coefficient shard kernel, whose two-phase strips
    carry true corners by construction."""
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_aniso,
        mesh_pad_spec, sharded_params)
    cfg = dataclasses.replace(SimConfig(**FUSED_UNEVEN), surface="flat",
                              surface_width=20.0, surface_length=60.0)
    rng = np.random.default_rng(13)
    dxx = 0.1 + 0.2 * rng.random((cfg.ny, cfg.nx))
    dyy = 0.1 + 0.2 * rng.random((cfg.ny, cfg.nx))
    dxy = 0.8 * np.sqrt(dxx * dyy) * (2 * rng.random((cfg.ny, cfg.nx)) - 1)
    tensor = (dxx, dyy, dxy)
    mesh = make_mesh(shape=(2, 2))
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None and pad_spec.active
    assert maybe_fused_shard_aniso(p_k, mesh, interpret=True,
                                   pad_spec=pad_spec) is not None
    params, _ = sharded_params(p_k, pad_spec)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tf, sf = run_f(pad_spec.pad_field(p_k.y0), params)
    tf = np.asarray(pad_spec.unpad_field(tf))

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
    assert r_x.ok
    tx = np.asarray(r_x.trajectory)[1:]
    assert np.all(np.asarray(sf.status) == 0)
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(r_x.stats.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)


@pytest.mark.parametrize("method", ["bs32", "rkc2"])
def test_fused_padded_box3d_tensor_matches_xla(method):
    """3x3 SPD box tensor (19-point) on an uneven volume through the
    z-streaming shard kernels: the six streamed fields (aE, aN, aU, Dxy,
    Dxz, Dyz) are wrap-filled and mirror-haloed like the scalar case."""
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_box3d,
        mesh_pad_spec, sharded_params)
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=17,
                    surface_width=10.0, surface_length=30.0, y_mesh=51,
                    surface_depth=3.0, z_mesh=6, t_final=0.6,
                    output_timestep=1, beta=0.0, dtype="float32",
                    method=method, rtol=1e-4, atol=1e-7, boundary="noflux",
                    use_pallas=True)
    rng = np.random.default_rng(17)
    shape = (cfg.nz, cfg.ny, cfg.nx)
    dxx = 0.1 + 0.1 * rng.random(shape)
    dyy = 0.1 + 0.1 * rng.random(shape)
    dzz = 0.1 + 0.1 * rng.random(shape)
    s = lambda a, b: 0.4 * np.sqrt(a * b) * (2 * rng.random(shape) - 1)
    tensor = (dxx, dyy, dzz, s(dxx, dyy), s(dxx, dzz), s(dyy, dzz))
    mesh = make_mesh(shape=(2, 2))
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None and pad_spec.active
    if method != "rkc2":
        assert maybe_fused_shard_box3d(p_k, mesh, interpret=True,
                                       pad_spec=pad_spec) is not None
    params, _ = sharded_params(p_k, pad_spec)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh, interpret_pallas=True)
    tf, sf = run_f(pad_spec.pad_field(p_k.y0), params)
    tf = np.asarray(pad_spec.unpad_field(tf))

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
    assert r_x.ok
    tx = np.asarray(r_x.trajectory)[1:]
    assert np.all(np.asarray(sf.status) == 0)
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(r_x.stats.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=2e-5)
