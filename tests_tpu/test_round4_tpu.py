"""On-chip Mosaic lowering of the round-4 kernel paths.

Multi-device correctness lives in the virtual-CPU-mesh suites
(tests/test_uneven.py, test_anisotropic3d.py, test_forcing.py); these pin
the REAL TPU compile paths: mirror-pad fused kernels (1x1 mesh — the
mirror legs degenerate to local slices but the in-kernel masks, wrapped
params and 8-row-aligned blocks all engage), the 19-point tensor mode of
the z-streaming box kernels, and in-kernel structured forcing.
"""

import dataclasses

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.parallel.mesh import make_mesh
from crdmodel_tpu.parallel.sharded import (make_sharded_simulation_fn,
                                           maybe_fused_shard_step,
                                           mesh_pad_spec, sharded_params)
from crdmodel_tpu.sim import make_run_fn, simulate


def test_mirror_pad_fused_on_chip():
    """Uneven grid on a 1x1 mesh: pad comes from the 8-row block
    alignment; fused selection asserted, physical trajectory vs the plain
    (unpadded-grid) reference of the same physics is NOT comparable
    (different ny), so the oracle is the XLA padded path."""
    import jax
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=256, y_mesh=257,
                    surface_width=20.0, surface_length=20.0 * 257 / 256,
                    t_final=0.2, output_timestep=1, beta=1.25,
                    dtype="float32", rtol=1e-4, atol=1e-6, use_pallas=True)
    mesh = make_mesh(shape=(1, 1))
    problem = build_problem(cfg)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None and pad_spec.active
    assert maybe_fused_shard_step(problem, mesh,
                                  pad_spec=pad_spec) is not None
    params, _ = sharded_params(problem, pad_spec)
    run_f, _ = make_sharded_simulation_fn(problem, mesh)
    tf, sf = run_f(pad_spec.pad_field(problem.y0), params)
    tf = np.asarray(pad_spec.unpad_field(tf))
    assert int(np.max(np.asarray(sf.status))) == 0

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x)
    run_x, _ = make_sharded_simulation_fn(p_x, mesh)
    pad_x = mesh_pad_spec(cfg_x, mesh)
    params_x, _ = sharded_params(p_x, pad_x)
    y0x = pad_x.pad_field(p_x.y0) if pad_x is not None else p_x.y0
    tx, sx = run_x(y0x, params_x)
    tx = np.asarray(pad_x.unpad_field(tx) if pad_x is not None else tx)
    assert (int(np.sum(np.asarray(sf.steps)))
            == int(np.sum(np.asarray(sx.steps))))
    np.testing.assert_allclose(tf, tx, rtol=0, atol=5e-5)


def test_tensor_box_fused_on_chip():
    """19-point tensor mode lowers through Mosaic and matches the XLA
    tensor path's step count on the chip."""
    cfg = SimConfig(model="aliev_panfilov", surface="box", x_mesh=128,
                    y_mesh=128, z_mesh=16, surface_width=8.0,
                    surface_length=8.0, surface_depth=1.0, diffusion=1.0,
                    beta=0.10, wave_length=0.25, wave_width=0.5,
                    t_final=0.3, output_timestep=1, dtype="float32",
                    rtol=1e-4, atol=1e-7, boundary="noflux_z",
                    use_pallas=True)
    nz, ny, nx = cfg.nz, cfg.ny, cfg.nx
    z = np.linspace(0, 1, nz)[:, None, None] * np.ones((nz, ny, nx))
    th = (z - 0.5) * np.pi / 3
    c, s_ = np.cos(th), np.sin(th)
    tensor = (0.3 * c * c + 0.08 * s_ * s_, 0.3 * s_ * s_ + 0.08 * c * c,
              np.full_like(c, 0.02), (0.3 - 0.08) * c * s_,
              np.where((z > 0.2) & (z < 0.8), 0.01, 0.0),
              np.where((z > 0.2) & (z < 0.8), -0.008, 0.0))
    from crdmodel_tpu.ops.pallas_box3d import _box_mode
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    assert _box_mode(p_k)[0] == "tensor"
    r_k = simulate(cfg, problem=p_k)
    assert r_k.ok
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    r_x = simulate(cfg_x, problem=p_x)
    assert r_x.ok
    # real-chip f32 arithmetic differs from the interpreter's: allow one
    # borderline accept flip (the CPU suites pin exact step equality)
    gap = np.abs(np.asarray(r_k.stats.steps) - np.asarray(r_x.stats.steps))
    assert gap.max() <= 1
    np.testing.assert_allclose(np.asarray(r_k.trajectory[-1]),
                               np.asarray(r_x.trajectory[-1]),
                               rtol=0, atol=2e-3)


def test_forcing_fused_on_chip():
    """In-kernel S1-S2 forcing lowers through Mosaic; agrees with the XLA
    forcing path (breakpointed pulse edges) within the f32 controller
    budget."""
    import jax
    from crdmodel_tpu.core.forcing import s1s2_protocol
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=512,
                    surface_width=20.0, surface_length=20.0,
                    t_final=0.4, output_timestep=4, beta=1.25,
                    dtype="float32", rtol=1e-4, atol=1e-6,
                    use_pallas=True)
    frc = s1s2_protocol(cfg, amplitude=1.5, s1_times=[0.05], s2_time=0.25,
                        duration=0.1)
    p_k = build_problem(cfg, forcing=frc)
    run_k = jax.jit(make_run_fn(p_k)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    assert int(np.max(np.asarray(sk.status))) == 0
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=frc)
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    # accept flips at the pulse-onset transients compound on real silicon
    # (interpreter equivalence is pinned in tests/test_forcing.py)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 8
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=5e-3)


def test_aniso2d_shard_mode_on_chip():
    """The 2-D aniso shard-kernel mode lowers through Mosaic (1x1 mesh)."""
    from crdmodel_tpu.parallel.sharded import maybe_fused_shard_aniso
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=256,
                    surface_width=20.0, surface_length=20.0, beta=1.25,
                    t_final=0.2, output_timestep=1, dtype="float32",
                    rtol=1e-4, atol=1e-6, use_pallas=True)
    tensor = (0.3, 0.08, 0.1)
    mesh = make_mesh(shape=(1, 1))
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    assert maybe_fused_shard_aniso(p_k, mesh) is not None
    params, _ = sharded_params(p_k)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh)
    tf, sf = run_f(p_k.y0, params)
    assert int(np.max(np.asarray(sf.status))) == 0
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    run_x, _ = make_sharded_simulation_fn(p_x, mesh)
    tx, sx = run_x(p_x.y0, sharded_params(p_x)[0])
    gap = np.abs(np.asarray(sf.steps) - np.asarray(sx.steps))
    assert gap.max() <= 1
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tx),
                               rtol=0, atol=1e-3)


def test_rkc2_gated_pulse_on_chip():
    """Pulsed pacing through the single-chip fused RKC kernel on silicon."""
    import jax
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           pulse_train, rect_profile)
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=256,
                    surface_width=20.0, surface_length=40.0, beta=1.25,
                    t_final=0.6, output_timestep=3, dtype="float32",
                    rtol=1e-4, atol=1e-6, use_pallas=True, method="rkc2")

    def frc():
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1, 0.4], 0.1, 1.5),
                     row=rect_profile(cfg.ny, 0, cfg.ny // 4)))

    p_k = build_problem(cfg, forcing=frc())
    run_k = jax.jit(make_run_fn(p_k)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    assert int(np.max(np.asarray(sk.status))) == 0
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=frc())
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 2
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=2e-3)
