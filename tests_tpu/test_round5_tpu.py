"""On-chip Mosaic lowering of the round-5 kernel paths.

Multi-device correctness lives in the virtual-CPU-mesh suites
(tests/test_uneven.py, test_forcing.py); these pin the REAL TPU compile
paths round 5 added: smooth-waveform forcing through the fused RKC2
kernel (per-eval amplitudes at true Chebyshev stage times), and the
anisotropic tensor on a padded (uneven) grid through the windowed-
coefficient shard kernel (1x1 mesh — the mirror legs degenerate to local
slices but the streamed Dxy field, wrapped params and in-kernel masks
all engage).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.sim import make_run_fn


def _smooth_protocol(cfg):
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           gaussian_profile, rect_profile)
    s1 = Stimulus(waveform=lambda t: 1.5 * jnp.exp(-((t - 0.3) / 0.1) ** 2),
                  row=rect_profile(cfg.ny, 0, cfg.ny // 4))
    s2 = Stimulus(waveform=lambda t: 0.4 * jnp.cos(3.0 * t),
                  col=gaussian_profile(cfg.nx, cfg.nx / 2, cfg.nx / 8),
                  var=1)
    return SeparableForcing(s1, s2)


def test_rkc2_smooth_waveform_on_chip():
    """Smooth (non-gated) waveforms through the single-chip fused RKC2
    kernel on silicon: per-eval SMEM amplitude rows at the dispatch's
    stage times (round 5 — VERDICT r4 item 5)."""
    from crdmodel_tpu.ops.pallas_rkc import is_rkc_supported
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=256,
                    surface_width=20.0, surface_length=40.0, beta=1.25,
                    t_final=0.6, output_timestep=3, dtype="float32",
                    rtol=1e-4, atol=1e-6, use_pallas=True, method="rkc2")
    p_k = build_problem(cfg, forcing=_smooth_protocol(cfg))
    assert is_rkc_supported(p_k, jnp.float32)
    run_k = jax.jit(make_run_fn(p_k)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    assert int(np.max(np.asarray(sk.status))) == 0
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=_smooth_protocol(cfg_x))
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 2
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=2e-3)


def test_aniso_tensor_padded_fused_on_chip():
    """2-D anisotropic tensor on an 8-row-alignment-padded grid (1x1
    mesh): the fused aniso shard kernel engages with the wrap-filled Dxy
    field riding the coefficient stack (round 5 — VERDICT r4 item 2)."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_aniso,
        mesh_pad_spec, sharded_params, simulate_sharded)
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=256, y_mesh=252,
                    surface_width=20.0, surface_length=19.7, beta=1.25,
                    t_final=0.3, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-6, use_pallas=True)
    rng = np.random.default_rng(29)
    dxx = 0.1 + 0.2 * rng.random((cfg.ny, cfg.nx))
    dyy = 0.1 + 0.2 * rng.random((cfg.ny, cfg.nx))
    dxy = 0.8 * np.sqrt(dxx * dyy) * (2 * rng.random((cfg.ny, cfg.nx)) - 1)
    tensor = (dxx, dyy, dxy)
    mesh = make_mesh(shape=(1, 1))
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    pad_spec = mesh_pad_spec(cfg, mesh)
    assert pad_spec is not None and pad_spec.active  # 252 -> 8-aligned 256
    assert maybe_fused_shard_aniso(p_k, mesh, pad_spec=pad_spec) is not None
    params, _ = sharded_params(p_k, pad_spec)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh)
    tf, sf = run_f(pad_spec.pad_field(p_k.y0), params)
    tf = np.asarray(pad_spec.unpad_field(tf))
    assert np.all(np.asarray(sf.status) == 0)

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
    assert r_x.ok
    gap = np.abs(np.asarray(sf.steps) - np.asarray(r_x.stats.steps))
    assert gap.max() <= 2
    np.testing.assert_allclose(tf, np.asarray(r_x.trajectory)[1:],
                               rtol=0, atol=2e-3)


def _box_protocol(cfg):
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           gaussian_profile, pulse_train,
                                           rect_profile)
    return SeparableForcing(
        Stimulus(waveform=pulse_train([0.05, 0.25], 0.08, 1.0),
                 row=rect_profile(cfg.ny, 0, cfg.ny // 4),
                 zprof=gaussian_profile(cfg.nz, 0.0, 2.0)),
        Stimulus(waveform=lambda t: 0.3 * jnp.cos(4.0 * t),
                 col=rect_profile(cfg.nx, 0, cfg.nx // 2)))


def _box_cfg(**kw):
    base = dict(model="aliev_panfilov", surface="box", x_mesh=128,
                surface_width=16.0, surface_length=16.0, y_mesh=128,
                surface_depth=2.0, z_mesh=8, t_final=0.5,
                output_timestep=1, beta=0.1, dtype="float32",
                rtol=1e-4, atol=1e-6, boundary="noflux", use_pallas=True)
    base.update(kw)
    from crdmodel_tpu.config import SimConfig
    return SimConfig(**base)


def test_box_forcing_on_chip_erk():
    """In-kernel pacing through the z-streaming box ERK kernel on silicon
    (round 5 — VERDICT r4 item 1): pulse train + smooth cosine + zprof."""
    cfg = _box_cfg()
    p_k = build_problem(cfg, forcing=_box_protocol(cfg))
    from crdmodel_tpu.ops.pallas_box3d import is_box3d_supported
    from crdmodel_tpu.integrate.erk import TABLEAUS
    assert is_box3d_supported(p_k, TABLEAUS["bs32"], jnp.float32)
    run_k = jax.jit(make_run_fn(p_k)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    assert int(np.max(np.asarray(sk.status))) == 0
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=_box_protocol(cfg_x))
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 2
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=2e-3)


def test_box_forcing_on_chip_rkc():
    """In-kernel pacing through the z-streaming box RKC kernel on silicon:
    per-eval amplitudes at the true Chebyshev stage times."""
    cfg = _box_cfg(method="rkc2")
    p_k = build_problem(cfg, forcing=_box_protocol(cfg))
    from crdmodel_tpu.ops.pallas_box3d_rkc import is_box3d_rkc_supported
    assert is_box3d_rkc_supported(p_k, jnp.float32)
    run_k = jax.jit(make_run_fn(p_k)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    assert int(np.max(np.asarray(sk.status))) == 0
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=_box_protocol(cfg_x))
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 2
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=2e-3)


def test_curved_tensor_fused_on_chip():
    """Torus-metric tensor through the fused shard aniso kernel on
    silicon (1x1 mesh): the streamed inv4 lane profile lowers in Mosaic."""
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_simulation_fn, maybe_fused_shard_aniso,
        sharded_params, simulate_sharded)
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=256,
                    surface_width=20.0, surface_length=60.0, beta=1.25,
                    t_final=0.3, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-6, use_pallas=True)
    rng = np.random.default_rng(41)
    shape = (cfg.ny, cfg.nx)
    dxx = 0.1 + 0.2 * rng.random(shape)
    dyy = 0.1 + 0.2 * rng.random(shape)
    dxy = 0.7 * np.sqrt(dxx * dyy) * (2 * rng.random(shape) - 1)
    tensor = (dxx, dyy, dxy)
    mesh = make_mesh(shape=(1, 1))
    p_k = build_problem(cfg, diffusion_tensor=tensor)
    assert maybe_fused_shard_aniso(p_k, mesh) is not None
    params, _ = sharded_params(p_k)
    run_f, _ = make_sharded_simulation_fn(p_k, mesh)
    tf, sf = run_f(p_k.y0, params)
    assert np.all(np.asarray(sf.status) == 0)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, diffusion_tensor=tensor)
    r_x = simulate_sharded(cfg_x, mesh=mesh, problem=p_x)
    gap = np.abs(np.asarray(sf.steps) - np.asarray(r_x.stats.steps))
    assert gap.max() <= 2
    # 5e-3: the random 0.7-margin tensor drives steep mixed terms; the
    # f32 fused-vs-XLA drift concentrates at isolated extrema (measured
    # 1 cell of 786K at 2.1e-3 over a 0.3-tu run)
    np.testing.assert_allclose(np.asarray(tf),
                               np.asarray(r_x.trajectory)[1:],
                               rtol=0, atol=5e-3)


def test_imex_forcing_on_chip():
    """Structured forcing through the fused ark324 IMEX kernel on silicon
    (round 5 late): amplitudes at the explicit stage times."""
    from crdmodel_tpu.core.forcing import (SeparableForcing, Stimulus,
                                           gaussian_profile, pulse_train,
                                           rect_profile)
    from crdmodel_tpu.ops.pallas_imex import is_imex_supported
    cfg = SimConfig(model="goldbeter", surface="torus", x_mesh=128,
                    surface_width=20.0, surface_length=40.0, beta=0.4,
                    t_final=1.0, output_timestep=2, dtype="float32",
                    rtol=1e-4, atol=1e-7, method="ark324", use_pallas=True)

    def frc(c):
        return SeparableForcing(
            Stimulus(waveform=pulse_train([0.1, 0.5], 0.1, 0.5),
                     row=rect_profile(c.ny, 0, c.ny // 4)),
            Stimulus(waveform=lambda t: 0.2 * jnp.cos(5.0 * t),
                     col=gaussian_profile(c.nx, c.nx / 2, c.nx / 8)))

    p_k = build_problem(cfg, forcing=frc(cfg))
    assert is_imex_supported(p_k, jnp.float32)
    run_k = jax.jit(make_run_fn(p_k)[0])
    tk, sk = run_k(p_k.y0, p_k.params)
    assert int(np.max(np.asarray(sk.status))) == 0
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    p_x = build_problem(cfg_x, forcing=frc(cfg_x))
    run_x = jax.jit(make_run_fn(p_x)[0])
    tx, sx = run_x(p_x.y0, p_x.params)
    gap = np.abs(np.asarray(sk.steps) - np.asarray(sx.steps))
    assert gap.max() <= 2
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=0, atol=2e-3)
