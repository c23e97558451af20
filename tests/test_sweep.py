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
         "--outdir", str(tmp_path / "out"), "--npz", "--quiet"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": repo})
    assert out.returncode == 0, out.stdout + out.stderr
    outdir = tmp_path / "out"
    assert (outdir / "FHNmodel_flat_subdomain.000.txt").exists()
    assert (outdir / "FHNmodel_flat_u.000.txt").exists()
    assert (outdir / "FHNmodel_flat_v.000.txt").exists()
    assert (outdir / "FHNmodel_flat.npz").exists()


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
