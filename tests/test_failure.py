"""Failure-detection subsystem: fault injection -> diagnostics + exit codes
(SURVEY.md §5: reproduce the reference's abort-with-diagnostic on integrator
failure, src/FHNmodel_torus.cpp:430-435)."""

import dataclasses
import os
import subprocess
import sys

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate, simulate_streaming


def _cfg(**kw):
    base = dict(model="fhn", surface="flat", x_mesh=12, surface_width=20,
                surface_length=40, t_final=2.0, output_timestep=4,
                beta=1.25, dtype="float64", rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


def test_max_steps_failure_is_sticky():
    """Absurdly low max_steps: the failing interval flags status=1 and all
    later intervals are skipped (sticky), like the reference's loop break."""
    res = simulate(_cfg(max_steps=3))
    assert not res.ok
    status = np.asarray(res.stats.status)
    first_bad = int(np.argmax(status != 0))
    assert status[first_bad] == 1
    assert np.all(status[first_bad:] != 0)
    # skipped intervals did no work
    steps = np.asarray(res.stats.steps)
    assert np.all(steps[first_bad + 1:] == 0)


def test_streaming_stops_on_failure(capsys):
    res = simulate_streaming(_cfg(max_steps=3))
    assert not res.ok
    out = capsys.readouterr().out
    assert "Solver failure" in out
    # a failed interval emits NO output row — the reference breaks before
    # writing (src/FHNmodel_torus.cpp:430-435), so only the IC remains
    assert res.trajectory.shape[0] == 1


def test_cli_exit_code_on_failure(tmp_path):
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
tFinal = 5
xMesh = 12
betaMin = 0.7
betaMax = 1.7

[System]
includeAllVars = 0
varyBeta = 0
""")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.argv=['x','run','%s','--model','fhn','--surface',"
         "'flat','--dtype','float64','--outdir','%s','--quiet'];"
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from crdmodel_tpu.config import SimConfig;"
         "import crdmodel_tpu.config as c;"
         "orig = c.config_from_ini;"
         "c.config_from_ini = lambda *a, **k: orig(*a, **{**k, 'max_steps': 3});"
         "from crdmodel_tpu.cli import main; sys.exit(main(sys.argv[1:]))"
         % (str(ini), str(tmp_path / 'out'))],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "PYTHONPATH": repo})
    assert out.returncode == 1, out.stdout + out.stderr
    assert "Solver failure" in out.stdout
