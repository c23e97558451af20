"""Config loader tests against the reference's own ini files."""

import math

import pytest

from crdmodel_tpu.config import SimConfig, config_from_ini, load_ini

FHN_INI = "/root/reference/data/FHNmodelArgs.ini"
GB_INI = "/root/reference/data/GoldbeterModelArgs.ini"
TEMP_INI = "/root/reference/data/temp.ini"


def test_load_fhn_ini_with_xmesh_key():
    # the shipped FHN ini uses xMesh although the FHN mains read thetaMesh
    # (SURVEY.md §2.3) — we accept either
    cfg = config_from_ini(FHN_INI, model="fhn", surface="torus")
    assert cfg.diffusion == 0.12
    assert cfg.beta == 1.25
    assert cfg.x_mesh == 400
    assert cfg.vary_beta == 1
    assert cfg.beta_min == 0.7 and cfg.beta_max == 1.7
    assert cfg.t_boundary == 38 and cfg.t_final == 50
    assert cfg.output_timestep == 20


def test_fhn_torus_derived_geometry():
    cfg = config_from_ini(FHN_INI, model="fhn", surface="torus")
    # r = 20/2pi, R = 80/2pi, ratio 4 -> ny = 1600 (src/FHNmodel_torus.cpp:188-193)
    assert cfg.nx == 400
    assert cfg.ny == 1600
    assert math.isclose(cfg.minor_radius, 20 / (2 * math.pi))
    assert math.isclose(cfg.dx, 2 * math.pi / 399)
    assert math.isclose(cfg.dy, 2 * math.pi / 1599)


def test_fhn_flat_derived_geometry():
    cfg = config_from_ini(FHN_INI, model="fhn", surface="flat")
    # flat domain [0,W]x[0,L], ny = nx * int(L/W) (src/FHNmodel_flat.cpp:190-192)
    assert cfg.nx == 400 and cfg.ny == 1600
    assert cfg.xmax == 20.0 and cfg.ymax == 80.0
    assert math.isclose(cfg.dx, 20.0 / 399)
    assert math.isclose(cfg.dy, 80.0 / 1599)


def test_goldbeter_ini():
    cfg = config_from_ini(GB_INI, model="goldbeter", surface="torus")
    assert cfg.x_mesh == 100
    assert cfg.ny == 400
    assert cfg.t_final == 4
    assert cfg.output_timestep == 5
    assert cfg.ic_type == 2
    assert cfg.just_diffusion == 0


def test_temp_ini_thetamesh_spelling():
    cfg = config_from_ini(TEMP_INI, model="fhn", surface="torus")
    assert cfg.x_mesh == 200
    assert cfg.surface_length == 40
    # ratio R/r = 2 -> ny = 400
    assert cfg.ny == 400


def test_flat_ratio_truncation():
    # reference truncates L/W to long int before multiplying
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=100,
                    surface_width=20, surface_length=70)
    assert cfg.ny == 300  # int(70/20)=3


def test_validation():
    with pytest.raises(ValueError):
        SimConfig(model="nope").validate()
    with pytest.raises(ValueError):
        SimConfig(wave_inside=2).validate()


def test_load_ini_sections():
    d = load_ini(FHN_INI)
    assert "Parameters" in d and "System" in d
    assert d["Parameters"]["surfaceWidth"] == "20"


def test_temp_ini_end_to_end():
    """The reference's temp.ini variant (thetaMesh spelling, L=40 strong
    curvature, symmetricIC key accepted-and-ignored) runs end to end."""
    from crdmodel_tpu.sim import simulate
    cfg = config_from_ini(TEMP_INI, model="fhn", surface="torus",
                          dtype="float64", t_final=0.5, output_timestep=1,
                          x_mesh=16, rtol=1e-6, atol=1e-10)
    res = simulate(cfg)
    assert res.ok


def test_cli_set_overrides():
    """--set type coercion comes from the field ANNOTATION, so
    Optional[bool] fields with a None default (use_pallas) work, and bools
    accept true/false words (ADVICE r1)."""
    from argparse import Namespace

    from crdmodel_tpu.cli import _cfg_from_args

    def args(*sets):
        return Namespace(ini=FHN_INI, model="fhn", surface="flat",
                         dtype=None, method=None, set=list(sets))

    cfg = _cfg_from_args(args("use_pallas=1", "speculative_k=4", "rtol=1e-4"))
    assert cfg.use_pallas is True
    assert cfg.speculative_k == 4
    assert cfg.rtol == 1e-4
    assert _cfg_from_args(args("use_pallas=false")).use_pallas is False
    assert _cfg_from_args(args("use_pallas=true")).use_pallas is True
    assert _cfg_from_args(args("use_pallas=none")).use_pallas is None
    assert _cfg_from_args(args("dtype=float64")).dtype == "float64"
    with pytest.raises(SystemExit):
        _cfg_from_args(args("use_pallas=maybe"))   # bad bool word
    with pytest.raises(SystemExit):
        _cfg_from_args(args("no_such_field=1"))    # unknown field
    with pytest.raises(SystemExit):
        _cfg_from_args(args("rtol"))               # missing '='
