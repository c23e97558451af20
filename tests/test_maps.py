"""Wavefront-analysis maps (viz/maps.py).

Exact synthetic oracles: linear-ramp activation (sub-frame interpolation
is exact for signals linear in t), piecewise-linear action potentials with
analytically known APD_f, plane-wave activation maps whose metric-aware
gradient must read the true surface speed on flat/torus/sphere grids, and
on-bin sinusoids for the dominant-frequency map. Plus the run -> maps CLI
pipeline over the reference-format output files.
"""

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.grid import make_geometry
from crdmodel_tpu.viz import maps


def _flat_cfg(nx=24, W=20.0, L=40.0):
    return SimConfig(model="barkley", surface="flat", x_mesh=nx,
                     surface_width=W, surface_length=L)


# ----------------------------------------------------------------------
# physical_spacings


def test_spacings_flat():
    cfg = _flat_cfg()
    geo = make_geometry(cfg)
    hx, hy = maps.physical_spacings(geo)
    np.testing.assert_allclose(hx, geo.grid.dx)
    np.testing.assert_allclose(hy, geo.grid.dy)


def test_spacings_torus():
    cfg = SimConfig(surface="torus", x_mesh=32, surface_width=20.0,
                    surface_length=80.0)
    geo = make_geometry(cfg)
    g = geo.grid
    th = g.xmin + np.arange(g.nx) * g.dx
    hx, hy = maps.physical_spacings(geo)
    np.testing.assert_allclose(hx, geo.r * g.dx)
    np.testing.assert_allclose(hy, (geo.R + geo.r * np.cos(th)) * g.dy)


def test_spacings_sphere_matches_metric():
    cfg = SimConfig(surface="sphere", x_mesh=16, surface_length=2 * np.pi)
    geo = make_geometry(cfg)           # R = 1
    g = geo.grid
    v = g.xmin + np.arange(g.nx) * g.dx
    hx, hy = maps.physical_spacings(geo)
    np.testing.assert_allclose(hx, 1.0 * g.dx, rtol=1e-9)
    np.testing.assert_allclose(hy, np.sin(v) * g.dy, rtol=1e-9)


# ----------------------------------------------------------------------
# activation_times


def test_activation_linear_ramp_exact():
    """u(t, y, x) = t - T(y, x) crosses 0 exactly at T; linear-in-t signals
    make the sub-frame interpolation exact."""
    ny, nx = 6, 11
    T = np.linspace(0.3, 4.7, ny * nx).reshape(ny, nx)
    times = np.linspace(0.0, 6.0, 13)    # coarse frames, off the T values
    u = times[:, None, None] - T[None]
    act = maps.activation_times(u, times, threshold=0.0)
    np.testing.assert_allclose(act, T, atol=1e-12)


def test_activation_initial_and_never():
    times = np.array([1.0, 2.0, 3.0])
    u = np.zeros((3, 1, 3))
    u[:, 0, 0] = 5.0                     # above threshold from the start
    u[:, 0, 1] = [0.0, 0.0, 0.0]         # never crosses
    u[:, 0, 2] = [0.0, 2.0, 2.0]         # crosses in frame 0->1
    act = maps.activation_times(u, times, threshold=1.0)
    assert act[0, 0] == times[0]
    assert np.isnan(act[0, 1])
    np.testing.assert_allclose(act[0, 2], 1.5)


def test_activation_default_threshold_is_midrange():
    times = np.linspace(0.0, 1.0, 5)
    u = np.zeros((5, 1, 2))
    u[:, 0, 0] = times                  # ramps 0 -> 1; midrange 0.5 at t=0.5
    act = maps.activation_times(u, times)
    np.testing.assert_allclose(act[0, 0], 0.5)
    assert np.isnan(act[0, 1])


# ----------------------------------------------------------------------
# apd_map


def test_apd_triangular_pulse_exact():
    """Piecewise-linear AP: rise 0->1 over [1, 2], fall 1->0 over [2, 5].
    APD90 level = 0.1; up-crossing at 1.1, down at 5 - 0.1*3 = 4.7."""
    times = np.linspace(0.0, 8.0, 81)
    sig = np.interp(times, [0.0, 1.0, 2.0, 5.0, 8.0],
                    [0.0, 0.0, 1.0, 0.0, 0.0])
    u = np.zeros((times.size, 2, 2))
    u[:, 0, 0] = sig
    u[:, 0, 1] = 0.02 * sig              # quiescent (below amplitude gate)
    u[:, 1, 0] = sig
    u[:, 1, 1] = sig
    apd = maps.apd_map(u, times, frac=0.9)
    np.testing.assert_allclose(apd[0, 0], 4.7 - 1.1, atol=1e-12)
    np.testing.assert_allclose(apd[1, 1], 3.6, atol=1e-12)
    assert np.isnan(apd[0, 1])


def test_apd_frac_dependence():
    """APD50 of the same triangle: level 0.5, up at 1.5, down at 3.5."""
    times = np.linspace(0.0, 8.0, 161)
    sig = np.interp(times, [0.0, 1.0, 2.0, 5.0, 8.0],
                    [0.0, 0.0, 1.0, 0.0, 0.0])
    u = sig[:, None, None] * np.ones((1, 1, 1))
    apd = maps.apd_map(u, times, frac=0.5)
    np.testing.assert_allclose(apd[0, 0], 2.0, atol=1e-12)


def test_apd_uses_first_ap_and_requires_completion():
    times = np.linspace(0.0, 10.0, 101)
    # two APs; the FIRST one (duration at level) must be reported
    sig = (np.interp(times, [0, 1, 2, 3, 10], [0, 0, 1, 0, 0])
           + np.interp(times, [0, 6, 7, 9, 10], [0, 0, 1, 0, 0]))
    u = sig[:, None, None]
    apd = maps.apd_map(u, times, frac=0.5)
    np.testing.assert_allclose(apd[0, 0], 1.0, atol=1e-12)
    # an AP that never repolarises inside the series -> NaN
    ramp = np.interp(times, [0, 1, 2, 10], [0, 0, 1, 1])[:, None, None]
    assert np.isnan(maps.apd_map(ramp, times, frac=0.5)[0, 0])


# ----------------------------------------------------------------------
# conduction_velocity


def test_cv_flat_plane_wave_reads_true_speed():
    cfg = _flat_cfg(nx=24)
    geo = make_geometry(cfg)
    g = geo.grid
    c = 0.7
    x = np.arange(g.nx) * g.dx
    act = np.broadcast_to(x / c, (g.ny, g.nx)).copy()
    speed, sx, sy = maps.conduction_velocity(act, geo)
    np.testing.assert_allclose(speed, c, rtol=1e-12)
    np.testing.assert_allclose(sx, 1.0 / c, rtol=1e-12)
    np.testing.assert_allclose(sy, 0.0, atol=1e-12)


def test_cv_torus_phi_wave_reads_surface_speed():
    """Activation advancing in phi at physical speed c: T(j, i) =
    j*dy*(R + r cos th_i)/c. Central/one-sided differences are exact for
    a map linear in j, so speed == c in every column."""
    cfg = SimConfig(surface="torus", x_mesh=24, surface_width=20.0,
                    surface_length=80.0)
    geo = make_geometry(cfg)
    g = geo.grid
    th = g.xmin + np.arange(g.nx) * g.dx
    c = 1.3
    ring = geo.R + geo.r * np.cos(th)
    act = (np.arange(g.ny)[:, None] * g.dy) * ring[None, :] / c
    speed, _, _ = maps.conduction_velocity(act, geo)
    # interior columns: d act/d th couples in via the central x-difference
    # of ring(th); the y-slowness alone is exactly 1/c
    _, sx, sy = maps.conduction_velocity(act, geo)
    np.testing.assert_allclose(sy, 1.0 / c, rtol=1e-12)


def test_cv_vmax_masks_collision_ridges():
    cfg = _flat_cfg(nx=12)
    geo = make_geometry(cfg)
    g = geo.grid
    x = np.arange(g.nx) * g.dx
    act = np.broadcast_to(np.minimum(x, x[-1] + g.dx - x) / 0.5,
                          (g.ny, g.nx)).copy()
    speed, _, _ = maps.conduction_velocity(act, geo, vmax=10.0)
    assert np.isnan(speed).any()               # the collision ridge
    finite = speed[np.isfinite(speed)]
    assert (finite <= 10.0).all()


def test_cv_propagates_nan():
    cfg = _flat_cfg(nx=12)
    geo = make_geometry(cfg)
    act = np.ones((geo.grid.ny, geo.grid.nx))
    act[3, 4] = np.nan
    speed, _, _ = maps.conduction_velocity(act, geo)
    assert np.isnan(speed[3, 4])


# ----------------------------------------------------------------------
# dominant_frequency_map


def test_df_on_bin_sinusoids():
    nt, dt = 128, 0.25
    times = np.arange(nt) * dt
    f1 = 8 / (nt * dt)                       # exactly on FFT bins
    f2 = 20 / (nt * dt)
    u = np.zeros((nt, 1, 2))
    u[:, 0, 0] = 2.0 + np.sin(2 * np.pi * f1 * times)
    u[:, 0, 1] = -1.0 + np.cos(2 * np.pi * f2 * times)
    freq, frac = maps.dominant_frequency_map(u, times)
    np.testing.assert_allclose(freq[0], [f1, f2], rtol=1e-12)
    np.testing.assert_allclose(frac[0], 1.0, atol=1e-9)


def test_df_constant_signal_zero_power():
    times = np.linspace(0.0, 1.0, 16)
    u = np.full((16, 2, 2), 3.0)
    freq, frac = maps.dominant_frequency_map(u, times)
    np.testing.assert_allclose(frac, 0.0)


def test_df_rejects_nonuniform_times():
    u = np.zeros((4, 1, 1))
    with pytest.raises(ValueError, match="uniform"):
        maps.dominant_frequency_map(u, np.array([0.0, 1.0, 3.0, 4.0]))


# ----------------------------------------------------------------------
# CLI pipeline


def test_cli_maps_pipeline(tmp_path):
    """run -> maps over the reference-format files (cli.py cmd_maps)."""
    from crdmodel_tpu.cli import main
    ini = tmp_path / "args.ini"
    ini.write_text(
        "[Parameters]\ndiffusion=1.0\nbeta=0.05\nsurfaceWidth=20\n"
        "surfaceLength=40\nwaveLength=0.25\nwaveWidth=0.5\nwaveInside=0\n"
        "outputTimestep=8\ntBoundary=0\ntFinal=8\nxMesh=24\nbetaMin=0\n"
        "betaMax=1\n[System]\nincludeAllVars=1\nvaryBeta=0\n")
    common = [str(ini), "--model", "barkley", "--surface", "flat"]
    rc = main(["run", "--outdir", str(tmp_path), "--quiet"] + common)
    assert rc == 0
    rc = main(["maps", "--dir", str(tmp_path), "--vmax", "100"] + common)
    assert rc == 0
    npz = tmp_path / "BarkleyModel_flat_maps.npz"
    assert npz.exists()
    data = np.load(npz)
    for key in ("activation", "apd", "cv", "dominant_freq",
                "slowness_x", "slowness_y", "dominant_power_frac"):
        assert data[key].shape == (48, 24)
    # a travelling Barkley wave must activate most of the domain
    assert np.isfinite(data["activation"]).mean() > 0.5
