"""Scroll-wave filament detection (viz/filaments.py).

Oracles:
  * an analytic straight transmural vortex line — exactly one filament,
    one piercing per z-plane at the vortex centre, MST length == nz-1
  * an opposite-charge vortex PAIR — two filaments, net charge zero,
    never merged by the clustering radius
  * a filament PARALLEL to the xy-plane — invisible to the z-plaquette
    family (no transversal crossing), found by planes="all"
  * frame-to-frame tracking follows a drifting filament as ONE track
  * e2e: the scroll-wave slab (examples/scroll_wave.py setup, short Tf)
    yields one transmural filament through the real solver
"""

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.viz import filaments as fil


def vortex_uv(nz, ny, nx, centers, axis="z"):
    """Analytic phase field with straight vortex lines.

    centers: list of (yc, xc, charge) for axis="z" (lines along z), or
    (zc, yc, charge) for axis="x" (lines along x)."""
    z, y, x = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                          indexing="ij")
    th = np.zeros((nz, ny, nx))
    if axis == "z":
        for yc, xc, q in centers:
            th = th + q * np.arctan2(y - yc, x - xc)
    else:
        for zc, yc, q in centers:
            th = th + q * np.arctan2(y - yc, z - zc)
    return np.cos(th), np.sin(th)


def test_single_straight_filament():
    nz, ny, nx = 8, 32, 32
    u, v = vortex_uv(nz, ny, nx, [(15.2, 16.7, 1)])
    # the analytic single-vortex phase field has NET winding +1, which is
    # topologically impossible on a periodic domain — declaring y/x
    # periodic would (correctly) detect the compensating seam winding as a
    # second filament. The field is non-periodic; say so.
    fils = fil.find_filaments(u, v, origin=(0.0, 0.0),
                              periodic=(False, False, False))
    assert len(fils) == 1
    f = fils[0]
    assert len(f) == nz                      # one piercing per z-plane
    assert np.all(f.charges == f.charges[0])
    np.testing.assert_allclose(f.length, nz - 1, rtol=1e-12)
    # plaquette centre within one cell of the analytic vortex position
    assert np.all(np.abs(f.points[:, 1] - 15.2) < 1.0)
    assert np.all(np.abs(f.points[:, 2] - 16.7) < 1.0)
    # z-sorted sample points
    assert np.all(np.diff(f.points[:, 0]) > 0)


def test_vortex_pair_two_filaments_net_zero():
    nz, ny, nx = 6, 40, 40
    u, v = vortex_uv(nz, ny, nx, [(19.5, 10.5, 1), (19.5, 29.5, -1)])
    fils = fil.find_filaments(u, v, origin=(0.0, 0.0),
                              periodic=(False, True, True))
    assert len(fils) == 2
    assert all(len(f) == nz for f in fils)
    total = sum(int(f.charges.sum()) for f in fils)
    assert total == 0
    signs = sorted(int(np.sign(f.charges[0])) for f in fils)
    assert signs == [-1, 1]


def test_horizontal_filament_needs_all_planes():
    # a vortex line ALONG x: no transversal crossing of any xy-plaquette,
    # so the z-family sees nothing; the x-family (planes="all") finds it
    nz, ny, nx = 16, 16, 12
    u, v = vortex_uv(nz, ny, nx, [(7.4, 8.6, 1)], axis="x")
    none = fil.find_filaments(u, v, origin=(0.0, 0.0),
                              periodic=(False, False, True))
    assert len(none) == 0
    fils = fil.find_filaments(u, v, origin=(0.0, 0.0),
                              periodic=(False, False, True), planes="all")
    assert len(fils) == 1
    f = fils[0]
    assert len(f) == nx                      # one piercing per x-plane
    np.testing.assert_allclose(f.length, nx - 1, rtol=1e-12)
    assert np.all(np.abs(f.points[:, 0] - 7.4) < 1.0)
    assert np.all(np.abs(f.points[:, 1] - 8.6) < 1.0)


def test_tracking_follows_drifting_filament():
    nz, ny, nx = 6, 32, 32
    frames = []
    for k in range(5):
        u, v = vortex_uv(nz, ny, nx, [(12.0 + k, 10.0 + 2 * k, 1)])
        # non-periodic axes: single net winding (see
        # test_single_straight_filament)
        frames.append(fil.find_filaments(u, v, origin=(0.0, 0.0),
                                         periodic=(False, False, False)))
    tracks = fil.track_filaments(frames, (nz, ny, nx),
                                 periodic=(False, False, False))
    assert len(tracks) == 1
    t = tracks[0]
    assert t.lifetime == 5
    cents = np.asarray(t.centroids)
    # the centroid drifts with the prescribed (1, 2)/frame velocity
    np.testing.assert_allclose(np.diff(cents[:, 1]), 1.0, atol=0.3)
    np.testing.assert_allclose(np.diff(cents[:, 2]), 2.0, atol=0.3)
    counts, lengths = fil.filament_stats(frames)
    assert np.all(counts == 1)
    np.testing.assert_allclose(lengths, nz - 1)


def test_e2e_scroll_wave_filament():
    # the examples/scroll_wave.py slab at test scale: the broken-front IC
    # extruded along z organises into a scroll whose filament spans the
    # depth axis
    cfg = SimConfig(
        model="aliev_panfilov", surface="box", x_mesh=48,
        surface_width=30, surface_length=30, surface_depth=5,
        z_mesh=8, diffusion=1.0, beta=0.10,
        wave_length=0.25, wave_width=0.5,
        t_final=16.0, output_timestep=2,
        dtype="float32", rtol=1e-4, atol=1e-7, boundary="noflux",
    ).validate()
    res = simulate(cfg)
    assert res.ok
    traj = np.asarray(res.trajectory)        # (nt, nvars, nz, ny, nx)
    framesets, _ = fil.filaments_trajectory(
        traj[1:, 0], traj[1:, 1], periodic=fil.periodic_axes3(cfg))
    # a filament is present in every post-IC frame and the dominant one
    # spans (nearly) the full depth
    for fils in framesets:
        assert len(fils) >= 1
        assert len(fils[0]) >= cfg.nz - 1
    counts, lengths = fil.filament_stats(framesets)
    assert np.all(lengths >= cfg.nz - 2)
