"""Spiral-tip detection/tracking (viz/tips.py).

Oracle 1: a synthetic vortex-antivortex phase pair — on a periodic domain
total topological charge is zero, so the minimal analytic fixture is a
+1/-1 pair; the winding detector must find exactly those two plaquettes
with the right charges. Oracle 2: translating the pair frame-to-frame must
link into two full-length continuous tracks. Oracle 3 (physics): the
Barkley broken-front seed curls into a rotating spiral whose core is a
persistent phase singularity."""

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate
from crdmodel_tpu.viz import tips


def _pair_fields(ny, nx, p_plus, p_minus):
    """u = cos(phi), v = sin(phi) with phi = angle around p_plus minus
    angle around p_minus (net charge 0 -> periodic-compatible)."""
    jj, ii = np.mgrid[0:ny, 0:nx].astype(np.float64)
    phi = (np.arctan2(jj - p_plus[0], ii - p_plus[1])
           - np.arctan2(jj - p_minus[0], ii - p_minus[1]))
    return np.cos(phi), np.sin(phi)


def test_synthetic_pair_detected_exactly():
    ny, nx = 64, 96
    p_plus, p_minus = (20.25, 30.25), (44.25, 70.25)
    u, v = _pair_fields(ny, nx, p_plus, p_minus)
    ts = tips.find_tips(u, v, origin=(0.0, 0.0))
    assert len(ts) == 2
    order = np.argsort(ts.charges)          # [-1, +1]
    np.testing.assert_array_equal(np.sort(ts.charges), [-1, 1])
    pm = ts.positions[order[0]]
    pp = ts.positions[order[1]]
    assert np.hypot(*(pp - np.asarray(p_plus))) < 1.0
    assert np.hypot(*(pm - np.asarray(p_minus))) < 1.0


def test_total_charge_is_zero_on_periodic_domain():
    rng = np.random.default_rng(3)
    u = rng.standard_normal((48, 48))
    v = rng.standard_normal((48, 48))
    q = tips.winding_numbers(u, v, (0.0, 0.0))
    assert int(q.sum()) == 0     # topological constraint, any field


def test_linking_translating_pair():
    ny, nx = 64, 96
    nt = 8
    tu, tv = [], []
    for k in range(nt):
        u, v = _pair_fields(ny, nx, (20.25 + k, 30.25 + k),
                            (44.25, 70.25 - k))
        tu.append(u)
        tv.append(v)
    tipsets, tracks, _ = tips.track_spiral_tips(
        np.asarray(tu), np.asarray(tv), origin=(0.0, 0.0))
    assert all(len(ts) == 2 for ts in tipsets)
    assert len(tracks) == 2
    for tr in tracks:
        assert tr.lifetime == nt
        frames, pos = tr.as_array()
        jumps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
        assert jumps.max() < 2.5      # ~sqrt(2) cells/frame + detector jitter


def test_linking_respects_periodic_wrap():
    """The linker must not break a track whose tip crosses the row-0 seam
    (synthetic detections: an atan2-built field is not itself periodic, so
    the linker is tested directly; see _pair_fields' plane-only caveat)."""
    ny, nx = 64, 96
    nt = 6
    tipsets = []
    for k in range(nt):
        pos = np.asarray([[(2.5 - k) % ny, 30.5], [44.5, 70.5]])
        tipsets.append(tips.TipSet(positions=pos,
                                   charges=np.asarray([1, -1])))
    tracks = tips.link_tips(tipsets, (ny, nx))
    lifetimes = sorted(tr.lifetime for tr in tracks)
    assert lifetimes == [nt, nt]


def test_barkley_spiral_has_persistent_tip():
    cfg = SimConfig(model="barkley", surface="flat", x_mesh=32,
                    surface_width=20, surface_length=40, beta=0.05,
                    diffusion=1.0, wave_length=0.25, wave_width=0.5,
                    t_final=12.0, output_timestep=12, dtype="float64",
                    rtol=1e-6, atol=1e-9)
    res = simulate(cfg)
    assert res.ok
    u = res.field(0)
    v = res.field(1)
    tipsets, tracks, origin = tips.track_spiral_tips(u, v)
    late = tipsets[len(tipsets) // 2:]
    assert sum(len(ts) > 0 for ts in late) >= len(late) - 1
    assert max(tr.lifetime for tr in tracks) >= len(tipsets) // 2


def test_cli_tips_pipeline(tmp_path):
    """run -> tips over the reference-format files (cli.py cmd_tips)."""
    from crdmodel_tpu.cli import main
    ini = tmp_path / "args.ini"
    ini.write_text(
        "[Parameters]\ndiffusion=1.0\nbeta=0.05\nsurfaceWidth=20\n"
        "surfaceLength=40\nwaveLength=0.25\nwaveWidth=0.5\nwaveInside=0\n"
        "outputTimestep=6\ntBoundary=0\ntFinal=6\nxMesh=24\nbetaMin=0\n"
        "betaMax=1\n[System]\nincludeAllVars=1\nvaryBeta=0\n")
    common = [str(ini), "--model", "barkley", "--surface", "flat"]
    rc = main(["run", "--outdir", str(tmp_path), "--quiet"] + common)
    assert rc == 0
    rc = main(["tips", "--dir", str(tmp_path)] + common)
    assert rc == 0
    csv = tmp_path / "BarkleyModel_flat_tips.csv"
    assert csv.exists()
    assert len(csv.read_text().strip().splitlines()) > 1


def test_csv_roundtrip(tmp_path):
    ny, nx = 48, 48
    u, v = _pair_fields(ny, nx, (12.25, 12.25), (36.25, 36.25))
    ts = tips.find_tips(u, v, origin=(0.0, 0.0))
    path = tips.tips_to_csv([ts], [0.0], str(tmp_path / "tips.csv"))
    rows = open(path).read().strip().splitlines()
    assert rows[0] == "frame,t,row,col,y,x,charge"
    assert len(rows) == 3


def test_single_vortex_on_bounded_domain():
    # a SINGLE +1 vortex is incompatible with a periodic domain (total
    # charge must be 0 there: the compensating -1 lands on the seam
    # plaquettes) but is exactly right on a bounded no-flux domain —
    # periodic=(False, False) drops the seam plaquettes and finds one tip
    ny, nx = 64, 96
    jj, ii = np.mgrid[0:ny, 0:nx].astype(np.float64)
    phi = np.arctan2(jj - 30.25, ii - 40.25)
    u, v = np.cos(phi), np.sin(phi)
    q_per = tips.winding_numbers(u, v, (0.0, 0.0))
    assert int(q_per.sum()) == 0                 # seam carries the -1
    ts = tips.find_tips(u, v, origin=(0.0, 0.0), periodic=(False, False))
    assert len(ts) == 1 and ts.charges[0] == 1
    assert np.hypot(*(ts.positions[0] - np.asarray((30.25, 40.25)))) < 1.0


def test_periodic_axes_from_cfg():
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=12,
                    surface_width=20, surface_length=40)
    assert tips.periodic_axes(cfg) == (True, True)
    import dataclasses
    assert tips.periodic_axes(
        dataclasses.replace(cfg, boundary="noflux")) == (False, False)
    assert tips.periodic_axes(
        dataclasses.replace(cfg, boundary="noflux_x")) == (True, False)
    assert tips.periodic_axes(
        dataclasses.replace(cfg, boundary="noflux_y")) == (False, True)


def test_bounded_linking_does_not_wrap():
    # two frames, one tip hugging the left edge then the right edge: with
    # wrap that is a tiny jump (links), without wrap it exceeds max_jump
    # (two tracks)
    ny, nx = 32, 32
    a = tips.TipSet(positions=np.array([[16.5, 0.5]]),
                    charges=np.array([1]))
    b = tips.TipSet(positions=np.array([[16.5, 31.5]]),
                    charges=np.array([1]))
    tracks_wrap = tips.link_tips([a, b], (ny, nx), max_jump=3.0)
    assert len(tracks_wrap) == 1
    tracks_flat = tips.link_tips([a, b], (ny, nx), max_jump=3.0,
                                 periodic=(False, False))
    assert len(tracks_flat) == 2
