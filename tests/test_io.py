"""Trajectory IO: reference-format write/read round trip, decomposition."""

import os

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.io.decomp import decompose, dims_create
from crdmodel_tpu.io.trajectory import (
    probe_nprocs, read_reference_files, save_npz, load_npz,
    write_reference_files,
)
from crdmodel_tpu.sim import simulate


def test_dims_create():
    assert dims_create(1) == (1, 1)
    assert dims_create(4) == (2, 2)
    assert dims_create(6) == (3, 2)
    assert dims_create(8) == (4, 2)
    assert dims_create(7) == (7, 1)


def test_decompose_covers_grid():
    for nprocs in (1, 3, 4, 6):
        subs = decompose(10, 17, nprocs)
        cover = np.zeros((17, 10), dtype=int)
        for s in subs:
            cover[s.j_start:s.j_end + 1, s.i_start:s.i_end + 1] += 1
        assert (cover == 1).all()


def test_reference_block_formula():
    # is = nx*cx/dims0 integer division (src/FHNmodel_torus.cpp:750-755)
    subs = decompose(10, 8, 4)  # dims (2,2)
    assert (subs[0].i_start, subs[0].i_end) == (0, 4)
    assert (subs[2].i_start, subs[2].i_end) == (5, 9)  # rank2 -> cx=1
    assert (subs[1].j_start, subs[1].j_end) == (4, 7)  # rank1 -> cy=1


@pytest.fixture(scope="module")
def small_result():
    cfg = SimConfig(model="fhn", surface="flat", x_mesh=10,
                    surface_width=20, surface_length=40,
                    t_final=0.5, output_timestep=2, beta=1.25,
                    include_all_vars=1, dtype="float64",
                    rtol=1e-6, atol=1e-10)
    return simulate(cfg)


@pytest.mark.parametrize("nprocs", [1, 4])
def test_write_read_roundtrip(small_result, tmp_path, nprocs):
    outdir = str(tmp_path / f"np{nprocs}")
    write_reference_files(small_result, outdir, nprocs=nprocs)
    prog = small_result.cfg.program_name
    assert probe_nprocs(outdir, prog) == nprocs
    for vi, var in enumerate(("u", "v")):
        arr, meta = read_reference_files(outdir, prog, var)
        want = small_result.field(vi)
        assert meta["nx"] == 10 and meta["ny"] == 20
        # %.16e round-trips float64 exactly
        np.testing.assert_array_equal(arr, want)


def test_file_format_matches_reference_layout(small_result, tmp_path):
    outdir = str(tmp_path)
    write_reference_files(small_result, outdir, nprocs=1)
    prog = small_result.cfg.program_name
    sub = open(os.path.join(outdir, f"{prog}_subdomain.000.txt")).read()
    # "nx  ny  is  ie  js  je XMIN XMAX TFINAL" (src/FHNmodel_flat.cpp:344)
    fields = sub.split()
    assert fields[:6] == ["10", "20", "0", "9", "0", "19"]
    line1 = open(os.path.join(outdir, f"{prog}_u.000.txt")).readline()
    assert line1.startswith(" ")           # reference's " %.16e" prefix
    vals = line1.split()
    assert len(vals) == 10 * 20            # x-fastest full local block
    assert all("e" in v for v in vals)


def test_read_actual_reference_style_files(tmp_path):
    """Hand-written files in the exact C++ output shape parse correctly."""
    prog = "FHNmodel_flat"
    with open(tmp_path / f"{prog}_subdomain.000.txt", "w") as fh:
        fh.write("4  2  0  3  0  1 0.000000 20.000000 50.000000\n")
    with open(tmp_path / f"{prog}_u.000.txt", "w") as fh:
        fh.write(" 1.0 2.0 3.0 4.0 5.0 6.0 7.0 8.0\n")
        fh.write(" 8.0 7.0 6.0 5.0 4.0 3.0 2.0 1.0\n")
    arr, meta = read_reference_files(str(tmp_path), prog, "u")
    assert arr.shape == (2, 2, 4)
    np.testing.assert_array_equal(arr[0, 0], [1, 2, 3, 4])
    np.testing.assert_array_equal(arr[1, 1], [4, 3, 2, 1])
    assert meta["t_final"] == 50.0


def test_npz_roundtrip(small_result, tmp_path):
    path = str(tmp_path / "traj.npz")
    save_npz(small_result, path)
    z = load_npz(path)
    np.testing.assert_array_equal(z["trajectory"],
                                  np.asarray(small_result.trajectory))
    assert z["status"].sum() == 0


def test_sharded_reference_writer_roundtrip(tmp_path):
    """ShardedReferenceWriter streams per-device-shard reference files with
    no gather; the standard reader must reassemble the exact trajectory."""
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.io.trajectory import (ShardedReferenceWriter,
                                            read_reference_files)
    from crdmodel_tpu.parallel.mesh import make_mesh
    from crdmodel_tpu.parallel.sharded import (simulate_sharded,
                                               simulate_sharded_streaming)

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=16,
                    surface_width=20.0, surface_length=40.0, t_final=0.5,
                    output_timestep=2, include_all_vars=1,
                    dtype="float64", rtol=1e-6, atol=1e-10)
    mesh = make_mesh(shape=(2, 4))
    problem = build_problem(cfg)
    writer = ShardedReferenceWriter(str(tmp_path), cfg, problem.model, mesh)
    res = simulate_sharded_streaming(cfg, mesh=mesh, problem=problem,
                                     on_snapshot=writer)
    assert res.ok

    batch = simulate_sharded(cfg, mesh=mesh)
    for v, name in ((0, "u"), (1, "v")):
        arr, meta = read_reference_files(str(tmp_path), cfg.program_name,
                                         var=name)
        assert arr.shape == (3, cfg.ny, cfg.nx)
        np.testing.assert_allclose(
            arr, np.asarray(batch.trajectory)[:, v], rtol=0, atol=1e-15)
