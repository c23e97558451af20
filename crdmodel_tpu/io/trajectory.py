"""Reference-compatible trajectory file IO (SURVEY.md C11 + P1-P4 contract).

Writer: emits exactly the reference's per-rank text files from a SimResult:
  <prog>_subdomain.NNN.txt : "nx  ny  is  ie  js  je XMIN XMAX TFINAL"
                             (src/FHNmodel_torus.cpp:376-381)
  <prog>_<var0>.NNN.txt    : one line per output time (IC first), values
                             " %.16e"-formatted, x-fastest over the local
                             block (src/FHNmodel_torus.cpp:383-455)
  <prog>_<var1>.NNN.txt    : only when includeAllVars=1
The decomposition into virtual ranks follows the reference's arithmetic
(io/decomp.py), so downstream tooling — including the reference's own Python
scripts — cannot tell our files from the C++ program's.

Reader: probes subdomain files to count ranks and reassembles the global
(nt, ny, nx) array exactly like the reference plot scripts
(util/FHNmodel/plot_FHNmodel_torus.py:26-87). Works on files written by us
OR by the original MPI binaries.

The hot formatting path uses the native C library (native/trajio.cpp) when
buildable, with a numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.io.decomp import Subdomain, decompose
from crdmodel_tpu.native import build as native_build


def _write_rows(path: str, data: np.ndarray, mode: str = "w"):
    """data: (n_rows, n_cols) float64 -> ' %.16e'-formatted lines."""
    data = np.ascontiguousarray(data, dtype=np.float64)
    lib = native_build.load()
    if lib is not None:
        rc = lib.trajio_write_rows(
            path.encode(), mode.encode(),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            data.shape[0], data.shape[1])
        if rc == 0:
            return
    # numpy fallback (slower): savetxt has no leading-space format quirk,
    # so build lines manually
    with open(path, mode) as fh:
        for row in data:
            fh.write("".join(" %.16e" % v for v in row))
            fh.write("\n")


def write_reference_files(result, outdir: str, nprocs: int = 1,
                          include_all_vars: Optional[bool] = None) -> list:
    """Write a SimResult as reference-format per-rank files. Returns paths."""
    cfg = result.cfg
    prog = cfg.program_name
    model = result.problem.model
    if include_all_vars is None:
        include_all_vars = bool(cfg.include_all_vars)
    os.makedirs(outdir, exist_ok=True)
    subs = decompose(cfg.nx, cfg.ny, nprocs)
    traj = np.asarray(result.trajectory, dtype=np.float64)  # (nt,nvars,ny,nx)
    nt = traj.shape[0]
    paths = []
    nvars_out = model.nvars if include_all_vars else 1
    for sub in subs:
        tag = f"{sub.rank:03d}"
        spath = os.path.join(outdir, f"{prog}_subdomain.{tag}.txt")
        with open(spath, "w") as fh:
            fh.write(f"{cfg.nx}  {cfg.ny}  {sub.i_start}  {sub.i_end}  "
                     f"{sub.j_start}  {sub.j_end} {cfg.xmin:f} {cfg.xmax:f} "
                     f"{cfg.t_final:f}\n")
        paths.append(spath)
        for v in range(nvars_out):
            name = model.var_names[v]
            vpath = os.path.join(outdir, f"{prog}_{name}.{tag}.txt")
            block = traj[:, v, sub.j_start:sub.j_end + 1,
                         sub.i_start:sub.i_end + 1]
            _write_rows(vpath, block.reshape(nt, -1))
            paths.append(vpath)
    return paths


class ShardedReferenceWriter:
    """Incremental reference-format writer for sharded runs: each process
    appends one row per output time for every shard ITS devices hold — the
    reference's exact IO pattern (per-rank fprintf per output step,
    src/FHNmodel_torus.cpp:437-455) with device shards as the ranks, and no
    gather anywhere. Pass an instance as `on_snapshot=` to
    simulate_sharded_streaming or simulate_sharded_multihost(gather=False).

    Rank numbering is the flat index of the shard's device in the mesh, so
    the union of all processes' files forms one consistent file set that
    read_reference_files/the reference plot scripts reassemble unchanged.
    """

    def __init__(self, outdir: str, cfg, model, mesh,
                 include_all_vars: Optional[bool] = None,
                 append: bool = False):
        """append=True preserves existing rank files and appends to them —
        REQUIRED when resuming a checkpointed run into the same outdir
        (the default would truncate every previously streamed row on the
        first post-resume snapshot)."""
        self.outdir = outdir
        self.cfg = cfg
        self.model = model
        self.prog = cfg.program_name
        if include_all_vars is None:
            include_all_vars = bool(cfg.include_all_vars)
        self.nvars_out = model.nvars if include_all_vars else 1
        self._rank_of = {id(d): i
                         for i, d in enumerate(mesh.devices.flat)}
        os.makedirs(outdir, exist_ok=True)
        self.append = append
        self._started = set()

    def _shard_rank(self, shard) -> int:
        return self._rank_of[id(shard.device)]

    def _start(self, shard, rank: int):
        cfg = self.cfg
        (j0, j1), (i0, i1) = [(s.start or 0,
                               (s.stop if s.stop is not None else n) - 1)
                              for s, n in zip(shard.index[1:],
                                              (cfg.ny, cfg.nx))]
        spath = os.path.join(self.outdir,
                             f"{self.prog}_subdomain.{rank:03d}.txt")
        with open(spath, "w") as fh:
            fh.write(f"{cfg.nx}  {cfg.ny}  {i0}  {i1}  {j0}  {j1} "
                     f"{cfg.xmin:f} {cfg.xmax:f} {cfg.t_final:f}\n")
        if not self.append:
            for v in range(self.nvars_out):
                name = self.model.var_names[v]
                open(os.path.join(self.outdir,
                                  f"{self.prog}_{name}.{rank:03d}.txt"),
                     "w").close()
        self._started.add(rank)

    def __call__(self, k: int, y) -> None:
        """Append snapshot k: y is the sharded (nvars, ny, nx) jax.Array
        (raw, not gathered)."""
        del k  # rows are ordered by call sequence, like the reference
        for shard in y.addressable_shards:
            rank = self._shard_rank(shard)
            if rank not in self._started:
                self._start(shard, rank)
            block = np.asarray(shard.data, dtype=np.float64)
            for v in range(self.nvars_out):
                name = self.model.var_names[v]
                vpath = os.path.join(self.outdir,
                                     f"{self.prog}_{name}.{rank:03d}.txt")
                _write_rows(vpath, block[v].reshape(1, -1), mode="a")


def probe_nprocs(outdir: str, prog: str) -> int:
    """Count rank files the way the plot scripts do
    (util/FHNmodel/plot_FHNmodel_torus.py:26-35)."""
    n = 0
    while os.path.exists(os.path.join(outdir, f"{prog}_subdomain.{n:03d}.txt")):
        n += 1
    return n


def _read_values(path: str) -> np.ndarray:
    with open(path) as fh:
        rows = [np.fromstring(line, dtype=np.float64, sep=" ")
                for line in fh if line.strip()]
    return np.vstack(rows)


def read_reference_files(outdir: str, prog: str, var: str):
    """Reassemble (nt, ny, nx) for variable `var` plus metadata dict —
    the inverse of write_reference_files, matching the plot scripts'
    reassembly (util/FHNmodel/plot_FHNmodel_torus.py:37-87)."""
    nprocs = probe_nprocs(outdir, prog)
    if nprocs == 0:
        raise FileNotFoundError(f"no {prog}_subdomain.*.txt in {outdir}")
    meta = None
    subs = []
    for r in range(nprocs):
        vals = np.loadtxt(
            os.path.join(outdir, f"{prog}_subdomain.{r:03d}.txt"))
        if meta is None:
            meta = {"nx": int(vals[0]), "ny": int(vals[1]),
                    "xmin": float(vals[6]), "xmax": float(vals[7]),
                    "t_final": float(vals[8])}
        elif int(vals[0]) != meta["nx"] or int(vals[1]) != meta["ny"]:
            raise ValueError("subdomain files incompatible")
        subs.append(tuple(int(v) for v in vals[2:6]))

    results = None
    nt = None
    for r, (i0, i1, j0, j1) in enumerate(subs):
        data = _read_values(os.path.join(outdir, f"{prog}_{var}.{r:03d}.txt"))
        if results is None:
            nt = data.shape[0]
            results = np.zeros((nt, meta["ny"], meta["nx"]))
        elif data.shape[0] != nt:
            raise ValueError(f"subdomain {r} has {data.shape[0]} != {nt} steps")
        nyl, nxl = j1 - j0 + 1, i1 - i0 + 1
        for k in range(nt):
            results[k, j0:j1 + 1, i0:i1 + 1] = data[k].reshape(nyl, nxl)
    return results, meta


def save_npz(result, path: str):
    """Framework-native trajectory capture: one compressed npz with the full
    (nt, nvars, ny, nx) array + metadata — a strict superset of the
    reference's text contract at ~10x smaller size."""
    import dataclasses
    np.savez_compressed(
        path,
        trajectory=np.asarray(result.trajectory),
        touts=result.touts,
        steps=np.asarray(result.stats.steps),
        accepted=np.asarray(result.stats.accepted),
        rejected=np.asarray(result.stats.rejected),
        status=np.asarray(result.stats.status),
        config=repr(dataclasses.asdict(result.cfg)),
    )


def load_npz(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
