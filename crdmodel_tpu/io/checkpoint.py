"""Checkpoint / resume (SURVEY.md §5: absent in the reference — its text
rows are a trajectory record with no reader on the C++ side; this is the
promised strict superset).

A checkpoint freezes the integration at an output boundary: solver state
(y, t, h, err_prev), accumulated snapshots, per-interval stats, and a config
fingerprint so resuming with a different physical setup is refused.

Formats: compressed npz (dependency-free, single host); per-shard npz files
with a JSON manifest (no host gather, one file per addressable shard); and an
orbax-backed variant (save_orbax_checkpoint) storing the state array as
sharding-aware zarr — the TPU-ecosystem standard for pod-scale runs, where
every process writes/reads only its own chunks through one logical path.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from crdmodel_tpu.config import SimConfig

# fields that affect the trajectory (resume refuses a mismatch); knobs like
# use_pallas or dtype may legitimately change between sessions
_PHYSICS_FIELDS = (
    "model", "surface", "diffusion", "beta", "surface_width",
    "surface_length", "wave_length", "wave_width", "wave_inside",
    "output_timestep", "t_boundary", "t_final", "x_mesh", "y_mesh",
    "beta_min", "beta_max", "vary_beta", "just_diffusion", "ic_type",
    "rng_seed", "rtol", "atol", "method", "step_mode", "coupling",
    "boundary", "pole_coarsen", "z_mesh", "surface_depth",
)


def config_fingerprint(cfg: SimConfig) -> str:
    blob = json.dumps({f: getattr(cfg, f) for f in _PHYSICS_FIELDS},
                      sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_checkpoint(path: str, cfg: SimConfig, k_out: int,
                    y, t: float, h: float, err_prev: float,
                    snapshots, stats: dict, br_t=None, br_y=None):
    """Write a resumable checkpoint after output interval k_out.

    br_t/br_y: ARK_NORMAL streaming only — the dense-output bracket (start
    of the last accepted step), so a resumed run interpolates the next
    snapshot identically even when the checkpointed t overshot the output
    boundary (sim.simulate_streaming step_mode="normal")."""
    extra = {}
    if br_t is not None:
        extra["br_t"] = float(br_t)
        extra["br_y"] = np.asarray(br_y)
    np.savez_compressed(
        path,
        fingerprint=config_fingerprint(cfg),
        k_out=k_out,
        y=np.asarray(y),
        t=float(t), h=float(h), err_prev=float(err_prev),
        snapshots=np.asarray(snapshots),
        **{f"stats_{k}": np.asarray(v) for k, v in stats.items()},
        **extra,
    )
    return path


def load_checkpoint(path: str, cfg: SimConfig) -> dict:
    with np.load(path, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}
    fp = str(data["fingerprint"])
    want = config_fingerprint(cfg)
    if fp != want:
        raise ValueError(
            f"checkpoint {path} was written for a different problem "
            f"(fingerprint {fp} != {want}); refusing to resume")
    return data


def resume_streaming(cfg: SimConfig, path: str, problem=None,
                     on_snapshot=None, progress: bool = False,
                     checkpoint_every: Optional[int] = None,
                     checkpoint_path: Optional[str] = None,
                     host_offload: bool = False):
    """Resume a simulate_streaming run from a checkpoint file."""
    from crdmodel_tpu.sim import simulate_streaming
    data = load_checkpoint(path, cfg)
    return simulate_streaming(
        cfg, problem=problem, on_snapshot=on_snapshot, progress=progress,
        checkpoint_every=checkpoint_every, checkpoint_path=checkpoint_path,
        host_offload=host_offload, _resume=data)


# ---------------------------------------------------------------------------
# Sharded checkpoints: per-shard files + JSON manifest, no host gather.
#
# The npz checkpoint above gathers the full state to one host — fine on one
# chip, unscalable on a pod. Here every process writes exactly the shards it
# addresses (the analogue of the reference's per-rank output files,
# src/FHNmodel_torus.cpp:376-410), and resume reassembles a global jax.Array
# with jax.make_array_from_callback, reading only locally-needed shards.
#
# Scope: the SOLVER STATE (y, t, h, err_prev, stats), not the accumulated
# snapshots — at pod scale trajectory rows belong in the streamed per-rank
# output files, not in checkpoints. A resumed run's SimResult therefore
# contains only post-resume snapshots.
# ---------------------------------------------------------------------------


def _write_shards(dirpath: str, name: str, arr, pid: int, k_out: int):
    # crash-safety: every file is written to a temp name then atomically
    # renamed, and every shard carries the round id (k_out) that the loader
    # cross-checks against the manifest — a crash mid-overwrite can
    # therefore leave stale-round shards behind but NEVER an undetectably
    # mixed state (the loader refuses on round mismatch)
    n = -1
    for n, shard in enumerate(arr.addressable_shards):
        starts = [s.start or 0 for s in shard.index]
        path = os.path.join(dirpath, f"{name}.p{pid:03d}.s{n:03d}.npz")
        # prefix-named temp: np.savez appends .npz to unknown suffixes, and
        # the loader's {name}.p*.npz glob must never match an in-flight temp
        tmp = os.path.join(dirpath, f"tmp.{name}.p{pid:03d}.s{n:03d}.npz")
        np.savez_compressed(tmp, data=np.asarray(shard.data),
                            starts=np.asarray(starts),
                            k_out=np.asarray(int(k_out)))
        os.replace(tmp, path)
    # drop this process's leftovers from a previous (larger) shard count —
    # after an elastic resume onto a smaller mesh, stale higher-index files
    # would otherwise shadow the directory forever (review finding r3)
    import glob as _glob
    for f in _glob.glob(os.path.join(dirpath, f"{name}.p{pid:03d}.s*.npz")):
        try:
            s_idx = int(os.path.basename(f).rsplit(".s", 1)[1][:3])
        except ValueError:
            continue
        if s_idx > n:
            os.remove(f)


def save_sharded_checkpoint(dirpath: str, cfg: SimConfig, mesh, k_out: int,
                            y, t: float, h: float, err_prev: float,
                            stats: dict, br_t=None, br_y=None) -> str:
    """Per-shard checkpoint of the solver state after output interval k_out.

    y: a sharded jax.Array (nvars, ny, nx). Every process writes its
    addressable shards; process 0 writes the manifest. br_t/br_y: the
    ARK_NORMAL dense-output bracket (see save_checkpoint), br_y sharded
    like y.
    """
    import jax

    os.makedirs(dirpath, exist_ok=True)
    pid = jax.process_index()
    _write_shards(dirpath, "y", y, pid, k_out)
    if br_y is not None:
        _write_shards(dirpath, "bry", br_y, pid, k_out)
    if pid == 0:
        manifest = {
            "fingerprint": config_fingerprint(cfg),
            "k_out": int(k_out),
            "t": float(t), "h": float(h), "err_prev": float(err_prev),
            "mesh_shape": [int(s) for s in mesh.devices.shape],
            "global_shape": [int(s) for s in y.shape],
            "stats": {k: np.asarray(v).tolist() for k, v in stats.items()},
        }
        if br_t is not None:
            manifest["br_t"] = float(br_t)
            manifest["has_br_y"] = br_y is not None
        mpath = os.path.join(dirpath, "manifest.json")
        with open(mpath + ".tmp", "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(mpath + ".tmp", mpath)
    return dirpath


def _regrid_for_mesh(arr_np, cfg, saved_mesh_shape, mesh):
    """Re-layout a saved global state array for a DIFFERENT mesh shape
    (elastic resume): strip the saved mesh's pad cells back to the physical
    grid, then pad for the new mesh (parallel/padding.py). Identity when
    neither mesh needs padding."""
    from crdmodel_tpu.parallel.padding import pad_spec_for
    # the saved pad layout is whatever the saving session used (its
    # y-multiple policy may differ, padding.py::fused_y_multiple) — unpad
    # needs only the physical extents, so slice by shape rather than
    # reconstructing the old spec
    if arr_np.shape[-2:] != (cfg.ny, cfg.nx):
        arr_np = np.asarray(arr_np[..., :cfg.ny, :cfg.nx])
    new = pad_spec_for(cfg, *(int(s) for s in mesh.devices.shape))
    if new.active:
        arr_np = np.asarray(new.pad_field(arr_np))
    return arr_np


def load_sharded_checkpoint(dirpath: str, cfg: SimConfig, mesh) -> dict:
    """Reassemble the solver state on mesh.

    Returns {k_out, t, h, err_prev, stats, y} with y a global sharded
    jax.Array. Refuses fingerprint mismatches (different physics). A
    DIFFERENT mesh shape is fine — elastic resume: the saved shards are
    reassembled into the global array, pad cells re-laid-out for the new
    mesh, and the state sharded onto it (device count changes between
    sessions are routine at pod scale). All per-process shard files must
    be visible (shared storage).
    """
    import glob

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y

    with open(os.path.join(dirpath, "manifest.json")) as fh:
        manifest = json.load(fh)
    want = config_fingerprint(cfg)
    if manifest["fingerprint"] != want:
        raise ValueError(
            f"checkpoint {dirpath} was written for a different problem "
            f"(fingerprint {manifest['fingerprint']} != {want}); "
            "refusing to resume")
    same_mesh = (list(manifest["mesh_shape"])
                 == [int(s) for s in mesh.devices.shape])

    def reassemble(name):
        # Shards from a different round than the manifest are SKIPPED, not
        # an immediate error: after an elastic resume onto a mesh with a
        # different per-process shard count, files from the older layout
        # legitimately coexist in the directory. They only become an error
        # when the manifest round's files don't fully cover the state —
        # which is exactly the interrupted-save case the round id exists
        # to detect.
        shards, stale = {}, []
        for f in glob.glob(os.path.join(dirpath, f"{name}.p*.s*.npz")):
            with np.load(f) as z:
                if "k_out" in z and int(z["k_out"]) != int(manifest["k_out"]):
                    stale.append(os.path.basename(f))
                    continue
                shards[tuple(int(v) for v in z["starts"])] = z["data"]

        def missing_error(detail):
            if stale:
                return ValueError(
                    f"checkpoint {dirpath} is MIXED: {detail}, and "
                    f"{len(stale)} {name} shard file(s) from a different "
                    f"round exist (e.g. {stale[0]}) — a save was "
                    "interrupted; refusing to resume from a corrupted "
                    "state")
            return ValueError(
                f"checkpoint {dirpath} {detail} (written by another "
                "process? copy all per-process files to shared storage)")

        shape = tuple(manifest["global_shape"])
        sharding = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))

        if same_mesh:
            def shard_for(index):
                key = tuple((s.start or 0) for s in index)
                if key not in shards:
                    raise missing_error(f"is missing the {name} shard at "
                                        f"{key}")
                return shards[key]

            return jax.make_array_from_callback(shape, sharding, shard_for)

        # elastic resume: assemble the saved global array from its disjoint
        # shard tiling, re-layout pad cells for the new mesh, shard onto it
        if not shards:
            raise missing_error(f"has no {name} shards for round "
                                f"{int(manifest['k_out'])}")
        total = 0
        full = np.empty(shape, next(iter(shards.values())).dtype)
        for starts, data in shards.items():
            sl = tuple(slice(s, s + n) for s, n in zip(starts, data.shape))
            full[sl] = data
            total += data.size
        if total != full.size:
            raise missing_error(f"{name} shards cover {total} of "
                                f"{full.size} elements")
        full = _regrid_for_mesh(full, cfg, manifest["mesh_shape"], mesh)
        return jax.device_put(full, sharding)

    out = {
        "k_out": int(manifest["k_out"]),
        "t": manifest["t"], "h": manifest["h"],
        "err_prev": manifest["err_prev"],
        "stats": {k: np.asarray(v, dtype=np.int64)
                  for k, v in manifest["stats"].items()},
        "y": reassemble("y"),
    }
    if "br_t" in manifest:
        out["br_t"] = manifest["br_t"]
        out["br_y"] = (reassemble("bry") if manifest.get("has_br_y")
                       else None)
    return out


# ---------------------------------------------------------------------------
# Orbax backend: the same manifest contract, with the state array stored as
# sharding-aware zarr via orbax.checkpoint. Unlike the per-shard npz files
# (one file per addressable shard, reassembled by start-offset), orbax
# chunks the GLOBAL array: a pod restore reads each process's chunks from
# one logical path, and the save participates in orbax's multi-process
# barrier — the standard checkpoint format of the TPU ecosystem.
#
# Layout:  dirpath/manifest.json   (scalars, stats, fingerprint — process 0)
#          dirpath/y/              (orbax checkpoint of the state array)
# ---------------------------------------------------------------------------


def save_orbax_checkpoint(dirpath: str, cfg: SimConfig, mesh, k_out: int,
                          y, t: float, h: float, err_prev: float,
                          stats: dict, br_t=None, br_y=None) -> str:
    """Orbax checkpoint of the solver state after output interval k_out.

    y: a (possibly sharded) jax.Array (nvars, ny, nx). Every process must
    call this (orbax save is collective); process 0 writes the manifest.
    br_t/br_y: the ARK_NORMAL dense-output bracket (see save_checkpoint).
    """
    import jax
    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    os.makedirs(dirpath, exist_ok=True)
    tree = {"y": y}
    if br_y is not None:
        tree["br_y"] = br_y
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(dirpath, "y"), tree, force=True)
    if jax.process_index() == 0:
        manifest = {
            "fingerprint": config_fingerprint(cfg),
            "k_out": int(k_out),
            "t": float(t), "h": float(h), "err_prev": float(err_prev),
            "mesh_shape": [int(s) for s in mesh.devices.shape],
            "global_shape": [int(s) for s in y.shape],
            "stats": {k: np.asarray(v).tolist() for k, v in stats.items()},
        }
        if br_t is not None:
            manifest["br_t"] = float(br_t)
            manifest["has_br_y"] = br_y is not None
        with open(os.path.join(dirpath, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1)
    return dirpath


def load_orbax_checkpoint(dirpath: str, cfg: SimConfig, mesh=None) -> dict:
    """Restore an orbax checkpoint; with mesh, y comes back sharded
    (nvars replicated, rows over AXIS_Y, cols over AXIS_X) and each process
    reads only the chunks its devices need. Refuses fingerprint mismatches
    (different physics); a different MESH SHAPE is an elastic resume —
    orbax re-shards natively when the global shape is unchanged, and
    pad-layout changes are re-laid-out on host (_regrid_for_mesh)."""
    import jax
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y

    dirpath = os.path.abspath(dirpath)
    with open(os.path.join(dirpath, "manifest.json")) as fh:
        manifest = json.load(fh)
    want = config_fingerprint(cfg)
    if manifest["fingerprint"] != want:
        raise ValueError(
            f"checkpoint {dirpath} was written for a different problem "
            f"(fingerprint {manifest['fingerprint']} != {want}); "
            "refusing to resume")
    # the saved global shape is the SAVED mesh's padded layout; the new
    # mesh may need a different pad — restore to host in that case
    if mesh is not None:
        from crdmodel_tpu.parallel.padding import pad_spec_for
        new_spec = pad_spec_for(cfg, *(int(s) for s in mesh.devices.shape))
        nvars = int(manifest["global_shape"][0])
        need_shape = ((nvars,) + new_spec.padded_shape if new_spec.active
                      else (nvars, cfg.ny, cfg.nx))
        direct = tuple(manifest["global_shape"]) == need_shape
    else:
        direct = False

    ypath = os.path.join(dirpath, "y")
    with ocp.StandardCheckpointer() as ckptr:
        tree_meta = ckptr.metadata(ypath).item_metadata.tree

        def abstract_for(name):
            meta = tree_meta[name]
            abstract = jax.ShapeDtypeStruct(tuple(meta.shape),
                                            np.dtype(meta.dtype))
            if mesh is not None and direct:
                abstract = jax.ShapeDtypeStruct(
                    abstract.shape, abstract.dtype,
                    sharding=NamedSharding(mesh, P(None, AXIS_Y, AXIS_X)))
            return abstract

        want = {"y": abstract_for("y")}
        if manifest.get("has_br_y"):
            want["br_y"] = abstract_for("br_y")
        restored = ckptr.restore(ypath, want)

    if mesh is not None and not direct:
        sharding = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))
        restored = {
            k: jax.device_put(
                _regrid_for_mesh(np.asarray(v), cfg,
                                 manifest["mesh_shape"], mesh), sharding)
            for k, v in restored.items()}

    out = {
        "k_out": int(manifest["k_out"]),
        "t": manifest["t"], "h": manifest["h"],
        "err_prev": manifest["err_prev"],
        "stats": {k: np.asarray(v, dtype=np.int64)
                  for k, v in manifest["stats"].items()},
        "y": restored["y"],
    }
    if "br_t" in manifest:
        out["br_t"] = manifest["br_t"]
        out["br_y"] = restored.get("br_y")
    return out
