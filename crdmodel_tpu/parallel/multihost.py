"""Multi-host (multi-process) execution over DCN.

The reference's MPI world spans nodes transparently (mpirun launches ranks
anywhere, src/FHNmodel_torus.cpp:217-220); the JAX equivalent is
jax.distributed: every process calls `initialize()`, after which
`jax.devices()` lists the devices of ALL processes and a Mesh built over
them spans hosts — shard_map collectives then ride ICI within a slice and
DCN across slices with no further code changes (the halo ppermutes and
error-control psums in parallel/sharded.py are topology-agnostic).

What this module adds on top of parallel/mesh.py:
  - initialize(): jax.distributed bootstrap (TPU pods auto-detect all
    arguments from the environment; explicit args support CPU testing and
    manual clusters).
  - distribute(): build a global jax.Array for a host-computed array (ICs,
    parameter fields are deterministic functions of the config, so every
    process computes them and contributes its addressable shards — no
    cross-host transfer of initial data).
  - simulate_sharded_multihost(): the sharded streaming driver wired for
    multi-process meshes, with per-process trajectory gathering optional
    (per-rank output files map naturally: each process writes its own).

Tested by tests/test_multihost.py: two coordinated CPU processes x 4
virtual devices each run the 2x4-spanning mesh and must reproduce the
single-process result exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y, balanced_dims


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap. On TPU pods all arguments are inferred
    from the environment; pass them explicitly for CPU clusters/tests."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_global_mesh(grid_shape: tuple, shape: Optional[tuple] = None) -> Mesh:
    """('py','px') mesh over ALL devices of all processes."""
    devs = jax.devices()
    if shape is None:
        shape = balanced_dims(len(devs), *grid_shape)
    arr = np.asarray(devs[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, (AXIS_Y, AXIS_X))


def distribute(mesh: Mesh, spec: P, host_array) -> jax.Array:
    """Global jax.Array from an array every process has computed in full
    (deterministic ICs/params): each process contributes the shards it can
    address; nothing crosses the network."""
    host_array = np.asarray(host_array)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host_array.shape, sharding, lambda idx: host_array[idx])


def distribute_params(mesh: Mesh, params: dict, specs: dict) -> dict:
    out = {}
    for k, v in params.items():
        s = specs[k]
        if isinstance(v, tuple):
            out[k] = tuple(distribute(mesh, si, vi) for vi, si in zip(v, s))
        else:
            out[k] = distribute(mesh, s, v)
    return out


def simulate_sharded_multihost(cfg, mesh: Optional[Mesh] = None,
                               problem=None, on_snapshot=None,
                               progress: bool = False, gather: bool = True,
                               checkpoint_every: Optional[int] = None,
                               checkpoint_dir: Optional[str] = None,
                               resume_dir: Optional[str] = None,
                               checkpoint_backend: str = "orbax",
                               host_offload: bool = False):
    """Streaming sharded run on a (possibly) process-spanning mesh.

    host_offload=True (with gather=True) keeps each allgathered snapshot in
    HOST memory so device memory stays bounded by the solver state
    regardless of Nt (see sim.simulate_streaming); gather=False needs no
    offload — snapshots stay device-sharded and trajectory rows live in
    the streamed per-shard files.

    Every process executes the same program; progress prints on process 0
    only. gather=True allgathers each snapshot to every host (fine for
    output-sized fields) and fires on_snapshot(k, np_array) on process 0;
    gather=False leaves the trajectory sharded and fires
    on_snapshot(k, sharded_jax_array) on EVERY process — pass an
    io.trajectory.ShardedReferenceWriter to stream per-shard reference
    files with no gather anywhere (the production pod IO path).

    checkpoint_every=N + checkpoint_dir checkpoint the solver state after
    every N output intervals; resume_dir resumes (post-resume snapshots
    only, as in simulate_sharded_streaming). checkpoint_backend defaults to
    "orbax" here: its save is a multi-process collective into one logical
    path and its restore reads only each process's own chunks; "npz"
    (per-shard files) also works when all files land on shared storage.
    """
    import time

    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.integrate.erk import SolveStats, merge_stops
    from crdmodel_tpu.parallel.sharded import (
        make_sharded_interval_fn, sharded_params)
    from crdmodel_tpu.sim import SimResult, output_times

    if checkpoint_backend not in ("npz", "orbax"):
        raise ValueError(f"checkpoint_backend must be 'npz' or 'orbax', "
                         f"got {checkpoint_backend!r}")
    problem = problem if problem is not None else build_problem(cfg)
    if mesh is None:
        mesh = make_global_mesh((cfg.ny, cfg.nx))
    dtype = jnp.dtype(cfg.dtype)
    is_lead = jax.process_index() == 0

    from crdmodel_tpu.parallel.sharded import mesh_pad_spec
    pad_spec = mesh_pad_spec(cfg, mesh)
    params_host, specs = sharded_params(problem, pad_spec)
    params = distribute_params(mesh, params_host, specs)

    def physical(arr):
        # see sharded.simulate_sharded_streaming: snapshots are PHYSICAL
        return pad_spec.unpad_field(arr) if pad_spec is not None else arr

    one_interval, h0_fn, one_interval_free, snap_at = \
        make_sharded_interval_fn(problem, mesh)
    normal = cfg.step_mode == "normal"
    touts = output_times(cfg)
    from crdmodel_tpu.core.problem import solver_breakpoints
    breakpoints = list(solver_breakpoints(cfg, problem.forcing))
    stop_times, is_output = merge_stops(touts, breakpoints)
    from crdmodel_tpu.sim import make_normal_stream_plan
    plan = (make_normal_stream_plan(zip(stop_times, is_output), breakpoints)
            if normal else None)

    def snap(arr):
        if not gather:
            return arr
        from jax.experimental import multihost_utils
        g = multihost_utils.process_allgather(arr, tiled=True)
        return np.asarray(g) if host_offload else jnp.asarray(g)

    nt = len(touts)
    t_start = time.perf_counter()
    if resume_dir is not None:
        from crdmodel_tpu.io.checkpoint import (load_orbax_checkpoint,
                                                load_sharded_checkpoint)
        load = (load_orbax_checkpoint if checkpoint_backend == "orbax"
                else load_sharded_checkpoint)
        ck = load(resume_dir, cfg, mesh)
        k_start = int(ck["k_out"])
        y = jnp.asarray(ck["y"], dtype)
        t = jnp.asarray(ck["t"], dtype)
        h = jnp.asarray(ck["h"], dtype)
        errp = jnp.asarray(ck["err_prev"], dtype)
        br_t = jnp.asarray(ck.get("br_t", ck["t"]), dtype)
        br_y = (jnp.asarray(ck["br_y"], dtype) if ck.get("br_y") is not None
                else y)
        if pad_spec is not None:
            # re-derive pad cells from the physical field (same wrap-refill
            # as simulate_sharded_streaming, parallel/sharded.py): the XLA
            # padded path carries frozen pads, the fused mirror-pad kernels
            # carry live wrapped copies — a checkpoint may hold either
            # (kernel selection depends on backend/interpret, which are not
            # in the config fingerprint), and the wrap-fill is the one
            # layout both paths accept as-is
            y = pad_spec.pad_field(pad_spec.unpad_field(y))
            br_y = pad_spec.pad_field(pad_spec.unpad_field(br_y))
        acc = {k: np.array(ck["stats"][k], dtype=np.int64)
               for k in ("steps", "accepted", "rejected", "status")}
        snaps = []
    else:
        k_start = 0
        y0_full = (pad_spec.pad_field(np.asarray(problem.y0))
                   if pad_spec is not None else np.asarray(problem.y0))
        from crdmodel_tpu.parallel.sharded import _state_spec
        y = distribute(mesh, _state_spec(problem), y0_full)
        t = jnp.asarray(0.0, dtype)
        h = h0_fn(y, {**params,
                      "_h0_tout": jnp.asarray(stop_times[0], dtype)})
        errp = jnp.asarray(1.0, dtype)
        br_t, br_y = t, y
        acc = {k: np.zeros(nt, dtype=np.int64)
               for k in ("steps", "accepted", "rejected", "status")}
        snaps = [snap(physical(y))]
        if on_snapshot is not None and (is_lead or not gather):
            on_snapshot(0, physical(y) if not gather
                        else np.asarray(snaps[0]))
    status = jnp.asarray(0, jnp.int32)

    state = {"t": t, "y": y, "h": h, "errp": errp, "status": status,
             "br_t": br_t, "br_y": br_y}

    def maybe_checkpoint(k_done):
        if checkpoint_every and checkpoint_dir and \
                k_done % checkpoint_every == 0 and k_done < nt:
            from crdmodel_tpu.io.checkpoint import (save_orbax_checkpoint,
                                                    save_sharded_checkpoint)
            save = (save_orbax_checkpoint if checkpoint_backend == "orbax"
                    else save_sharded_checkpoint)
            save(checkpoint_dir, cfg, mesh, k_done, state["y"],
                 float(state["t"]), float(state["h"]),
                 float(state["errp"]), acc,
                 br_t=float(state["br_t"]) if normal else None,
                 br_y=state["br_y"] if normal else None)

    def step_to(stop, first, k_out):
        if normal and plan[float(stop)][0]:
            cap = jnp.asarray(plan[float(stop)][1], dtype)
            (state["t"], state["y"], state["h"], state["errp"],
             state["br_t"], state["br_y"],
             (ns, na, nr, state["status"])) = one_interval_free(
                state["t"], state["y"], state["h"], state["errp"],
                state["status"], jnp.asarray(stop, dtype),
                jnp.asarray(first), state["br_t"], state["br_y"], cap,
                params)
        else:
            (state["t"], state["y"], state["h"], state["errp"],
             (ns, na, nr, state["status"])) = one_interval(
                state["t"], state["y"], state["h"], state["errp"],
                state["status"], jnp.asarray(stop, dtype),
                jnp.asarray(first), params)
            if normal:
                state["br_t"], state["br_y"] = state["t"], state["y"]
        acc["steps"][k_out] += int(ns)
        acc["accepted"][k_out] += int(na)
        acc["rejected"][k_out] += int(nr)
        acc["status"][k_out] = max(acc["status"][k_out],
                                   int(state["status"]))
        return int(state["status"])

    def on_output(k_done):
        if normal:
            cur = physical(snap_at(
                state["br_t"], state["br_y"], state["t"], state["y"],
                jnp.asarray(float(touts[k_done - 1]), dtype), params))
        else:
            cur = physical(state["y"])
        snaps.append(snap(cur))
        if on_snapshot is not None and (is_lead or not gather):
            on_snapshot(k_done, cur if not gather
                        else np.asarray(snaps[-1]))

    from crdmodel_tpu.sim import drive_stream_loop
    drive_stream_loop(list(zip(stop_times, is_output)), nt, k_start,
                      resume_dir is None, dtype, step_to,
                      lambda: float(state["t"]), on_output,
                      maybe_checkpoint, progress, t_start, lead=is_lead)

    wall = time.perf_counter() - t_start
    # gather=False keeps the per-snapshot DEVICE-SHARDED arrays in
    # SimResult.snapshots and leaves trajectory EMPTY — at pod scale the
    # rows live in the streamed per-shard files (never materialise a
    # host-gathered trajectory); field()/writers on the empty trajectory
    # yield empty results rather than a type error
    if gather and snaps:
        traj = (np.stack([np.asarray(s) for s in snaps]) if host_offload
                else jnp.stack(snaps))
    else:
        traj = jnp.zeros((0,) + tuple(problem.y0.shape), dtype)
    stats = SolveStats(steps=jnp.asarray(acc["steps"]),
                       accepted=jnp.asarray(acc["accepted"]),
                       rejected=jnp.asarray(acc["rejected"]),
                       status=jnp.asarray(acc["status"]))
    if resume_dir is not None:
        touts_out = touts[k_start:k_start + len(snaps)]
    else:
        touts_out = np.concatenate([[0.0], touts[:len(snaps) - 1]])
    return SimResult(cfg=cfg, problem=problem,
                     trajectory=traj,
                     touts=touts_out,
                     stats=stats, wall_time=wall,
                     snapshots=None if gather else snaps)


def sweep_beta_multihost(cfg, betas, mesh: Optional[Mesh] = None,
                         spatial_shape: Optional[tuple] = None):
    """Process-spanning 'member' ensemble sweep over DCN.

    The DCN analogue of parallel/ensemble.py: the member axis of a
    ('member',) or ('member','py','px') mesh spans ALL processes'
    devices (jax.devices() is global after initialize()), each member
    running the full single-member adaptive program with zero
    cross-member communication — the reference's N separate `mpirun`
    launches (README.md:29-34) become one multi-node program. Member
    inputs are built identically on every process and contributed
    shard-wise (distribute(); nothing crosses the network), results are
    allgathered to every host.

    Returns a sweep.SweepResult (trajectories include the IC row, the
    sweep.py layout)."""
    import dataclasses
    import time

    from jax.experimental import multihost_utils

    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.parallel.ensemble import (make_ensemble_mesh,
                                                make_ensemble_sweep_fn,
                                                member_axis_size)
    from crdmodel_tpu.parallel.mesh import AXIS_M
    from crdmodel_tpu.sweep import SweepResult

    if cfg.vary_beta:
        raise ValueError("sweep_beta sweeps the constant beta; "
                         "vary_beta encodes a spatial range")
    t0 = time.perf_counter()
    if mesh is None:
        mesh = make_ensemble_mesh(spatial_shape=spatial_shape)
    base = build_problem(cfg)
    run_e, touts, pad_e = make_ensemble_sweep_fn(base, mesh)
    m = member_axis_size(mesh)
    B = len(betas)
    n_pad = -(-B // m) * m
    probs = [build_problem(dataclasses.replace(cfg, beta=float(b)))
             for b in betas]
    dtype = np.dtype(cfg.dtype)
    y0s = np.stack([np.asarray(p.y0) for p in probs]).astype(dtype)
    if pad_e is not None:
        y0s = np.stack([np.asarray(pad_e.pad_field(y)) for y in y0s])
    bb = np.asarray(list(betas), dtype)
    if n_pad != B:
        y0s = np.concatenate([y0s, np.repeat(y0s[-1:], n_pad - B, 0)])
        bb = np.concatenate([bb, np.repeat(bb[-1:], n_pad - B)])
    ds = np.ones(n_pad, dtype)
    lead = lambda a: P(AXIS_M, *([None] * (np.ndim(a) - 1)))  # noqa: E731
    traj, stats = run_e(distribute(mesh, lead(y0s), y0s),
                        distribute(mesh, lead(bb), bb),
                        distribute(mesh, lead(ds), ds))
    gather = lambda x: np.asarray(  # noqa: E731
        multihost_utils.process_allgather(x, tiled=True))[:B]
    traj = gather(traj)
    stats = jax.tree_util.tree_map(gather, stats)
    if pad_e is not None:
        traj = np.asarray(pad_e.unpad_field(jnp.asarray(traj)))
        y0s = y0s[..., :cfg.ny, :cfg.nx]
    full = np.concatenate([y0s[:B, None], traj], axis=1)
    return SweepResult(cfg=cfg, betas=np.asarray(betas, np.float64),
                       trajectories=full,
                       touts=np.concatenate([[0.0], touts]), stats=stats,
                       wall_time=time.perf_counter() - t0,
                       members=tuple({"beta": float(b)} for b in betas))
