"""Ensemble parallelism: parameter-sweep members sharded across devices.

The reference's only sweep mechanism is separate `mpirun` launches per
hand-edited ini (README.md:29-34). sweep.py batches members on ONE device
(vmap off-TPU, the hand-batched member loop on TPU); this module adds the
missing axis: a leading **'member' mesh axis** that distributes members
across devices, each device (or spatial submesh) running the full
single-member adaptive program independently.

Why shard_map and not vmap-with-sharding: members are *embarrassingly*
parallel — per-member adaptive control means per-member while_loop trip
counts. A sharded vmap would run one global lockstep loop (every device
stepping until the SLOWEST member finishes, with a cross-member allreduce
per step); under shard_map each member's loop simply terminates when that
member is done, with ZERO cross-member communication. It also lifts the
two TPU restrictions of the on-device batched paths (sweep.py):

  * the fused Pallas kernels can't vmap (no Pallas TPU batching rule), but
    inside shard_map each device holds its member's FULL grid, so the
    member program IS the plain single-device program — fused kernels and
    all (sim.make_run_fn);
  * vmap-of-adaptive-while_loop TPU compiles are pathological (measured
    267 s for a toy, docs/PERF_NOTES.md); here nothing is vmapped.

Mesh layouts:
  ('member',)             one member (or a serial fold of B/M members) per
                          device — the sweet spot for sweep throughput
  ('member','py','px')    each member spatially decomposed over a
                          ('py','px') submesh (parallel/sharded.py
                          build_local_run): halo ppermutes and control-flow
                          psums name the spatial axes explicitly, so
                          members never couple. Uneven grids pad-and-mask
                          per member exactly as in single-member runs.

Per-member parameters ride runtime inputs, never baked constants: beta via
params["b"] (and the fused kernels' "_fused_b" input), diffusion via the
"dscale" coefficient scale — the same contract the serial TPU sweep uses
(sweep.py, ops/pallas_step.py::step_err).

check_vma=False throughout: member-varying while_loop conditions are the
entire point (devices in different members legitimately execute different
trip counts; collectives — if any — stay inside a member's spatial submesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from crdmodel_tpu.parallel.mesh import AXIS_M, AXIS_X, AXIS_Y


def make_ensemble_mesh(n_member_shards: Optional[int] = None,
                       spatial_shape: Optional[tuple] = None) -> Mesh:
    """A ('member',) or ('member','py','px') mesh over the first devices.

    n_member_shards: size of the member axis (default: all devices divided
    by the spatial submesh size). spatial_shape: optional (py, px) per-member
    spatial decomposition."""
    devs = jax.devices()
    if spatial_shape is None:
        m = n_member_shards if n_member_shards is not None else len(devs)
        if m > len(devs):
            raise ValueError(f"member mesh needs {m} devices, "
                             f"have {len(devs)}")
        return Mesh(np.asarray(devs[:m]), (AXIS_M,))
    py, px = spatial_shape
    per = py * px
    m = n_member_shards if n_member_shards is not None else len(devs) // per
    if m < 1 or m * per > len(devs):
        raise ValueError(f"mesh ({m},{py},{px}) needs {m * per} devices, "
                         f"have {len(devs)}")
    arr = np.asarray(devs[:m * per]).reshape(m, py, px)
    return Mesh(arr, (AXIS_M, AXIS_Y, AXIS_X))


def member_axis_size(mesh: Mesh) -> int:
    if mesh.axis_names[0] != AXIS_M:
        raise ValueError(f"ensemble mesh must lead with '{AXIS_M}', "
                         f"got axes {mesh.axis_names}")
    return int(mesh.devices.shape[0])


def make_ensemble_sweep_fn(problem, mesh: Mesh, sweep_d: bool = False,
                           interpret: bool = False):
    """Jitted run(y0s, b_batch, dscale) -> (traj, stats) over the member mesh.

    y0s: (B, nvars, ny, nx) member initial states (spatially PRE-PADDED by
    the caller when the grid doesn't divide a spatial submesh — sweep.py
    reuses its existing pad path); b_batch: (B,) scalars or (B, ny, 1)
    ramps; dscale: (B,) per-member diffusion scales (ignored unless
    sweep_d). B must be a multiple of the member-axis size (the caller pads
    by repeating members and slices the results back).

    Returns (run, touts, pad_spec); traj is (B, Nt, nvars, ny, nx) and
    stats arrays are (B, Nt) — the sweep.py vmap layout.
    """
    cfg = problem.cfg
    m_shards = member_axis_size(mesh)
    spatial = len(mesh.axis_names) > 1
    b_is_field = np.ndim(problem.params["b"]) == 2

    if spatial:
        from crdmodel_tpu.parallel.sharded import build_local_run
        spatial_shape = dict(zip(mesh.axis_names[1:],
                                 mesh.devices.shape[1:]))
        extra = {"dscale": P()} if sweep_d else None
        run_member, param_specs, pad_spec, touts = build_local_run(
            problem, spatial_shape, interpret_pallas=interpret,
            extra_param_specs=extra, member_sync=True)
        rest_specs = {k: v for k, v in param_specs.items()
                      if k not in ("b", "dscale")}
        y0_spec = P(AXIS_M, None, AXIS_Y, AXIS_X)
        traj_spec = P(AXIS_M, None, None, AXIS_Y, AXIS_X)
        b_spec = P(AXIS_M, AXIS_Y, None) if b_is_field else P(AXIS_M)
    else:
        from crdmodel_tpu.sim import make_run_fn
        run_member, touts = make_run_fn(problem, interpret=interpret)
        pad_spec = None
        rest_specs = None
        y0_spec = P(AXIS_M)
        traj_spec = P(AXIS_M)
        b_spec = P(AXIS_M)

    def local_fn(y0s_blk, b_blk, ds_blk, params_rest):
        def one(y0, b, ds):
            p = dict(params_rest)
            p["b"] = b
            if not spatial and not b_is_field:
                # fused single-device kernels read beta from the runtime
                # "_fused_b" input (ops/pallas_step.py::step_err); inert on
                # the XLA path
                p["_fused_b"] = jnp.reshape(b, (1, 1))
            if sweep_d:
                p["dscale"] = ds
            return run_member(y0, p)

        k = y0s_blk.shape[0]
        if k == 1:
            out = one(y0s_blk[0], b_blk[0], ds_blk[0])
            return jax.tree_util.tree_map(lambda x: x[None], out)
        # serial fold of k = B/M members per shard: ONE traced body
        return jax.lax.map(lambda args: one(*args),
                           (y0s_blk, b_blk, ds_blk))

    from crdmodel_tpu.integrate.erk import SolveStats
    stats_spec = jax.tree_util.tree_map(
        lambda _: P(AXIS_M), SolveStats(steps=0, accepted=0, rejected=0,
                                        status=0))
    in_specs = (y0_spec, b_spec, P(AXIS_M),
                rest_specs if spatial else {})
    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=in_specs,
                       out_specs=(traj_spec, stats_spec),
                       # member-varying loop trip counts are intentional
                       # (module docstring); vma can't express them
                       check_vma=False)

    if spatial:
        from crdmodel_tpu.parallel.sharded import sharded_params
        params0, _ = sharded_params(problem, pad_spec)
        params_rest = {k: v for k, v in params0.items() if k != "b"}
    else:
        params_rest = {}

    @jax.jit
    def run(y0s, b_batch, dscale):
        if y0s.shape[0] % m_shards:
            raise ValueError(f"B={y0s.shape[0]} not a multiple of the "
                             f"member axis ({m_shards}); pad members first")
        return fn(y0s, b_batch, dscale, params_rest)

    return run, touts, pad_spec
