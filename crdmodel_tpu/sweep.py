"""Parameter-sweep driver: vmapped batches of simulations.

The reference can only sweep parameters by launching separate `mpirun`
processes per ini file (README.md:29-34). Here a sweep shares ONE compiled
adaptive-integrator program across all members — batched with `jax.vmap`
off-TPU, or reused serially per member on TPU where the vmapped while_loop's
compile time is pathological (_resolve_batch_mode). Listed as the north-star
"vmapped parameter-sweep driver over ini-style configs" in BASELINE.json.

Adaptive stepping under vmap runs members in lockstep: each member keeps its
own step size and accept/reject decisions, and the batched while_loop runs
until every member reaches the output time (JAX masks the finished ones) —
semantics identical to running members separately, at batched throughput.

Sweepable per-member parameters (SWEEPABLE_FIELDS / sweep_configs): beta
(feeds the kinetics AND the initial condition through the steady state),
diffusion (a traced scale on the linear-in-D stencil coefficients — one
compiled stencil serves every D), and the wave-geometry / IC fields
(wave_length, wave_width, wave_inside, ic_type, rng_seed). Grid shape,
surface and method change the compiled program, so they sweep at the Python
level (one compile per value).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.integrate.erk import SolveStats, integrate_to_outputs
from crdmodel_tpu.sim import output_times


@dataclasses.dataclass
class SweepResult:
    cfg: SimConfig
    betas: np.ndarray           # legacy name; the swept member values
    trajectories: jnp.ndarray   # (n_members, Nt+1, nvars, ny, nx)
    touts: np.ndarray
    stats: SolveStats           # batched: arrays (n_members, Nt)
    wall_time: float
    members: tuple = ()         # per-member override dicts (sweep_configs)

    def ok(self) -> bool:
        return bool(np.all(np.asarray(self.stats.status) == 0))


# Per-member sweepable SimConfig fields (SURVEY.md §7 step 8: "beta grids, D,
# wave geometry"). beta feeds kinetics + ICs; diffusion rescales the stencil
# via the traced params["dscale"] scalar (coefficients are linear in D,
# core/grid.py); the wave-geometry and IC fields feed ICs only. Grid shape /
# surface / method change the compiled program and sweep at the Python level.
SWEEPABLE_FIELDS = ("beta", "diffusion", "wave_length", "wave_width",
                    "wave_inside", "ic_type", "rng_seed")


def _is_ensemble_mesh(mesh) -> bool:
    from crdmodel_tpu.parallel.ensemble import AXIS_M
    return mesh is not None and AXIS_M in getattr(mesh, "axis_names", ())


def _resolve_batch_mode(batch_mode: str, mesh=None, cfg=None) -> str:
    """"auto" picks per backend: "vmap" (jax.vmap over the whole run) off-
    TPU; on TPU "members" (small grids), "serial" (large grids and
    spatially sharded sweeps). A mesh whose leading axis is 'member'
    (parallel/ensemble.py) always takes "devices": members sharded across
    devices, each running the full single-member program independently.

    Why three modes: XLA-TPU compile of jax.vmap over the whole adaptive
    loop nest is pathological (measured 2026-08-17: 267 s cold for a 10x40
    toy vs 65 s for the single-member program; lax.map worse still). The
    "members" mode instead hand-batches the member axis INSIDE one
    lax.while_loop (integrate_to_outputs n_members: per-member step size,
    accept/reject and status masking — step sequences identical to separate
    runs) and vmaps only the stepper, which compiles like the single-member
    program. "serial" (ONE compiled single-member program, host loop over
    members) remains for sharded sweeps, whose shard_map closure is not
    member-foldable on a fixed device mesh.

    The on-TPU members/serial crossover is the fused-kernel threshold
    (PALLAS_AUTO_POINTS): below it one member underutilises the VPU and
    batching wins big (measured 2026-08-17, B=8 FHN at 100x400: members
    0.045 s vs serial 0.311 s warm — 7.0x); above it one member already
    saturates the VPU and the serial path additionally gets the fused
    kernel that the member-batched XLA loop cannot use (B=8 at 400x1600:
    members 2.42 s vs serial 0.96 s — batching LOSES 2.5x). See
    docs/PERF_NOTES.md "TPU-batched sweeps"."""
    ens = _is_ensemble_mesh(mesh)
    if batch_mode == "auto":
        if ens:
            return "devices"
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if not on_tpu:
            return "vmap"
        if mesh is not None:
            return "serial"
        from crdmodel_tpu.config import PALLAS_AUTO_POINTS
        if cfg is not None and cfg.ny * cfg.nx >= PALLAS_AUTO_POINTS:
            return "serial"
        return "members"
    if batch_mode not in ("vmap", "serial", "members", "devices"):
        raise ValueError(f"batch_mode must be auto|vmap|serial|members|"
                         f"devices, got {batch_mode!r}")
    if batch_mode == "devices" and not ens:
        raise ValueError("batch_mode='devices' needs a mesh whose leading "
                         "axis is 'member' (parallel/ensemble.py::"
                         "make_ensemble_mesh)")
    if batch_mode != "devices" and ens:
        raise ValueError(f"a 'member' mesh implies batch_mode='devices'; "
                         f"got {batch_mode!r}")
    if batch_mode == "members" and mesh is not None:
        raise ValueError("batch_mode='members' folds the member axis into "
                         "the single-device program; sharded sweeps take "
                         "batch_mode='vmap' (CPU mesh) or 'serial'")
    return batch_mode


# Compiled-runner cache: sweep_configs is called repeatedly with the same
# base config (parameter studies iterate), and a fresh closure per call
# would miss jax.jit's cache every time — measured 5-11 s of retrace per
# warm B=8 call vs ~0.05 s of actual device compute (2026-08-17). Keyed by
# the full config tuple (+ member count / swept-field structure / mesh
# device ids); entries live for the process like Problem.cache.
_SWEEP_CACHE: dict = {}


def _mesh_key(mesh):
    if mesh is None:
        return None
    return (tuple(mesh.axis_names), tuple(mesh.devices.shape),
            tuple(int(d.id) for d in mesh.devices.flat))


def _cached(key, build):
    if key not in _SWEEP_CACHE:
        _SWEEP_CACHE[key] = build()
    return _SWEEP_CACHE[key]


def sweep_configs(cfg: SimConfig, overrides, mesh=None,
                  batch_mode: str = "auto") -> SweepResult:
    """Run one simulation per override dict in a single compiled program.

    overrides: sequence of dicts with keys from SWEEPABLE_FIELDS, e.g.
    [{"beta": 0.3, "diffusion": 0.06}, {"beta": 0.3, "diffusion": 0.12}, ...].
    Each member's ICs are rebuilt from its full overridden config; per-member
    kinetics see their own beta, and per-member diffusion rides the
    params["dscale"] scalar so ONE compiled stencil serves every D value.

    The reference's only sweep mechanism is separate `mpirun` launches per
    hand-edited ini (README.md:29-34); this is the in-program generalisation
    (members share the compiled adaptive solver, masked lockstep semantics —
    see module docstring).

    mesh: optional device mesh — each member's grid is spatially sharded
    (XLA path; see sweep_beta). batch_mode: "auto" | "vmap" | "serial"
    (see _resolve_batch_mode).
    """
    overrides = [dict(o) for o in overrides]
    if not overrides:
        raise ValueError("need at least one override dict")
    bad = {k for o in overrides for k in o} - set(SWEEPABLE_FIELDS)
    if bad:
        raise ValueError(f"not sweepable: {sorted(bad)} "
                         f"(allowed: {SWEEPABLE_FIELDS})")
    if cfg.vary_beta and any("beta" in o for o in overrides):
        raise ValueError("beta sweeps need vary_beta=0 (the spatial ramp "
                         "already encodes a beta range)")
    if cfg.method == "rkc2" and any("diffusion" in o for o in overrides):
        raise ValueError("rkc2 diffusion sweeps unsupported (the static "
                        "spectral-radius bound assumes the base D)")

    problems = [build_problem(dataclasses.replace(cfg, **o))
                for o in overrides]
    # the SHARED compiled program (rhs, stencil coefficients, geometry) comes
    # from the UNMODIFIED base cfg — per-member diffusion is expressed only
    # through dscale = member_D / base_D (a member-built rhs would bake
    # member 0's D into the coefficients and double-scale member 0)
    ckey = dataclasses.astuple(cfg)
    base = _cached(("problem", ckey), lambda: build_problem(cfg))
    dtype = base.y0.dtype
    y0s = jnp.stack([p.y0 for p in problems])
    b_batch = jnp.stack([jnp.asarray(np.broadcast_to(
        np.asarray(p.params["b"], np.float64),
        np.shape(base.params["b"])), dtype) for p in problems])
    sweep_d = any("diffusion" in o for o in overrides)
    dscale = jnp.asarray([p.cfg.diffusion / cfg.diffusion for p in problems],
                         dtype)
    touts = output_times(cfg)
    ensemble = _is_ensemble_mesh(mesh)
    pad_spec = None
    mode = _resolve_batch_mode(batch_mode, mesh, cfg)

    if ensemble:
        pass   # handled entirely in the "devices" dispatch below
    elif mesh is not None:
        from crdmodel_tpu.parallel.sharded import (
            make_sharded_simulation_fn, mesh_pad_spec, sharded_params)
        # serial mode runs one member per dispatch, so the fused shard
        # kernels apply (per-member beta/diffusion ride prepare_params'
        # runtime _fused_b/_fused_coeffs inputs, ops/kernel_common.py);
        # vmap mode must force the XLA stepper (no Pallas batching rule)
        cfg_sh = (cfg if mode == "serial"
                  else dataclasses.replace(cfg, use_pallas=False))
        base_sh = _cached(("problem", dataclasses.astuple(cfg_sh)),
                          lambda: build_problem(cfg_sh))
        extra = None
        if sweep_d:
            from jax.sharding import PartitionSpec as P
            extra = {"dscale": P()}
        run_sharded = _cached(
            ("sharded_run", dataclasses.astuple(cfg_sh), _mesh_key(mesh),
             sweep_d),
            lambda: make_sharded_simulation_fn(
                base_sh, mesh, extra_param_specs=extra)[0])
        pad_spec = mesh_pad_spec(cfg, mesh)
        params0, _ = sharded_params(base_sh, pad_spec)
        if pad_spec is not None:
            # uneven grid: member states (and any 2-D ramp field) padded to
            # the mesh-divisible shape; trajectories unpadded below
            y0s = jax.vmap(pad_spec.pad_field)(y0s)
            if b_batch.ndim > 1:
                b_batch = jax.vmap(pad_spec.pad_rows)(b_batch)

        def run_one(y0, b, ds):
            p = {**params0, "b": b}
            if sweep_d:
                p["dscale"] = ds
            return run_sharded(y0, p)
    else:
        from crdmodel_tpu.core.problem import make_rhs
        from crdmodel_tpu.core.problem import solver_breakpoints
        breakpoints = solver_breakpoints(cfg, base.forcing)
        rhs_split = (make_rhs(cfg, base.model, base.geometry, dtype,
                              split=True,
                              diffusion_field=base.diffusion_field,
                              forcing=base.forcing,
                              diffusion_tensor=base.diffusion_tensor,
                              face_mask=base.face_mask,
                              obstacle_mask=base.obstacle_mask)
                     if cfg.method == "ark324" else None)
        rho_fn = None
        if cfg.method == "rkc2":
            from crdmodel_tpu.core.problem import make_rho_bound
            rho_fn = make_rho_bound(cfg, base.model, base.geometry, dtype,
                                    diffusion_field=base.diffusion_field,
                                    diffusion_tensor=base.diffusion_tensor,
                                    face_mask=base.face_mask)

        def run_one(y0, b, ds):
            params = {"b": b}
            if sweep_d:
                params["dscale"] = ds
            return integrate_to_outputs(
                base.rhs, y0, params, 0.0, touts,
                rtol=cfg.rtol, atol=cfg.atol, method=cfg.method,
                max_steps=cfg.max_steps, breakpoints=breakpoints,
                rhs_split=rhs_split, rho_fn=rho_fn,
                step_mode=cfg.step_mode)

    if mode == "members" and cfg.step_mode != "tstop" and batch_mode == "auto":
        mode = "serial"   # ARK_NORMAL members not foldable; keep auto working
    if mode == "serial" and mesh is None and batch_mode == "auto":
        # auto upgrade: large-grid TPU sweeps fold members onto a member
        # mesh over ALL devices — one dispatch instead of a host loop
        # (measured: M=1 fold beats the host serial loop, 0.414 vs 0.438 s
        # bs32 / 0.385 vs 0.459 s rkc2 warm at the canonical size; on a
        # pod the members additionally spread across chips), and members
        # run the SAME fused kernels as single simulate() calls (the
        # serial run_one path is XLA-only for rkc2/ark324).
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            from crdmodel_tpu.parallel.ensemble import make_ensemble_mesh
            mesh = make_ensemble_mesh(
                min(len(jax.devices()), len(overrides)))
            mode = "devices"
    t0 = time.perf_counter()
    if mode == "vmap":
        run = _cached(("vmap", ckey, _mesh_key(mesh), sweep_d),
                      lambda: jax.jit(jax.vmap(run_one)))
        traj, stats = run(y0s, b_batch, dscale)
    elif mode == "members":
        # hand-batched member axis inside ONE while_loop (the TPU-resident
        # batched sweep; see _resolve_batch_mode and integrate_to_outputs)
        params_m = {"b": b_batch}
        pax = {"b": 0}
        if sweep_d:
            params_m["dscale"] = dscale
            pax["dscale"] = 0
        nm = len(problems)

        def build_members():
            @jax.jit
            def run_members(y0s, params_m):
                return integrate_to_outputs(
                    base.rhs, y0s, params_m, 0.0, touts,
                    rtol=cfg.rtol, atol=cfg.atol, method=cfg.method,
                    max_steps=cfg.max_steps, breakpoints=breakpoints,
                    rhs_split=rhs_split, rho_fn=rho_fn,
                    step_mode=cfg.step_mode, n_members=nm, params_axes=pax)
            return run_members

        run_members = _cached(("members", ckey, nm, sweep_d), build_members)
        traj_t, stats_t = run_members(y0s, params_m)
        # (Nt, B, ...) -> (B, Nt, ...) to match the vmap layout
        traj = jnp.moveaxis(traj_t, 0, 1)
        stats = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, 1),
                                       stats_t)
    elif mode == "devices":
        # members sharded across devices (parallel/ensemble.py): each
        # device (or spatial submesh) runs the full single-member program
        # with per-member adaptive control and ZERO cross-member comms —
        # member-only meshes get the fused Pallas kernels the batched
        # paths cannot use
        from crdmodel_tpu.parallel.ensemble import (make_ensemble_sweep_fn,
                                                    member_axis_size)
        m_shards = member_axis_size(mesh)
        spatial_e = len(mesh.axis_names) > 1
        if not spatial_e and int(cfg.speculative_k) > 1:
            # the K-step mega-kernel bakes beta/coefficients (see the
            # serial branch below); plain fused kernels take runtime inputs
            cfg_e = dataclasses.replace(cfg, speculative_k=0)
        else:
            # composed meshes included: the fused ERK/IMEX shard kernels
            # are lockstep-safe and take runtime per-member b/dscale
            # (parallel/sharded.py::build_local_run member_sync)
            cfg_e = cfg
        prob_e = _cached(("problem", dataclasses.astuple(cfg_e)),
                         lambda: build_problem(cfg_e))
        run_e, _, pad_e = _cached(
            ("ensemble", dataclasses.astuple(cfg_e), _mesh_key(mesh),
             sweep_d),
            lambda: make_ensemble_sweep_fn(prob_e, mesh, sweep_d=sweep_d))
        y0s_e, b_e, ds_e = y0s, b_batch, dscale
        if pad_e is not None:
            y0s_e = jax.vmap(pad_e.pad_field)(y0s_e)
            if b_e.ndim > 1:
                b_e = jax.vmap(pad_e.pad_rows)(b_e)
        nb = len(problems)
        n_pad = -(-nb // m_shards) * m_shards
        if n_pad != nb:
            # member-axis padding: repeat the last member, results sliced
            # back below (the duplicates burn their shard's idle time only)
            rep = lambda a: jnp.concatenate(
                [a, jnp.repeat(a[-1:], n_pad - nb, axis=0)], axis=0)
            y0s_e, b_e, ds_e = rep(y0s_e), rep(b_e), rep(ds_e)
        traj, stats = run_e(y0s_e, b_e, ds_e)
        if n_pad != nb:
            traj = traj[:nb]
            stats = jax.tree_util.tree_map(lambda x: x[:nb], stats)
        if pad_e is not None:
            traj = pad_e.unpad_field(traj)
    elif mesh is None and cfg.method not in ("rkc2", "ark324"):
        # serial via the production single-run driver: on TPU above the
        # fused threshold every member reuses ONE compiled fused Pallas
        # step — the member's beta/diffusion ride the kernel's runtime
        # inputs (_fused_b / dscale, ops/pallas_step.py) instead of being
        # baked (measured: the fused step is 1.43x the XLA step at the
        # canonical size, docs/PERF_NOTES.md). speculative_k is forced off:
        # the K-step mega-kernel (pallas_kstep) closes over BAKED beta/
        # coefficients and never sees the member overrides — running it
        # would silently integrate every member with the base beta/D
        # (review finding r3).
        from crdmodel_tpu.sim import make_simulation_fn
        if int(cfg.speculative_k) > 1:
            cfg_ns = dataclasses.replace(cfg, speculative_k=0)
            base_ns = _cached(("problem", dataclasses.astuple(cfg_ns)),
                              lambda: build_problem(cfg_ns))
        else:
            base_ns = base
        run_sim, _ = make_simulation_fn(base_ns)

        def member_params(i):
            p = {"b": b_batch[i]}
            if getattr(b_batch[i], "ndim", 0) == 0:
                p["_fused_b"] = jnp.reshape(b_batch[i], (1, 1))
            if sweep_d:
                p["dscale"] = dscale[i]
            return p

        outs = [run_sim(y0s[i], member_params(i))
                for i in range(len(problems))]
        traj = jnp.stack([o[0] for o in outs])
        stats = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                       *[o[1] for o in outs])
    else:
        # one compile, every member (and every later call) reuses it
        run1 = _cached(("serial1", ckey, _mesh_key(mesh), sweep_d),
                       lambda: jax.jit(run_one))
        outs = [run1(y0s[i], b_batch[i], dscale[i])
                for i in range(len(problems))]
        traj = jnp.stack([o[0] for o in outs])
        stats = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                       *[o[1] for o in outs])
    # block_until_ready is a NO-OP on the axon TPU backend; sync by pulling
    # a scalar (utils/profiling.py::device_sync)
    from crdmodel_tpu.utils.profiling import device_sync
    device_sync(traj)
    wall = time.perf_counter() - t0
    if mesh is not None and pad_spec is not None:
        y0s = pad_spec.unpad_field(y0s)
        traj = pad_spec.unpad_field(traj)
    full = jnp.concatenate([y0s[:, None], traj], axis=1)
    betas = np.asarray([p.cfg.beta for p in problems], dtype=np.float64)
    return SweepResult(cfg=cfg, betas=betas, trajectories=full,
                       touts=np.concatenate([[0.0], touts]), stats=stats,
                       wall_time=wall, members=tuple(overrides))


def sweep_beta(cfg: SimConfig, betas: Sequence[float],
               mesh=None, batch_mode: str = "auto") -> SweepResult:
    """Run one simulation per beta value in a single compiled program.

    cfg.vary_beta must be 0 (a spatial ramp already encodes a beta *range*;
    sweeping sweeps the constant). ICs are rebuilt per member because the
    background steady state depends on beta (src/FHNmodel_torus.cpp:240-244,
    src/GoldbeterModel_torus.cpp:253-261).

    mesh: optional jax.sharding.Mesh — the pod-scale combinations from
    BASELINE.json. A ('py','px') mesh spatially shards each member's grid
    (ppermute halos, psum'd error control) with members batched on top;
    a mesh whose leading axis is 'member' (parallel/ensemble.py) shards
    the MEMBERS across devices instead, optionally composing both. The
    vmap-over-shard_map combination forces the XLA stepper (vmap of the
    fused kernels is UNSUPPORTED by the Pallas TPU batching rule, measured
    2026-08-16: rejects the HBM-resident state input); the serial and
    ensemble paths run the fused shard kernels with per-member beta/
    diffusion as runtime inputs (ops/kernel_common.py::prepare_params).

    Thin wrapper over sweep_configs (one override dict per beta).
    """
    betas = np.asarray(list(betas), dtype=np.float64)
    return sweep_configs(cfg, [{"beta": float(b)} for b in betas],
                         mesh=mesh, batch_mode=batch_mode)
