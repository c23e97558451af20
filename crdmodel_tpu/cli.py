"""Command-line interface — the orchestration layer (SURVEY.md L7).

Replaces the reference's four shell scripts (util/ShellScripts/run*.sh: mpirun
-> plot -> GenTorus -> MapOutputToTorus) with subcommands of one CLI:

  python -m crdmodel_tpu run <ini> --model fhn --surface torus [options]
  python -m crdmodel_tpu plot <ini> --model ... --dir outputs
  python -m crdmodel_tpu gentorus <ini>
  python -m crdmodel_tpu curvature <ini>
  python -m crdmodel_tpu sweep <ini> --model ... --betas 0.1:1.0:10
  python -m crdmodel_tpu steadystate <beta>      (SolveGoldbeterODE.py parity)

`run` mirrors the full reference pipeline: banner (C14), progress/ETA (C12),
reference-format per-rank text files (C11), optional movie + torus mapping.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _model_choices():
    from crdmodel_tpu.models.base import _REGISTRY

    import crdmodel_tpu.models  # noqa: F401  (populates the registry)
    return sorted(_REGISTRY)


def _add_model_args(p):
    p.add_argument("ini", help="reference-format ini file")
    p.add_argument("--model", choices=_model_choices(), required=True)
    # the generic revolution surfaces need profile callables
    # (build_problem(cfg, profile=...)) and are library-only
    p.add_argument("--surface", choices=["flat", "torus", "sphere", "box"],
                   required=True)
    p.add_argument("--dtype", default=None,
                   help="float32 (default) or float64")
    p.add_argument("--method", default=None,
                   help="bs32 | zonneveld43 | dopri54 | rkc2 | ark324")
    p.add_argument("--set", action="append", metavar="FIELD=VALUE",
                   help="override any SimConfig field (repeatable), e.g. "
                        "--set rtol=1e-4 --set speculative_k=4")


_BOOL_WORDS = {"true": True, "yes": True, "on": True,
               "false": False, "no": False, "off": False,
               "none": None, "null": None}


def _coerce_override(key: str, ann, val: str):
    """Cast a --set string to the SimConfig field's ANNOTATED type (the
    default value's type is useless for Optional fields whose default is
    None, e.g. use_pallas). Accepts true/false words for bools and `none`
    for Optionals."""
    import typing
    word = val.strip().lower()
    optional = False
    if typing.get_origin(ann) is typing.Union:
        args = [a for a in typing.get_args(ann) if a is not type(None)]
        optional = len(args) < len(typing.get_args(ann))
        ann = args[0] if args else str
    if optional and word in ("none", "null", ""):
        return None
    if ann is bool:
        if word in _BOOL_WORDS and _BOOL_WORDS[word] is not None:
            return _BOOL_WORDS[word]
        try:
            return bool(int(float(val)))
        except ValueError:
            raise ValueError(
                f"--set {key}: expected a bool (true/false/1/0), got {val!r}")
    if ann is int:
        return int(float(val))
    if ann is float:
        return float(val)
    return val


def _cfg_from_args(args, **extra):
    import dataclasses as _dc
    import typing

    from crdmodel_tpu.config import SimConfig, config_from_ini
    if not os.path.exists(args.ini):
        sys.exit(f"error: config file not found: {args.ini}")
    overrides = dict(extra)
    if args.dtype:
        overrides["dtype"] = args.dtype
    if getattr(args, "method", None):
        overrides["method"] = args.method
    # generic --set field=value overrides for any SimConfig field
    hints = typing.get_type_hints(SimConfig)
    fields = {f.name for f in _dc.fields(SimConfig)}
    for kv in getattr(args, "set", None) or []:
        if "=" not in kv:
            sys.exit(f"error: --set expects field=value, got {kv!r}")
        key, val = kv.split("=", 1)
        if key not in fields:
            sys.exit(f"error: unknown config field {key!r} "
                     f"(known: {', '.join(sorted(fields))})")
        try:
            overrides[key] = _coerce_override(key, hints[key], val)
        except ValueError as e:
            sys.exit(f"error: {e}")
    return config_from_ini(args.ini, model=args.model, surface=args.surface,
                           **overrides)


def cmd_run(args):
    from crdmodel_tpu.core.problem import build_problem
    from crdmodel_tpu.io.trajectory import save_npz, write_reference_files
    from crdmodel_tpu.sim import print_banner, simulate_streaming

    cfg = _cfg_from_args(args)
    problem = build_problem(cfg)
    print_banner(cfg, problem)
    os.makedirs(args.outdir, exist_ok=True)

    import contextlib
    from crdmodel_tpu.utils.profiling import trace
    trace_ctx = trace(args.trace) if args.trace else contextlib.nullcontext()
    with trace_ctx:
        res = _run_simulation(args, cfg, problem)
    if args.trace:
        print(f"   wrote profiler trace to {args.trace} "
              f"(view: tensorboard --logdir {args.trace})")
    print(res.describe())

    if getattr(args, "snapshot_mode", None) == "none":
        # throughput/soak mode: nothing was captured, so there are no
        # field outputs to write — stats + manifest only
        from crdmodel_tpu.utils import RunManifest
        mpath = RunManifest.from_result(res).save(
            os.path.join(args.outdir, f"{cfg.program_name}_manifest.json"))
        print(f"   wrote {mpath} (snapshot-mode none: no field outputs)")
        return 0 if res.ok else 1

    if cfg.surface == "box":
        # the per-rank text contract is 2-D (SURVEY.md C11); volumes go
        # out as npz + VTK ImageData instead
        path = os.path.join(args.outdir, f"{cfg.program_name}.npz")
        save_npz(res, path)
        print(f"   wrote {path}")
    else:
        write_reference_files(res, args.outdir, nprocs=args.nprocs_files)
        print(f"   wrote reference-format files to {args.outdir}/")
    from crdmodel_tpu.utils import RunManifest
    mpath = RunManifest.from_result(res).save(
        os.path.join(args.outdir, f"{cfg.program_name}_manifest.json"))
    print(f"   wrote {mpath}")
    if args.npz and cfg.surface != "box":
        path = os.path.join(args.outdir, f"{cfg.program_name}.npz")
        save_npz(res, path)
        print(f"   wrote {path}")
    if args.plot:
        from crdmodel_tpu.viz import plot_movie, volume_slice
        source = volume_slice(res) if cfg.surface == "box" else res
        out = plot_movie(source, cfg, args.outdir)
        print(f"   wrote {len(out['frames'])} frames"
              + (f" and {out['movie']}" if out["movie"]
                 else " (no movie encoder)"))
    if args.map_torus and cfg.surface == "box":
        # the 3-D analogue of the step-vtp pipeline: a .vti volume per
        # snapshot + ParaView collection (viz/volume.py)
        from crdmodel_tpu.viz import save_volume_series
        pvd = save_volume_series(res, args.outdir)
        print(f"   wrote {pvd}")
    elif args.map_torus and cfg.surface == "torus":
        from crdmodel_tpu.viz import generate_torus_vtp, map_output_to_torus
        generate_torus_vtp(cfg, args.outdir)
        pvd = map_output_to_torus(res, args.outdir)
        print(f"   wrote {pvd}")
    elif args.map_torus and res.problem.geometry.kind == "revolution":
        # sphere / generic revolution surfaces: same step-vtp + pvd
        # pipeline on the parametric revolution mesh
        from crdmodel_tpu.viz import map_output_to_surface
        from crdmodel_tpu.viz.torus_mesh import generate_revolution_vtp
        generate_revolution_vtp(res.problem.geometry, cfg, args.outdir)
        pvd = map_output_to_surface(res, args.outdir)
        print(f"   wrote {pvd}")
    return 0 if res.ok else 1


def _run_simulation(args, cfg, problem):
    from crdmodel_tpu.sim import simulate_streaming

    if args.devices and args.devices > 1:
        # streaming variant: bounded device-time per dispatch (large
        # single-dispatch runs can exceed runtime execution limits).
        # --checkpoint/--resume refer to a per-shard checkpoint DIRECTORY
        # here (io/checkpoint.py::save_sharded_checkpoint)
        from crdmodel_tpu.parallel.sharded import simulate_sharded_streaming
        res = simulate_sharded_streaming(cfg, n_devices=args.devices,
                                         problem=problem,
                                         progress=not args.quiet,
                                         checkpoint_every=args.checkpoint_every,
                                         checkpoint_dir=args.checkpoint,
                                         resume_dir=args.resume,
                                         checkpoint_backend=args.checkpoint_backend,
                                         host_offload=args.host_offload,
                                         snapshot_mode=args.snapshot_mode)
    elif args.resume:
        from crdmodel_tpu.io.checkpoint import resume_streaming
        res = resume_streaming(cfg, args.resume, problem=problem,
                               progress=not args.quiet,
                               checkpoint_every=args.checkpoint_every,
                               checkpoint_path=args.checkpoint,
                               host_offload=args.host_offload)
    else:
        res = simulate_streaming(cfg, problem=problem,
                                 progress=not args.quiet,
                                 checkpoint_every=args.checkpoint_every,
                                 checkpoint_path=args.checkpoint,
                                 host_offload=args.host_offload,
                                 snapshot_mode=args.snapshot_mode)
    return res


def cmd_plot(args):
    from crdmodel_tpu.viz import plot_movie
    cfg = _cfg_from_args(args)
    out = plot_movie(args.dir, cfg, args.dir)
    print(f"wrote {len(out['frames'])} frames"
          + (f" and {out['movie']}" if out["movie"]
             else " (no movie encoder)"))
    return 0


def cmd_gentorus(args):
    from crdmodel_tpu.viz import generate_torus_vtp
    cfg = _cfg_from_args(args)
    path = generate_torus_vtp(cfg, args.outdir, manual=args.manual)
    print(f"Saving output to file {path}")
    return 0


def cmd_curvature(args):
    from crdmodel_tpu.viz import (generate_curvature_coupling_vtp,
                                  plot_curvature_profiles)
    cfg = _cfg_from_args(args)
    path = generate_curvature_coupling_vtp(cfg, args.outdir)
    print(f"Saving output to file {path}")
    if args.profiles:
        p = plot_curvature_profiles(
            os.path.join(args.outdir, "curvature_profiles.png"))
        print(f"Saving profiles to {p}")
    return 0


def cmd_sweep(args):
    from crdmodel_tpu.sweep import sweep_beta, sweep_configs

    def parse_axis(spec):
        lo, hi, n = spec.split(":")
        return np.linspace(float(lo), float(hi), int(n))

    mesh = None
    if args.ensemble_devices:
        # members sharded across devices (parallel/ensemble.py) — the
        # device-parallel sweep the reference approximates with N separate
        # mpirun launches (README.md:29-34). Optionally composed with a
        # per-member spatial submesh: --ensemble-devices M
        # --ensemble-spatial YxX
        from crdmodel_tpu.parallel.ensemble import make_ensemble_mesh
        spatial = None
        if args.ensemble_spatial:
            y, x = args.ensemble_spatial.lower().split("x")
            spatial = (int(y), int(x))
        mesh = make_ensemble_mesh(args.ensemble_devices,
                                  spatial_shape=spatial)

    axes = {}
    if args.betas:
        axes["beta"] = parse_axis(args.betas)
    if args.diffusions:
        axes["diffusion"] = parse_axis(args.diffusions)
    if args.wave_widths:
        axes["wave_width"] = parse_axis(args.wave_widths)
    if args.wave_lengths:
        axes["wave_length"] = parse_axis(args.wave_lengths)
    if not axes:
        print("need at least one sweep axis (--betas/--diffusions/"
              "--wave-widths/--wave-lengths)", file=sys.stderr)
        return 2
    cfg = _cfg_from_args(args, **({"vary_beta": 0} if args.betas else {}))
    if list(axes) == ["beta"]:
        res = sweep_beta(cfg, axes["beta"], mesh=mesh,
                         batch_mode=args.batch_mode)
        members = [{"beta": float(b)} for b in axes["beta"]]
    else:
        # Cartesian product of the given axes, one member per combination
        import itertools
        keys = list(axes)
        members = [dict(zip(keys, (float(v) for v in combo)))
                   for combo in itertools.product(*(axes[k] for k in keys))]
        res = sweep_configs(cfg, members, mesh=mesh,
                            batch_mode=args.batch_mode)
    print(f"swept {len(members)} members over {sorted(axes)} "
          f"in {res.wall_time:.2f}s ({'ok' if res.ok() else 'FAILED'})")
    if args.npz:
        cols = {k: np.asarray([m.get(k, getattr(cfg, k)) for m in members])
                for k in axes}
        np.savez_compressed(args.npz, **cols,
                            trajectories=np.asarray(res.trajectories),
                            touts=res.touts,
                            status=np.asarray(res.stats.status))
        print(f"wrote {args.npz}")
    return 0 if res.ok() else 1


def cmd_steadystate(args):
    """Parity with util/GoldbeterModel/SolveGoldbeterODE.py's stdout contract:
    prints `[Zs] [Ys]` (consumed by the reference C++ via fscanf,
    src/GoldbeterModel_torus.cpp:258). --plot adds the script's two-panel
    trajectory figure."""
    from crdmodel_tpu.models import get_model
    zs, ys = get_model(args.model).steady_state(args.beta)
    print(f"[{zs}] [{ys}]")
    if args.plot:
        from crdmodel_tpu.models.ode_tools import plot_model_ode
        p = plot_model_ode(args.model, args.beta, args.plot)
        print(f"Saving trajectories to {p}", file=sys.stderr)
    return 0


def cmd_tips(args):
    """Spiral-tip (phase-singularity) detection over a finished run's
    output files (viz/tips.py; beyond-reference analysis — the reference's
    post-processing stops at movies/torus maps). Needs both variables,
    i.e. a run with includeAllVars=1."""
    from crdmodel_tpu.io.trajectory import read_reference_files
    from crdmodel_tpu.models import get_model
    from crdmodel_tpu.viz import tips
    cfg = _cfg_from_args(args)
    model = get_model(cfg.model)
    if model.nvars < 2:
        print(f"model {cfg.model} has {model.nvars} variable(s); tip "
              "detection needs a 2-variable phase plane", file=sys.stderr)
        return 2
    u, _ = read_reference_files(args.dir, cfg.program_name,
                                model.var_names[0])
    try:
        v, _ = read_reference_files(args.dir, cfg.program_name,
                                    model.var_names[1])
    except FileNotFoundError:
        print("second-variable files not found — rerun the simulation "
              "with --set includeAllVars=1", file=sys.stderr)
        return 2
    tipsets, tracks, origin = tips.track_spiral_tips(
        u, v, periodic=tips.periodic_axes(cfg))
    touts = np.linspace(0.0, cfg.t_final, u.shape[0])
    out = os.path.join(args.dir, f"{cfg.program_name}_tips.csv")
    tips.tips_to_csv(tipsets, touts, out, cfg=cfg)
    n_frames_with = sum(len(ts) > 0 for ts in tipsets)
    longest = max((tr.lifetime for tr in tracks), default=0)
    print(f"phase origin (cu, cv) = ({origin[0]:.4g}, {origin[1]:.4g})")
    print(f"tips in {n_frames_with}/{len(tipsets)} frames; "
          f"{len(tracks)} track(s), longest lifetime {longest} frames")
    print(f"wrote {out}")
    return 0


def cmd_maps(args):
    """Wavefront-analysis maps over a finished run's output files
    (viz/maps.py; beyond-reference analysis — activation/APD/CV maps are
    the standard cardiac-mapping readouts, dominant-frequency maps the
    standard fibrillation readout; the reference's post-processing stops
    at movies/torus maps)."""
    from crdmodel_tpu.core.grid import make_geometry
    from crdmodel_tpu.io.trajectory import read_reference_files
    from crdmodel_tpu.models import get_model
    from crdmodel_tpu.viz import maps
    cfg = _cfg_from_args(args)
    model = get_model(cfg.model)
    var = model.var_names[args.var]
    u, _ = read_reference_files(args.dir, cfg.program_name, var)
    touts = np.linspace(0.0, cfg.t_final, u.shape[0])
    geometry = make_geometry(cfg)

    act = maps.activation_times(u, touts, threshold=args.threshold)
    apd = maps.apd_map(u, touts, frac=args.apd_frac)
    speed, sx, sy = maps.conduction_velocity(act, geometry, vmax=args.vmax)
    freq, frac = maps.dominant_frequency_map(u, touts)

    out = os.path.join(args.dir, f"{cfg.program_name}_maps.npz")
    maps.maps_to_npz(out, cfg=cfg, activation=act, apd=apd, cv=speed,
                     slowness_x=sx, slowness_y=sy, dominant_freq=freq,
                     dominant_power_frac=frac)
    for name, arr in (("activation", act), (f"APD{args.apd_frac:.0%}"
                                            .rstrip("%"), apd),
                      ("conduction velocity", speed),
                      ("dominant frequency", freq)):
        print(maps.summarize(name, arr))
    print(f"wrote {out}")
    if args.png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 2, figsize=(11, 7), dpi=110)
        for ax, (title, arr) in zip(axes.flat, (
                ("activation time", act), ("APD", apd),
                ("conduction velocity", speed), ("dominant freq", freq))):
            im = ax.imshow(arr, origin="lower", aspect="auto",
                           interpolation="nearest")
            ax.set_title(title)
            fig.colorbar(im, ax=ax, shrink=0.85)
        fig.suptitle(f"{cfg.program_name} [{var}]")
        png = os.path.join(args.dir, f"{cfg.program_name}_maps.png")
        fig.savefig(png, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {png}")
    return 0


def cmd_stability(args):
    """Linear-stability report computed from the kinetics via AD — the
    numbers the reference hardcodes into its plot scripts (FHN Hopf line at
    beta=1, util/FHNmodel/plot_FHNmodel_torus.py:93-95; Goldbeter window
    0.289/0.774, util/GoldbeterModel/plot_GoldbeterModel_torus.py:91-94)."""
    from crdmodel_tpu.models.stability import stability_report
    print(stability_report(args.model, args.beta, args.diffusion,
                           beta_lo=args.scan[0] if args.scan else None,
                           beta_hi=args.scan[1] if args.scan else None))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="crdmodel_tpu",
                                 description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="simulate + write outputs (replaces "
                       "util/ShellScripts/run*.sh)")
    _add_model_args(p)
    p.add_argument("--outdir", default="outputs")
    p.add_argument("--nprocs-files", type=int, default=1,
                   help="virtual rank count for reference-format files")
    p.add_argument("--npz", action="store_true")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--map-torus", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--devices", type=int, default=0,
                   help="shard the run over N devices (2D spatial mesh)")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file path (with --checkpoint-every)")
    p.add_argument("--checkpoint-every", type=int, default=None,
                   metavar="N", help="checkpoint every N output intervals")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="write a jax.profiler device trace (TensorBoard "
                        "format) covering the simulation")
    p.add_argument("--host-offload", action="store_true",
                   help="pull each snapshot to host memory as produced "
                        "(bounded device memory for long runs; the pull "
                        "is asynchronous, overlapping the next interval)")
    p.add_argument("--snapshot-mode", default=None,
                   choices=("device", "host", "none"),
                   help="snapshot capture policy (default: device, or "
                        "host with --host-offload). 'none' captures "
                        "nothing — throughput/soak mode: the run prints "
                        "stats and writes the manifest but no field "
                        "outputs")
    p.add_argument("--checkpoint-backend", default="npz",
                   choices=("npz", "orbax"),
                   help="sharded checkpoint format (with --devices > 1): "
                        "per-shard npz files or orbax zarr")
    p.add_argument("--resume", default=None,
                   help="resume from a checkpoint file")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("plot", help="render movie from output files")
    _add_model_args(p)
    p.add_argument("--dir", default="outputs")
    p.set_defaults(fn=cmd_plot)

    p = sub.add_parser("gentorus", help="torus mesh vtp (GenTorus.py)")
    _add_model_args(p)
    p.add_argument("--outdir", default=".")
    p.add_argument("--manual", action="store_true",
                   help="GenTorusManual.py variant")
    p.set_defaults(fn=cmd_gentorus)

    p = sub.add_parser("curvature",
                       help="curvature/coupling vtp (GenCurvatureCoupling.py)")
    _add_model_args(p)
    p.add_argument("--outdir", default=".")
    p.add_argument("--profiles", action="store_true",
                   help="also plot K/C profiles (PlotGaussianAndCoupling.py)")
    p.set_defaults(fn=cmd_curvature)

    p = sub.add_parser("sweep", help="vmapped parameter sweep (new "
                       "capability); axes combine as a Cartesian product")
    _add_model_args(p)
    p.add_argument("--betas", default=None, metavar="LO:HI:N")
    p.add_argument("--diffusions", default=None, metavar="LO:HI:N")
    p.add_argument("--wave-widths", default=None, metavar="LO:HI:N")
    p.add_argument("--wave-lengths", default=None, metavar="LO:HI:N")
    p.add_argument("--batch-mode", default="auto",
                   choices=["auto", "vmap", "serial", "members", "devices"],
                   help="auto: vmap off-TPU, members (member axis hand-"
                        "batched inside one while_loop — the TPU-resident "
                        "batched sweep) on TPU; serial = one compiled "
                        "member program, host loop; devices = implied by "
                        "--ensemble-devices")
    p.add_argument("--ensemble-devices", type=int, default=0, metavar="M",
                   help="shard members over an M-device 'member' mesh axis "
                        "(each device runs whole members independently, "
                        "fused kernels included; parallel/ensemble.py)")
    p.add_argument("--ensemble-spatial", default=None, metavar="YxX",
                   help="with --ensemble-devices: additionally decompose "
                        "each member over a YxX spatial submesh "
                        "(M*Y*X devices total, lockstep collectives)")
    p.add_argument("--npz", default=None)
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("steadystate",
                       help="print a model's fixed point: `[Zs] [Ys]`")
    p.add_argument("beta", type=float)
    p.add_argument("--model", default="goldbeter",
                   choices=_model_choices())
    p.add_argument("--plot", default=None, metavar="PNG",
                   help="also render the 0-D trajectory figure")
    p.set_defaults(fn=cmd_steadystate)

    p = sub.add_parser("stability",
                       help="linear-stability report: fixed point, "
                            "eigenvalues, Hopf crossings, Turing band "
                            "(computed via AD, not hardcoded)")
    p.add_argument("beta", type=float)
    p.add_argument("--model", default="fhn", choices=_model_choices())
    p.add_argument("--diffusion", type=float, default=0.12,
                   help="diffusion coefficient (reference default 0.12, "
                        "data/FHNmodelArgs.ini:4)")
    p.add_argument("--scan", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="also report stability crossings in [LO, HI]")
    p.set_defaults(fn=cmd_stability)

    p = sub.add_parser("tips",
                       help="detect + track spiral tips (phase "
                            "singularities) in a finished run's output "
                            "files; writes <prog>_tips.csv")
    _add_model_args(p)
    p.add_argument("--dir", default="outputs")
    p.set_defaults(fn=cmd_tips)

    p = sub.add_parser("maps",
                       help="wavefront-analysis maps (activation time, "
                            "APD, conduction velocity, dominant "
                            "frequency) over a finished run's output "
                            "files; writes <prog>_maps.npz")
    _add_model_args(p)
    p.add_argument("--dir", default="outputs")
    p.add_argument("--var", type=int, default=0,
                   help="variable index to analyse (default 0)")
    p.add_argument("--threshold", type=float, default=None,
                   help="activation threshold (default: data midrange)")
    p.add_argument("--apd-frac", type=float, default=0.9,
                   help="APD repolarisation fraction (0.9 = APD90)")
    p.add_argument("--vmax", type=float, default=None,
                   help="cap reported conduction velocities (collision "
                        "ridges/breakthroughs read as near-infinite)")
    p.add_argument("--png", action="store_true",
                   help="also render a 4-panel figure <prog>_maps.png")
    p.set_defaults(fn=cmd_maps)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
