"""Measure the CPU proxy baseline for BASELINE.md — all FOUR reference
programs (/root/reference/CMakeLists.txt:20-25).

The reference (MPI+SUNDIALS C++) cannot be built in this image (no mpicxx,
no SUNDIALS, no boost — see BASELINE.md). This proxy reproduces each
program's per-step numerics in float64 numpy: vectorised 5-point stencil
(torus metric src/FHNmodel_torus.cpp:526-615 or flat
src/FHNmodel_flat.cpp:489-566) + the model kinetics (FHN
src/FHNmodel_torus.cpp:656-660; Goldbeter Hill terms
src/GoldbeterModel_torus.cpp:694-716) + Bogacki-Shampine 3(2) adaptive
WRMS control at the hardcoded tolerances (rtol=1e-5, atol=1e-10,
src/FHNmodel_torus.cpp:197-198) — i.e. the same method-of-lines pipeline,
on this host's CPU. Vectorised numpy is, if anything, generous to the
reference's scalar per-point loops with per-point sin/cos.

Grids/configs come from the shipped inis through the framework's own
loader (config.py reads the reference files, tolerating the
xMesh/thetaMesh key skew), so the proxy and the TPU runs measure the SAME
problems.

Usage: python scripts/measure_baseline.py [program ...]
Programs: fhn_torus fhn_flat goldbeter_torus goldbeter_flat (default all).
Prints grid-points x steps / sec per program; numbers are recorded in
BASELINE.md with provenance.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from crdmodel_tpu.config import config_from_ini  # noqa: E402

EPSILON = 0.36
# Goldbeter constants, src/GoldbeterModel_torus.cpp:67-78
V0, K, KF, V1 = 1.0, 10.0, 1.0, 7.3
VM2, VM3, K2, KR, KA = 65.0, 500.0, 1.0, 2.0, 0.9

INIS = {
    "fhn": ("/root/reference/data/FHNmodelArgs.ini", "fhn"),
    "goldbeter": ("/root/reference/data/GoldbeterModelArgs.ini",
                  "goldbeter"),
}


def goldbeter_steady(beta):
    """(Zs, Ys) — the framework's exact fixed-point solve
    (models/goldbeter.py::steady_state, the in-process replacement for
    the reference's popen'd SolveGoldbeterODE.py). Setup only, untimed."""
    from crdmodel_tpu.models.goldbeter import steady_state
    zs, ys = steady_state(beta)
    return float(zs), float(ys)


def make_rhs(cfg, model):
    nx, ny = cfg.nx, cfg.ny
    D = cfg.diffusion
    dx, dy = cfg.dx, cfg.dy
    if cfg.surface == "torus":
        r, R = cfg.surface_width / (2 * np.pi), cfg.surface_length / (2 * np.pi)
        th = np.arange(nx) * dx
        ring = R + r * np.cos(th)
        c_asym = D * (-np.sin(th) / (r * ring)) / (2 * dx)
        c_th = D / (r * r * dx * dx)
        c_phi = D / (ring * ring * dy * dy)

        def lap(u):
            ue = np.roll(u, -1, axis=-1)
            uw = np.roll(u, 1, axis=-1)
            un = np.roll(u, -1, axis=-2)
            us = np.roll(u, 1, axis=-2)
            return (c_asym * (ue - uw) + c_th * (ue - 2 * u + uw)
                    + c_phi * (un - 2 * u + us))
    else:
        cu1, cu2 = D / (dx * dx), D / (dy * dy)

        def lap(u):
            ue = np.roll(u, -1, axis=-1)
            uw = np.roll(u, 1, axis=-1)
            un = np.roll(u, -1, axis=-2)
            us = np.roll(u, 1, axis=-2)
            return cu1 * (ue + uw) + cu2 * (un + us) - 2 * (cu1 + cu2) * u

    if cfg.vary_beta:
        yy = np.arange(ny) * dy
        b = (cfg.beta_min
             + yy * (cfg.beta_max - cfg.beta_min)
             / (cfg.ymax - cfg.ymin))[:, None]
    else:
        b = cfg.beta

    if model == "fhn":
        def rhs(t, y):
            u, v = y[0], y[1]
            du = lap(u) + 3.0 * u - u ** 3 - v
            dv = EPSILON * (u + b)
            return np.stack([du, dv])
    else:
        def rhs(t, y):
            Z, Y = y[0], y[1]
            v2 = VM2 * Z * Z / (K2 * K2 + Z * Z)
            v3 = (VM3 * Y * Y * Z ** 4
                  / ((KR * KR + Y * Y) * (KA ** 4 + Z ** 4)))
            dZ = lap(Z) + V0 + V1 * b - v2 + v3 + KF * Y - K * Z
            dY = v2 - v3 - KF * Y
            return np.stack([dZ, dY])

    return rhs


def run_program(name, accepted_target=300):
    model, surface = name.rsplit("_", 1)
    ini, mdl = INIS[model]
    cfg = config_from_ini(ini, model=mdl, surface=surface)
    rhs = make_rhs(cfg, model)
    rtol, atol = 1e-5, 1e-10

    if model == "fhn":
        us = -cfg.beta
        y = np.stack([np.full((cfg.ny, cfg.nx), us),
                      np.full((cfg.ny, cfg.nx), cfg.beta ** 3 - 3 * cfg.beta)])
        if cfg.vary_beta:
            y = np.ones((2, cfg.ny, cfg.nx))
    else:
        zs, ys = goldbeter_steady(cfg.beta)
        y = np.stack([np.full((cfg.ny, cfg.nx), zs),
                      np.full((cfg.ny, cfg.nx), ys)])
        # wave segment (+1, +1), src/GoldbeterModel_torus.cpp:330-414
        y[:, : cfg.ny // 8, : cfg.nx // 2] += 1.0

    t, h = 0.0, 1e-4
    nsteps, naccept = 0, 0
    wall0 = time.perf_counter()
    k1 = rhs(t, y)
    while naccept < accepted_target:
        k2 = rhs(t + 0.5 * h, y + 0.5 * h * k1)
        k3 = rhs(t + 0.75 * h, y + 0.75 * h * k2)
        ynew = y + h * (2 / 9 * k1 + 1 / 3 * k2 + 4 / 9 * k3)
        k4 = rhs(t + h, ynew)
        err_v = h * ((2 / 9 - 7 / 24) * k1 + (1 / 3 - 1 / 4) * k2
                     + (4 / 9 - 1 / 3) * k3 - 1 / 8 * k4)
        w = 1.0 / (rtol * np.abs(y) + atol)
        err = np.sqrt(np.mean((err_v * w) ** 2))
        nsteps += 1
        if err <= 1.0:
            t += h
            y = ynew
            k1 = k4  # FSAL
            naccept += 1
        h *= min(max(0.9 * err ** (-1 / 3), 0.1), 5.0)
    wall = time.perf_counter() - wall0
    rate = cfg.nx * cfg.ny * nsteps / wall
    print(f"{name}: grid {cfg.ny}x{cfg.nx}, steps={nsteps} "
          f"accepted={naccept} t={t:.5f} wall={wall:.2f}s")
    print(f"{name}: baseline grid-points*steps/sec = {rate:.4e}")
    return rate


def main(argv):
    programs = argv or ["fhn_torus", "fhn_flat",
                        "goldbeter_torus", "goldbeter_flat"]
    for p in programs:
        run_program(p)


if __name__ == "__main__":
    main(sys.argv[1:])
