"""Measure the CPU proxy baseline for BASELINE.md.

The reference (MPI+SUNDIALS C++) cannot be built in this image (no mpicxx,
no SUNDIALS, no boost — see BASELINE.md). This proxy reproduces its
per-step numerics on the canonical FHN torus problem in float64 numpy:
vectorised 5-point torus-metric stencil + FHN kinetics + Bogacki–Shampine
3(2) adaptive WRMS control — i.e. the same method-of-lines pipeline, on CPU.
Vectorised numpy is, if anything, generous to the reference's scalar
per-point loops with per-point sin/cos (src/FHNmodel_torus.cpp:531-537).

Prints grid-points x steps / sec. Run once; the number is recorded in
bench.py and BASELINE.md with provenance.
"""

import time

import numpy as np

EPSILON = 0.36


def main():
    # canonical FHN torus: 400x1600, varyBeta (data/FHNmodelArgs.ini)
    nx, ny = 400, 1600
    W, L = 20.0, 80.0
    r, R = W / (2 * np.pi), L / (2 * np.pi)
    dx = 2 * np.pi / (nx - 1)
    dy = 2 * np.pi / (ny - 1)
    D = 0.12
    beta_min, beta_max = 0.7, 1.7
    rtol, atol = 1e-5, 1e-10

    th = np.arange(nx) * dx
    ring = R + r * np.cos(th)
    c_asym = D * (-np.sin(th) / (r * ring)) / (2 * dx)
    c_th = D / (r * r * dx * dx)
    c_phi = D / (ring * ring * dy * dy)
    yy = np.arange(ny) * dy
    b = (beta_min + yy * (beta_max - beta_min) / (2 * np.pi))[:, None]

    def rhs(t, y):
        u, v = y[0], y[1]
        ue = np.roll(u, -1, axis=-1)
        uw = np.roll(u, 1, axis=-1)
        un = np.roll(u, -1, axis=-2)
        us = np.roll(u, 1, axis=-2)
        lap = (c_asym * (ue - uw) + c_th * (ue - 2 * u + uw)
               + c_phi * (un - 2 * u + us))
        du = lap + 3.0 * u - u ** 3 - v
        dv = EPSILON * (u + b)
        return np.stack([du, dv])

    # BS3(2)
    y = np.ones((2, ny, nx))
    t, h = 0.0, 1e-3
    nsteps, naccept = 0, 0
    t_end_steps = 300  # enough accepted steps for a stable rate
    wall0 = time.perf_counter()
    k1 = rhs(t, y)
    while naccept < t_end_steps:
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
    rate = nx * ny * nsteps / wall
    print(f"steps={nsteps} accepted={naccept} t={t:.4f} wall={wall:.2f}s")
    print(f"baseline grid-points*steps/sec = {rate:.4e}")


if __name__ == "__main__":
    main()
