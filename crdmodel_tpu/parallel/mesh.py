"""Device mesh construction for 2D spatial domain decomposition.

The TPU-native replacement for the reference's MPI Cartesian process grid
(`MPI_Dims_create`/`MPI_Cart_create` with periods={1,1},
src/FHNmodel_torus.cpp:718-736): a `jax.sharding.Mesh` with axes
('py', 'px') partitioning the (ny, nx) grid. Periodicity comes from the
wrap-around `lax.ppermute` permutations in the halo exchange, not from the
mesh itself.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

AXIS_Y = "py"
AXIS_X = "px"
AXIS_M = "member"   # ensemble (parameter-sweep) axis, parallel/ensemble.py


def balanced_dims(n: int, ny: int, nx: int) -> tuple:
    """Pick (py, px) with py*px == n — the jax analogue of MPI_Dims_create's
    auto-factorisation (src/FHNmodel_torus.cpp:724). Accepts ANY (devices,
    grid) pair, like the reference's SetupDecomp uneven block partition
    (src/FHNmodel_torus.cpp:750-755): a grid that doesn't divide the mesh is
    padded-and-masked (parallel/padding.py). Preference order: exactly
    dividing factorisations first (no padding), then the most balanced
    split, then least padded waste."""
    best = None
    for py in range(1, n + 1):
        if n % py:
            continue
        px = n // py
        if py > ny or px > nx:
            continue
        exact = 0 if (ny % py == 0 and nx % px == 0) else 1
        balance = abs(np.log(py / px))
        waste = (-(-ny // py) * py) * (-(-nx // px) * px) - ny * nx
        key = (exact, balance, waste)
        if best is None or key < best[0]:
            best = (key, py, px)
    if best is None:
        raise ValueError(
            f"no (py, px) factorisation of {n} devices fits grid {ny}x{nx} "
            "(need py <= ny and px <= nx)")
    return best[1], best[2]


def make_mesh(n_devices: int | None = None, shape: tuple | None = None,
              grid_shape: tuple | None = None) -> Mesh:
    """Build a ('py','px') mesh over the first n devices.

    Either pass an explicit mesh `shape` (py, px), or `grid_shape`=(ny, nx)
    to auto-factorise n_devices over it.
    """
    devs = jax.devices()
    if shape is None:
        n = n_devices if n_devices is not None else len(devs)
        if grid_shape is None:
            raise ValueError("need shape or grid_shape")
        shape = balanced_dims(n, *grid_shape)
    n = shape[0] * shape[1]
    if n > len(devs):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(shape)
    return Mesh(arr, (AXIS_Y, AXIS_X))
