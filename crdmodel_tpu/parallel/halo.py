"""Halo exchange via lax.ppermute — the reference's Exchange() in ~20 lines.

Replaces 175 lines x 4 copies of MPI_Irecv/pack/MPI_Isend/MPI_Wait
(reference src/FHNmodel_torus.cpp:775-950) with collective permutes that XLA
schedules over ICI and can overlap with compute.

Two-phase exchange (rows first, then columns of the row-padded block) so the
corner cells of the padded array arrive filled with the true diagonal
neighbours' values for free. The reference's 5-point stencil never reads
corners (SURVEY.md §7 "corner cells never receive diagonal info"), but a
9-point kernel would work unchanged.

Convention: device row index increases with global j (south -> north), device
column index with global i (west -> east). Periodic wrap in both axes matches
the MPI Cartesian grid's periods={1,1} (src/FHNmodel_torus.cpp:731-736).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from crdmodel_tpu.parallel.mesh import AXIS_X, AXIS_Y


def _shift_from_prev(x, axis_name):
    """Value from the previous device along axis (wrap-around): device i
    receives device (i-1)'s x."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    return lax.ppermute(x, axis_name, [(i, (i + 1) % n) for i in range(n)])


def _shift_from_next(x, axis_name):
    """Value from the next device along axis (wrap-around)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    return lax.ppermute(x, axis_name, [(i, (i - 1) % n) for i in range(n)])


def halo_pad(u, axis_y: str = AXIS_Y, axis_x: str = AXIS_X, p: int = 1):
    """Pad a local block (..., nyl, nxl) to (..., nyl+2p, nxl+2p) with
    neighbour halos (periodic). With a 1-device axis this degenerates to the
    single-device periodic wrap — one code path for both.

    p > 1 (deep halos) feeds the fused multi-stage shard kernel
    (ops/pallas_shard_step.py): one exchange of width p >= #stages replaces
    per-stage width-1 exchanges, the structural analogue of the reference's
    per-RHS-call Exchange (src/FHNmodel_torus.cpp:521) hoisted out of the
    stage loop."""
    # phase 1: rows (y). south halo rows = south neighbour's north edge.
    north_edge = u[..., -p:, :]
    south_edge = u[..., :p, :]
    south_halo = _shift_from_prev(north_edge, axis_y)
    north_halo = _shift_from_next(south_edge, axis_y)
    up = jnp.concatenate([south_halo, u, north_halo], axis=-2)
    # phase 2: columns (x) of the row-padded block -> corners correct too.
    east_edge = up[..., :, -p:]
    west_edge = up[..., :, :p]
    west_halo = _shift_from_prev(east_edge, axis_x)
    east_halo = _shift_from_next(west_edge, axis_x)
    return jnp.concatenate([west_halo, up, east_halo], axis=-1)


def halo_pad_rows(u, axis_y: str = AXIS_Y, p: int = 1):
    """Row-only (y) halo pad: (..., nyl, w) -> (..., nyl+2p, w)."""
    south_halo = _shift_from_prev(u[..., -p:, :], axis_y)
    north_halo = _shift_from_next(u[..., :p, :], axis_y)
    return jnp.concatenate([south_halo, u, north_halo], axis=-2)


def halo_pad_cols(u, axis_x: str = AXIS_X, p: int = 1):
    """Column-only (x) halo pad: (..., nxl) -> (..., nxl+2p)."""
    west_halo = _shift_from_prev(u[..., -p:], axis_x)
    east_halo = _shift_from_next(u[..., :p], axis_x)
    return jnp.concatenate([west_halo, u, east_halo], axis=-1)
