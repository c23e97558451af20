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


def _seam_fix(up, u, axis_name, p, seam, axis):
    """Repair the periodic wrap of a PADDED axis (parallel/padding.py).

    When the grid is padded to divide the mesh, the array wrap (delivered by
    the ppermute ring above) is not the physical wrap: the last physical
    index n-1 lives mid-array at (seam_shard, seam_local). Two extra
    point-to-point ppermute legs carry the true seam values:

      leg A: shard 0's first p physical rows -> seam_shard, overwriting
             padded-block rows seam_local+p+1 .. seam_local+2p (the +1..+p
             neighbours physical row n-1 actually reads — in-shard pad rows
             or the received halo, one uniform slice covers both);
      leg B: seam_shard's last p physical rows -> shard 0's low halo
             (physical row 0's -1..-p neighbours).

    `axis` is -2 (rows) or -1 (cols); `up` is the ring-padded block, `u` the
    raw local block. Pad cells themselves read garbage neighbours, but their
    RHS is masked to zero every evaluation so nothing propagates (the
    5-point stencil also never reads corners, so the seam corner cells need
    no diagonal fix)."""
    s_star, q = seam
    if q + 1 < p:
        raise ValueError(
            f"seam halo width {p} spans shards (last shard holds only "
            f"{q + 1} physical rows); use the XLA width-1 path")
    n_dev = lax.axis_size(axis_name)

    def take(a, lo, hi):
        return a[..., lo:hi, :] if axis == -2 else a[..., :, lo:hi]

    def put(a, lo, hi, val):
        idx = ((Ellipsis, slice(lo, hi), slice(None)) if axis == -2
               else (Ellipsis, slice(None), slice(lo, hi)))
        return a.at[idx].set(val)

    me = lax.axis_index(axis_name)
    # leg A: physical rows 0..p-1 (shard 0's low edge) -> seam shard.
    # Every shard computes the slice; ppermute selects the (0 -> s_star) leg
    # (non-receivers get zeros, discarded by the where).
    rows_lo = take(u, 0, p)
    recv_a = (rows_lo if n_dev == 1
              else lax.ppermute(rows_lo, axis_name, [(0, s_star)]))
    fixed = put(up, q + p + 1, q + 2 * p + 1,
                jnp.where(me == s_star, recv_a, take(up, q + p + 1,
                                                     q + 2 * p + 1)))
    # leg B: physical rows n-p..n-1 (seam shard, local q-p+1..q) -> shard 0.
    rows_hi = take(u, q - p + 1, q + 1)
    recv_b = (rows_hi if n_dev == 1
              else lax.ppermute(rows_hi, axis_name, [(s_star, 0)]))
    fixed = put(fixed, 0, p,
                jnp.where(me == 0, recv_b, take(fixed, 0, p)))
    return fixed


def halo_pad(u, axis_y: str = AXIS_Y, axis_x: str = AXIS_X, p: int = 1,
             seam_y=None, seam_x=None):
    """Pad a local block (..., nyl, nxl) to (..., nyl+2p, nxl+2p) with
    neighbour halos (periodic). With a 1-device axis this degenerates to the
    single-device periodic wrap — one code path for both.

    p > 1 (deep halos) feeds the fused multi-stage shard kernel
    (ops/pallas_shard_step.py): one exchange of width p >= #stages replaces
    per-stage width-1 exchanges, the structural analogue of the reference's
    per-RHS-call Exchange (src/FHNmodel_torus.cpp:521) hoisted out of the
    stage loop.

    seam_y/seam_x: (seam_shard, seam_local) from a PadSpec when the global
    grid is padded to divide the mesh — repairs the physical periodic wrap
    (see _seam_fix)."""
    # phase 1: rows (y). south halo rows = south neighbour's north edge.
    north_edge = u[..., -p:, :]
    south_edge = u[..., :p, :]
    south_halo = _shift_from_prev(north_edge, axis_y)
    north_halo = _shift_from_next(south_edge, axis_y)
    up = jnp.concatenate([south_halo, u, north_halo], axis=-2)
    if seam_y is not None:
        up = _seam_fix(up, u, axis_y, p, seam_y, axis=-2)
    # phase 2: columns (x) of the row-padded block -> corners correct too.
    east_edge = up[..., :, -p:]
    west_edge = up[..., :, :p]
    west_halo = _shift_from_prev(east_edge, axis_x)
    east_halo = _shift_from_next(west_edge, axis_x)
    out = jnp.concatenate([west_halo, up, east_halo], axis=-1)
    if seam_x is not None:
        out = _seam_fix(out, up, axis_x, p, seam_x, axis=-1)
    return out


def _mirror_runs(t0: int, width: int, n: int, blk: int):
    """Static transfer plan for assembling the rows
    [(t0 + i) % n for i in range(width)] of an n-extent physical axis that
    is stored padded to size*blk: a list of (src_shard, src_lo, length)
    pieces, each contiguous within one shard. Everything is a Python int —
    the plan compiles to a fixed set of ppermute legs."""
    runs = []
    i = 0
    while i < width:
        g = (t0 + i) % n
        s = g // blk
        length = min(width - i, n - g, (s + 1) * blk - g)
        runs.append((s, g - s * blk, length))
        i += length
    return runs


def _gather_strip(slice_fn, runs, dst: int, axis_name: str, axis: int):
    """Assemble the planned pieces on device `dst` (other devices receive
    zeros/garbage — callers mask with where(me == dst)). slice_fn(lo, L)
    slices L local rows/cols starting at local index lo."""
    from jax import lax as _lax
    size = _lax.axis_size(axis_name)
    pieces = []
    for (s, lo, length) in runs:
        sl = slice_fn(lo, length)
        if size > 1:
            sl = _lax.ppermute(sl, axis_name, [(s, dst)])
        pieces.append(sl)
    if len(pieces) == 1:
        return pieces[0]
    return jnp.concatenate(pieces, axis=axis)


def mirror_edges(slice_fn, ring_lo, ring_hi, axis_name: str, p: int,
                 n: int, blk: int, axis: int):
    """(lo, hi) width-p halo strips of the n-PERIODIC EXTENSION of a field
    stored padded to size*blk along `axis` (the fused kernels' mirror-pad
    semantics: pad cells hold live copies of their wrapped physical sources,
    so every interior array position is already consistent — only the two
    array-edge halos need repair; parallel/padding.py module docstring and
    ops/pallas_shard_step.py).

      shard 0's lo halo   = extension rows -p..-1      = physical n-p..n-1
      last shard's hi halo = extension rows n_pad..+p-1 = physical
                             (n_pad..n_pad+p-1) mod n

    ring_lo/ring_hi are the plain wrap-around ppermute values (correct on
    every non-edge shard: array-contiguous mirrors ARE the extension)."""
    size = lax.axis_size(axis_name)
    if p > blk:
        raise ValueError(f"mirror halo width {p} exceeds the block size "
                         f"{blk}: ring transport is one-hop (the fused "
                         "kernels' is_*_supported gates require nyl >= P)")
    n_pad = size * blk
    lo_fix = _gather_strip(slice_fn, _mirror_runs((n - p) % n, p, n, blk),
                           0, axis_name, axis)
    hi_fix = _gather_strip(slice_fn, _mirror_runs(n_pad % n, p, n, blk),
                           size - 1, axis_name, axis)
    me = lax.axis_index(axis_name)
    lo = jnp.where(me == 0, lo_fix, ring_lo)
    hi = jnp.where(me == size - 1, hi_fix, ring_hi)
    return lo, hi


def mirror_halo_pad_rows(u, axis_y: str, p: int, n: int, blk: int):
    """halo_pad_rows for the n-periodic mirror extension (padded axis)."""
    ring_lo = _shift_from_prev(u[..., -p:, :], axis_y)
    ring_hi = _shift_from_next(u[..., :p, :], axis_y)
    lo, hi = mirror_edges(lambda lo_i, L: u[..., lo_i:lo_i + L, :],
                          ring_lo, ring_hi, axis_y, p, n, blk, axis=-2)
    return jnp.concatenate([lo, u, hi], axis=-2)


def mirror_halo_pad_cols(u, axis_x: str, p: int, n: int, blk: int):
    """halo_pad_cols for the n-periodic mirror extension (padded axis)."""
    ring_lo = _shift_from_prev(u[..., -p:], axis_x)
    ring_hi = _shift_from_next(u[..., :p], axis_x)
    lo, hi = mirror_edges(lambda lo_i, L: u[..., lo_i:lo_i + L],
                          ring_lo, ring_hi, axis_x, p, n, blk, axis=-1)
    return jnp.concatenate([lo, u, hi], axis=-1)


def mirror_halo_pad(u, axis_y: str, axis_x: str, p: int, pad_spec):
    """Two-phase halo_pad for the mirror extension on a padded grid: rows
    first (mirror-corrected when y is padded), then columns of the
    row-padded block (mirror-corrected when x is padded) — the column
    legs carry the source shards' already-fixed row halos, so corners
    hold true diagonal extension values like the plain two-phase."""
    if pad_spec.y.active:
        up = mirror_halo_pad_rows(u, axis_y, p, pad_spec.y.n, pad_spec.y.blk)
    else:
        up = halo_pad_rows(u, axis_y, p)
    if pad_spec.x.active:
        return mirror_halo_pad_cols(up, axis_x, p,
                                    pad_spec.x.n, pad_spec.x.blk)
    return halo_pad_cols(up, axis_x, p)


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
