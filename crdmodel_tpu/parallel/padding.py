"""Pad-and-mask support for grids that do not divide the device mesh.

The reference's SetupDecomp handles ANY (grid, ranks) pair by integer block
partition with uneven blocks (src/FHNmodel_torus.cpp:750-755: is = nx*cx/dims0
etc.). `jax.shard_map` fundamentally requires equal blocks per device, so the
TPU-native equivalent pads the global grid up to the mesh-divisible size and
masks the pad cells out of the dynamics:

- pad cells' RHS is zeroed every evaluation, so their values never move from
  the (finite, wrap-copied) initial fill — no NaN/overflow can leak from them;
- error norms exclude them automatically (masked RHS => zero error stages) and
  the initial-step-size norms mask them explicitly (see the reduce_fn built in
  parallel/sharded.py);
- the periodic wrap at the PHYSICAL seam (row ny-1 <-> row 0, col nx-1 <->
  col 0) no longer coincides with the array wrap, so the halo exchange carries
  two extra point-to-point `lax.ppermute` legs that deliver the true seam
  rows/cols (parallel/halo.py::halo_pad seam_y/seam_x).

The seam geometry: with block size blk = nyp/py, the last physical row ny-1
lives in shard s* = (ny-1)//blk at local index q = (ny-1)%blk. Physical row
ny-1 reads its +1 neighbour at padded-block position q+p+1 (p = halo width),
which is either an in-shard pad row (q < blk-1) or the received halo row
(q = blk-1) — ONE uniform overwrite with physical row 0 (ppermute leg shard 0
-> s*) covers both. Physical row 0 reads its -1 neighbour from shard 0's low
halo, overwritten with physical row ny-1 (ppermute leg s* -> shard 0).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AxisPad:
    """Padding along one grid axis sharded over `size` devices."""
    n: int          # physical extent
    n_pad: int      # padded extent (multiple of size)
    size: int       # devices along this axis
    blk: int        # n_pad // size
    seam_shard: int  # device holding the last physical index
    seam_local: int  # local index of the last physical index in seam_shard

    @property
    def active(self) -> bool:
        return self.n_pad != self.n


def _axis_pad(n: int, size: int, multiple: int = 1) -> AxisPad:
    if n < 2 and size > 1:
        raise ValueError(f"cannot shard an axis of extent {n} over {size} "
                         "devices (periodic stencil needs >= 2 points)")
    blk = -(-n // size)          # ceil
    if multiple > 1:
        # round the block up so the fused shard kernels' strip machinery
        # (8-row sublane alignment, ops/pallas_step.py::_pick_strip) accepts
        # the local block; the extra pad rows evolve as mirrors and are
        # masked from the error norms like every other pad cell
        blk = -(-blk // multiple) * multiple
    n_pad = blk * size
    return AxisPad(n=n, n_pad=n_pad, size=size, blk=blk,
                   seam_shard=(n - 1) // blk, seam_local=(n - 1) % blk)


@dataclasses.dataclass(frozen=True)
class PadSpec:
    """Padding plan for a (ny, nx) grid on a (py, px) mesh."""
    y: AxisPad
    x: AxisPad

    @property
    def active(self) -> bool:
        return self.y.active or self.x.active

    @property
    def padded_shape(self) -> tuple:
        return (self.y.n_pad, self.x.n_pad)

    def seam_y(self):
        """(seam_shard, seam_local) for halo_pad, or None when the array
        wrap IS the physical wrap along y."""
        return ((self.y.seam_shard, self.y.seam_local)
                if self.y.active else None)

    def seam_x(self):
        return ((self.x.seam_shard, self.x.seam_local)
                if self.x.active else None)

    def pad_field(self, arr):
        """Wrap-pad the trailing (ny, nx) dims to (nyp, nxp). Wrap fill
        keeps pad values inside the physical value range (finite kinetics,
        conservative spectral-radius bounds) and makes the t=0 pad contents
        physically meaningful."""
        if not self.active:
            return arr
        mod = np if isinstance(arr, np.ndarray) else jnp
        out = arr
        if self.y.active:
            reps = -(-self.y.n_pad // self.y.n)
            out = mod.concatenate([out] * reps, axis=-2)[
                ..., :self.y.n_pad, :]
        if self.x.active:
            reps = -(-self.x.n_pad // self.x.n)
            out = mod.concatenate([out] * reps, axis=-1)[
                ..., :, :self.x.n_pad]
        return out

    def pad_rows(self, arr):
        """Wrap-pad a (..., ny, 1) per-row field to (..., nyp, 1)."""
        wy = self.y.n_pad - self.y.n
        if wy == 0:
            return arr
        mod = np if isinstance(arr, np.ndarray) else jnp
        reps = -(-self.y.n_pad // self.y.n)
        tiled = mod.concatenate([arr] * reps, axis=-2)
        return tiled[..., :self.y.n_pad, :]

    def pad_cols(self, arr):
        """Wrap-pad a (..., nx) per-column profile to (..., nxp)."""
        wx = self.x.n_pad - self.x.n
        if wx == 0:
            return arr
        mod = np if isinstance(arr, np.ndarray) else jnp
        reps = -(-self.x.n_pad // self.x.n)
        tiled = mod.concatenate([arr] * reps, axis=-1)
        return tiled[..., :self.x.n_pad]

    def unpad_field(self, arr):
        """Slice the trailing (nyp, nxp) dims back to (ny, nx)."""
        if not self.active:
            return arr
        return arr[..., :self.y.n, :self.x.n]

    def valid_mask(self) -> np.ndarray:
        """(nyp, nxp) bool, True on physical cells."""
        m = np.zeros(self.padded_shape, dtype=bool)
        m[:self.y.n, :self.x.n] = True
        return m


def compute_pad_spec(ny: int, nx: int, py: int, px: int,
                     y_multiple: int = 1) -> PadSpec:
    return PadSpec(y=_axis_pad(ny, py, y_multiple), x=_axis_pad(nx, px))


def fused_y_multiple(cfg) -> int:
    """8 when the fused shard kernels could engage on this run (their strip
    machinery needs an 8-row-aligned local block, ops/pallas_step.py::
    _pick_strip), else 1. Deciding here — before kernel selection — keeps
    every pad-spec consumer (drivers, checkpoints, sweeps) on one layout;
    when a fused kernel later declines for another reason, the XLA padded
    path just carries a few extra masked rows."""
    import jax
    import jax.numpy as jnp
    if jnp.dtype(cfg.dtype) != jnp.float32:
        return 1
    if cfg.use_pallas is False:
        return 1
    if getattr(cfg, "pole_coarsen", 0):
        return 1           # reduced-grid operator is XLA-only
    if cfg.use_pallas is True:
        return 8
    try:
        return 8 if jax.default_backend() == "tpu" else 1
    except Exception:
        return 1


def pad_spec_for(cfg, py: int, px: int) -> PadSpec:
    """The ONE pad layout for cfg's grid on a (py, px) mesh — all consumers
    (parallel/sharded.py::mesh_pad_spec, io/checkpoint.py elastic resume)
    must derive the layout through here so shapes agree."""
    return compute_pad_spec(cfg.ny, cfg.nx, py, px,
                            y_multiple=fused_y_multiple(cfg))
