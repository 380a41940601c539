"""Halo-exchange engine: shard_map + ppermute spatial domain decomposition.

Replaces the reference's dask ``map_overlap(depth=(r, r), boundary=np.nan)``
pattern (slope.py:94-98, convolution.py:316-325, ...) with a two-phase
ppermute halo exchange over a ``Mesh(('y', 'x'))``:

  phase 1 extends each block in x (left/right edge columns travel one hop
  over ICI), phase 2 extends the *already-extended* rows in y — which
  carries the corner halos without extra diagonal sends.  The outer mesh
  boundary is filled with NaN, reproducing the reference's NaN-border
  contract exactly.

Any radius-r local kernel (3x3 surface stencils r=1, focal windows
r=k//2, ...) distributes through ``stencil_shard_map`` unchanged.
"""

from __future__ import annotations

import warnings

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

__all__ = [
    "HaloSpec", "make_raster_mesh", "raster_sharding", "distribute",
    "halo_extend", "stencil_shard_map", "get_raster_mesh",
]


@dataclass(frozen=True)
class HaloSpec:
    """Halo radius per spatial axis (rows, cols)."""
    ry: int
    rx: int

    @classmethod
    def square(cls, r: int) -> "HaloSpec":
        return cls(r, r)


def make_raster_mesh(n_y: Optional[int] = None, n_x: Optional[int] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Create a 2D ('y', 'x') device mesh over the given/all devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_y is None and n_x is None:
        # favor a square-ish factorization
        n_y = int(np.floor(np.sqrt(n)))
        while n % n_y:
            n_y -= 1
        n_x = n // n_y
    elif n_y is None:
        n_y = n // n_x
    elif n_x is None:
        n_x = n // n_y
    if n_y * n_x > n:
        raise ValueError(f"mesh {n_y}x{n_x} needs more than {n} devices")
    dev_arr = np.asarray(devices[:n_y * n_x]).reshape(n_y, n_x)
    return Mesh(dev_arr, axis_names=("y", "x"))


def raster_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """NamedSharding placing the trailing (y, x) dims over the mesh."""
    spec = (None,) * (ndim - 2) + ("y", "x")
    return NamedSharding(mesh, P(*spec))


def distribute(data, mesh: Mesh):
    """Place an array (or DataArray payload) onto the mesh, sharded (y, x).

    Shapes that do not divide the mesh are placed through a jitted identity
    (GSPMD supports uneven shards); the stencil dispatch layer NaN-pads to
    the tile grid before entering shard_map.
    """
    arr = jnp.asarray(data)
    shape = arr.shape
    # NamedSharding requires divisibility; shard each spatial dim only when
    # it divides the mesh (the other is replicated).  Pod-scale rasters are
    # normally tiled to multiples; fully-indivisible shapes degrade
    # gracefully to replication.
    spec_y = "y" if shape[-2] % mesh.shape["y"] == 0 else None
    spec_x = "x" if shape[-1] % mesh.shape["x"] == 0 else None
    for ax, spec_ax, size in (("y", spec_y, shape[-2]),
                              ("x", spec_x, shape[-1])):
        if spec_ax is None and mesh.shape[ax] > 1:
            warnings.warn(
                f"distribute: dim of size {size} does not divide the mesh "
                f"'{ax}' axis ({mesh.shape[ax]} devices); that dim is "
                "REPLICATED, not sharded. Pad the raster to a multiple of "
                "the mesh shape to distribute it.",
                UserWarning, stacklevel=2)
    spec = (None,) * (arr.ndim - 2) + (spec_y, spec_x)
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def get_raster_mesh(arr) -> Optional[Mesh]:
    """Return the 2D raster mesh an array is sharded over, if any.

    The sharding-driven dispatch: ops call this to decide between the
    single-chip jit path and the shard_map halo path.
    """
    sharding = getattr(arr, "sharding", None)
    if not isinstance(sharding, NamedSharding):
        return None
    mesh = sharding.mesh
    if mesh.size <= 1:
        return None
    if not {"y", "x"} <= set(mesh.axis_names):
        # a foreign mesh (user sharding with other axis names): the halo
        # engine's specs are written against ('y', 'x') — take the
        # single-chip path rather than KeyError inside run_stencil
        return None
    spec = sharding.spec
    # sharded over named axes on the last two dims?
    trailing = tuple(spec[-2:]) if len(spec) >= 2 else ()
    if not any(s is not None for s in trailing):
        return None
    return mesh


def _nan_like(x):
    return jnp.full_like(x, jnp.nan)


def _halo_from_prev(out, axis: int, r: int, axis_name: str, n: int,
                    fill=np.nan):
    """Width-r halo PRECEDING the local block along `axis`.

    Gathered from up to k = ceil(r / local_size) predecessor shards: each
    offset j is ONE ppermute (the ICI routes multi-hop shifts directly);
    offsets 1..k-1 carry whole blocks, offset k the partial remainder.
    Beyond the mesh edge the halo is NaN (``boundary=np.nan`` contract).
    """
    size = out.shape[axis]
    k = -(-r // size)
    idx = jax.lax.axis_index(axis_name)
    parts = []
    for j in range(k, 0, -1):  # farthest shard owns the leftmost strip
        take = size if j < k else r - (k - 1) * size
        strip = jax.lax.slice_in_dim(out, size - take, size, axis=axis)
        if n - j <= 0:
            parts.append(jnp.full_like(strip, fill))
            continue
        recv = jax.lax.ppermute(strip, axis_name,
                                [(i, i + j) for i in range(n - j)])
        parts.append(jnp.where(idx < j, jnp.full_like(recv, fill), recv))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _halo_from_next(out, axis: int, r: int, axis_name: str, n: int,
                    fill=np.nan):
    """Width-r halo FOLLOWING the local block along `axis` (mirror)."""
    size = out.shape[axis]
    k = -(-r // size)
    idx = jax.lax.axis_index(axis_name)
    parts = []
    for j in range(1, k + 1):  # nearest shard owns the leftmost strip
        take = size if j < k else r - (k - 1) * size
        strip = jax.lax.slice_in_dim(out, 0, take, axis=axis)
        if n - j <= 0:
            parts.append(jnp.full_like(strip, fill))
            continue
        recv = jax.lax.ppermute(strip, axis_name,
                                [(i, i - j) for i in range(j, n)])
        parts.append(jnp.where(idx >= n - j, jnp.full_like(recv, fill),
                               recv))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def halo_extend(block, halo: HaloSpec, mesh: Mesh, fill=np.nan):
    """Extend a local block with radius-(ry, rx) halos from mesh neighbors.

    Must be called inside shard_map over `mesh`.  Outer boundary is
    ``fill`` (default NaN — the reference's ``boundary=np.nan`` contract;
    the packed-JFA exchange passes its -1 sentinel).  Returns an array of
    shape (h + 2*ry, w + 2*rx); corners included (two-phase exchange).
    Radii wider than the local shard gather from multiple neighbor
    offsets (⌈r/shard⌉ ppermutes per side) — the analog of the
    reference's dask rechunk-for-depth (proximity.py:603-627), without
    ever replicating the raster.
    """
    ry, rx = halo.ry, halo.rx
    n_y = mesh.shape["y"]
    n_x = mesh.shape["x"]

    out = block
    if rx > 0:
        ax = out.ndim - 1
        left_halo = _halo_from_prev(out, ax, rx, "x", n_x, fill)
        right_halo = _halo_from_next(out, ax, rx, "x", n_x, fill)
        out = jnp.concatenate([left_halo, out, right_halo], axis=-1)
    if ry > 0:
        ax = out.ndim - 2
        top_halo = _halo_from_prev(out, ax, ry, "y", n_y, fill)
        bot_halo = _halo_from_next(out, ax, ry, "y", n_y, fill)
        out = jnp.concatenate([top_halo, out, bot_halo], axis=-2)
    return out


def stencil_shard_map(kernel: Callable, mesh: Mesh, halo: HaloSpec,
                      out_leading_dims: int = 0):
    """Distribute a radius-r local kernel over the mesh with halo exchange.

    `kernel(extended_block, *args) -> extended_out` must be a pure local
    function whose output ring of width (ry, rx) is edge garbage (it is
    cropped); scalar side args are broadcast to every shard.  The kernel
    may return `out_leading_dims` extra leading (replicated-spec) dims
    before the spatial (y, x) dims — e.g. a stacked stats axis.
    """
    ry, rx = halo.ry, halo.rx

    def per_shard(block, *args):
        ext = halo_extend(block, halo, mesh)
        out = kernel(ext, *args)
        h, w = out.shape[-2], out.shape[-1]
        return out[..., ry:h - ry, rx:w - rx]

    from jax.experimental.shard_map import shard_map

    out_spec = P(*((None,) * out_leading_dims + ("y", "x")))

    def run(data, *args):
        n_args = len(args)
        in_spec = P(*((None,) * (data.ndim - 2) + ("y", "x")))
        mapped = shard_map(
            per_shard, mesh=mesh,
            in_specs=(in_spec,) + (P(),) * n_args,
            out_specs=out_spec,
            check_rep=False,
        )
        return mapped(data, *args)

    return run
