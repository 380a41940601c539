"""Sharding-driven stencil dispatch: single-chip jit vs shard_map halos.

The TPU-native replacement for the reference's 4-way backend dispatch
(utils.py:117-143): instead of switching on numpy/cupy/dask array types,
ops switch on the input's *sharding*.  A raster placed over a 2D mesh
(``parallel.distribute``) automatically runs under shard_map with ppermute
halo exchange; anything else takes the plain jit path.

Non-divisible shapes are NaN-padded up to the mesh tile grid and cropped
back — NaN padding reproduces the beyond-edge semantics, so results are
identical to the unpadded single-chip run.
"""

from __future__ import annotations

import warnings

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.halo import (HaloSpec, get_raster_mesh, raster_sharding,
                             stencil_shard_map)

__all__ = ["run_stencil"]

_compiled_cache: dict = {}


def _sharded_runner(kernel: Callable, mesh, halo: HaloSpec,
                    out_leading_dims: int = 0):
    n_y = mesh.shape["y"]
    n_x = mesh.shape["x"]
    mapped = stencil_shard_map(kernel, mesh, halo, out_leading_dims)
    sharding = raster_sharding(mesh)

    @jax.jit
    def run(data, *args):
        h, w = data.shape[-2], data.shape[-1]
        hp = -(-h // n_y) * n_y
        wp = -(-w // n_x) * n_x
        if not jnp.issubdtype(data.dtype, jnp.floating):
            # NaN pad/boundary semantics need a float payload (NaN cast
            # to int is silent garbage); the stencil kernels compute in
            # f32 anyway
            data = data.astype(jnp.float32)
        if (hp, wp) != (h, w):
            pads = [(0, 0)] * (data.ndim - 2) + [(0, hp - h), (0, wp - w)]
            data = jnp.pad(data, pads, constant_values=jnp.nan)
        data = jax.lax.with_sharding_constraint(
            data, raster_sharding(mesh, data.ndim))
        out = mapped(data, *args)
        return out[..., :h, :w]

    return run


def run_stencil(kernel: Callable, radius, data, *args):
    """Run a radius-r local kernel, distributed iff `data` is mesh-sharded.

    `kernel(data, *args)` must compute a full-size output whose outer
    radius-r ring may be garbage/NaN (it is regenerated from halos on the
    distributed path and kept as the NaN border on the single path).
    """
    mesh = get_raster_mesh(data)
    if mesh is None:
        return kernel(data, *args)
    halo = HaloSpec.square(radius) if isinstance(radius, int) \
        else HaloSpec(*radius)
    # halos wider than the local shard stay distributed via multi-hop
    # ppermute gathers (halo_extend); only warn when the halo swallows
    # the entire raster — each extended block then holds ~the full
    # raster, so sharding no longer saves memory (still correct)
    if (halo.ry >= data.shape[-2] // 2 or halo.rx >= data.shape[-1] // 2):
        warnings.warn(
            f"run_stencil: halo radius ({halo.ry}, {halo.rx}) covers the "
            f"whole raster {data.shape[-2:]}; every shard's extended "
            "block is raster-sized, so distribution saves compute but "
            "not memory.", UserWarning, stacklevel=3)
    key = (kernel, mesh, halo)
    runner = _compiled_cache.get(key)
    if runner is None:
        # rank of the kernel output decides how many leading (replicated)
        # dims precede the spatial (y, x) pair in the out spec
        out_shape = jax.eval_shape(
            kernel, jax.ShapeDtypeStruct(data.shape, data.dtype),
            *[jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))
              for a in args])
        out_leading = len(out_shape.shape) - 2
        runner = _sharded_runner(kernel, mesh, halo, out_leading)
        _compiled_cache[key] = runner
    return runner(data, *args)
