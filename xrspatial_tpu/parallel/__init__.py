"""Distributed execution over a 2D device mesh.

The reference's only multi-device story is dask ``map_overlap`` chunking with
NaN-boundary halos (SURVEY.md §2.2).  The TPU-native equivalent implemented
here: rasters shard over a ``Mesh(('y','x'))``; stencil ops run under
``shard_map`` with halo exchange via ``jax.lax.ppermute`` over ICI; global
reductions use ``psum``/``pmax`` instead of dask tree-combines.

Dispatch is sharding-driven: every op inspects its input's sharding — a
raster placed with a NamedSharding over a 2D mesh automatically takes the
distributed path (the single-backend analog of the reference's
array-type dispatch, utils.py:117-143).
"""

from .halo import (HaloSpec, distribute, get_raster_mesh,  # noqa: F401
                   halo_extend, make_raster_mesh, raster_sharding,
                   stencil_shard_map)

__all__ = [
    "HaloSpec", "distribute", "get_raster_mesh", "halo_extend",
    "make_raster_mesh", "raster_sharding", "stencil_shard_map",
]
