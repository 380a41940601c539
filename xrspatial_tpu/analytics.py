"""Composite terrain analytics.

TPU-native counterpart of reference ``xrspatial/analytics.py:6-87``
(``summarize_terrain``).  Unlike the reference, which calls slope/
curvature/aspect separately (three passes over the DEM), the TPU build
computes all three from a single fused neighborhood gather
(kernels/surface.py::surface_multi) — one HBM read for all outputs.
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import get_dataarray_resolution, to_jax, wrap_like
from .xrlib import DataArray, Dataset

__all__ = ["summarize_terrain"]


def summarize_terrain(terrain: DataArray) -> Dataset:
    """Calculate slope, aspect, and curvature of a terrain in one fused pass.

    Returns a Dataset with variables named ``{terrain.name}-slope``,
    ``{terrain.name}-curvature``, ``{terrain.name}-aspect`` plus the
    original terrain, matching the reference output layout.
    """
    if terrain.name is None:
        raise NameError('Requires DataArray.name property to be set')

    cellsize_x, cellsize_y = get_dataarray_resolution(terrain)
    from .kernels.surface import surface_kernels
    outs = surface_kernels(to_jax(terrain), ("slope", "aspect", "curvature"),
                           cellsize_x, cellsize_y)

    ds = terrain.to_dataset()
    ds[f'{terrain.name}-slope'] = wrap_like(terrain, outs["slope"],
                                            f'{terrain.name}-slope')
    ds[f'{terrain.name}-curvature'] = wrap_like(terrain, outs["curvature"],
                                                f'{terrain.name}-curvature')
    ds[f'{terrain.name}-aspect'] = wrap_like(terrain, outs["aspect"],
                                             f'{terrain.name}-aspect')
    return ds
