"""Curvature: second derivative of the surface (convexity/concavity).

TPU-native counterpart of reference ``xrspatial/curvature.py``: the Numba
plus-shaped stencil (curvature.py:31-41, ``-2*(d+e)*100/cellsize²``) runs
as a fused XLA program.  Cell size is the mean of x and y resolution
(curvature.py:233-234); the input must carry a ``res`` attr or derivable
coords.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .dataset_support import supports_dataset
from .kernels.dispatch import run_stencil
from .kernels.surface import curvature_jit
from .utils import get_dataarray_resolution, to_jax, wrap_like
from .xrlib import DataArray

__all__ = ["curvature"]


@supports_dataset
def curvature(agg: DataArray,
              name: Optional[str] = 'curvature') -> DataArray:
    """Returns curvature of the input elevation raster.

    Positive values indicate convex-upward cells, negative concave.
    Output preserves dims/coords/attrs with a 1-cell NaN border.
    """
    cellsize_x, cellsize_y = get_dataarray_resolution(agg)
    cellsize = (cellsize_x + cellsize_y) / 2
    data = to_jax(agg)
    from .kernels.surface import run_surface_op
    out = run_surface_op("curvature", data, cellsize, cellsize)
    return wrap_like(agg, out, name)
