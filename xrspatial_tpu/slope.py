"""Slope: terrain gradient magnitude in degrees (planar Horn or geodesic).

TPU-native counterpart of reference ``xrspatial/slope.py``: the Numba
``_cpu`` Horn stencil (slope.py:56-76), CUDA kernel (:133-142) and dask
``map_overlap`` path (:94-98) all collapse to one fused XLA stencil program
(kernels/surface.py); the geodesic ECEF plane-fit variant (:167-264,
geodesic.py:174-229) becomes a vectorized float64 program
(kernels/geodesic.py).  Distribution over a device mesh is provided by
``xrspatial_tpu.parallel`` instead of dask chunking.
"""

from __future__ import annotations

import jax.numpy as jnp

from .dataset_support import supports_dataset
from .kernels.geodesic import WGS84_A2, WGS84_B2, geodesic_slope
from .kernels.dispatch import run_stencil
from .kernels.surface import slope_jit
from .utils import (Z_UNITS, _extract_latlon_coords, get_dataarray_resolution,
                    to_jax, wrap_like, x64)
from .xrlib import DataArray

__all__ = ["slope"]


@supports_dataset
def slope(agg: DataArray,
          name: str = 'slope',
          method: str = 'planar',
          z_unit: str = 'meter') -> DataArray:
    """Returns slope of input aggregate in degrees.

    Parameters
    ----------
    agg : DataArray or Dataset
        2D array of elevation data.  For a Dataset the op is applied to
        each data variable independently.
    name : str, default='slope'
        Name of output DataArray.
    method : str, default='planar'
        ``'planar'``: classic Horn algorithm with uniform cell size.
        ``'geodesic'``: cells converted to ECEF and fit with a 3D plane —
        accurate for geographic (lat/lon) grids.
    z_unit : str, default='meter'
        Unit of elevation values (geodesic method only).

    Returns
    -------
    slope_agg : DataArray of the same shape, dims/coords/attrs preserved,
        1-cell NaN border.
    """
    if method not in ('planar', 'geodesic'):
        raise ValueError(
            f"method must be 'planar' or 'geodesic', got {method!r}")

    if method == 'planar':
        cellsize_x, cellsize_y = get_dataarray_resolution(agg)
        data = to_jax(agg)
        from .kernels.surface import run_surface_op
        out = run_surface_op("slope", data, cellsize_x, cellsize_y)
    else:
        if z_unit not in Z_UNITS:
            raise ValueError(
                f"z_unit must be one of "
                f"{sorted(Z_UNITS)}, got {z_unit!r}")
        z_factor = Z_UNITS[z_unit]
        lat_2d, lon_2d = _extract_latlon_coords(agg)
        with x64():
            out = geodesic_slope(to_jax(agg, jnp.float64),
                                 jnp.asarray(lat_2d), jnp.asarray(lon_2d),
                                 WGS84_A2, WGS84_B2, z_factor)

    return wrap_like(agg, out, name)
