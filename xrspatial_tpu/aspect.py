"""Aspect: downslope compass direction (planar 3x3 or geodesic).

TPU-native counterpart of reference ``xrspatial/aspect.py``: the Numba
stencil (aspect.py:56-90, flat cells -> -1) runs as a fused XLA program
(kernels/surface.py); the geodesic plane-fit variant follows
geodesic.py:146-166 (kernels/geodesic.py).  The numpy reference path carries
no 359.999->0 clamp (that is a GPU-only quirk at aspect.py:121), so neither
do we — numpy is the golden backend.
"""

from __future__ import annotations

import jax.numpy as jnp

from .dataset_support import supports_dataset
from .kernels.geodesic import WGS84_A2, WGS84_B2, geodesic_aspect
from .kernels.dispatch import run_stencil
from .kernels.surface import aspect_jit
from .utils import Z_UNITS, _extract_latlon_coords, to_jax, wrap_like, x64
from .xrlib import DataArray

__all__ = ["aspect"]


@supports_dataset
def aspect(agg: DataArray,
           name: str = 'aspect',
           method: str = 'planar',
           z_unit: str = 'meter') -> DataArray:
    """Returns downslope aspect in compass degrees (0 = N, 90 = E, ...).

    Flat cells return -1.  Output preserves dims/coords/attrs with a
    1-cell NaN border.

    Parameters
    ----------
    agg : DataArray or Dataset
        2D elevation array.
    name : str, default='aspect'
    method : 'planar' | 'geodesic'
    z_unit : str, default='meter' (geodesic only)
    """
    if method not in ('planar', 'geodesic'):
        raise ValueError(
            f"method must be 'planar' or 'geodesic', got {method!r}")

    if method == 'planar':
        data = to_jax(agg)
        from .kernels.surface import run_surface_op
        out = run_surface_op("aspect", data)
    else:
        if z_unit not in Z_UNITS:
            raise ValueError(
                f"z_unit must be one of "
                f"{sorted(Z_UNITS)}, got {z_unit!r}")
        z_factor = Z_UNITS[z_unit]
        lat_2d, lon_2d = _extract_latlon_coords(agg)
        with x64():
            out = geodesic_aspect(to_jax(agg, jnp.float64),
                                  jnp.asarray(lat_2d), jnp.asarray(lon_2d),
                                  WGS84_A2, WGS84_B2, z_factor)

    return wrap_like(agg, out, name)
