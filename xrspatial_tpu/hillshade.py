"""Hillshade: illumination of a surface from a given sun azimuth/altitude.

TPU-native counterpart of reference ``xrspatial/hillshade.py``: the
np.gradient-based formulation (hillshade.py:20-35) runs as a fused XLA
stencil program.  ``shadows=True`` (an OptiX/RTX path in the reference,
gpu_rtx/hillshade.py) is reformulated as a batched ray-march toward the sun
— TPUs have no RT cores — implemented in kernels/shadows.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .dataset_support import supports_dataset
from .kernels.dispatch import run_stencil
from .kernels.surface import hillshade_jit
from .utils import to_jax, wrap_like
from .xrlib import DataArray

__all__ = ["hillshade"]


@supports_dataset
def hillshade(agg: DataArray,
              azimuth: int = 225,
              angle_altitude: int = 25,
              name: Optional[str] = 'hillshade',
              shadows: bool = False) -> DataArray:
    """Returns illumination values in [0, 1] for each cell.

    Parameters
    ----------
    agg : DataArray or Dataset
        2D elevation array.
    angle_altitude : int, default=25
        Sun altitude angle in degrees.
    azimuth : int, default=225
        Sun azimuth (angle from north) in degrees.
    name : str, default='hillshade'
    shadows : bool, default=False
        Also compute cast shadows by ray-marching each cell toward the sun
        (replaces the reference's OptiX ray-traced path).
    """
    data = to_jax(agg)
    if shadows:
        # shadow path mirrors the reference's RTX output semantics
        # (Lambert + halving in shadow, gpu_rtx/hillshade.py:96-123),
        # implemented as a batched ray-march — TPUs have no RT cores
        from .kernels.shadows import hillshade_shadows
        from .utils import get_dataarray_resolution
        cellsize_x, cellsize_y = get_dataarray_resolution(agg)
        out = hillshade_shadows(data, jnp.float32(azimuth),
                                jnp.float32(angle_altitude),
                                jnp.float32(cellsize_x),
                                jnp.float32(abs(cellsize_y)))
    else:
        from .kernels.surface import run_surface_op
        out = run_surface_op("hillshade", data, azimuth=azimuth,
                             angle_altitude=angle_altitude)
    return wrap_like(agg, out, name)
