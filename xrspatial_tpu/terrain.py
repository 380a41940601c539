"""Pseudo-random terrain synthesis (16-octave perlin fBm).

TPU-native counterpart of reference ``xrspatial/terrain.py``: the octave
loop (``_gen_terrain``, terrain.py:36-61) runs on device, one fused jitted
octave accumulation per permutation table; water cutoff and zfactor scaling
match terrain.py:64-80.  Output coordinates reproduce the datashader
Canvas pixel-center convention the reference relies on (terrain.py:267-273)
without the datashader dependency.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .perlin import _permutation_table, perlin_noise
from .utils import x64
from .xrlib import DataArray

__all__ = ["generate_terrain"]

# sum of the first 6 octave weights, as hard-coded by the reference
# (terrain.py:58): 1.00+0.50+0.25+0.13+0.06+0.03
_OCTAVE_NORM = 1.97
_N_OCTAVES = 16


def _scale(value, old_range, new_range):
    d = (value - old_range[0]) / (old_range[1] - old_range[0])
    return d * (new_range[1] - new_range[0]) + new_range[0]


@jax.jit
def _octave_add(acc, p, x, y, mult):
    return acc + perlin_noise(p, x, y) * mult


# NOTE: one-dispatch variants of the octave loop were tried and are
# SLOWER on this TPU than 16 separate jit calls: a fori-loop body with
# traced frequencies ran 6x slower, a fully-unrolled single program 2x
# slower (XLA fuses the 16 gather chains into a worse schedule than 16
# small programs).  Keep per-octave dispatch; the win is the f32 fade/
# gradient math after the f64 lattice split (see perlin.py).


@jax.jit
def _finalize(acc, zfactor):
    data = acc / _OCTAVE_NORM
    data = data ** 3
    data = (data - jnp.min(data)) / (jnp.max(data) - jnp.min(data))
    data = jnp.where(data < 0.3, 0.0, data)  # water cutoff
    return (data * zfactor).astype(jnp.float32)


def generate_terrain(agg: DataArray,
                     x_range: tuple = (0, 500),
                     y_range: tuple = (0, 500),
                     seed: int = 10,
                     zfactor: int = 4000,
                     full_extent: Optional[Union[Tuple, List]] = None,
                     name: str = 'terrain') -> DataArray:
    """Generate pseudo-random terrain (helpful for testing raster functions).

    Parameters
    ----------
    agg : DataArray
        2D array whose shape determines the output size.
    x_range, y_range : tuple
        Coordinate ranges of the output.
    seed : int, default=10
    zfactor : int, default=4000
        Multiplier for elevation values.
    full_extent : (xmin, ymin, xmax, ymax), optional
        Full extent of the coordinate system; noise-space coordinates are
        scaled relative to it.
    """
    height, width = agg.shape

    if full_extent is None:
        full_extent = (x_range[0], y_range[0], x_range[1], y_range[1])
    elif not isinstance(full_extent, (list, tuple)) or len(full_extent) != 4:
        raise TypeError('full_extent must be tuple(4)')

    full_xrange = (full_extent[0], full_extent[2])
    full_yrange = (full_extent[1], full_extent[3])
    x_scaled = (_scale(x_range[0], full_xrange, (0.0, 1.0)),
                _scale(x_range[1], full_xrange, (0.0, 1.0)))
    y_scaled = (_scale(y_range[0], full_yrange, (0.0, 1.0)),
                _scale(y_range[1], full_yrange, (0.0, 1.0)))

    linx = np.linspace(x_scaled[0], x_scaled[1], width, endpoint=False,
                       dtype=np.float32)
    liny = np.linspace(y_scaled[0], y_scaled[1], height, endpoint=False,
                       dtype=np.float32)
    x, y = np.meshgrid(linx, liny)
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    with x64():
        x = x.astype(jnp.float64)
        y = y.astype(jnp.float64)
        acc = jnp.zeros((height, width), dtype=jnp.float32)
        for i in range(_N_OCTAVES):
            p = jnp.asarray(_permutation_table(seed + i))
            freq = float(2 ** i)
            acc = _octave_add(acc, p, x * freq, y * freq,
                              jnp.float32(1.0 / freq))
        out = _finalize(acc, float(zfactor))

    # datashader Canvas pixel-center coordinate convention
    dx = (x_range[1] - x_range[0]) / width
    dy = (y_range[1] - y_range[0]) / height
    xs = x_range[0] + dx * (np.arange(width) + 0.5)
    ys = y_range[0] + dy * (np.arange(height) + 0.5)

    result = DataArray(out, name=name, dims=['y', 'x'],
                       coords={'y': ys, 'x': xs},
                       attrs={'res': (dx, dy)})
    return result
