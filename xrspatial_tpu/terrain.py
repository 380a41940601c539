"""Pseudo-random terrain synthesis (16-octave perlin fBm).

TPU-native counterpart of reference ``xrspatial/terrain.py``: the octave
loop (``_gen_terrain``, terrain.py:36-61), water cutoff and zfactor scaling
(terrain.py:64-80).  Output coordinates reproduce the datashader Canvas
pixel-center convention the reference relies on (terrain.py:267-273)
without the datashader dependency.

Round-4 architecture: each octave's ``p[p[xi]+yi]`` hash lattice is computed
on the HOST over the unique (xi, yi) values only (xi depends on the column,
yi on the row — see perlin.py), all 16 octaves' packed tables / indices /
fractions ship as THREE device_put calls total, and one jitted program
expands each lattice with two whole-axis takes and accumulates.  This
replaced a 16-dispatch device-gather loop that cost ~3.2 s at 1024²
(HBM-latency-bound random gathers); outputs are bit-identical (goldens +
A/B pinned in tests/test_synthesis.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .perlin import octave_eval, octave_tables
from .xrlib import DataArray

__all__ = ["generate_terrain"]

# sum of the first 6 octave weights, as hard-coded by the reference
# (terrain.py:58): 1.00+0.50+0.25+0.13+0.06+0.03
_OCTAVE_NORM = 1.97
_N_OCTAVES = 16


def _scale(value, old_range, new_range):
    d = (value - old_range[0]) / (old_range[1] - old_range[0])
    return d * (new_range[1] - new_range[0]) + new_range[0]


def pack_octaves(octaves):
    """Concatenate per-octave (packed, ix, iy, xf, yf) tuples into three
    flat transport arrays (uint8 tables / int32 indices / f32 fractions)
    plus a static carve plan.

    Each device_put through the axon tunnel costs ~10 ms, so 16 octaves x 5
    fields must not ship individually (the exact-viewshed packed-transport
    lesson).  The carve plan is a tuple of static ints, hashable for the
    program cache.
    """
    tables, idx, frac, plan = [], [], [], []
    t_off = i_off = f_off = 0
    for packed, ix, iy, xf, yf in octaves:
        nyi, nxi = packed.shape
        h, w = iy.shape[0], ix.shape[0]
        plan.append((t_off, nyi, nxi, i_off, w, h, f_off))
        tables.append(packed.ravel())
        idx.append(ix)
        idx.append(iy)
        frac.append(xf)
        frac.append(yf)
        t_off += nyi * nxi
        i_off += w + h
        f_off += w + h
    return (np.concatenate(tables), np.concatenate(idx),
            np.concatenate(frac), tuple(plan))


def carve_octave(tables, idx, frac, entry):
    """Static-slice one octave's fields out of the packed transport."""
    t_off, nyi, nxi, i_off, w, h, f_off = entry
    packed = tables[t_off:t_off + nyi * nxi].reshape(nyi, nxi)
    ix = idx[i_off:i_off + w]
    iy = idx[i_off + w:i_off + w + h]
    xf = frac[f_off:f_off + w]
    yf = frac[f_off + w:f_off + w + h]
    return packed, ix, iy, xf, yf


@lru_cache(maxsize=8)
def _terrain_program(plan, weights):
    """One jitted program: carve + expand + accumulate all octaves, finalize.

    ``plan``/``weights`` are static per output shape; the accumulation order
    and f32 arithmetic match the legacy per-octave dispatch bit-for-bit.
    """

    @jax.jit
    def run(tables, idx, frac, zfactor):
        acc = None
        for entry, weight in zip(plan, weights):
            packed, ix, iy, xf, yf = carve_octave(tables, idx, frac, entry)
            val = octave_eval(packed, ix, iy, xf, yf) * jnp.float32(weight)
            acc = val if acc is None else acc + val
        data = acc / _OCTAVE_NORM
        data = data ** 3
        data = (data - jnp.min(data)) / (jnp.max(data) - jnp.min(data))
        data = jnp.where(data < 0.3, 0.0, data)  # water cutoff
        return (data * zfactor).astype(jnp.float32)

    return run


@lru_cache(maxsize=4)
def _transport(seed, height, width, x_scaled, y_scaled):
    """Host-hashed packed transport for all octaves, memoized per
    (seed, shape, scaled ranges) — terrain synthesis is deterministic in
    these, and repeated calls (benchmark loops, tiled workflows that
    regenerate the same extent) skip the ~1.3 s/4096^2 host hashing.

    f32 linspace then f64 promotion reproduces the legacy device math:
    x*freq is exact in f64 (freq is a power of two), and the f64->f32
    fraction rounding matches the old in-jit x64 split.
    """
    linx = np.linspace(x_scaled[0], x_scaled[1], width, endpoint=False,
                       dtype=np.float32).astype(np.float64)
    liny = np.linspace(y_scaled[0], y_scaled[1], height, endpoint=False,
                       dtype=np.float32).astype(np.float64)
    octaves = []
    for i in range(_N_OCTAVES):
        freq = float(2 ** i)
        octaves.append(octave_tables(seed + i, linx * freq, liny * freq))
    tables, idx, frac, plan = pack_octaves(octaves)
    # memoize the device residency too: the packed tables are ~73 MB at
    # 4096^2 and re-uploading them dominated warm calls (~1 s tunnel)
    return (jnp.asarray(tables), jnp.asarray(idx), jnp.asarray(frac),
            plan)


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


    tables, idx, frac, plan = _transport(
        seed, height, width, (float(x_scaled[0]), float(x_scaled[1])),
        (float(y_scaled[0]), float(y_scaled[1])))
    weights = [1.0 / float(2 ** i) for i in range(_N_OCTAVES)]
    run = _terrain_program(plan, tuple(weights))
    out = run(tables, idx, frac, np.float32(zfactor))

    # datashader Canvas pixel-center coordinate convention
    dx = (x_range[1] - x_range[0]) / width
    dy = (y_range[1] - y_range[0]) / height
    xs = x_range[0] + dx * (np.arange(width) + 0.5)
    ys = y_range[0] + dy * (np.arange(height) + 0.5)

    result = DataArray(out, name=name, dims=['y', 'x'],
                       coords={'y': ys, 'x': xs},
                       attrs={'res': (dx, dy)})
    return result
