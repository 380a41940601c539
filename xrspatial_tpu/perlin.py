"""Perlin noise synthesis on device.

TPU-native counterpart of reference ``xrspatial/perlin.py``: the Numba
gradient loop (perlin.py:28-74) and CUDA kernel (:129-164) become one fused
jnp gather program.  The permutation table is generated host-side with the
exact legacy NumPy RNG calls the reference uses (``np.random.seed(seed)``
then ``np.random.permutation(2**20)``, perlin.py:80-82 and the cupy path's
numpy-RNG reuse at :174-177) so output is bit-compatible across frameworks.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .utils import x64
from .xrlib import DataArray

__all__ = ["perlin"]


@lru_cache(maxsize=32)
def _permutation_table(seed: int) -> np.ndarray:
    """Legacy-RNG permutation of 2**20, doubled (reference perlin.py:80-82)."""
    np.random.seed(seed)
    p = np.random.permutation(np.arange(2 ** 20, dtype=np.int32))
    return np.concatenate([p, p]).astype(np.int32)


def _fade(t):
    return 6 * t ** 5 - 15 * t ** 4 + 10 * t ** 3


def _gradient(h, x, y):
    """Dot product with one of 4 axis gradient vectors chosen by h % 4.

    Vector table [[0,1],[0,-1],[1,0],[-1,0]] (reference perlin.py:40).
    With axis gradients the dot is just (+-x) or (+-y) — exact in every
    dtype — so the output follows the input dtype (the reference's f64
    accumulation only influenced the later lerps; see perlin_noise).
    """
    f = jnp.mod(h, 4)
    one = jnp.ones((), x.dtype)
    zero = jnp.zeros((), x.dtype)
    gx = jnp.where(f == 2, one, jnp.where(f == 3, -one, zero))
    gy = jnp.where(f == 0, one, jnp.where(f == 1, -one, zero))
    return gx * x + gy * y


def perlin_noise(p: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Raw (un-normalized) perlin values for coordinate grids x, y."""
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    # the integer/fraction split needs the input precision (lattice
    # coordinates reach 2^15+ at terrain's high octaves, where float32
    # has no fractional resolution), but the fractions live in [0, 1)
    # where float32 is plenty — so the fade/gradient/lerp math runs f32
    # (f64 is software-emulated on TPU)
    xf = (x - xi).astype(jnp.float32)
    yf = (y - yi).astype(jnp.float32)
    u = _fade(xf)
    v = _fade(yf)

    n00 = _gradient(p[p[xi] + yi], xf, yf)
    n01 = _gradient(p[p[xi] + yi + 1], xf, yf - 1)
    n11 = _gradient(p[p[xi + 1] + yi + 1], xf - 1, yf - 1)
    n10 = _gradient(p[p[xi + 1] + yi], xf - 1, yf)

    x1 = n00 + u * (n10 - n00)
    x2 = n01 + u * (n11 - n01)
    return x1 + v * (x2 - x1)


@jax.jit
def _perlin_normalized(p, x, y):
    out = perlin_noise(p, x, y)
    out = (out - jnp.min(out)) / (jnp.max(out) - jnp.min(out))
    return out.astype(jnp.float32)


def perlin(agg: DataArray,
           freq: tuple = (1, 1),
           seed: int = 5,
           name: str = 'perlin') -> DataArray:
    """Generate a perlin noise aggregate, normalized to [0, 1].

    Parameters
    ----------
    agg : DataArray
        2D array whose shape determines the output size.
    freq : tuple, default=(1, 1)
        (x, y) frequency multipliers.
    seed : int, default=5
        RNG seed for the permutation table.
    """
    height, width = agg.shape
    p = jnp.asarray(_permutation_table(seed))
    linx = np.linspace(0, freq[0], width, endpoint=False, dtype=np.float32)
    liny = np.linspace(0, freq[1], height, endpoint=False, dtype=np.float32)
    x, y = np.meshgrid(linx, liny)
    with x64():
        out = _perlin_normalized(p, jnp.asarray(x), jnp.asarray(y))
    return DataArray(out, dims=agg.dims, attrs=agg.attrs, name=name)
