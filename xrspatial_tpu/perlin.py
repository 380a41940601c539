"""Perlin noise synthesis: host-hashed lattices + separable device expansion.

TPU-native counterpart of reference ``xrspatial/perlin.py``: the Numba
gradient loop (perlin.py:28-74) and CUDA kernel (:129-164).  The permutation
table is generated host-side with the exact legacy NumPy RNG calls the
reference uses (``np.random.seed(seed)`` then ``np.random.permutation(2**20)``,
perlin.py:80-82 and the cupy path's numpy-RNG reuse at :174-177) so output is
bit-compatible across frameworks.

Architecture note (round 4): the dependent hash chain ``p[p[xi]+yi]`` is a
random gather into an 8 MB table — pathological on TPU (HBM-latency bound,
~3.2 s for 16 octaves at 1024²).  But ``xi`` depends only on the column and
``yi`` only on the row, so the hash field of one octave is a small
(unique-yi × unique-xi) lattice matrix.  We therefore:

1. hash the lattice on the HOST (numpy random access into a 2 MB ``p % 4``
   table is nanoseconds/element),
2. pack all four corner hashes (2 bits each) of every octave into ONE flat
   uint8 upload (each device_put through the axon tunnel costs ~10 ms, so
   transport is 3 packed arrays total, not 4 × octaves),
3. expand lattice→pixels on device with two whole-axis ``jnp.take`` calls
   (rows then columns — the separable-gather pattern TPUs handle well, same
   as ``utils.canvas_like``), and run the fade/gradient/lerp math in f32.

Outputs are bit-identical to the previous on-device gather formulation (the
per-element float sequence is unchanged); goldens pin this.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .xrlib import DataArray

__all__ = ["perlin"]


@lru_cache(maxsize=32)
def _permutation_table(seed: int) -> np.ndarray:
    """Legacy-RNG permutation of 2**20, doubled (reference perlin.py:80-82)."""
    np.random.seed(seed)
    p = np.random.permutation(np.arange(2 ** 20, dtype=np.int32))
    return np.concatenate([p, p]).astype(np.int32)


@lru_cache(maxsize=32)
def _mod4_table(seed: int) -> np.ndarray:
    """``p % 4`` as uint8 — the only part of the hash the gradient needs.

    2 MB instead of 8 MB, so host-side lattice hashing stays cache-resident.
    """
    return (_permutation_table(seed) & 3).astype(np.uint8)


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
    """Raw (un-normalized) perlin values for coordinate grids x, y.

    Legacy fully-on-device formulation (dependent gathers into the 8 MB
    permutation table — slow on TPU).  Kept for API compatibility and as
    the parity oracle for the lattice path; production callers use
    ``octave_tables`` + ``octave_eval``.
    """
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


# ---------------------------------------------------------------------------
# Host-hashed separable lattice path (the production formulation)
# ---------------------------------------------------------------------------

def _split_axis(v: np.ndarray):
    """Integer/fraction split of a 1-D coordinate axis, host-side.

    Reproduces the device split bit-for-bit: truncating ``astype(int32)``
    (coords are >= 0 in every API path) and ``(v - vi)`` in the input
    precision rounded to f32.
    """
    vi = v.astype(np.int32)
    vf = (v - vi.astype(v.dtype)).astype(np.float32)
    viu, inv = np.unique(vi, return_inverse=True)
    return vf, viu, inv.astype(np.int32).ravel()


def octave_tables(seed: int, x_col: np.ndarray, y_row: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                             np.ndarray, np.ndarray]:
    """Hash one octave's lattice on the host.

    ``x_col``/``y_row`` are the per-column / per-row noise-space coordinates
    (every caller's coordinate grids are outer products, so the 2-D grids
    are never materialized).  Returns:

    - ``packed``: (n_unique_yi, n_unique_xi) uint8; the four corner hashes
      ``p[p[xi+dx]+yi+dy] % 4`` packed 2 bits each as
      ``h00 | h01<<2 | h10<<4 | h11<<6`` (dy varies within a pair, matching
      the n00/n01/n10/n11 corner naming in ``perlin_noise``),
    - ``ix`` (W,), ``iy`` (H,): int32 lattice-column/row index per pixel,
    - ``xf`` (W,), ``yf`` (H,): f32 in-cell fractions.

    Out-of-range lattice indices clamp, matching jnp gather semantics of the
    legacy device path.
    """
    p = _permutation_table(seed)
    p4 = _mod4_table(seed)
    n = p.shape[0]
    half = n // 2  # p holds a doubled permutation: values are < n//2
    xf, xiu, ix = _split_axis(x_col)
    yf, yiu, iy = _split_axis(y_row)

    # full-resolution octaves make this the hot loop of generate_terrain,
    # so the fast path keeps indices int32, reuses the two outer-sum
    # index planes for both dy corners (p4[b+1] == p4[1:][b], a view),
    # and ors the 2-bit fields together in uint8 — ~8x the generic path.
    # It requires every index to be provably in-bounds (no clamping);
    # otherwise fall back to the clipped formulation, which reproduces
    # jnp gather clamp semantics of the legacy device path.
    in_bounds = (xiu[0] >= 0 and xiu[-1] <= n - 2
                 and yiu[0] >= 0 and yiu[-1] + 1 <= n - half)
    if in_bounds:
        px0 = p[xiu]
        px1 = p[xiu + 1]
        y0 = yiu[:, None]
        p4s = p4[1:]
        b = px0[None, :] + y0
        packed = p4[b]
        packed |= p4s[b] << 2
        b = px1[None, :] + y0
        packed |= p4[b] << 4
        packed |= p4s[b] << 6
        return packed, ix, iy, xf, yf

    px0 = p[np.clip(xiu, 0, n - 1)].astype(np.int64)
    px1 = p[np.clip(xiu + 1, 0, n - 1)].astype(np.int64)
    y0 = yiu.astype(np.int64)[:, None]
    y1 = y0 + 1

    def tab(px, yv):
        return p4[np.clip(px[None, :] + yv, 0, n - 1)].astype(np.int16)

    packed = (tab(px0, y0) | (tab(px0, y1) << 2)
              | (tab(px1, y0) << 4) | (tab(px1, y1) << 6))
    return packed.astype(np.uint8), ix, iy, xf, yf


def octave_eval(packed, ix, iy, xf, yf):
    """Device evaluation of one octave from its host-hashed lattice.

    Two whole-axis takes expand the lattice to pixel resolution; the
    fade/gradient/lerp float sequence is identical per element to
    ``perlin_noise`` (vectors broadcast instead of materialized grids).
    """
    t = jnp.take(jnp.take(packed, iy, axis=0), ix, axis=1)
    h00 = (t & 3).astype(jnp.int32)
    h01 = ((t >> 2) & 3).astype(jnp.int32)
    h10 = ((t >> 4) & 3).astype(jnp.int32)
    h11 = ((t >> 6) & 3).astype(jnp.int32)
    xf2 = xf[None, :]
    yf2 = yf[:, None]
    u = _fade(xf)[None, :]
    v = _fade(yf)[:, None]

    n00 = _gradient(h00, xf2, yf2)
    n01 = _gradient(h01, xf2, yf2 - 1)
    n11 = _gradient(h11, xf2 - 1, yf2 - 1)
    n10 = _gradient(h10, xf2 - 1, yf2)

    x1 = n00 + u * (n10 - n00)
    x2 = n01 + u * (n11 - n01)
    return x1 + v * (x2 - x1)


@jax.jit
def _perlin_normalized(packed, ix, iy, xf, yf):
    out = octave_eval(packed, ix, iy, xf, yf)
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
    linx = np.linspace(0, freq[0], width, endpoint=False, dtype=np.float32)
    liny = np.linspace(0, freq[1], height, endpoint=False, dtype=np.float32)
    packed, ix, iy, xf, yf = octave_tables(seed, linx, liny)
    out = _perlin_normalized(jnp.asarray(packed), jnp.asarray(ix),
                             jnp.asarray(iy), jnp.asarray(xf),
                             jnp.asarray(yf))
    return DataArray(out, dims=agg.dims, attrs=agg.attrs, name=name)
