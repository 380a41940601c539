"""Bump map synthesis (random land-feature bumps).

TPU-native counterpart of reference ``xrspatial/bump.py``: the sequential
Numba accumulation (``_finish_bump``, bump.py:12-28) — whose per-bump spread
reads the *current* center value, making bump order significant — is
reproduced exactly with a ``lax.scan`` over bumps and masked scatter-adds.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .xrlib import DataArray

__all__ = ["bump"]


from functools import partial


@partial(jax.jit, static_argnums=(0, 3))
def _scan_bumps(shape, locs, heights, spread):
    height, width = shape
    s = spread * spread
    # offsets mirror the reference's half-open ranges
    # [x-spread, x+spread) x [y-spread, y+spread)  (bump.py:23-24)
    offs = np.arange(-spread, spread)
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    oy = jnp.asarray(oy.ravel())
    ox = jnp.asarray(ox.ravel())
    d2 = (ox * ox + oy * oy).astype(jnp.float64)
    ring = d2 <= s

    def body(out, bump):
        x, y, z = bump
        x = x.astype(jnp.int32)
        y = y.astype(jnp.int32)
        out = out.at[y, x].add(z)
        center = out[y, x]
        ny = y + oy
        nx = x + ox
        valid = (ring & (ny >= 0) & (ny < height) & (nx >= 0) & (nx < width))
        contrib = jnp.where(valid, center * (d2 / s), 0.0)
        out = out.at[ny, nx].add(contrib, mode="drop")
        return out, None

    init = jnp.zeros((height, width), dtype=jnp.float64)
    xs = (locs[:, 0].astype(jnp.float64), locs[:, 1].astype(jnp.float64),
          heights.astype(jnp.float64))
    out, _ = jax.lax.scan(body, init, xs)
    return out


@partial(jax.jit, static_argnums=(0, 1))
def _scan_bumps_nospread(shape_h, shape_w, locs, heights):
    out = jnp.zeros((shape_h, shape_w), dtype=jnp.float64)
    return out.at[locs[:, 1], locs[:, 0]].add(heights)


def bump(width: int,
         height: int,
         count: Optional[int] = None,
         height_func=None,
         spread: int = 1) -> DataArray:
    """Generate a simple bump map simulating land features.

    Parameters
    ----------
    width, height : int
        Output size in pixels.
    count : int, optional
        Number of bumps (default ``width * height // 10``).
    height_func : callable, optional
        Maps an (N, 2) array of bump locations to heights.
    spread : int, default=1
        Spread radius in pixels.
    """
    if count is None:
        count = width * height // 10
    if height_func is None:
        height_func = lambda bumps: np.ones(len(bumps))  # noqa: E731

    locs = np.empty((count, 2), dtype=np.uint16)
    locs[:, 0] = np.random.choice(range(width), count)
    locs[:, 1] = np.random.choice(range(height), count)
    heights = np.asarray(height_func(locs), dtype=np.float64)

    from .utils import x64
    with x64():
        locs_j = jnp.asarray(locs.astype(np.int32))
        heights_j = jnp.asarray(heights)
        if spread > 0:
            out = _scan_bumps((height, width), locs_j, heights_j, spread)
        else:
            # no neighborhood: order-independent scatter-add of the centers
            out = _scan_bumps_nospread(height, width, locs_j, heights_j)
    return DataArray(out, dims=['y', 'x'], attrs=dict(res=1))
