"""Cast shadows for hillshade: batched ray-march toward the sun.

TPU-native replacement for the reference's OptiX/RTX shadow path
(``gpu_rtx/hillshade.py``): TPUs have no RT cores, so every cell marches a
ray toward the sun.  Because all rays share ONE direction, each step's
terrain sample is a uniform fractional shift of the whole raster —
implemented as four dynamic-sliced reads + bilinear weights (per-element
gathers are pathological on TPU; dynamic_slice is a contiguous copy).

Output semantics mirror the RTX path (gpu_rtx/hillshade.py:96-123):
Lambertian shading ``(cos(theta)+1)/2`` from the surface normal, halved
for cells in shadow, clamped to [0, 1].
"""

from __future__ import annotations

from functools import partial
from math import pi as PI

import jax
import jax.numpy as jnp

__all__ = ["shadow_mask", "hillshade_shadows"]


def _sun_dir(azimuth, altitude):
    """Unit vector toward the sun in world (east, north, up) coordinates
    (mirrors gpu_rtx/hillshade.py:133-143)."""
    az = azimuth * PI / 180.0
    alt = altitude * PI / 180.0
    return (jnp.sin(az) * jnp.cos(alt),
            jnp.cos(az) * jnp.cos(alt),
            jnp.sin(alt))


@partial(jax.jit, static_argnames=("n_steps",))
def _shadow_mask_impl(data, azimuth, angle_altitude, cellsize_x,
                      cellsize_y, n_steps: int):
    h, w = data.shape
    sx, sy, sz = _sun_dir(azimuth.astype(jnp.float32),
                          angle_altitude.astype(jnp.float32))

    step = jnp.minimum(jnp.abs(cellsize_x), jnp.abs(cellsize_y))
    dc = sx * step / jnp.abs(cellsize_x)       # east -> +col
    dr = -sy * step / jnp.abs(cellsize_y)      # north -> -row
    dz = sz / jnp.maximum(jnp.sqrt(sx * sx + sy * sy), 1e-9) * step

    # -inf terrain (incl. NaN cells and out-of-bounds) never blocks
    terrain = jnp.where(jnp.isnan(data), -jnp.inf, data)
    pad = n_steps + 1
    padded = jnp.pad(terrain, pad, constant_values=-jnp.inf)

    z0 = data + 1e-3

    def body(k, blocked):
        kf = k.astype(jnp.float32)
        oy = dr * kf
        ox = dc * kf
        oy0 = jnp.floor(oy)
        ox0 = jnp.floor(ox)
        fy = oy - oy0
        fx = ox - ox0
        ry = (pad + oy0).astype(jnp.int32)
        rx = (pad + ox0).astype(jnp.int32)
        s00 = jax.lax.dynamic_slice(padded, (ry, rx), (h, w))
        s01 = jax.lax.dynamic_slice(padded, (ry, rx + 1), (h, w))
        s10 = jax.lax.dynamic_slice(padded, (ry + 1, rx), (h, w))
        s11 = jax.lax.dynamic_slice(padded, (ry + 1, rx + 1), (h, w))
        sample = ((s00 * (1 - fy) + s10 * fy) * (1 - fx)
                  + (s01 * (1 - fy) + s11 * fy) * fx)
        zray = z0 + dz * kf
        return blocked | (sample > zray)

    blocked = jax.lax.fori_loop(1, n_steps + 1, body,
                                jnp.zeros((h, w), bool))
    return ~blocked


def shadow_mask(data, azimuth, angle_altitude, cellsize_x, cellsize_y,
                n_steps: int = 1024):
    """True where a cell sees the sun (not shadowed)."""
    data = data.astype(jnp.float32)
    h, w = data.shape
    n = min(n_steps, int(1.5 * max(h, w)) + 2)
    return _shadow_mask_impl(data, jnp.float32(azimuth),
                             jnp.float32(angle_altitude),
                             jnp.float32(cellsize_x),
                             jnp.float32(cellsize_y), n)


@jax.jit
def hillshade_shadows(data, azimuth, angle_altitude, cellsize_x, cellsize_y):
    """Lambert-shaded illumination with cast shadows (RTX-path analog)."""
    data = data.astype(jnp.float32)
    # surface normal from central differences (world units)
    p = jnp.pad(data, 1, mode="edge")
    dzdx = (p[1:-1, 2:] - p[1:-1, :-2]) / (2.0 * cellsize_x)
    dzdy_north = (p[:-2, 1:-1] - p[2:, 1:-1]) / (2.0 * cellsize_y)
    inv_len = jax.lax.rsqrt(dzdx ** 2 + dzdy_north ** 2 + 1.0)
    nx = -dzdx * inv_len
    ny = -dzdy_north * inv_len
    nz = inv_len

    sx, sy, sz = _sun_dir(azimuth.astype(jnp.float32),
                          angle_altitude.astype(jnp.float32))
    cos_theta = nx * sx + ny * sy + nz * sz
    shade = (cos_theta + 1.0) / 2.0

    lit = shadow_mask(data, azimuth, angle_altitude, cellsize_x, cellsize_y)
    shade = jnp.where(lit, shade, shade / 2.0)
    return jnp.clip(shade, 0.0, 1.0)
