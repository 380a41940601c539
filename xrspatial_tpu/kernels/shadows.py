"""Cast shadows for hillshade: batched ray-march toward the sun.

TPU-native replacement for the reference's OptiX/RTX shadow path
(``gpu_rtx/hillshade.py``): TPUs have no RT cores, so instead of tracing
rays against a BVH of the triangulated terrain, every cell marches a ray
toward the sun with bilinear terrain sampling — one fused program, all
cells in parallel per step.

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


def _bilinear(data, r, c):
    h, w = data.shape
    r0 = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, h - 1)
    c0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, w - 1)
    r1 = jnp.clip(r0 + 1, 0, h - 1)
    c1 = jnp.clip(c0 + 1, 0, w - 1)
    fr = jnp.clip(r - r0, 0.0, 1.0)
    fc = jnp.clip(c - c0, 0.0, 1.0)
    v00 = data[r0, c0]
    v01 = data[r0, c1]
    v10 = data[r1, c0]
    v11 = data[r1, c1]
    return ((v00 * (1 - fr) + v10 * fr) * (1 - fc)
            + (v01 * (1 - fr) + v11 * fr) * fc)


@partial(jax.jit, static_argnames=("n_steps",))
def shadow_mask(data, azimuth, angle_altitude, cellsize_x, cellsize_y,
                n_steps: int = 1024):
    """True where a cell sees the sun (not shadowed).

    Marches up to `n_steps` cell-sized steps along the sun direction,
    comparing the ray height against bilinear-sampled terrain.
    """
    data = data.astype(jnp.float32)
    h, w = data.shape
    sx, sy, sz = _sun_dir(azimuth.astype(jnp.float32),
                          angle_altitude.astype(jnp.float32))

    step = jnp.minimum(jnp.abs(cellsize_x), jnp.abs(cellsize_y))
    dc = sx * step / jnp.abs(cellsize_x)       # east -> +col
    dr = -sy * step / jnp.abs(cellsize_y)      # north -> -row
    horiz = jnp.sqrt((sx * step) ** 2 + (sy * step) ** 2)
    dz = jnp.where(horiz > 0,
                   sz / jnp.maximum(jnp.sqrt(sx * sx + sy * sy), 1e-9)
                   * step, jnp.inf)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    z0 = data + 1e-3

    def body(k, blocked):
        kf = k.astype(jnp.float32)
        r = rows + dr * kf
        c = cols + dc * kf
        zray = z0 + dz * kf
        inside = (r >= 0) & (r <= h - 1) & (c >= 0) & (c <= w - 1)
        sample = _bilinear(data, r, c)
        hit = inside & (sample > zray) & ~jnp.isnan(sample)
        return blocked | hit

    blocked = jax.lax.fori_loop(1, n_steps + 1, body,
                                jnp.zeros((h, w), bool))
    return ~blocked


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
