"""Fused 3x3 surface stencils: slope / aspect / curvature / hillshade.

One shared neighborhood-gather feeds per-op epilogues, so composites like
``summarize_terrain`` read the DEM once.  Under ``jax.jit`` XLA fuses the
pad + 9 shifted reads + epilogue into a single VMEM-tiled elementwise loop;
a Pallas variant (kernels/pallas_surface.py) computes several products per
HBM read for the multi-output case.

Numerical contracts mirrored from the reference (all float32):
- slope:   Horn 3x3 Sobel-weighted gradient, ``atan(|∇z|)*57.29578``
  (reference slope.py:56-76).
- aspect:  compass direction, flat -> -1 (reference aspect.py:56-90).
- curvature: ``-2*(d+e)*100/cellsize²`` plus-shaped stencil
  (reference curvature.py:31-41).
- hillshade: np.gradient-based illumination, ``(shaded+1)/2``
  (reference hillshade.py:20-35).
- all ops: 1-cell NaN border (reference slope.py:59-61 etc.).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEG = 57.29578  # the reference's degree conversion constant (slope.py:76)

__all__ = [
    "neighborhood", "slope_from_neighbors", "aspect_from_neighbors",
    "curvature_from_center", "hillshade_from_gradient",
    "slope_jit", "aspect_jit", "curvature_jit", "hillshade_jit",
    "surface_multi",
]


def neighborhood(data: jax.Array):
    """Return the 9 shifted neighbor arrays of a 2D array.

    Layout (matching the reference aspect kernel's naming, aspect.py:56-90):
    ``a b c`` = row above (y-1), ``d e f`` = center row, ``g h i`` = row
    below (y+1).  Borders are NaN-padded; callers NaN the border ring anyway.
    """
    p = jnp.pad(data, 1, constant_values=jnp.nan)
    a = p[:-2, :-2]
    b = p[:-2, 1:-1]
    c = p[:-2, 2:]
    d = p[1:-1, :-2]
    e = p[1:-1, 1:-1]
    f = p[1:-1, 2:]
    g = p[2:, :-2]
    h = p[2:, 1:-1]
    i = p[2:, 2:]
    return a, b, c, d, e, f, g, h, i


def _interior_mask(shape):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((rows >= 1) & (rows < shape[0] - 1)
            & (cols >= 1) & (cols < shape[1] - 1))


def _nan_border(out):
    return jnp.where(_interior_mask(out.shape), out, jnp.nan)


def slope_from_neighbors(nb, cellsize_x, cellsize_y):
    a, b, c, d, e, f, g, h, i = nb
    # Horn gradient; dz_dy sign is irrelevant to the magnitude
    dz_dx = ((c + 2.0 * f + i) - (a + 2.0 * d + g)) / (8.0 * cellsize_x)
    dz_dy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / (8.0 * cellsize_y)
    p = jnp.sqrt(dz_dx * dz_dx + dz_dy * dz_dy)
    return jnp.arctan(p) * DEG


def aspect_from_neighbors(nb):
    a, b, c, d, e, f, g, h, i = nb
    dz_dx = ((c + 2.0 * f + i) - (a + 2.0 * d + g)) / 8.0
    dz_dy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / 8.0
    angle = jnp.arctan2(dz_dy, -dz_dx) * (180.0 / jnp.pi)
    # convert math angle -> compass direction (0-360, 0 = north)
    compass = jnp.where(angle < 0.0, 90.0 - angle,
                        jnp.where(angle > 90.0, 450.0 - angle, 90.0 - angle))
    flat = (dz_dx == 0.0) & (dz_dy == 0.0)
    return jnp.where(flat, -1.0, compass)


def curvature_from_center(nb, cellsize):
    a, b, c, d, e, f, g, h, i = nb
    dd = (h + b) * 0.5 - e
    ee = (f + d) * 0.5 - e
    return -2.0 * (dd + ee) * 100.0 / (cellsize * cellsize)


def hillshade_from_gradient(nb, azimuth, angle_altitude):
    """Matches the reference's np.gradient formulation (hillshade.py:20-35),
    algebraically simplified to remove all per-pixel transcendentals.

    With L = |grad| and aspect = atan2(-gx, gy):
      sin(pi/2 - atan L) = 1/sqrt(1+L^2),  cos(pi/2 - atan L) = L/sqrt(1+L^2)
      cos(phi - aspect)  = (cos(phi)*gy - sin(phi)*gx) / L
    so  shaded = (sinA + cosA*(cos(phi)*gy - sin(phi)*gx)) * rsqrt(1+L^2)
    — the L factors cancel; only one rsqrt per pixel remains (the scalar
    sin/cos of phi and altitude are computed once).
    """
    a, b, c, d, e, f, g, h, i = nb
    gx = (h - b) * 0.5  # gradient along axis 0 (rows)
    gy = (f - d) * 0.5  # gradient along axis 1 (cols)
    azrad = (360.0 - azimuth) * (jnp.pi / 180.0)
    altrad = angle_altitude * (jnp.pi / 180.0)
    phi = azrad - jnp.pi / 2.0
    sin_a = jnp.sin(altrad)
    cos_a = jnp.cos(altrad)
    cos_p = jnp.cos(phi)
    sin_p = jnp.sin(phi)
    shaded = ((sin_a + cos_a * (cos_p * gy - sin_p * gx))
              * jax.lax.rsqrt(1.0 + gx * gx + gy * gy))
    return (shaded + 1.0) / 2.0


# ---------------------------------------------------------------------------
# jitted single-op entry points (scalar params traced to avoid recompiles)
# ---------------------------------------------------------------------------

@jax.jit
def slope_jit(data, cellsize_x, cellsize_y):
    data = data.astype(jnp.float32)
    out = slope_from_neighbors(neighborhood(data),
                               cellsize_x.astype(jnp.float32),
                               cellsize_y.astype(jnp.float32))
    return _nan_border(out)


@jax.jit
def aspect_jit(data):
    data = data.astype(jnp.float32)
    return _nan_border(aspect_from_neighbors(neighborhood(data)))


@jax.jit
def curvature_jit(data, cellsize):
    data = data.astype(jnp.float32)
    out = curvature_from_center(neighborhood(data),
                                cellsize.astype(jnp.float32))
    return _nan_border(out)


@jax.jit
def hillshade_jit(data, azimuth, angle_altitude):
    data = data.astype(jnp.float32)
    out = hillshade_from_gradient(neighborhood(data),
                                  azimuth.astype(jnp.float32),
                                  angle_altitude.astype(jnp.float32))
    return _nan_border(out)


import os


def use_pallas_surface(data, which=("slope",)) -> bool:
    """The classic-pipeline tiled Pallas stencil
    (kernels/pallas_surface2.py) beats fused XLA on TPU at scale for
    every product (16k^2 on a v5e: slope 6.5 vs 16.3 ms, hillshade ~6-7
    vs 9.0 ms) — since its epilogues are transcendental-free, hillshade
    rides it too (round 1 kept hillshade on XLA).  Small outputs hit
    XLA's whole-result-in-VMEM quirk, so gate by size."""
    if os.environ.get("XRSPATIAL_NO_PALLAS") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if data.shape[-2] <= 10 or data.shape[-1] <= 130:
        return False  # tile interiors need th > 2*r rows / tw > 2*r cols
    return data.size >= (2048 * 2048)


def run_surface_op(name, data, cellsize_x=1.0, cellsize_y=1.0,
                   azimuth=225.0, angle_altitude=25.0):
    """Single-op dispatch shared by slope/aspect/curvature/hillshade.

    Mesh-sharded input -> run_stencil (ppermute halo path); TPU at
    scale -> Pallas tiled kernel; else the fused-XLA stencil.  ONE
    place for the gate so the four ops cannot silently diverge.
    """
    from ..parallel.halo import get_raster_mesh
    from .dispatch import run_stencil
    if get_raster_mesh(data) is None and use_pallas_surface(data, (name,)):
        return surface_kernels(data, (name,), cellsize_x, cellsize_y,
                               azimuth, angle_altitude)[name]
    if name == "slope":
        return run_stencil(slope_jit, 1, data, jnp.float32(cellsize_x),
                           jnp.float32(cellsize_y))
    if name == "aspect":
        return run_stencil(aspect_jit, 1, data)
    if name == "curvature":
        return run_stencil(curvature_jit, 1, data,
                           jnp.float32(cellsize_x))
    if name == "hillshade":
        return run_stencil(hillshade_jit, 1, data, jnp.float32(azimuth),
                           jnp.float32(angle_altitude))
    raise ValueError(f"unknown surface op {name!r}")


def surface_kernels(data, which, cellsize_x=1.0, cellsize_y=1.0,
                    azimuth=225.0, angle_altitude=25.0):
    """Compute the requested surface products, choosing the Pallas
    tiled kernel on TPU at scale, else the fused-XLA path."""
    if use_pallas_surface(data, which):
        from .pallas_surface2 import surface_tiled
        outs = surface_tiled(data, jnp.float32(cellsize_x),
                             jnp.float32(cellsize_y), jnp.float32(azimuth),
                             jnp.float32(angle_altitude), tuple(which))
        return {name: outs[k] for k, name in enumerate(which)}
    return surface_multi(data, jnp.float32(cellsize_x),
                         jnp.float32(cellsize_y), jnp.float32(azimuth),
                         jnp.float32(angle_altitude), tuple(which))


@partial(jax.jit, static_argnames=("which",))
def surface_multi(data, cellsize_x, cellsize_y, azimuth, angle_altitude,
                  which=("slope", "aspect", "curvature", "hillshade")):
    """Compute several surface products from one neighborhood gather.

    Used by ``summarize_terrain`` (reference analytics.py:6-87) so the DEM
    is read once for all outputs.
    """
    data = data.astype(jnp.float32)
    nb = neighborhood(data)
    csx = cellsize_x.astype(jnp.float32)
    csy = cellsize_y.astype(jnp.float32)
    outs = {}
    if "slope" in which:
        outs["slope"] = _nan_border(slope_from_neighbors(nb, csx, csy))
    if "aspect" in which:
        outs["aspect"] = _nan_border(aspect_from_neighbors(nb))
    if "curvature" in which:
        outs["curvature"] = _nan_border(
            curvature_from_center(nb, (csx + csy) * 0.5))
    if "hillshade" in which:
        outs["hillshade"] = _nan_border(hillshade_from_gradient(
            nb, azimuth.astype(jnp.float32), angle_altitude.astype(jnp.float32)))
    return outs
