"""Geodesic (WGS-84 ellipsoidal) slope / aspect as vectorized JAX programs.

TPU-native reformulation of the reference's per-pixel Numba loops
(``geodesic.py:174-229``, CUDA ``:236-401``): instead of recomputing each
cell's ECEF coordinates nine times (once per neighboring stencil center), we
compute the ECEF grid once and gather shifted views, then run the local
tangent-frame projection + least-squares plane fit as fused elementwise math
over (9, H, W) stacks.

float64 throughout — ECEF magnitudes (~6.4e6 m) vs neighbor deltas (~30 m)
make float32 cancellation-catastrophic; mirrors the reference's float64
contract (geodesic.py:14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# WGS-84 constants (reference geodesic.py:26-33)
WGS84_A = 6378137.0
WGS84_B = 6356752.314245
WGS84_A2 = WGS84_A * WGS84_A
WGS84_B2 = WGS84_B * WGS84_B
# the reference kernels hard-code this radius (geodesic.py:181, :210)
_R_KERNEL = 6370994.884953014
INV_2R = 1.0 / (2.0 * _R_KERNEL)

__all__ = ["geodesic_fit", "geodesic_slope", "geodesic_aspect",
           "WGS84_A2", "WGS84_B2", "INV_2R"]


def _ecef(lat_rad, lon_rad, h, a2, b2):
    cos_lat, sin_lat = jnp.cos(lat_rad), jnp.sin(lat_rad)
    cos_lon, sin_lon = jnp.cos(lon_rad), jnp.sin(lon_rad)
    n = a2 / jnp.sqrt(a2 * cos_lat * cos_lat + b2 * sin_lat * sin_lat)
    x = (n + h) * cos_lat * cos_lon
    y = (n + h) * cos_lat * sin_lon
    z = (b2 / a2 * n + h) * sin_lat
    return x, y, z


def _shift9(arr):
    """(9, H, W) stack of the 3x3 neighborhood (NaN-padded borders)."""
    p = jnp.pad(arr, 1, constant_values=jnp.nan)
    views = [p[1 + dy:arr.shape[0] + 1 + dy, 1 + dx:arr.shape[1] + 1 + dx]
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    return jnp.stack(views, axis=0)


def geodesic_fit(elev, lat_deg, lon_deg, a2, b2, z_factor):
    """Least-squares tangent-plane fit u = A*e + B*n per pixel.

    Returns (A, B, valid) float64/bool arrays of shape (H, W).
    """
    f64 = jnp.float64
    elev = elev.astype(f64)
    lat = jnp.asarray(lat_deg, f64)
    lon = jnp.asarray(lon_deg, f64)
    deg2rad = np.pi / 180.0

    h = elev * z_factor
    x, y, z = _ecef(lat * deg2rad, lon * deg2rad, h, a2, b2)

    # center-frame basis vectors
    lat_r, lon_r = lat * deg2rad, lon * deg2rad
    cos_lat, sin_lat = jnp.cos(lat_r), jnp.sin(lat_r)
    cos_lon, sin_lon = jnp.cos(lon_r), jnp.sin(lon_r)
    ex, ey = -sin_lon, cos_lon                      # East  (ez = 0)
    nx, ny, nz = -sin_lat * cos_lon, -sin_lat * sin_lon, cos_lat  # North
    ux, uy, uz = cos_lat * cos_lon, cos_lat * sin_lon, sin_lat    # Up

    dx = _shift9(x) - x[None]
    dy = _shift9(y) - y[None]
    dz = _shift9(z) - z[None]
    e9 = dx * ex[None] + dy * ey[None]
    n9 = dx * nx[None] + dy * ny[None] + dz * nz[None]
    u9 = dx * ux[None] + dy * uy[None] + dz * uz[None]
    # curvature correction: compensate the ellipsoid curving away
    u9 = u9 + (e9 * e9 + n9 * n9) * INV_2R

    valid = ~jnp.any(jnp.isnan(_shift9(elev)), axis=0)

    me = jnp.mean(e9, axis=0)
    mn = jnp.mean(n9, axis=0)
    mu = jnp.mean(u9, axis=0)
    de, dn, du = e9 - me[None], n9 - mn[None], u9 - mu[None]
    see = jnp.sum(de * de, axis=0)
    snn = jnp.sum(dn * dn, axis=0)
    sen = jnp.sum(de * dn, axis=0)
    seu = jnp.sum(de * du, axis=0)
    snu = jnp.sum(dn * du, axis=0)

    det = see * snn - sen * sen
    degenerate = jnp.abs(det) < 1e-30
    safe_det = jnp.where(degenerate, 1.0, det)
    A = jnp.where(degenerate, 0.0, (seu * snn - snu * sen) / safe_det)
    B = jnp.where(degenerate, 0.0, (snu * see - seu * sen) / safe_det)
    return A, B, valid


def _nan_border32(out):
    h, w = out.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (rows >= 1) & (rows < h - 1) & (cols >= 1) & (cols < w - 1)
    return jnp.where(interior, out, jnp.nan).astype(jnp.float32)


@jax.jit
def geodesic_slope(elev, lat_deg, lon_deg, a2, b2, z_factor):
    A, B, valid = geodesic_fit(elev, lat_deg, lon_deg, a2, b2, z_factor)
    deg = jnp.arctan(jnp.sqrt(A * A + B * B)) * (180.0 / np.pi)
    return _nan_border32(jnp.where(valid, deg, jnp.nan))


@jax.jit
def geodesic_aspect(elev, lat_deg, lon_deg, a2, b2, z_factor):
    A, B, valid = geodesic_fit(elev, lat_deg, lon_deg, a2, b2, z_factor)
    mag = jnp.sqrt(A * A + B * B)
    # downslope bearing in (east, north) = (-A, -B), as a compass angle
    angle = jnp.arctan2(-A, -B) * (180.0 / np.pi)
    angle = jnp.where(angle < 0.0, angle + 360.0, angle)
    angle = jnp.where(angle >= 360.0, angle - 360.0, angle)
    out = jnp.where(mag < 1e-7, -1.0, angle)
    return _nan_border32(jnp.where(valid, out, jnp.nan))
