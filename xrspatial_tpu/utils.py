"""Shared helpers: resolution/unit inference, validation, JAX adapters.

TPU-native counterpart of the reference's ``xrspatial/utils.py``.  The
reference's 4-way numpy/cupy/dask backend dispatch
(``ArrayTypeFunctionMapping``, utils.py:117-143) collapses here to a single
JAX path: every op coerces ``agg.data`` to a ``jax.Array``, runs a jitted/
Pallas program, and re-wraps with the input's coords/dims/attrs.

Behavioral-parity helpers (resolution, unit heuristics, Web-Mercator
projection, lat/lon extraction) mirror reference semantics at
utils.py:168-330 and utils.py:455-714.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .xrlib import DataArray

__all__ = [
    "canvas_like",
    "get_dataarray_resolution",
    "calc_res",
    "get_xy_range",
    "validate_arrays",
    "lnglat_to_meters",
    "height_implied_by_aspect_ratio",
    "Z_UNITS",
    "warn_if_unit_mismatch",
    "to_jax",
    "wrap_like",
    "nan_border",
    "bands_to_img",
    "color_values",
    "has_cuda_and_cupy",
    "is_cupy_array",
    "has_dask_array",
    "has_dask_dataframe",
    "is_cupy_backed",
    "is_dask_cupy",
    "cuda_args",
    "calc_cuda_dims",
    "not_implemented_func",
]


# ---------------------------------------------------------------------------
# Geometry / resolution (reference: utils.py:168-277)
# ---------------------------------------------------------------------------

def get_xy_range(raster, xdim=None, ydim=None):
    """(xmin, xmax), (ymin, ymax) from the raster's dim coordinates."""
    if ydim is None:
        ydim = raster.dims[-2]
    if xdim is None:
        xdim = raster.dims[-1]
    xvals = np.asarray(raster[xdim].data)
    yvals = np.asarray(raster[ydim].data)
    return (float(xvals.min()), float(xvals.max())), \
           (float(yvals.min()), float(yvals.max()))


def calc_res(raster, xdim=None, ydim=None):
    """(xres, yres) derived from coordinate extents (endpoint spacing)."""
    h, w = raster.shape[-2:]
    (xmin, xmax), (ymin, ymax) = get_xy_range(raster, xdim, ydim)
    return (xmax - xmin) / (w - 1), (ymax - ymin) / (h - 1)


def get_dataarray_resolution(agg, xdim: Optional[str] = None,
                             ydim: Optional[str] = None):
    """Cell size (x, y): prefer the ``res`` attr, else derive from coords.

    Matches reference utils.py:233-277: ``res`` may be a scalar or a
    2-sequence; anything malformed falls back to coordinate spacing.
    """
    try:
        cellsize = agg.attrs.get("res")
        if (isinstance(cellsize, (tuple, list, np.ndarray))
                and len(cellsize) == 2
                and isinstance(cellsize[0], (int, float, np.number))
                and isinstance(cellsize[1], (int, float, np.number))):
            return cellsize[0], cellsize[1]
        if isinstance(cellsize, (int, float, np.number)):
            return cellsize, cellsize
        return calc_res(agg, xdim, ydim)
    except Exception:
        return calc_res(agg, xdim, ydim)


def lnglat_to_meters(longitude, latitude):
    """Project (longitude, latitude) to Web Mercator meters.

    Reference: utils.py:280-330.
    """
    if isinstance(longitude, (list, tuple)):
        longitude = np.array(longitude)
    if isinstance(latitude, (list, tuple)):
        latitude = np.array(latitude)
    shift = np.pi * 6378137
    easting = longitude * shift / 180.0
    northing = np.log(np.tan((90 + latitude) * np.pi / 360.0)) * shift / np.pi
    return easting, northing


def height_implied_by_aspect_ratio(W: int, X, Y) -> int:
    """Height (pixels) implied by width + x/y ranges at equal aspect."""
    return int(W * (Y[1] - Y[0]) / (X[1] - X[0]))


def validate_arrays(*arrays):
    """Check that all input DataArrays share shape (reference utils.py:146-165).

    The reference also enforced same backend array type and aligned dask
    chunks; with a single JAX backend only the shape check remains.
    """
    if len(arrays) < 2:
        raise ValueError("validate_arrays() input must contain 2 or more arrays")
    first = arrays[0]
    for other in arrays[1:]:
        if tuple(first.data.shape) != tuple(other.data.shape):
            raise ValueError("input arrays must have equal shapes")


# ---------------------------------------------------------------------------
# Unit heuristics (reference: utils.py:455-599)
# ---------------------------------------------------------------------------

_LINEAR_UNITS = (
    "m", "meter", "metre", "meters", "metres",
    "km", "kilometer", "kilometre", "kilometers", "kilometres",
    "ft", "foot", "feet",
)

Z_UNITS = {
    'meter': 1.0, 'meters': 1.0, 'm': 1.0,
    'foot': 0.3048, 'feet': 0.3048, 'ft': 0.3048,
    'kilometer': 1000.0, 'kilometers': 1000.0, 'km': 1000.0,
    'mile': 1609.344, 'miles': 1609.344, 'mi': 1609.344,
}


def _infer_coord_unit_type(coord, cellsize: float) -> str:
    """Classify a coordinate axis as 'degrees' | 'linear' | 'unknown'."""
    units = str(coord.attrs.get("units", "")).lower()
    if "degree" in units or units in ("deg", "degrees"):
        return "degrees"
    if units in _LINEAR_UNITS:
        return "linear"

    vals = np.asarray(coord.data)
    if vals.size < 2 or not np.issubdtype(vals.dtype, np.number):
        return "unknown"
    vmin, vmax = float(np.nanmin(vals)), float(np.nanmax(vals))
    span, dx = abs(vmax - vmin), abs(float(cellsize))
    if -360.0 <= vmin <= 360.0 and -360.0 <= vmax <= 360.0 and 1e-5 <= dx <= 0.5:
        return "degrees"
    if span > 1000.0 and dx >= 0.1:
        return "linear"
    return "unknown"


def _sample_windows_min_max(data, max_window_elems: int = 65536,
                            windows: int = 5) -> Tuple[float, float]:
    """Sampled min/max from a few windows, never a full pass.

    Reference: utils.py:731 (same intent — cheap bound estimates).
    """
    flat = data.reshape(-1)
    n = flat.size
    if n == 0:
        return np.nan, np.nan
    win = min(max_window_elems, n)
    starts = np.linspace(0, max(n - win, 0), num=max(windows, 1)).astype(np.int64)
    vmin, vmax = np.inf, -np.inf
    for s in starts:
        # fetch only the sampled window: np.asarray of the FULL payload
        # costs ~1.3 s per 64 MB through the device tunnel
        chunk = np.asarray(flat[int(s):int(s) + win])
        finite = chunk[np.isfinite(chunk)] if chunk.dtype.kind == "f" else chunk
        if finite.size:
            vmin = min(vmin, float(finite.min()))
            vmax = max(vmax, float(finite.max()))
    if vmin is np.inf:
        return np.nan, np.nan
    return vmin, vmax


def _infer_vertical_unit_type(agg) -> str:
    units = str(agg.attrs.get("units", "")).lower()
    if any(k in units for k in ("degree", "deg")) or "rad" in units:
        return "angle"
    if units in _LINEAR_UNITS:
        return "elevation"
    try:
        vmin, vmax = _sample_windows_min_max(agg.data)
    except Exception:
        return "unknown"
    if not (np.isfinite(vmin) and np.isfinite(vmax)):
        return "unknown"
    span = vmax - vmin
    if 10.0 <= span <= 20000.0 and vmin > -500.0:
        return "elevation"
    if -360.0 <= vmin <= 360.0 and -360.0 <= vmax <= 360.0 and span <= 720.0:
        return "angle"
    return "unknown"


def warn_if_unit_mismatch(agg) -> None:
    """Warn when coordinates look like degrees but elevations look linear.

    Reference: utils.py:540-590.
    """
    try:
        cellsize_x, cellsize_y = get_dataarray_resolution(agg)
    except Exception:
        return
    if len(agg.dims) < 2:
        return
    dim_y, dim_x = agg.dims[-2], agg.dims[-1]
    coord_x = agg.coords.get(dim_x) if hasattr(agg.coords, "get") else None
    coord_y = agg.coords.get(dim_y) if hasattr(agg.coords, "get") else None
    if coord_x is None and dim_x in agg.coords:
        coord_x = agg.coords[dim_x]
    if coord_y is None and dim_y in agg.coords:
        coord_y = agg.coords[dim_y]
    if coord_x is None or coord_y is None:
        return
    horiz = {_infer_coord_unit_type(coord_x, cellsize_x),
             _infer_coord_unit_type(coord_y, cellsize_y)} - {"unknown"}
    vert = _infer_vertical_unit_type(agg)
    if not horiz or vert == "unknown":
        return
    if "degrees" in horiz and vert == "elevation":
        warnings.warn(
            "input DataArray appears to have coordinates in degrees but "
            "elevation values in a linear unit (e.g. meters/feet). "
            "Slope/aspect operations expect horizontal distances in the same "
            "units as vertical. Consider reprojecting to a projected CRS "
            "with meter-based coordinates.",
            UserWarning,
        )


# ---------------------------------------------------------------------------
# Lat/lon extraction for geodesic methods (reference: utils.py:602-714)
# ---------------------------------------------------------------------------

_LAT_NAMES = {"lat", "latitude", "y"}
_LON_NAMES = {"lon", "longitude", "x"}


def _find_coord(agg, dim_name, known_names, label):
    if dim_name in agg.coords:
        coord = agg.coords[dim_name]
        if np.issubdtype(np.asarray(coord.data).dtype, np.number):
            return coord
    for name in agg.coords:
        if str(name).lower() in known_names:
            coord = agg.coords[name]
            if np.issubdtype(np.asarray(coord.data).dtype, np.number):
                return coord
    raise ValueError(
        f"geodesic method requires a numeric {label} coordinate; "
        f"none found among {list(agg.coords)}")


def _validate_geographic_range(lat_2d, lon_2d):
    if np.nanmin(lat_2d) < -90.0 or np.nanmax(lat_2d) > 90.0:
        raise ValueError("latitude values must be within [-90, 90] degrees")
    if np.nanmin(lon_2d) < -180.0 or np.nanmax(lon_2d) > 360.0:
        raise ValueError("longitude values must be within [-180, 360] degrees")


def _extract_latlon_coords(agg):
    """2-D float64 (lat, lon) grids from 1-D or 2-D coordinates."""
    if agg.ndim < 2:
        raise ValueError(
            f"geodesic method requires a 2-D DataArray, got {agg.ndim}-D")
    dim_y, dim_x = agg.dims[-2], agg.dims[-1]
    lat_vals = np.asarray(_find_coord(agg, dim_y, _LAT_NAMES, "latitude").data,
                          dtype=np.float64)
    lon_vals = np.asarray(_find_coord(agg, dim_x, _LON_NAMES, "longitude").data,
                          dtype=np.float64)
    h, w = agg.shape[-2], agg.shape[-1]
    if lat_vals.ndim == 1 and lon_vals.ndim == 1:
        lat_2d = np.broadcast_to(lat_vals[:, None], (h, w)).copy()
        lon_2d = np.broadcast_to(lon_vals[None, :], (h, w)).copy()
    elif lat_vals.ndim == 2 and lon_vals.ndim == 2:
        lat_2d, lon_2d = lat_vals, lon_vals
    else:
        raise ValueError(
            f"lat/lon coordinates must be both 1-D or both 2-D, "
            f"got lat={lat_vals.ndim}-D and lon={lon_vals.ndim}-D")
    _validate_geographic_range(lat_2d, lon_2d)
    return lat_2d, lon_2d


# ---------------------------------------------------------------------------
# JAX adapters — the single-backend replacement for ArrayTypeFunctionMapping
# ---------------------------------------------------------------------------

class x64:
    """Context manager enabling float64 for ops that need it.

    Global ``jax_enable_x64`` breaks Pallas/Mosaic TPU compilation, so f64
    ops (geodesic, focal mean, viewshed) opt in locally.  Uses
    ``jax.enable_x64`` under the hood.
    """

    def __enter__(self):
        self._cm = jax.enable_x64(True)
        self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        return self._cm.__exit__(*exc)


def to_jax(agg, dtype=jnp.float32) -> jax.Array:
    """Coerce a DataArray's payload to a device array of `dtype`."""
    data = agg.data if isinstance(agg, DataArray) else agg
    arr = jnp.asarray(data)
    if dtype is not None and arr.dtype != dtype:
        arr = arr.astype(dtype)
    return arr


def wrap_like(agg, out, name: Optional[str] = None) -> DataArray:
    """Wrap an output array with the input's coords/dims/attrs.

    The universal output contract of every reference op (e.g.
    slope.py:367-371, aspect.py:384-388).
    """
    return DataArray(out, name=name, coords=agg.coords, dims=agg.dims,
                     attrs=agg.attrs)


def canvas_like(raster, width: int = 512, height: Optional[int] = None,
                x_range: Optional[tuple] = None,
                y_range: Optional[tuple] = None, layer=None):
    """Resample a raster onto a canvas grid (nearest neighbor).

    Reimplements the reference's datashader-backed ``canvas_like``
    (utils.py:374-443) without datashader: output pixel centers follow the
    Canvas convention and each samples the nearest input cell.  The gather
    is separable (whole-row then whole-column takes), which TPUs handle
    efficiently — unlike per-element gathers.
    """
    if raster.ndim == 3 and layer is not None:
        raster = raster.sel({raster.dims[0]: layer})
    ydim, xdim = raster.dims[-2], raster.dims[-1]
    x_coords = np.asarray(raster[xdim].data, dtype=np.float64)
    y_coords = np.asarray(raster[ydim].data, dtype=np.float64)
    if x_range is None:
        x_range = (float(x_coords.min()), float(x_coords.max()))
    if y_range is None:
        y_range = (float(y_coords.min()), float(y_coords.max()))
    if height is None:
        height = height_implied_by_aspect_ratio(width, x_range, y_range)

    # output pixel centers (Canvas convention)
    dx = (x_range[1] - x_range[0]) / width
    dy = (y_range[1] - y_range[0]) / height
    out_x = x_range[0] + dx * (np.arange(width) + 0.5)
    out_y = y_range[0] + dy * (np.arange(height) + 0.5)

    # nearest-neighbor source indices (host: coords are 1-D)
    xi = np.abs(out_x[None, :] - x_coords[:, None]).argmin(axis=0)
    yi = np.abs(out_y[None, :] - y_coords[:, None]).argmin(axis=0)
    # orient output like datashader (y ascending)
    data = jnp.asarray(raster.data)
    resampled = jnp.take(jnp.take(data, jnp.asarray(yi), axis=-2),
                         jnp.asarray(xi), axis=-1)

    out = DataArray(resampled, name=raster.name,
                    dims=raster.dims, attrs=dict(raster.attrs))
    for cname, cval in raster.coords.items():
        if cname not in (ydim, xdim):
            out.coords[cname] = cval
    out.coords[ydim] = out_y
    out.coords[xdim] = out_x
    out.attrs["res"] = (dx, dy)
    return out


def nan_border(arr: jax.Array, radius: int = 1) -> jax.Array:
    """Set a `radius`-wide border to NaN (stencil edge contract).

    Reference contract: slope.py:59-61, hillshade.py:33-34,
    convolution.py:297-298.
    """
    if radius <= 0:
        return arr
    h, w = arr.shape[-2], arr.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((rows >= radius) & (rows < h - radius)
                & (cols >= radius) & (cols < w - radius))
    return jnp.where(interior, arr, jnp.nan)


# ---------------------------------------------------------------------------
# Backend predicates + image helpers (reference utils.py:34-115, 363-452)
# ---------------------------------------------------------------------------
# The reference's 4-backend dispatch (numpy/cupy/dask/dask-cupy) does not
# exist here — the single JAX/TPU backend replaces it by design — but
# user code ported from the reference commonly imports these predicates,
# so they exist with the truthful single-backend answers.

def has_cuda_and_cupy() -> bool:
    """Always False: this build targets TPU via JAX (reference
    utils.py:34-35 probes CUDA+cupy)."""
    return False


def is_cupy_array(arr) -> bool:
    """Always False (reference utils.py:42-43)."""
    return False


def has_dask_array() -> bool:
    """Always False: distribution happens via jax.sharding meshes, not
    dask (reference utils.py:46-47)."""
    return False


def has_dask_dataframe() -> bool:
    """Always False (reference utils.py:50-51)."""
    return False


def is_cupy_backed(agg) -> bool:
    """Always False (reference utils.py:90-95)."""
    return False


def is_dask_cupy(agg) -> bool:
    """Always False (reference utils.py:98-103)."""
    return False


def cuda_args(shape):
    """Unavailable: there is no CUDA launch geometry on TPU; kernels are
    Pallas/XLA programs (reference utils.py:58-87)."""
    raise NotImplementedError(
        "cuda_args is not applicable to the TPU backend: compiled "
        "kernels are Pallas/XLA programs with no CUDA launch geometry.")


def calc_cuda_dims(shape):
    """Unavailable on TPU — see cuda_args (reference utils.py:58-87)."""
    raise NotImplementedError(
        "calc_cuda_dims is not applicable to the TPU backend.")


def not_implemented_func(agg, *args, messages='Not yet implemented.'):
    """Raise NotImplementedError (reference utils.py:113-114)."""
    raise NotImplementedError(messages)


def bands_to_img(r, g, b, nodata=1):
    """Combine three band rasters into an RGBA uint32 image.

    Reference utils.py:363-371 returns a datashader ``tf.Image``;
    datashader is not a dependency here, so the packed RGBA image is
    returned as a uint32 DataArray (the same array a datashader Image
    wraps).  Alpha is 0 where the red band is NaN or <= nodata, else
    255.
    """
    r = np.asarray(r, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        a = np.where(np.logical_or(np.isnan(r), r <= nodata), 0, 255)
        data = (r.astype(np.uint32) & 0xFF) \
            | (g.astype(np.uint32) & 0xFF) << 8 \
            | (b.astype(np.uint32) & 0xFF) << 16 \
            | a.astype(np.uint32) << 24
    return DataArray(data, dims=("y", "x"), name="image")


# minimal CSS color table for color_values (the reference delegates to
# datashader.colors.rgb; these cover its documented examples)
_CSS_COLORS = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 128, 0), "lime": (0, 255, 0), "blue": (0, 0, 255),
    "yellow": (255, 255, 0), "cyan": (0, 255, 255), "aqua": (0, 255, 255),
    "magenta": (255, 0, 255), "fuchsia": (255, 0, 255),
    "gray": (128, 128, 128), "grey": (128, 128, 128),
    "silver": (192, 192, 192), "maroon": (128, 0, 0),
    "olive": (128, 128, 0), "navy": (0, 0, 128), "teal": (0, 128, 128),
    "purple": (128, 0, 128), "orange": (255, 165, 0),
    "brown": (165, 42, 42), "pink": (255, 192, 203),
}


def _rgb(c):
    """(r, g, b) from a color name, '#rrggbb' hex string, or 3-tuple
    (subset of datashader.colors.rgb the reference relies on)."""
    if isinstance(c, (tuple, list)) and len(c) == 3:
        return tuple(int(v) for v in c)
    if isinstance(c, str):
        s = c.strip().lower()
        if s.startswith("#") and len(s) == 7:
            return tuple(int(s[i:i + 2], 16) for i in (1, 3, 5))
        if s in _CSS_COLORS:
            return _CSS_COLORS[s]
    raise ValueError(f"don't know how to convert color {c!r}")


def color_values(agg, color_key, alpha=255):
    """Color a categorical aggregate by a value->color mapping.

    Reference utils.py:445-452 (returns a datashader ``tf.Image``; here
    the packed RGBA uint32 raster is returned as a DataArray — values
    missing from ``color_key`` map to 0, i.e. transparent).
    """
    data = np.asarray(agg.data if isinstance(agg, DataArray) else agg)
    out = np.zeros(data.shape, dtype=np.uint32)
    for val, color in color_key.items():
        r, g, b = _rgb(color)
        packed = np.uint32(r | (g << 8) | (b << 16) | (alpha << 24))
        out = np.where(data == val, packed, out)
    return DataArray(out, dims=("y", "x")[:out.ndim], name="image")
