"""Multispectral band indices and true-color compositing.

TPU-native counterpart of reference ``xrspatial/multispectral.py``: every
index there carries four near-identical backends (Numba CPU loop, CUDA
kernel, dask, dask+cupy quadruples, e.g. arvi :29-77) — here each is one
fused jnp expression under jit; XLA fuses the whole index into a single
VMEM-tiled elementwise pass.  Semantics preserved: float32 compute,
zero-denominator cells produce NaN (the reference leaves the NaN-
initialized output untouched), coords/attrs taken from the reference's
designated source band.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from .dataset_support import supports_dataset_bands
from .utils import to_jax, validate_arrays, wrap_like
from .xrlib import DataArray

__all__ = ["arvi", "evi", "gci", "nbr", "nbr2", "ndvi", "ndmi", "savi",
           "sipi", "ebbi", "true_color"]


def _guard(denominator, value):
    """NaN where the denominator is exactly 0 (reference convention)."""
    return jnp.where(denominator == 0.0, jnp.nan, value)


@jax.jit
def _arvi_jit(nir, red, blue):
    num = nir - 2.0 * red + blue
    den = nir + 2.0 * red + blue
    return _guard(den, num / jnp.where(den == 0.0, 1.0, den))


@jax.jit
def _evi_jit(nir, red, blue, c1, c2, soil_factor, gain):
    num = nir - red
    den = nir + c1 * red - c2 * blue + soil_factor
    return _guard(den, gain * (num / jnp.where(den == 0.0, 1.0, den)))


@jax.jit
def _gci_jit(nir, green):
    return _guard(green, nir / jnp.where(green == 0.0, 1.0, green) - 1.0)


@jax.jit
def _normalized_ratio_jit(a, b):
    den = a + b
    return _guard(den, (a - b) / jnp.where(den == 0.0, 1.0, den))


@jax.jit
def _savi_jit(nir, red, soil_factor):
    num = nir - red
    den = (nir + red + soil_factor) * (1.0 + soil_factor)
    return _guard(den, num / jnp.where(den == 0.0, 1.0, den))


@jax.jit
def _sipi_jit(nir, red, blue):
    den = nir - red
    return _guard(den, (nir - blue) / jnp.where(den == 0.0, 1.0, den))


@jax.jit
def _ebbi_jit(red, swir, tir):
    den = 10.0 * jnp.sqrt(swir + tir)
    return _guard(den, (swir - red) / jnp.where(den == 0.0, 1.0, den))


@supports_dataset_bands(nir='nir_agg', red='red_agg', blue='blue_agg')
def arvi(nir_agg, red_agg, blue_agg, name='arvi') -> DataArray:
    """Atmospherically Resistant Vegetation Index:
    ``(nir - 2*red + blue) / (nir + 2*red + blue)``."""
    validate_arrays(red_agg, nir_agg, blue_agg)
    out = _arvi_jit(to_jax(nir_agg), to_jax(red_agg), to_jax(blue_agg))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(nir='nir_agg', red='red_agg', blue='blue_agg')
def evi(nir_agg, red_agg, blue_agg, c1=6.0, c2=7.5, soil_factor=1.0,
        gain=2.5, name='evi') -> DataArray:
    """Enhanced Vegetation Index:
    ``gain * (nir - red) / (nir + c1*red - c2*blue + soil_factor)``."""
    if not isinstance(c1, (float, int)):
        raise ValueError("c1 must be numeric")
    if not isinstance(c2, (float, int)):
        raise ValueError("c2 must be numeric")
    if soil_factor > 1.0 or soil_factor < -1.0:
        raise ValueError("soil factor must be between [-1.0, 1.0]")
    if gain < 0:
        raise ValueError("gain must be greater than 0")
    validate_arrays(nir_agg, red_agg, blue_agg)
    out = _evi_jit(to_jax(nir_agg), to_jax(red_agg), to_jax(blue_agg),
                   jnp.float32(c1), jnp.float32(c2),
                   jnp.float32(soil_factor), jnp.float32(gain))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(nir='nir_agg', green='green_agg')
def gci(nir_agg, green_agg, name='gci') -> DataArray:
    """Green Chlorophyll Index: ``nir / green - 1``."""
    validate_arrays(nir_agg, green_agg)
    out = _gci_jit(to_jax(nir_agg), to_jax(green_agg))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(nir='nir_agg', swir2='swir2_agg')
def nbr(nir_agg, swir2_agg, name='nbr') -> DataArray:
    """Normalized Burn Ratio: ``(nir - swir2) / (nir + swir2)``."""
    validate_arrays(nir_agg, swir2_agg)
    out = _normalized_ratio_jit(to_jax(nir_agg), to_jax(swir2_agg))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(swir1='swir1_agg', swir2='swir2_agg')
def nbr2(swir1_agg, swir2_agg, name='nbr2') -> DataArray:
    """Normalized Burn Ratio 2: ``(swir1 - swir2) / (swir1 + swir2)``."""
    validate_arrays(swir1_agg, swir2_agg)
    out = _normalized_ratio_jit(to_jax(swir1_agg), to_jax(swir2_agg))
    return wrap_like(swir1_agg, out, name)


@supports_dataset_bands(nir='nir_agg', red='red_agg')
def ndvi(nir_agg, red_agg, name='ndvi') -> DataArray:
    """Normalized Difference Vegetation Index:
    ``(nir - red) / (nir + red)``."""
    validate_arrays(nir_agg, red_agg)
    out = _normalized_ratio_jit(to_jax(nir_agg), to_jax(red_agg))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(nir='nir_agg', swir1='swir1_agg')
def ndmi(nir_agg, swir1_agg, name='ndmi') -> DataArray:
    """Normalized Difference Moisture Index:
    ``(nir - swir1) / (nir + swir1)``."""
    validate_arrays(nir_agg, swir1_agg)
    out = _normalized_ratio_jit(to_jax(nir_agg), to_jax(swir1_agg))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(nir='nir_agg', red='red_agg')
def savi(nir_agg, red_agg, soil_factor=1.0, name='savi') -> DataArray:
    """Soil Adjusted Vegetation Index:
    ``(nir - red) / ((nir + red + sf) * (1 + sf))``."""
    validate_arrays(red_agg, nir_agg)
    if not -1.0 <= soil_factor <= 1.0:
        raise ValueError("soil factor must be between [-1.0, 1.0]")
    out = _savi_jit(to_jax(nir_agg), to_jax(red_agg),
                    jnp.float32(soil_factor))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(nir='nir_agg', red='red_agg', blue='blue_agg')
def sipi(nir_agg, red_agg, blue_agg, name='sipi') -> DataArray:
    """Structure Insensitive Pigment Index:
    ``(nir - blue) / (nir - red)``."""
    validate_arrays(red_agg, nir_agg, blue_agg)
    out = _sipi_jit(to_jax(nir_agg), to_jax(red_agg), to_jax(blue_agg))
    return wrap_like(nir_agg, out, name)


@supports_dataset_bands(red='red_agg', swir='swir_agg', tir='tir_agg')
def ebbi(red_agg, swir_agg, tir_agg, name='ebbi') -> DataArray:
    """Enhanced Built-Up and Bareness Index:
    ``(swir - red) / (10 * sqrt(swir + tir))``."""
    validate_arrays(red_agg, swir_agg, tir_agg)
    out = _ebbi_jit(to_jax(red_agg), to_jax(swir_agg), to_jax(tir_agg))
    return wrap_like(red_agg, out, name)


@jax.jit
def _normalize_sigmoid_jit(data, pixel_max, c, th):
    """Global min-max normalize + sigmoid contrast enhancement.

    Matches reference multispectral.py:1286-1341 (all-equal input keeps
    the NaN initialization).
    """
    min_val = jnp.nanmin(data)
    max_val = jnp.nanmax(data)
    rng = max_val - min_val
    norm = (data - min_val) / jnp.where(rng == 0.0, 1.0, rng)
    norm = 1.0 / (1.0 + jnp.exp(c * (th - norm)))
    return jnp.where(rng == 0.0, jnp.nan, norm * pixel_max)


@jax.jit
def _true_color_jit(r, g, b, nodata, c, th):
    pixel_max = jnp.float32(255.0)
    alpha = jnp.where(jnp.isnan(r) | (r <= nodata), 0, 255)
    channels = [
        _normalize_sigmoid_jit(band, pixel_max, c, th)
        for band in (r, g, b)
    ]
    out = jnp.stack(
        [ch.astype(jnp.uint8) for ch in channels]
        + [alpha.astype(jnp.uint8)], axis=-1)
    return out


def true_color(r, g, b, nodata=1, c=10.0, th=0.125,
               name='true_color') -> DataArray:
    """RGBA true-color composite with sigmoid contrast enhancement.

    ``normalized = 1 / (1 + exp(c * (th - normalized)))``; output is a
    (y, x, band) uint8 DataArray; alpha = 0 on nodata/NaN cells.
    """
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        out = _true_color_jit(to_jax(r), to_jax(g), to_jax(b),
                              jnp.float32(nodata), jnp.float32(c),
                              jnp.float32(th))

    coords = {'band': [0, 1, 2, 3]}
    for d in ('y', 'x'):
        if d in r.coords:
            coords[d] = r[d]
    return DataArray(out, name=name, dims=['y', 'x', 'band'],
                     coords=coords, attrs=dict(r.attrs))
