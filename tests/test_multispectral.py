"""Tests for multispectral band indices."""

import numpy as np
import pytest

from general_checks import create_test_raster, general_output_checks

from xrspatial_tpu import Dataset
from xrspatial_tpu.multispectral import (arvi, ebbi, evi, gci, nbr, nbr2,
                                         ndmi, ndvi, savi, sipi, true_color)
from xrspatial_tpu.xrlib import DataArray


@pytest.fixture
def bands():
    rng = np.random.default_rng(20)
    out = {}
    for name in ["nir", "red", "blue", "green", "swir1", "swir2", "tir"]:
        out[name] = create_test_raster(
            (rng.random((6, 8)) * 2).astype(np.float32), name=name)
    return out


def _np(agg):
    return np.asarray(agg.data)


def test_ndvi(bands):
    out = ndvi(bands["nir"], bands["red"])
    nir, red = _np(bands["nir"]), _np(bands["red"])
    general_output_checks(bands["nir"], out, (nir - red) / (nir + red))
    assert out.name == "ndvi"


def test_ndvi_zero_denominator():
    nir = create_test_raster(np.array([[1.0, 0.0]], dtype=np.float32))
    red = create_test_raster(np.array([[-1.0, 0.0]], dtype=np.float32))
    out = _np(ndvi(nir, red))
    assert np.isnan(out).all()


def test_arvi(bands):
    out = _np(arvi(bands["nir"], bands["red"], bands["blue"]))
    nir, red, blue = (_np(bands[k]) for k in ("nir", "red", "blue"))
    expected = (nir - 2 * red + blue) / (nir + 2 * red + blue)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_evi(bands):
    out = _np(evi(bands["nir"], bands["red"], bands["blue"]))
    nir, red, blue = (_np(bands[k]) for k in ("nir", "red", "blue"))
    expected = 2.5 * (nir - red) / (nir + 6.0 * red - 7.5 * blue + 1.0)
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_evi_validation(bands):
    with pytest.raises(ValueError):
        evi(bands["nir"], bands["red"], bands["blue"], c1="x")
    with pytest.raises(ValueError):
        evi(bands["nir"], bands["red"], bands["blue"], soil_factor=2.0)
    with pytest.raises(ValueError):
        evi(bands["nir"], bands["red"], bands["blue"], gain=-1)


def test_gci(bands):
    out = _np(gci(bands["nir"], bands["green"]))
    expected = _np(bands["nir"]) / _np(bands["green"]) - 1
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_normalized_ratio_family(bands):
    nir, swir1, swir2 = (_np(bands[k]) for k in ("nir", "swir1", "swir2"))
    np.testing.assert_allclose(
        _np(nbr(bands["nir"], bands["swir2"])),
        (nir - swir2) / (nir + swir2), rtol=1e-5)
    np.testing.assert_allclose(
        _np(nbr2(bands["swir1"], bands["swir2"])),
        (swir1 - swir2) / (swir1 + swir2), rtol=1e-5)
    np.testing.assert_allclose(
        _np(ndmi(bands["nir"], bands["swir1"])),
        (nir - swir1) / (nir + swir1), rtol=1e-5)


def test_savi(bands):
    out = _np(savi(bands["nir"], bands["red"], soil_factor=0.5))
    nir, red = _np(bands["nir"]), _np(bands["red"])
    expected = (nir - red) / ((nir + red + 0.5) * 1.5)
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    with pytest.raises(ValueError):
        savi(bands["nir"], bands["red"], soil_factor=3.0)


def test_sipi(bands):
    out = _np(sipi(bands["nir"], bands["red"], bands["blue"]))
    nir, red, blue = (_np(bands[k]) for k in ("nir", "red", "blue"))
    np.testing.assert_allclose(out, (nir - blue) / (nir - red), rtol=2e-5)


def test_ebbi(bands):
    out = _np(ebbi(bands["red"], bands["swir1"], bands["tir"]))
    red, swir, tir = (_np(bands[k]) for k in ("red", "swir1", "tir"))
    expected = (swir - red) / (10.0 * np.sqrt(swir + tir))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_shape_mismatch_raises(bands):
    small = create_test_raster(np.ones((3, 3), dtype=np.float32))
    with pytest.raises(ValueError):
        ndvi(bands["nir"], small)


def test_dataset_band_aliases(bands):
    ds = Dataset({"B8": bands["nir"], "B4": bands["red"]})
    out = ndvi(ds, nir="B8", red="B4")
    nir, red = _np(bands["nir"]), _np(bands["red"])
    np.testing.assert_allclose(_np(out), (nir - red) / (nir + red),
                               rtol=1e-5)
    with pytest.raises(TypeError):
        ndvi(ds, nir="B8")
    with pytest.raises(ValueError):
        ndvi(ds, nir="B8", red="nope")


def test_true_color(bands):
    out = true_color(bands["red"], bands["green"], bands["blue"], nodata=0)
    data = _np(out)
    assert data.shape == (6, 8, 4)
    assert data.dtype == np.uint8
    assert out.dims == ("y", "x", "band")
    assert (data[:, :, 3] == 255).all()  # no nodata cells
    # sigmoid normalization reproduces the reference formula
    r = _np(bands["red"]).astype(np.float32)
    norm = (r - r.min()) / (r.max() - r.min())
    expected_r = (1 / (1 + np.exp(10.0 * (0.125 - norm))) * 255)
    np.testing.assert_allclose(data[:, :, 0], expected_r.astype(np.uint8),
                               atol=1)


def test_true_color_nodata_alpha(bands):
    red = bands["red"].copy(deep=True)
    vals = np.asarray(red.data).copy()
    vals[0, 0] = np.nan
    vals[1, 1] = -5.0
    red.data = vals
    out = _np(true_color(red, bands["green"], bands["blue"], nodata=-1))
    assert out[0, 0, 3] == 0
    assert out[1, 1, 3] == 0
    assert out[2, 2, 3] == 255


def test_uint_dtype_bands():
    """Integer (uint16 sentinel-style) bands must compute in float and
    return float32 (reference test_multispectral.py uint-dtype cases)."""
    rng = np.random.default_rng(0)
    nir_u = (rng.random((4, 5)) * 10000).astype(np.uint16)
    red_u = (rng.random((4, 5)) * 10000).astype(np.uint16)
    nir = DataArray(nir_u, dims=("y", "x"))
    red = DataArray(red_u, dims=("y", "x"))
    out = np.asarray(ndvi(nir, red).data)
    assert out.dtype == np.float32
    expected = ((nir_u.astype(np.float64) - red_u)
                / (nir_u.astype(np.float64) + red_u))
    np.testing.assert_allclose(out, expected, atol=1e-6)
    sv = np.asarray(savi(nir, red).data)
    assert sv.dtype == np.float32 and np.isfinite(sv).all()


def test_savi_soil_factor_domain():
    """soil_factor outside [-1, 1] raises (reference contract)."""
    rng = np.random.default_rng(1)
    nir = DataArray(rng.random((3, 3)).astype(np.float32), dims=("y", "x"))
    red = DataArray(rng.random((3, 3)).astype(np.float32), dims=("y", "x"))
    with pytest.raises(ValueError):
        savi(nir, red, soil_factor=2.0)
    with pytest.raises(ValueError):
        savi(nir, red, soil_factor=-1.5)


def test_zero_bands_yield_nan_not_inf():
    """0/0 denominators produce NaN (never +-inf) across the
    normalized-ratio family."""
    z = DataArray(np.zeros((3, 3), np.float32), dims=("y", "x"))
    for fn in (ndvi, nbr, ndmi):
        out = np.asarray(fn(z, z).data)
        assert np.isnan(out).all() or not np.isinf(out).any()


def test_ndvi_range_contract():
    """NDVI of positive bands lies in [-1, 1] (reference
    test_ndvi_data_contains_valid_values)."""
    rng = np.random.default_rng(7)
    nir = DataArray((rng.random((16, 16)) * 9 + 0.5).astype(np.float32),
                    dims=("y", "x"))
    red = DataArray((rng.random((16, 16)) * 9 + 0.5).astype(np.float32),
                    dims=("y", "x"))
    out = np.asarray(ndvi(nir, red).data)
    assert (out >= -1.0).all() and (out <= 1.0).all()
