"""Dataset passthrough and remaining utils coverage."""

import numpy as np
import pytest

from general_checks import create_test_raster

from xrspatial_tpu import Dataset, quantile, slope
from xrspatial_tpu.focal import hotspots, mean
from xrspatial_tpu.utils import (height_implied_by_aspect_ratio,
                                 lnglat_to_meters, warn_if_unit_mismatch)


def test_slope_on_dataset(elevation_raster_no_nans):
    a = create_test_raster(elevation_raster_no_nans, name="a")
    b = create_test_raster(elevation_raster_no_nans * 2, name="b")
    ds = Dataset({"a": a, "b": b}, attrs={"src": "x"})
    out = slope(ds)
    assert isinstance(out, Dataset)
    assert set(out.data_vars) == {"a", "b"}
    assert out["a"].name == "a"  # name=var via supports_dataset
    assert out.attrs == {"src": "x"}


def test_classify_on_dataset(elevation_raster_no_nans):
    ds = Dataset({"v": create_test_raster(elevation_raster_no_nans,
                                          name="v")})
    out = quantile(ds, k=3)
    assert isinstance(out, Dataset)
    vals = np.asarray(out["v"].data)
    assert set(np.unique(vals[np.isfinite(vals)])) <= {0.0, 1.0, 2.0}


def test_focal_mean_on_dataset(elevation_raster_no_nans):
    ds = Dataset({"v": create_test_raster(elevation_raster_no_nans,
                                          name="v")})
    out = mean(ds)
    assert isinstance(out, Dataset)


def test_hotspots_attrs_unit(raster):
    agg = create_test_raster(raster)
    out = hotspots(agg, np.ones((3, 3)))
    assert out.attrs["unit"] == "%"
    assert agg.attrs.get("unit") is None  # input attrs untouched


def test_lnglat_to_meters():
    e, n = lnglat_to_meters(0.0, 0.0)
    assert e == 0.0 and n == pytest.approx(0.0, abs=1e-6)
    e, n = lnglat_to_meters(180.0, 0.0)
    assert e == pytest.approx(np.pi * 6378137)
    e, n = lnglat_to_meters(np.array([-74.0]), np.array([40.71]))
    assert e[0] == pytest.approx(-8237642.32, rel=1e-4)


def test_height_implied_by_aspect_ratio():
    assert height_implied_by_aspect_ratio(100, (0, 10), (0, 5)) == 50


def test_warn_if_unit_mismatch():
    import warnings

    from xrspatial_tpu import DataArray
    data = np.random.default_rng(0).random((50, 50)) * 1000 + 500
    da = DataArray(data, dims=["y", "x"])
    da["y"] = np.linspace(40.0, 41.0, 50)
    da["x"] = np.linspace(-105.0, -104.0, 50)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        warn_if_unit_mismatch(da)
    assert any("degrees" in str(w.message) for w in rec)

    # clean raster: no warning
    agg = create_test_raster(data.astype(np.float32))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        warn_if_unit_mismatch(agg)
    assert not rec


def test_canvas_like():
    from xrspatial_tpu.utils import canvas_like
    rng = np.random.default_rng(2)
    data = rng.random((20, 40)).astype(np.float32)
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    out = canvas_like(agg, width=20)
    assert out.shape[1] == 20
    assert out.attrs["res"][0] == pytest.approx(
        (np.asarray(agg["x"].data).max() - np.asarray(agg["x"].data).min())
        / 20)
    # downsampling by 2 picks nearest source cells; all values must come
    # from the input
    assert np.isin(np.asarray(out.data), data).all()


def test_canvas_like_identity_size():
    from xrspatial_tpu.utils import canvas_like
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    out = canvas_like(agg, width=4, height=3)
    # y ascending output vs input's descending coords -> rows flipped
    np.testing.assert_array_equal(np.asarray(out.data), data[::-1])


def test_resolution_accepts_numpy_scalars():
    from xrspatial_tpu.utils import get_dataarray_resolution
    from xrspatial_tpu.xrlib import DataArray
    agg = DataArray(np.zeros((4, 5), np.float32), dims=("y", "x"),
                    attrs={"res": (np.float32(5.0), np.int64(7))})
    agg["y"] = np.arange(4.0)
    agg["x"] = np.arange(5.0)
    assert get_dataarray_resolution(agg) == (5.0, 7)
    agg.attrs["res"] = np.float32(2.5)
    assert get_dataarray_resolution(agg) == (2.5, 2.5)
