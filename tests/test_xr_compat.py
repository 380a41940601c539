"""Tests for the bundled xarray-compatible data model."""

import numpy as np
import pytest

from general_checks import create_test_raster

from xrspatial_tpu import DataArray, Dataset, concat, slope
from xrspatial_tpu.diagnostics import diagnose


def test_dataarray_basics():
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    da = DataArray(data, dims=("y", "x"), name="z", attrs={"res": (1, 1)})
    assert da.shape == (3, 4)
    assert da.dims == ("y", "x")
    assert da.name == "z"
    assert da.attrs["res"] == (1, 1)
    assert da.sizes == {"y": 3, "x": 4}
    np.testing.assert_array_equal(da.values, data)


def test_dataarray_default_dims():
    da = DataArray(np.zeros((2, 3)))
    assert da.dims == ("dim_0", "dim_1")


def test_coord_assignment_and_attrs():
    da = DataArray(np.zeros((3, 4)), dims=("y", "x"))
    da["y"] = np.array([2.0, 1.0, 0.0])
    da["x"] = np.array([0.0, 1.0, 2.0, 3.0])
    da["y"].attrs["units"] = "m"
    assert list(da.coords) == ["y", "x"]
    assert da["y"].attrs["units"] == "m"
    np.testing.assert_array_equal(da["y"].values, [2.0, 1.0, 0.0])


def test_coords_propagate_through_ops(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    out = slope(agg)
    assert list(out.coords) == list(agg.coords)
    np.testing.assert_array_equal(out["y"].values, agg["y"].values)
    assert out["y"].attrs.get("units") == "m"


def test_arithmetic_keeps_coords():
    agg = create_test_raster(np.ones((4, 5), dtype=np.float32))
    doubled = agg * 2 + 1
    assert doubled.dims == agg.dims
    np.testing.assert_array_equal(doubled.values, 3 * np.ones((4, 5)))
    assert list(doubled.coords) == list(agg.coords)


def test_equals_and_copy():
    agg = create_test_raster(np.random.default_rng(0).random((4, 4)))
    dup = agg.copy(deep=True)
    assert agg.equals(dup)
    dup.data = np.asarray(dup.data) + 1
    assert not agg.equals(dup)


def test_isel_sel():
    agg = create_test_raster(np.arange(20, dtype=float).reshape(4, 5),
                             attrs={"res": (1, 1)})
    sub = agg.isel({"y": slice(1, 3)})
    assert sub.shape == (2, 5)
    np.testing.assert_array_equal(sub["y"].values, agg["y"].values[1:3])
    picked = agg.sel(y=agg["y"].values[2], method="nearest")
    assert picked.shape == (5,)


def test_dataset_roundtrip():
    a = create_test_raster(np.ones((3, 3)), name="a")
    b = create_test_raster(np.zeros((3, 3)), name="b")
    ds = Dataset({"a": a, "b": b}, attrs={"src": "test"})
    assert set(ds.data_vars) == {"a", "b"}
    assert ds.attrs["src"] == "test"
    assert ds["a"].name == "a"
    for var in ds:
        assert var in ("a", "b")


def test_dataset_support_decorator():
    from xrspatial_tpu.dataset_support import supports_dataset

    @supports_dataset
    def double(agg, name=None):
        out = agg.copy()
        out.data = np.asarray(agg.data) * 2
        out.name = name
        return out

    ds = Dataset({"u": create_test_raster(np.ones((2, 2)), name="u"),
                  "v": create_test_raster(np.full((2, 2), 3.0), name="v")})
    out = double(ds)
    assert isinstance(out, Dataset)
    np.testing.assert_array_equal(out["v"].values, np.full((2, 2), 6.0))
    assert out["v"].name == "v"


def test_concat_new_dim():
    arrs = [create_test_raster(np.full((2, 3), i), name=f"s{i}")
            for i in range(3)]
    out = concat(arrs, dim="stats")
    assert out.shape == (3, 2, 3)
    assert out.dims == ("stats", "y", "x")
    np.testing.assert_array_equal(np.asarray(out["stats"].data),
                                  np.asarray(["s0", "s1", "s2"]))


def test_diagnose_unit_mismatch():
    data = np.random.default_rng(1).random((50, 50)) * 1000 + 500
    da = DataArray(data, dims=["y", "x"])
    da["y"] = np.linspace(40.0, 41.0, 50)
    da["x"] = np.linspace(-105.0, -104.0, 50)
    report = diagnose(da)
    assert report.has_warnings
    assert report.issues[0].code == "UNIT_MISMATCH"


def test_diagnose_clean():
    agg = create_test_raster(np.random.default_rng(1).random((20, 20)))
    report = diagnose(agg)
    assert not report.has_issues
    assert str(report) == "No issues detected."


def test_assign_attrs_coords_where_fillna():
    import numpy as np

    from xrspatial_tpu import DataArray
    da = DataArray(np.array([[1.0, np.nan], [3.0, 4.0]]), dims=("y", "x"))
    da2 = da.assign_attrs({"a": 1}, b=2)
    assert da2.attrs == {"a": 1, "b": 2} and da.attrs == {}
    da3 = da.assign_coords(y=[10.0, 20.0])
    np.testing.assert_array_equal(da3["y"].values, [10.0, 20.0])
    filled = da.fillna(0.0)
    np.testing.assert_array_equal(filled.values, [[1.0, 0.0], [3.0, 4.0]])
    masked = da.where(da > 2)
    assert np.isnan(masked.values[0, 0])
    assert masked.values[1, 1] == 4.0


def test_reduction_dim_and_axis():
    da = DataArray(np.arange(12, dtype=np.float32).reshape(3, 4),
                   dims=("y", "x"))
    m = da.mean(dim="y")
    assert m.shape == (4,) and m.dims == ("x",)
    np.testing.assert_allclose(np.asarray(m.data), [4., 5., 6., 7.])
    s = da.sum(axis=1)
    assert s.shape == (3,) and s.dims == ("y",)
    # full reduction still works
    assert float(da.max().data) == 11.0
    with pytest.raises(ValueError):
        da.mean(dim="z")


def test_getitem_ellipsis_dims():
    d3 = DataArray(np.zeros((2, 3, 4), np.float32), dims=("b", "y", "x"))
    d3["y"] = np.arange(3.0)
    d3["x"] = np.arange(4.0)
    out = d3[..., 0]
    assert out.dims == ("b", "y")
    np.testing.assert_array_equal(np.asarray(out["y"].data), np.arange(3.0))
    assert "x" not in out.coords
    out2 = d3[0, ...]
    assert out2.dims == ("y", "x")


def test_concat_existing_dim_keeps_coord():
    a = DataArray(np.zeros((2, 3), np.float32), dims=("y", "x"))
    a["y"] = np.array([0.0, 1.0])
    a["x"] = np.arange(3.0)
    b = DataArray(np.ones((2, 3), np.float32), dims=("y", "x"))
    b["y"] = np.array([2.0, 3.0])
    b["x"] = np.arange(3.0)
    out = concat([a, b], "y")
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(out["y"].data),
                                  [0.0, 1.0, 2.0, 3.0])
