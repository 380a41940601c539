"""Shared test harness (mirror of the reference's tests/general_checks.py).

The golden oracle is ``tests/reference_impl.py`` — independent, loop-based
numpy implementations of each op's reference semantics — with the same
rtol=1e-6 allclose contract the reference used between backends.
"""

from __future__ import annotations

import jax
import numpy as np

from xrspatial_tpu.xrlib import DataArray


def create_test_raster(data, name="myraster", dims=("y", "x"),
                       attrs={"res": (0.5, 0.5), "crs": "EPSG: 5070"}):
    """Build a DataArray with reference-style coords (y descending)."""
    raster = DataArray(np.asarray(data), name=name, dims=dims,
                       attrs=dict(attrs) if attrs else None)
    res = (0.5, 0.5)
    if attrs and "res" in attrs:
        res = attrs["res"]
    raster[dims[0]] = np.linspace((data.shape[0] - 1) * res[0], 0,
                                  data.shape[0])
    raster[dims[1]] = np.linspace(0, (data.shape[1] - 1) * res[1],
                                  data.shape[1])
    raster[dims[0]].attrs["units"] = "m"
    raster[dims[1]].attrs["units"] = "m"
    return raster


def general_output_checks(input_agg, output_agg, expected_results=None,
                          verify_attrs=True, verify_dtype=False, rtol=1e-6):
    # single-backend contract: output payload is a device (jax) array
    assert isinstance(output_agg.data, jax.Array), type(output_agg.data)

    if verify_attrs:
        assert output_agg.shape == input_agg.shape
        assert tuple(output_agg.dims) == tuple(input_agg.dims)
        assert dict(output_agg.attrs) == dict(input_agg.attrs)
        for coord in input_agg.coords:
            np.testing.assert_allclose(
                np.asarray(output_agg[coord].data),
                np.asarray(input_agg[coord].data), equal_nan=True)

    if expected_results is not None:
        out = np.asarray(output_agg.data)
        np.testing.assert_allclose(out, expected_results,
                                   equal_nan=True, rtol=rtol)
        if verify_dtype:
            assert out.dtype == expected_results.dtype


def assert_nan_edges_effect(result_agg, radius=1):
    """Stencil ops must produce a NaN ring of the operator radius."""
    out = np.asarray(result_agg.data)
    assert np.isnan(out[:radius, :]).all()
    assert np.isnan(out[-radius:, :]).all()
    assert np.isnan(out[:, :radius]).all()
    assert np.isnan(out[:, -radius:]).all()


def assert_input_data_unmodified(data_before, data_after):
    assert data_before.equals(data_after)
