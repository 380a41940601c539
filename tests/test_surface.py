"""Parity + contract tests for slope / aspect / curvature / hillshade."""

import numpy as np
import pytest

from general_checks import (assert_input_data_unmodified,
                            assert_nan_edges_effect, create_test_raster,
                            general_output_checks)
from reference_impl import ref_aspect, ref_curvature, ref_hillshade, ref_slope

from xrspatial_tpu import aspect, curvature, hillshade, slope
from xrspatial_tpu.analytics import summarize_terrain


# ---------------------------------------------------------------------------
# slope
# ---------------------------------------------------------------------------

def test_slope_parity(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    out = slope(agg)
    expected = ref_slope(elevation_raster_no_nans, 0.5, 0.5)
    general_output_checks(agg, out, expected)
    assert out.name == "slope"
    assert_nan_edges_effect(out)


def test_slope_nan_propagation(elevation_raster):
    agg = create_test_raster(elevation_raster)
    out = slope(agg)
    expected = ref_slope(elevation_raster, 0.5, 0.5)
    general_output_checks(agg, out, expected)


def test_slope_flat():
    data = np.zeros((6, 8), dtype=np.float32)
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    out = np.asarray(slope(agg).data)
    np.testing.assert_allclose(out[1:-1, 1:-1], 0.0)


def test_slope_plane_analytic():
    # z = 3x + 4y with unit cells -> |grad| = 5 everywhere
    yy, xx = np.mgrid[0:10, 0:12].astype(np.float32)
    data = 3 * xx + 4 * yy
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    out = np.asarray(slope(agg).data)
    np.testing.assert_allclose(out[1:-1, 1:-1],
                               np.degrees(np.arctan(5.0)), rtol=1e-5)


def test_slope_res_from_coords(elevation_raster_no_nans):
    # no res attr -> resolution derived from coordinates
    agg = create_test_raster(elevation_raster_no_nans, attrs={"crs": "x"})
    out = slope(agg)
    expected = ref_slope(elevation_raster_no_nans, 0.5, -0.5)
    general_output_checks(agg, out, expected)


@pytest.mark.parametrize("size", [(2, 4), (10, 15)])
@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32, np.float64])
def test_slope_dtypes(random_data):
    agg = create_test_raster(random_data)
    out = slope(agg)
    expected = ref_slope(random_data.astype(np.float32), 0.5, 0.5)
    general_output_checks(agg, out, expected)
    assert np.asarray(out.data).dtype == np.float32


def test_slope_input_unmodified(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    before = agg.copy(deep=True)
    slope(agg)
    assert_input_data_unmodified(before, agg)


def test_slope_invalid_method(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    with pytest.raises(ValueError):
        slope(agg, method="bogus")


# ---------------------------------------------------------------------------
# aspect
# ---------------------------------------------------------------------------

def test_aspect_parity(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    out = aspect(agg)
    expected = ref_aspect(elevation_raster_no_nans)
    general_output_checks(agg, out, expected)
    assert out.name == "aspect"


def test_aspect_nan(elevation_raster):
    agg = create_test_raster(elevation_raster)
    out = aspect(agg)
    general_output_checks(agg, out, ref_aspect(elevation_raster))


def test_aspect_flat_is_minus_one():
    data = np.full((6, 8), 42.0, dtype=np.float32)
    agg = create_test_raster(data)
    out = np.asarray(aspect(agg).data)
    np.testing.assert_allclose(out[1:-1, 1:-1], -1.0)


def test_aspect_cardinal_directions():
    # plane rising to the south (rows increase downward = toward y min):
    # reference coordinate convention has row 0 at max y (north).
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float32)
    north_up = aspect(create_test_raster(yy))  # z grows as y falls
    out = np.asarray(north_up.data)
    expected = ref_aspect(yy)
    np.testing.assert_allclose(out, expected, equal_nan=True, rtol=1e-6)


# ---------------------------------------------------------------------------
# curvature
# ---------------------------------------------------------------------------

def test_curvature_parity(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans, attrs={"res": (1, 1)})
    out = curvature(agg)
    expected = ref_curvature(elevation_raster_no_nans, 1.0)
    general_output_checks(agg, out, expected)
    assert out.name == "curvature"


def test_curvature_bump():
    data = np.zeros((5, 5), dtype=np.float32)
    data[2, 2] = 1.0
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    out = np.asarray(curvature(agg).data)
    assert out[2, 2] == pytest.approx(400.0)   # convex peak
    assert out[1, 2] == pytest.approx(-100.0)  # neighbors concave


def test_curvature_mean_cellsize(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans, attrs={"res": (2, 4)})
    out = curvature(agg)
    expected = ref_curvature(elevation_raster_no_nans, 3.0)
    general_output_checks(agg, out, expected)


# ---------------------------------------------------------------------------
# hillshade
# ---------------------------------------------------------------------------

def test_hillshade_parity(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    out = hillshade(agg)
    expected = ref_hillshade(elevation_raster_no_nans)
    # rtol 5e-6: float32 transcendental op-ordering noise (within the 1e-5
    # parity contract)
    general_output_checks(agg, out, expected, rtol=5e-6)
    assert out.name == "hillshade"


def test_hillshade_angles(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    out = hillshade(agg, azimuth=120, angle_altitude=60)
    expected = ref_hillshade(elevation_raster_no_nans, 120, 60)
    general_output_checks(agg, out, expected, rtol=5e-6)


def test_hillshade_range(elevation_raster_no_nans):
    out = np.asarray(hillshade(create_test_raster(
        elevation_raster_no_nans)).data)
    interior = out[1:-1, 1:-1]
    assert np.nanmin(interior) >= 0.0 and np.nanmax(interior) <= 1.0


# ---------------------------------------------------------------------------
# summarize_terrain
# ---------------------------------------------------------------------------

def test_summarize_terrain(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans,
                             attrs={"res": (1, 1)}, name="terrain")
    ds = summarize_terrain(agg)
    assert set(ds.data_vars) == {
        "terrain", "terrain-slope", "terrain-curvature", "terrain-aspect"}
    np.testing.assert_allclose(np.asarray(ds["terrain-slope"].data),
                               ref_slope(elevation_raster_no_nans, 1, 1),
                               equal_nan=True, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ds["terrain-aspect"].data),
                               ref_aspect(elevation_raster_no_nans),
                               equal_nan=True, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ds["terrain-curvature"].data),
                               ref_curvature(elevation_raster_no_nans, 1.0),
                               equal_nan=True, rtol=1e-6)


def test_summarize_terrain_requires_name(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans, name=None)
    agg.name = None
    with pytest.raises(NameError):
        summarize_terrain(agg)


def test_hillshade_shadows():
    # a tall wall to the southwest casts shadows northeast of it
    data = np.zeros((32, 32), dtype=np.float32)
    data[16, :] = 50.0  # east-west wall
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    out = np.asarray(hillshade(agg, azimuth=180, angle_altitude=10,
                               shadows=True).data)
    assert out.shape == (32, 32)
    assert np.nanmin(out) >= 0.0 and np.nanmax(out) <= 1.0
    # azimuth 180: sun due south (low) -> cells north of the wall shadowed.
    # reference coordinate layout: row 0 is north (max y)
    north_side = out[5:15, 5:25]
    south_side = out[18:28, 5:25]
    assert north_side.mean() < south_side.mean()


# ---------------------------------------------------------------------------
# terrain_pipeline (fused surface + focal pass)
# ---------------------------------------------------------------------------

def test_terrain_pipeline_matches_separate_ops(elevation_raster_no_nans):
    from xrspatial_tpu.analytics import terrain_pipeline
    from xrspatial_tpu.convolution import circle_kernel
    from xrspatial_tpu.focal import focal_stats

    agg = create_test_raster(elevation_raster_no_nans,
                             attrs={"res": (1, 1)}, name="dem")
    stats = ("mean", "max", "min", "std")
    ds = terrain_pipeline(agg, surface=("slope", "hillshade"),
                          stats_funcs=stats)
    assert set(ds.data_vars) == {"dem", "dem-slope", "dem-hillshade",
                                 "focal_stats"}
    np.testing.assert_allclose(
        np.asarray(ds["dem-slope"].data),
        np.asarray(slope(agg).data), equal_nan=True, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ds["dem-hillshade"].data),
        np.asarray(hillshade(agg).data), equal_nan=True, rtol=1e-6)
    fs = focal_stats(agg, circle_kernel(1, 1, 1.5), stats_funcs=list(stats))
    np.testing.assert_allclose(np.asarray(ds["focal_stats"].data),
                               np.asarray(fs.data), equal_nan=True,
                               rtol=1e-6)
    assert list(np.asarray(ds["focal_stats"].coords["stats"].data)) == \
        list(stats)


def test_terrain_pipeline_validates_args(elevation_raster_no_nans):
    from xrspatial_tpu.analytics import terrain_pipeline
    agg = create_test_raster(elevation_raster_no_nans,
                             attrs={"res": (1, 1)}, name="dem")
    with pytest.raises(ValueError):
        terrain_pipeline(agg, surface=("slope", "nope"))
    with pytest.raises(ValueError):
        terrain_pipeline(agg, stats_funcs=("mean", "nope"))
