"""Parity + contract tests for convolution / focal family."""

import numpy as np
import pytest

from general_checks import create_test_raster, general_output_checks
from reference_impl import (ref_convolve2d, ref_focal_apply, ref_focal_mean,
                            ref_hotspots)

from xrspatial_tpu.convolution import (annulus_kernel, calc_cellsize,
                                       circle_kernel, convolution_2d,
                                       convolve_2d, custom_kernel)
from xrspatial_tpu.focal import apply, focal_stats, hotspots, mean
from xrspatial_tpu.parallel import distribute, make_raster_mesh


# ---------------------------------------------------------------------------
# kernel builders
# ---------------------------------------------------------------------------

def test_circle_kernel_golden():
    kernel = circle_kernel(1, 1, 3)
    expected = np.array([
        [0., 0., 0., 1., 0., 0., 0.],
        [0., 1., 1., 1., 1., 1., 0.],
        [0., 1., 1., 1., 1., 1., 0.],
        [1., 1., 1., 1., 1., 1., 1.],
        [0., 1., 1., 1., 1., 1., 0.],
        [0., 1., 1., 1., 1., 1., 0.],
        [0., 0., 0., 1., 0., 0., 0.]])
    np.testing.assert_array_equal(kernel, expected)


def test_circle_kernel_anisotropic():
    kernel = circle_kernel(1, 2, 3)
    expected = np.array([
        [0., 0., 0., 1., 0., 0., 0.],
        [1., 1., 1., 1., 1., 1., 1.],
        [0., 0., 0., 1., 0., 0., 0.]])
    np.testing.assert_array_equal(kernel, expected)


def test_annulus_kernel_golden():
    kernel = annulus_kernel(1, 1, 3, 1)
    expected = np.array([
        [0., 0., 0., 1., 0., 0., 0.],
        [0., 1., 1., 1., 1., 1., 0.],
        [0., 1., 1., 0., 1., 1., 0.],
        [1., 1., 0., 0., 0., 1., 1.],
        [0., 1., 1., 0., 1., 1., 0.],
        [0., 1., 1., 1., 1., 1., 0.],
        [0., 0., 0., 1., 0., 0., 0.]])
    np.testing.assert_array_equal(kernel, expected)


def test_kernel_distance_units():
    k_m = circle_kernel(1000, 1000, "2 km")
    k_raw = circle_kernel(1000, 1000, 2000)
    np.testing.assert_array_equal(k_m, k_raw)
    with pytest.raises(ValueError):
        circle_kernel(1, 1, "-3")
    with pytest.raises(ValueError):
        circle_kernel(1, 1, "3 lightyears")


def test_custom_kernel_validation():
    with pytest.raises(ValueError):
        custom_kernel([[1, 1], [1, 1]])  # not ndarray
    with pytest.raises(ValueError):
        custom_kernel(np.ones((2, 3)))  # even dim


def test_calc_cellsize_unit():
    agg = create_test_raster(np.ones((4, 4), dtype=np.float32),
                             attrs={"res": (1, 1), "unit": "km"})
    assert calc_cellsize(agg) == (1000.0, 1000.0)


# ---------------------------------------------------------------------------
# convolution
# ---------------------------------------------------------------------------

def test_convolution_2d_parity(elevation_raster_no_nans):
    kernel = circle_kernel(1, 1, 1.5)
    agg = create_test_raster(elevation_raster_no_nans)
    out = convolution_2d(agg, kernel)
    expected = ref_convolve2d(elevation_raster_no_nans, kernel)
    general_output_checks(agg, out, expected)


def test_convolution_2d_weighted():
    rng = np.random.default_rng(3)
    data = (rng.random((10, 12)) * 10).astype(np.float32)
    kernel = np.array([[0.1, 0.2, 0.1],
                       [0.2, 1.0, 0.2],
                       [0.1, 0.2, 0.1]])
    agg = create_test_raster(data)
    out = np.asarray(convolution_2d(agg, kernel).data)
    np.testing.assert_allclose(out, ref_convolve2d(data, kernel),
                               equal_nan=True, rtol=2e-6)


def test_convolve_2d_nan_propagates(elevation_raster):
    kernel = np.ones((3, 3))
    out = np.asarray(convolve_2d(elevation_raster, kernel))
    expected = ref_convolve2d(elevation_raster, kernel)
    np.testing.assert_allclose(out, expected, equal_nan=True, rtol=1e-6)
    # windows touching the NaN row are NaN (no skipping)
    assert np.isnan(out[1, 2])


# ---------------------------------------------------------------------------
# focal mean
# ---------------------------------------------------------------------------

def test_mean_parity(elevation_raster):
    agg = create_test_raster(elevation_raster)
    out = mean(agg)
    general_output_checks(agg, out, ref_focal_mean(elevation_raster))
    assert out.name == "mean"


def test_mean_passes(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    expected = ref_focal_mean(ref_focal_mean(elevation_raster_no_nans))
    out = mean(agg, passes=2)
    np.testing.assert_allclose(np.asarray(out.data), expected,
                               equal_nan=True, rtol=1e-6)


def test_mean_excludes():
    data = np.array([[1., 2., 3.],
                     [4., -999., 6.],
                     [7., 8., 9.]], dtype=np.float32)
    out = np.asarray(mean(create_test_raster(data),
                          excludes=[-999.0, np.nan]).data)
    expected = ref_focal_mean(data, excludes=(-999.0, np.nan))
    np.testing.assert_allclose(out, expected, equal_nan=True, rtol=1e-6)
    assert out[1, 1] == -999.0  # excluded value passes through


def test_mean_golden_bump():
    data = np.zeros((5, 5))
    data[2, 2] = 9.0
    out = np.asarray(mean(create_test_raster(data)).data)
    expected = np.array([
        [0., 0., 0., 0., 0.],
        [0., 1., 1., 1., 0.],
        [0., 1., 1., 1., 0.],
        [0., 1., 1., 1., 0.],
        [0., 0., 0., 0., 0.]])
    np.testing.assert_allclose(out, expected)


# ---------------------------------------------------------------------------
# apply / focal_stats
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stat", ["mean", "max", "min", "range", "std",
                                  "var", "sum"])
def test_focal_stats_parity(elevation_raster_no_nans, stat):
    kernel = circle_kernel(1, 1, 1.5)
    agg = create_test_raster(elevation_raster_no_nans)
    out = focal_stats(agg, kernel, stats_funcs=[stat])
    fn = {"mean": np.nanmean, "max": np.nanmax, "min": np.nanmin,
          "range": lambda a: np.nanmax(a) - np.nanmin(a),
          "std": np.nanstd, "var": np.nanvar, "sum": np.nansum}[stat]
    expected = ref_focal_apply(elevation_raster_no_nans, kernel, fn)
    assert out.dims == ("stats", "y", "x")
    np.testing.assert_allclose(np.asarray(out.data)[0], expected,
                               equal_nan=True, rtol=2e-5, atol=1e-4)


def test_focal_stats_with_nans(elevation_raster):
    kernel = np.ones((3, 3))
    agg = create_test_raster(elevation_raster)
    out = focal_stats(agg, kernel, stats_funcs=["mean", "sum"])
    exp_mean = ref_focal_apply(elevation_raster, kernel, np.nanmean)
    exp_sum = ref_focal_apply(elevation_raster, kernel, np.nansum)
    np.testing.assert_allclose(np.asarray(out.data)[0], exp_mean,
                               equal_nan=True, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.data)[1], exp_sum,
                               equal_nan=True, rtol=1e-5)


def test_focal_stats_docstring_golden():
    """Golden from reference focal.py:840-860."""
    kernel = circle_kernel(1, 1, 1)
    data = np.array([
        [0, 0, 0, 0, 0, 0],
        [1, 1, 2, 2, 1, 1],
        [2, 2, 1, 1, 2, 2],
        [3, 3, 0, 0, 3, 3]], dtype=float)
    from xrspatial_tpu.xrlib import DataArray
    out = focal_stats(DataArray(data), kernel, stats_funcs=["min", "sum"])
    expected_min = np.array([
        [0., 0., 0., 0., 0., 0.],
        [0., 0., 0., 0., 0., 0.],
        [1., 1., 0., 0., 1., 1.],
        [2., 0., 0., 0., 0., 2.]])
    expected_sum = np.array([
        [1., 1., 2., 2., 1., 1.],
        [4., 6., 6., 6., 6., 4.],
        [8., 9., 6., 6., 9., 8.],
        [8., 8., 4., 4., 8., 8.]])
    np.testing.assert_allclose(np.asarray(out.data)[0], expected_min)
    np.testing.assert_allclose(np.asarray(out.data)[1], expected_sum)


def test_apply_custom_python_func(elevation_raster_no_nans):
    kernel = circle_kernel(1, 1, 1.5)
    agg = create_test_raster(elevation_raster_no_nans)

    def frac_above_500(buf):
        return np.nanmean(buf > 500)

    out = apply(agg, kernel, func=frac_above_500)
    expected = ref_focal_apply(elevation_raster_no_nans, kernel,
                               lambda b: np.nanmean(b > 500))
    np.testing.assert_allclose(np.asarray(out.data), expected,
                               equal_nan=True, rtol=1e-6)
    assert out.name == "focal_apply"


@pytest.mark.slow
def test_apply_custom_func_1024(monkeypatch):
    """VERDICT r2 #7: the host escape hatch must run a custom func on a
    1024^2 raster in seconds (was: minutes of per-pixel copy loops)."""
    import time
    rng = np.random.default_rng(3)
    data = rng.random((1024, 1024)).astype(np.float32)
    agg = create_test_raster(data)
    kernel = circle_kernel(1, 1, 1.5)

    def frac_above_half(buf):
        return np.nanmean(buf > 0.5)

    t0 = time.perf_counter()
    out = apply(agg, kernel, func=frac_above_half)
    elapsed = time.perf_counter() - t0
    # generous bound: the regression this guards was MINUTES of
    # per-pixel python loops; a loaded CI box can double the normal
    # ~5-10 s vectorized time
    assert elapsed < 90.0, f"host apply too slow: {elapsed:.1f}s"
    # spot-check interior pixels against a directly computed window
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(data, 1, constant_values=np.nan)
    wins = sliding_window_view(pad, (3, 3))
    kmask = kernel == 1
    for y, x in [(1, 1), (5, 500), (1022, 1022), (0, 0), (1023, 1023)]:
        expected = np.nanmean(np.where(kmask, wins[y, x], np.nan) > 0.5)
        np.testing.assert_allclose(np.asarray(out.data)[y, x], expected,
                                   rtol=1e-6)


def test_apply_default_mean(elevation_raster_no_nans):
    kernel = np.ones((3, 3))
    agg = create_test_raster(elevation_raster_no_nans)
    out = apply(agg, kernel)
    expected = ref_focal_apply(elevation_raster_no_nans, kernel, np.nanmean)
    np.testing.assert_allclose(np.asarray(out.data), expected,
                               equal_nan=True, rtol=1e-5)


def test_apply_validation(elevation_raster_no_nans):
    agg = create_test_raster(elevation_raster_no_nans)
    with pytest.raises(TypeError):
        apply("nope", np.ones((3, 3)))
    with pytest.raises(ValueError):
        apply(agg, np.ones((2, 2)))


# ---------------------------------------------------------------------------
# hotspots
# ---------------------------------------------------------------------------

def test_hotspots_docstring_golden():
    """Golden from reference focal.py:1085-1100."""
    kernel = custom_kernel(np.array([[1, 1, 0]]))
    data = np.array([
        [0, 1000, 1000, 0, 0, 0],
        [0, 0, 0, -1000, -1000, 0],
        [0, -900, -900, 0, 0, 0],
        [0, 100, 1000, 0, 0, 0]], dtype=float)
    from xrspatial_tpu.xrlib import DataArray
    out = hotspots(DataArray(data), kernel)
    expected = np.array([
        [0, 0, 95, 0, 0, 0],
        [0, 0, 0, 0, -90, 0],
        [0, 0, -90, 0, 0, 0],
        [0, 0, 0, 0, 0, 0]], dtype=np.int8)
    np.testing.assert_array_equal(np.asarray(out.data), expected)
    assert np.asarray(out.data).dtype == np.int8
    assert out.attrs.get("unit") == "%"


def test_hotspots_parity(elevation_raster_no_nans):
    kernel = circle_kernel(1, 1, 1.5)
    agg = create_test_raster(elevation_raster_no_nans)
    out = hotspots(agg, kernel)
    expected = ref_hotspots(elevation_raster_no_nans, kernel)
    np.testing.assert_array_equal(np.asarray(out.data), expected)


def test_hotspots_zero_std():
    from xrspatial_tpu.xrlib import DataArray
    with pytest.raises(ZeroDivisionError):
        hotspots(DataArray(np.ones((4, 4))), np.ones((3, 3)))


# ---------------------------------------------------------------------------
# distributed focal
# ---------------------------------------------------------------------------

def test_sharded_focal_stats(elevation_raster_no_nans):
    mesh = make_raster_mesh(2, 2)
    kernel = circle_kernel(1, 1, 1.5)
    agg = create_test_raster(elevation_raster_no_nans)
    agg.data = distribute(agg.data, mesh)
    out = focal_stats(agg, kernel, stats_funcs=["mean", "std"])
    exp_mean = ref_focal_apply(elevation_raster_no_nans, kernel, np.nanmean)
    exp_std = ref_focal_apply(elevation_raster_no_nans, kernel, np.nanstd)
    np.testing.assert_allclose(np.asarray(out.data)[0], exp_mean,
                               equal_nan=True, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.data)[1], exp_std,
                               equal_nan=True, rtol=1e-4, atol=1e-4)


def test_sharded_convolution(elevation_raster_no_nans):
    mesh = make_raster_mesh(2, 2)
    kernel = np.ones((5, 5))
    agg = create_test_raster(elevation_raster_no_nans)
    agg.data = distribute(agg.data, mesh)
    out = np.asarray(convolution_2d(agg, kernel).data)
    expected = ref_convolve2d(elevation_raster_no_nans, kernel)
    np.testing.assert_allclose(out, expected, equal_nan=True, rtol=1e-5)


def test_sharded_mean(elevation_raster):
    mesh = make_raster_mesh(4, 2)
    agg = create_test_raster(elevation_raster)
    agg.data = distribute(agg.data, mesh)
    out = np.asarray(mean(agg, passes=2).data)
    expected = ref_focal_mean(ref_focal_mean(elevation_raster))
    np.testing.assert_allclose(out, expected, equal_nan=True, rtol=1e-6)


def test_mean_preserves_input_dtype():
    # reference writes nanmean into np.zeros_like(data): integer rasters
    # come back integer (truncated means), float32 stays float32
    from xrspatial_tpu.xrlib import DataArray
    data = np.array([[0, 0, 0], [0, 9, 0], [0, 0, 0]], dtype=np.int32)
    out = mean(DataArray(data, dims=("y", "x")))
    assert out.data.dtype == np.int32
    # center mean = 1.0; corners mean = 9/4 = 2.25 -> truncates to 2
    assert int(np.asarray(out.data)[0, 0]) == 2
    assert int(np.asarray(out.data)[1, 1]) == 1

    f32 = mean(DataArray(data.astype(np.float32), dims=("y", "x")))
    assert f32.data.dtype == np.float32
    np.testing.assert_allclose(np.asarray(f32.data)[0, 0], 2.25)


def test_window_stats_conv_branch_matches_unrolled(monkeypatch):
    """Huge kernels route to the conv/reduce-window formulation; its
    results must match the unrolled pass (mean/sum/count exactly,
    min/max exactly, std/var to f32 algebra)."""
    import jax.numpy as jnp

    import xrspatial_tpu.kernels.window as W
    rng = np.random.default_rng(21)
    data = jnp.asarray((rng.random((40, 60)) * 50).astype(np.float32))
    data = data.at[5, 7].set(jnp.nan)
    kernel = annulus_kernel(1, 1, 5.5, 2.0)
    offsets = W.kernel_offsets(kernel)
    stats = ("mean", "sum", "max", "min", "range", "std", "var")
    ref = W._window_stats_unrolled(data, offsets, stats)
    got = W._window_stats_conv(data, offsets, stats)
    for s in ("mean", "sum", "max", "min", "range"):
        np.testing.assert_allclose(np.asarray(got[s]), np.asarray(ref[s]),
                                   rtol=1e-5, atol=1e-4, equal_nan=True,
                                   err_msg=s)
    for s in ("std", "var"):
        np.testing.assert_allclose(np.asarray(got[s]), np.asarray(ref[s]),
                                   rtol=1e-3, atol=1e-3, equal_nan=True,
                                   err_msg=s)
    # and the dispatcher picks conv when offsets exceed the cap
    monkeypatch.setattr(W, "UNROLL_MAX_OFFSETS", 4)
    got2 = W.window_stats(data, offsets, ("mean",))
    np.testing.assert_allclose(np.asarray(got2["mean"]),
                               np.asarray(ref["mean"]),
                               rtol=1e-5, atol=1e-4, equal_nan=True)


def test_window_stats_conv_all_nan_sum_is_zero():
    # reference semantics: np.nansum of an all-NaN buffer is 0.0
    import jax.numpy as jnp

    import xrspatial_tpu.kernels.window as W
    data = jnp.full((8, 9), jnp.nan)
    kernel = circle_kernel(1, 1, 2)
    offsets = W.kernel_offsets(kernel)
    out = W._window_stats_conv(data, offsets, ("sum", "mean", "max"))
    np.testing.assert_array_equal(np.asarray(out["sum"]), 0.0)
    assert np.isnan(np.asarray(out["mean"])).all()
    assert np.isnan(np.asarray(out["max"])).all()
