"""Distributed (mesh-sharded) execution parity tests.

Runs on the conftest-forced 8-device virtual CPU platform: sharding an
8x6 raster over a 2x2 (or 4x2) mesh exercises the same ppermute halo paths
a real pod would, mirroring the reference's (3,3)-chunk dask trick
(general_checks.py:30-61).
"""

import jax
import numpy as np
import pytest

from general_checks import create_test_raster
from reference_impl import ref_aspect, ref_curvature, ref_hillshade, ref_slope

from xrspatial_tpu import aspect, curvature, hillshade, slope
from xrspatial_tpu.parallel import distribute, make_raster_mesh


@pytest.fixture(params=[(2, 2), (4, 2), (1, 8)])
def mesh(request):
    ny, nx = request.param
    return make_raster_mesh(ny, nx)


def _sharded_raster(data, mesh, **kw):
    agg = create_test_raster(data, **kw)
    agg.data = distribute(agg.data, mesh)
    return agg


def test_mesh_construction():
    m = make_raster_mesh()
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == ("y", "x")


def test_sharded_slope_parity(elevation_raster, mesh):
    agg = _sharded_raster(elevation_raster, mesh)
    out = np.asarray(slope(agg).data)
    np.testing.assert_allclose(out, ref_slope(elevation_raster, 0.5, 0.5),
                               equal_nan=True, rtol=1e-6)


def test_sharded_slope_large_uneven(mesh):
    # x dim (53) divides no mesh factor: exercises NaN-pad-and-crop while
    # y stays genuinely sharded
    rng = np.random.default_rng(5)
    data = (rng.random((36, 53)) * 100).astype(np.float32)
    agg = _sharded_raster(data, mesh, attrs={"res": (2, 2)})
    out = np.asarray(slope(agg).data)
    np.testing.assert_allclose(out, ref_slope(data, 2, 2),
                               equal_nan=True, rtol=1e-6)


def test_fully_indivisible_falls_back(mesh):
    # neither dim divides: distribute() replicates, ops take the jit path
    rng = np.random.default_rng(6)
    data = (rng.random((37, 53)) * 100).astype(np.float32)
    agg = _sharded_raster(data, mesh, attrs={"res": (1, 1)})
    out = np.asarray(slope(agg).data)
    np.testing.assert_allclose(out, ref_slope(data, 1, 1),
                               equal_nan=True, rtol=1e-6)


def test_sharded_aspect_parity(elevation_raster_no_nans, mesh):
    agg = _sharded_raster(elevation_raster_no_nans, mesh)
    out = np.asarray(aspect(agg).data)
    np.testing.assert_allclose(out, ref_aspect(elevation_raster_no_nans),
                               equal_nan=True, rtol=1e-6)


def test_sharded_curvature_parity(elevation_raster_no_nans, mesh):
    agg = _sharded_raster(elevation_raster_no_nans, mesh,
                          attrs={"res": (1, 1)})
    out = np.asarray(curvature(agg).data)
    np.testing.assert_allclose(out, ref_curvature(elevation_raster_no_nans, 1),
                               equal_nan=True, rtol=1e-6)


def test_sharded_hillshade_parity(elevation_raster_no_nans, mesh):
    agg = _sharded_raster(elevation_raster_no_nans, mesh)
    out = np.asarray(hillshade(agg).data)
    # rtol 5e-6: float32 op-ordering differs slightly across shard layouts
    np.testing.assert_allclose(out, ref_hillshade(elevation_raster_no_nans),
                               equal_nan=True, rtol=5e-6)


def test_output_stays_sharded(elevation_raster_no_nans):
    mesh = make_raster_mesh(2, 2)
    agg = _sharded_raster(elevation_raster_no_nans, mesh)
    out = slope(agg)
    from xrspatial_tpu.parallel.halo import get_raster_mesh
    assert get_raster_mesh(out.data) is mesh


def test_sharded_zonal_stats(zones_values=None):
    """Zonal segment reductions work on mesh-sharded inputs via GSPMD."""
    from xrspatial_tpu.zonal import stats
    mesh = make_raster_mesh(2, 2)
    zones_data = np.zeros((10, 10), dtype=np.int64)
    zones_data[:5, 5:] = 10
    zones_data[5:, :5] = 20
    zones_data[5:, 5:] = 30
    values_data = np.arange(100, dtype=np.float64).reshape(10, 10)
    zones = create_test_raster(zones_data, name="zones")
    values = create_test_raster(values_data, name="values")
    zones.data = distribute(zones.data, mesh)
    values.data = distribute(values.data, mesh)
    df = stats(zones=zones, values=values, stats_funcs=["mean", "count"])
    np.testing.assert_allclose(df["mean"], [22.0, 27.0, 72.0, 77.0])
    np.testing.assert_allclose(df["count"], [25] * 4)


def test_sharded_proximity():
    """Jump flood on a mesh-sharded raster (GSPMD handles the shifts)."""
    from xrspatial_tpu.proximity import proximity
    mesh = make_raster_mesh(2, 2)
    data = np.zeros((16, 16), dtype=np.float32)
    data[3, 4] = 1.0
    data[12, 12] = 1.0
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    agg.data = distribute(agg.data, mesh)
    out = np.asarray(proximity(agg).data)
    # exact check vs brute force at a few cells
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    for (i, j) in [(0, 0), (8, 8), (15, 0)]:
        d = min(np.hypot(xs[j] - xs[4], ys[i] - ys[3]),
                np.hypot(xs[j] - xs[12], ys[i] - ys[12]))
        assert abs(out[i, j] - d) < 1e-4


def test_halo_wider_than_shard_multi_hop():
    """VERDICT r2 #6: a kernel radius > the local shard dimension is
    served by multi-hop ppermute gathers and STAYS sharded (was: warn +
    replicated single-device fallback)."""
    from reference_impl import ref_convolve2d

    from xrspatial_tpu.convolution import convolution_2d
    from xrspatial_tpu.parallel import get_raster_mesh
    mesh = make_raster_mesh(4, 2)
    rng = np.random.default_rng(9)
    data = (rng.random((16, 16)) * 10).astype(np.float32)
    agg = create_test_raster(data)
    agg.data = distribute(agg.data, mesh)   # shards are 4x8
    kernel = np.ones((11, 11))              # radius 5 > shard height 4
    res = convolution_2d(agg, kernel)
    np.testing.assert_allclose(np.asarray(res.data),
                               ref_convolve2d(data, kernel),
                               equal_nan=True, rtol=1e-5)
    assert get_raster_mesh(res.data) is not None  # output still sharded


def test_halo_three_hops_and_uneven_shards():
    """radius spanning 3 shards, on a raster that does not divide the
    mesh (pad-and-crop path) — the deepest multi-hop configuration."""
    from reference_impl import ref_convolve2d

    from xrspatial_tpu.convolution import convolution_2d
    mesh = make_raster_mesh(8, 1)
    rng = np.random.default_rng(10)
    data = (rng.random((42, 9)) * 10).astype(np.float32)
    agg = create_test_raster(data)
    agg.data = distribute(agg.data, mesh)   # y shards of 6 rows (padded 48)
    kernel = np.ones((27, 3))               # ry 13 -> 3 hops over 6-row shards
    res = convolution_2d(agg, kernel)
    np.testing.assert_allclose(np.asarray(res.data),
                               ref_convolve2d(data, kernel),
                               equal_nan=True, rtol=1e-5)


def test_sharded_hotspots(raster):
    from reference_impl import ref_hotspots

    from xrspatial_tpu.convolution import circle_kernel
    from xrspatial_tpu.focal import hotspots
    mesh = make_raster_mesh(2, 2)
    kernel = circle_kernel(1, 1, 1.5)
    agg = create_test_raster(raster)
    agg.data = distribute(agg.data, mesh)
    out = np.asarray(hotspots(agg, kernel).data)
    np.testing.assert_array_equal(out, ref_hotspots(raster, kernel))


def test_sharded_regions():
    from xrspatial_tpu.zonal import regions
    mesh = make_raster_mesh(2, 2)
    data = np.array([[1, 1, 0, 0],
                     [1, 0, 0, 2],
                     [0, 0, 2, 2],
                     [3, 0, 2, 2]], dtype=np.float32)
    agg = create_test_raster(data)
    ref = np.asarray(regions(agg).data)
    agg.data = distribute(agg.data, mesh)
    out = np.asarray(regions(agg).data)
    np.testing.assert_array_equal(out, ref)


def test_sharded_focal_stats(raster):
    from xrspatial_tpu.convolution import circle_kernel
    from xrspatial_tpu.focal import focal_stats
    mesh = make_raster_mesh(2, 2)
    kernel = circle_kernel(1, 1, 1.5)
    agg = create_test_raster(raster)
    ref = np.asarray(focal_stats(agg, kernel).data)
    sharded = create_test_raster(raster)
    sharded.data = distribute(sharded.data, mesh)
    out = np.asarray(focal_stats(sharded, kernel).data)
    np.testing.assert_allclose(out, ref, equal_nan=True, rtol=1e-5,
                               atol=1e-6)


def test_sharded_multispectral_elementwise():
    # elementwise indices run under GSPMD with no halo machinery
    from xrspatial_tpu.multispectral import ndvi
    mesh = make_raster_mesh(2, 2)
    rng = np.random.default_rng(5)
    nir_d = rng.random((8, 8)).astype(np.float32)
    red_d = rng.random((8, 8)).astype(np.float32)
    nir = create_test_raster(nir_d, name="nir")
    red = create_test_raster(red_d, name="red")
    ref = np.asarray(ndvi(nir, red).data)
    nir.data = distribute(nir.data, mesh)
    red.data = distribute(red.data, mesh)
    out = np.asarray(ndvi(nir, red).data)
    np.testing.assert_allclose(out, ref, equal_nan=True, rtol=1e-6)


def test_sharded_classify_quantile():
    # global percentile reductions over a sharded raster (GSPMD collectives)
    from xrspatial_tpu.classify import quantile
    mesh = make_raster_mesh(2, 2)
    rng = np.random.default_rng(6)
    data = (rng.random((16, 16)) * 100).astype(np.float32)
    agg = create_test_raster(data)
    ref = np.asarray(quantile(agg, k=4).data)
    agg2 = create_test_raster(data)
    agg2.data = distribute(agg2.data, mesh)
    out = np.asarray(quantile(agg2, k=4).data)
    np.testing.assert_allclose(out, ref, equal_nan=True)


def test_distribute_warns_on_indivisible_dim():
    # 37 divides no mesh factor > 1: both dims replicate, two warnings
    mesh = make_raster_mesh(2, 2)
    data = np.zeros((37, 37), np.float32)
    with pytest.warns(UserWarning, match="REPLICATED, not sharded"):
        distribute(data, mesh)


def test_distribute_no_warning_when_divisible():
    import warnings as _w
    mesh = make_raster_mesh(2, 2)
    data = np.zeros((8, 6), np.float32)
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        distribute(data, mesh)


def test_run_stencil_warns_on_raster_sized_halo():
    """A halo covering the whole raster still computes (multi-hop), but
    warns that distribution no longer saves memory."""
    from reference_impl import ref_convolve2d

    from xrspatial_tpu.convolution import convolution_2d
    mesh = make_raster_mesh(4, 2)
    rng = np.random.default_rng(9)
    data = (rng.random((8, 6)) * 10).astype(np.float32)
    agg = create_test_raster(data)
    agg.data = distribute(agg.data, mesh)   # shards are 2x3
    kernel = np.ones((7, 7))                # radius 3 >= 6 // 2
    with pytest.warns(UserWarning, match="raster-sized"):
        res = convolution_2d(agg, kernel)
    np.testing.assert_allclose(np.asarray(res.data),
                               ref_convolve2d(data, kernel),
                               equal_nan=True, rtol=1e-5)


def test_viewshed_warns_on_sharded_input():
    from xrspatial_tpu import viewshed
    mesh = make_raster_mesh(2, 2)
    rng = np.random.default_rng(11)
    data = (rng.random((16, 16)) * 10).astype(np.float32)
    agg = create_test_raster(data)
    agg.data = distribute(agg.data, mesh)
    with pytest.warns(UserWarning, match="ONE device"):
        viewshed(agg, x=float(agg['x'].data[8]), y=float(agg['y'].data[8]))


def test_a_star_warns_on_sharded_input():
    from xrspatial_tpu import a_star_search
    mesh = make_raster_mesh(2, 2)
    data = np.ones((16, 16), np.float32)
    agg = create_test_raster(data)
    agg.data = distribute(agg.data, mesh)
    start = (float(agg['y'].data[1]), float(agg['x'].data[1]))
    goal = (float(agg['y'].data[14]), float(agg['x'].data[14]))
    with pytest.warns(UserWarning, match="gathered"):
        a_star_search(agg, start, goal)


@pytest.mark.slow
@pytest.mark.parametrize("small_mesh_shape", [(1, 2), (1, 3)])
def test_viewshed_sharded_small_mesh_parity(small_mesh_shape):
    # fewer devices than octants: a per-device single scan would DROP
    # octants; the path must fall back to the stacked 4-scan per device
    from xrspatial_tpu import viewshed
    ny, nx = small_mesh_shape
    mesh = make_raster_mesh(ny, nx, devices=jax.devices()[:ny * nx])
    rng = np.random.default_rng(13)
    data = (rng.random((64, 64)) * 80).astype(np.float32)
    ref_agg = create_test_raster(data)
    x0 = float(ref_agg['x'].data[20])
    y0 = float(ref_agg['y'].data[40])
    ref = np.asarray(viewshed(ref_agg, x=x0, y=y0, observer_elev=5.0,
                              exact=False).data)
    agg = create_test_raster(data)
    agg.data = distribute(agg.data, mesh)
    out = np.asarray(viewshed(agg, x=x0, y=y0, observer_elev=5.0,
                              exact=False).data)
    np.testing.assert_array_equal(out == -1, ref == -1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


@pytest.mark.slow
def test_viewshed_sharded_xdraw_parity(mesh):
    # the 4 octant scans distribute over the mesh (lax.switch + pmax);
    # results must match the single-device XDraw bit-for-bit
    from xrspatial_tpu import viewshed
    rng = np.random.default_rng(12)
    data = (rng.random((64, 64)) * 80).astype(np.float32)
    ref_agg = create_test_raster(data)
    x0 = float(ref_agg['x'].data[20])
    y0 = float(ref_agg['y'].data[40])
    ref = np.asarray(viewshed(ref_agg, x=x0, y=y0, observer_elev=5.0,
                              exact=False).data)
    agg = create_test_raster(data)
    agg.data = distribute(agg.data, mesh)
    out = np.asarray(viewshed(agg, x=x0, y=y0, observer_elev=5.0,
                              exact=False).data)
    # visibility decisions identical; angles may differ in the last ulp
    # (different XLA fusion between the two programs)
    np.testing.assert_array_equal(out == -1, ref == -1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_foreign_mesh_takes_single_chip_path():
    # a user sharding over a mesh WITHOUT ('y','x') axes must not crash
    # the halo engine; ops take the plain jit path
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    foreign = Mesh(devs, axis_names=("i", "j"))
    rng = np.random.default_rng(3)
    data = (rng.random((8, 8)) * 10).astype(np.float32)
    arr = jax.device_put(jnp_asarray(data),
                         NamedSharding(foreign, P("i", "j")))
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    agg.data = arr
    out = np.asarray(slope(agg).data)
    ref_agg = create_test_raster(data, attrs={"res": (1, 1)})
    np.testing.assert_allclose(out, np.asarray(slope(ref_agg).data),
                               equal_nan=True, rtol=1e-6)


def test_run_stencil_3d_leading_dim():
    # distribute() supports leading dims; run_stencil must too
    import jax.numpy as jnp
    from xrspatial_tpu.kernels.dispatch import run_stencil
    mesh = make_raster_mesh(2, 2)
    rng = np.random.default_rng(4)
    data = (rng.random((3, 8, 8)) * 10).astype(np.float32)

    @jax.jit
    def mean3x3(a):
        h, w = a.shape[-2], a.shape[-1]
        p = jnp.pad(a, ((0, 0), (1, 1), (1, 1)), constant_values=jnp.nan)
        acc = jnp.zeros_like(a)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                acc = acc + p[:, dy:dy + h, dx:dx + w]
        return acc / 9.0

    ref = np.asarray(mean3x3(jnp.asarray(data)))
    sharded = distribute(jnp.asarray(data), mesh)
    out = np.asarray(run_stencil(mean3x3, 1, sharded))
    np.testing.assert_allclose(out, ref, equal_nan=True, rtol=1e-6)


@pytest.mark.parametrize("shape,meshshape,metric_name", [
    ((64, 64), (2, 4), "EUCLIDEAN"),
    pytest.param((768, 512), (2, 4), "EUCLIDEAN",
                 marks=pytest.mark.slow),   # 512-stride global GSPMD round
    ((96, 64), (4, 2), "MANHATTAN"),
])
def test_sharded_jfa_bit_parity(shape, meshshape, metric_name):
    """The distributed packed JFA (per-shard rounds behind per-round
    halo exchanges, parallel/jfa_sharded.py) must be BIT-identical to
    the unsharded jump flood — same selections, same keys, same
    reconstructed coordinates (VERDICT r3 task 3)."""
    import jax.numpy as jnp

    from xrspatial_tpu.kernels.jfa import (EUCLIDEAN, MANHATTAN,
                                           jump_flood, packed_state_plan)

    h, w = shape
    metric = {"EUCLIDEAN": EUCLIDEAN, "MANHATTAN": MANHATTAN}[metric_name]
    rng = np.random.default_rng(42)
    mask = rng.random((h, w)) < 0.002
    mask[h // 3, w // 2] = True
    vals = (rng.random((h, w)) * 9).astype(np.float32)
    xs = np.arange(w, dtype=np.float32) * 2.0 + 5.0
    ys = np.arange(h, dtype=np.float32) * 3.0 - 7.0
    assert packed_state_plan(xs, ys, metric) is not None
    mesh = make_raster_mesh(*meshshape)
    d0, tx0, ty0, tv0 = jump_flood(jnp.asarray(mask), jnp.asarray(xs),
                                   jnp.asarray(ys), metric,
                                   values=jnp.asarray(vals))
    d1, tx1, ty1, tv1 = jump_flood(distribute(mask, mesh),
                                   jnp.asarray(xs), jnp.asarray(ys),
                                   metric, values=distribute(vals, mesh),
                                   mesh=mesh)
    for a, b in [(d0, d1), (tx0, tx1), (ty0, ty1), (tv0, tv1)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_proximity_takes_jfa_sharded(monkeypatch):
    """proximity() on a mesh-sharded raster routes through the
    distributed packed JFA, not the XLA-scan fallback."""
    from xrspatial_tpu import parallel
    from xrspatial_tpu.parallel import jfa_sharded
    from xrspatial_tpu.proximity import proximity

    calls = []
    orig = jfa_sharded.jump_flood_packed_sharded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(jfa_sharded, "jump_flood_packed_sharded", spy)
    mesh = make_raster_mesh(2, 2)
    data = np.zeros((32, 32), dtype=np.float32)
    data[3, 4] = 1.0
    data[20, 28] = 1.0
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    agg.data = distribute(agg.data, mesh)
    base = create_test_raster(data, attrs={"res": (1, 1)})
    out_sh = np.asarray(proximity(agg).data)
    out_1 = np.asarray(proximity(base).data)
    assert calls, "sharded proximity did not take the distributed JFA"
    np.testing.assert_array_equal(out_sh, out_1)


def test_viewshed_banded_bitwise_parity():
    # the memory-scaling banded XDraw (minor-axis shards + K-row carry
    # halos, kernels/viewshed.py::viewshed_grid_los_sharded_banded) is
    # BIT-identical to the single-device scan: identical step math on
    # identical operand values (halo rows are refreshed from the
    # neighbor's exact owned carries every band).  One 4x2 mesh here;
    # the driver dryrun asserts the same bit-parity on its own mesh.
    from xrspatial_tpu.kernels.viewshed import (
        viewshed_grid_los, viewshed_grid_los_sharded_banded)
    mesh = make_raster_mesh(4, 2)
    rng = np.random.default_rng(21)
    for shape in [(64, 64), (80, 52)]:       # divisible and not
        data = (rng.random(shape) * 90).astype(np.float32)
        data[3, 5] = np.nan
        for (vr, vc) in [(shape[0] // 2, shape[1] // 2), (0, 0)]:
            ref = np.asarray(viewshed_grid_los(
                data, vr, vc, 5.0, 0.0, 1.0, 1.0))
            out = np.asarray(viewshed_grid_los_sharded_banded(
                jax.numpy.asarray(data), mesh, vr, vc,
                5.0, 0.0, 1.0, 1.0))
            np.testing.assert_array_equal(out, ref)


def test_viewshed_sharded_takes_banded_path(mesh):
    # the public dispatch must route sharded XDraw through the banded
    # memory-scaling kernel (not the legacy replicate-whole-raster one)
    import sys

    import xrspatial_tpu.viewshed  # noqa: F401  (package shadows the name)
    vs_mod = sys.modules["xrspatial_tpu.viewshed"]
    calls = []
    orig = vs_mod.viewshed_grid_los_sharded_banded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    rng = np.random.default_rng(22)
    data = (rng.random((64, 64)) * 80).astype(np.float32)
    agg = _sharded_raster(data, mesh)
    vs_mod.viewshed_grid_los_sharded_banded = spy
    try:
        out = vs_mod.viewshed(agg, x=float(agg['x'].data[20]),
                              y=float(agg['y'].data[40]), exact=False)
    finally:
        vs_mod.viewshed_grid_los_sharded_banded = orig
    assert calls, "sharded viewshed did not take the banded path"
    assert np.asarray(out.data).shape == (64, 64)
