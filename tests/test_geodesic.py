"""Tests for geodesic slope/aspect (WGS-84 ECEF plane fit)."""

import numpy as np
import pytest

from xrspatial_tpu import DataArray, aspect, slope

WGS84_A = 6378137.0
WGS84_B = 6356752.314245
R_KERNEL = 6370994.884953014


def ref_geodesic_fit(elev, lat, lon, z_factor=1.0):
    """Loop oracle of the reference's per-pixel ECEF plane fit
    (geodesic.py:40-129)."""
    a2, b2 = WGS84_A ** 2, WGS84_B ** 2
    inv_2r = 1.0 / (2.0 * R_KERNEL)

    def ecef(lat_r, lon_r, h):
        n = a2 / np.sqrt(a2 * np.cos(lat_r) ** 2 + b2 * np.sin(lat_r) ** 2)
        return ((n + h) * np.cos(lat_r) * np.cos(lon_r),
                (n + h) * np.cos(lat_r) * np.sin(lon_r),
                (b2 / a2 * n + h) * np.sin(lat_r))

    h, w = elev.shape
    A = np.full((h, w), np.nan)
    B = np.full((h, w), np.nan)
    d2r = np.pi / 180.0
    for yy in range(1, h - 1):
        for xx in range(1, w - 1):
            nb = elev[yy - 1:yy + 2, xx - 1:xx + 2]
            if np.isnan(nb).any():
                continue
            lat_c, lon_c = lat[yy, xx] * d2r, lon[yy, xx] * d2r
            xc, yc, zc = ecef(lat_c, lon_c, elev[yy, xx] * z_factor)
            ex, ey = -np.sin(lon_c), np.cos(lon_c)
            nx = -np.sin(lat_c) * np.cos(lon_c)
            ny = -np.sin(lat_c) * np.sin(lon_c)
            nz = np.cos(lat_c)
            ux = np.cos(lat_c) * np.cos(lon_c)
            uy = np.cos(lat_c) * np.sin(lon_c)
            uz = np.sin(lat_c)
            es, ns_, us = [], [], []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    la = lat[yy + dy, xx + dx] * d2r
                    lo = lon[yy + dy, xx + dx] * d2r
                    xk, yk, zk = ecef(la, lo,
                                      elev[yy + dy, xx + dx] * z_factor)
                    dxv, dyv, dzv = xk - xc, yk - yc, zk - zc
                    e = dxv * ex + dyv * ey
                    n = dxv * nx + dyv * ny + dzv * nz
                    u = dxv * ux + dyv * uy + dzv * uz
                    u += (e * e + n * n) * inv_2r
                    es.append(e)
                    ns_.append(n)
                    us.append(u)
            es, ns_, us = np.array(es), np.array(ns_), np.array(us)
            de = es - es.mean()
            dn = ns_ - ns_.mean()
            du = us - us.mean()
            see, snn = (de * de).sum(), (dn * dn).sum()
            sen, seu, snu = (de * dn).sum(), (de * du).sum(), (dn * du).sum()
            det = see * snn - sen * sen
            if abs(det) < 1e-30:
                A[yy, xx], B[yy, xx] = 0.0, 0.0
            else:
                A[yy, xx] = (seu * snn - snu * sen) / det
                B[yy, xx] = (snu * see - seu * sen) / det
    return A, B


@pytest.fixture
def geo_raster():
    rng = np.random.default_rng(8)
    elev = (rng.random((8, 10)) * 500).astype(np.float64)
    agg = DataArray(elev, dims=("y", "x"), name="elev")
    agg["y"] = np.linspace(45.0, 45.07, 8)
    agg["x"] = np.linspace(7.0, 7.09, 10)
    return agg


def test_geodesic_slope_parity(geo_raster):
    out = np.asarray(slope(geo_raster, method="geodesic").data)
    elev = np.asarray(geo_raster.data)
    lat = np.broadcast_to(np.asarray(geo_raster["y"].data)[:, None],
                          elev.shape)
    lon = np.broadcast_to(np.asarray(geo_raster["x"].data)[None, :],
                          elev.shape)
    A, B = ref_geodesic_fit(elev, lat, lon)
    expected = np.degrees(np.arctan(np.sqrt(A ** 2 + B ** 2)))
    np.testing.assert_allclose(out[1:-1, 1:-1], expected[1:-1, 1:-1],
                               rtol=1e-5)
    assert np.isnan(out[0]).all()


def test_geodesic_aspect_parity(geo_raster):
    out = np.asarray(aspect(geo_raster, method="geodesic").data)
    elev = np.asarray(geo_raster.data)
    lat = np.broadcast_to(np.asarray(geo_raster["y"].data)[:, None],
                          elev.shape)
    lon = np.broadcast_to(np.asarray(geo_raster["x"].data)[None, :],
                          elev.shape)
    A, B = ref_geodesic_fit(elev, lat, lon)
    ang = np.degrees(np.arctan2(-A, -B))
    ang = np.where(ang < 0, ang + 360.0, ang)
    mag = np.sqrt(A ** 2 + B ** 2)
    expected = np.where(mag < 1e-7, -1.0, ang)
    np.testing.assert_allclose(out[1:-1, 1:-1], expected[1:-1, 1:-1],
                               rtol=1e-4, atol=1e-5)


def test_geodesic_z_unit(geo_raster):
    m = np.asarray(slope(geo_raster, method="geodesic", z_unit="meter").data)
    km = np.asarray(slope(geo_raster, method="geodesic",
                          z_unit="km").data)
    # km elevations are 1000x taller -> steeper slopes
    assert np.nanmean(km) > np.nanmean(m)
    with pytest.raises(ValueError):
        slope(geo_raster, method="geodesic", z_unit="parsec")


def test_geodesic_flat_earth_matches_planar_roughly():
    # a small flat patch at the equator: geodesic slope of constant
    # elevation is ~0
    agg = DataArray(np.full((6, 6), 100.0), dims=("y", "x"))
    agg["y"] = np.linspace(0.0, 0.005, 6)
    agg["x"] = np.linspace(0.0, 0.005, 6)
    out = np.asarray(slope(agg, method="geodesic").data)
    np.testing.assert_allclose(out[1:-1, 1:-1], 0.0, atol=1e-3)


def test_geodesic_nan_neighbor():
    elev = np.full((5, 5), 10.0)
    elev[2, 2] = np.nan
    agg = DataArray(elev, dims=("y", "x"))
    agg["y"] = np.linspace(10.0, 10.04, 5)
    agg["x"] = np.linspace(20.0, 20.04, 5)
    out = np.asarray(slope(agg, method="geodesic").data)
    # all interior cells touch the NaN -> NaN
    assert np.isnan(out[1:-1, 1:-1]).all()


def test_latlon_range_validation():
    agg = DataArray(np.zeros((4, 4)), dims=("y", "x"))
    agg["y"] = np.linspace(89, 95, 4)  # invalid latitude
    agg["x"] = np.linspace(0, 3, 4)
    with pytest.raises(ValueError):
        slope(agg, method="geodesic")
