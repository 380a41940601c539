"""Tests for A* pathfinding."""

import numpy as np
import pytest

from general_checks import create_test_raster

from xrspatial_tpu import DataArray, a_star_search


@pytest.fixture
def surface():
    # reference docstring grid (pathfinding.py examples)
    data = np.array([
        [0, 1, 0, 0],
        [1, 1, 0, 0],
        [0, 1, 2, 2],
        [1, 0, 2, 0],
        [0, 2, 2, 2]], dtype=np.float64)
    agg = DataArray(data, dims=["lat", "lon"], name="s")
    agg["lon"] = np.arange(4, dtype=float)
    agg["lat"] = np.arange(4, -1, -1, dtype=float)
    return agg


def test_docstring_golden(surface):
    """Barrier 0: path hugs the diagonal (reference docstring values)."""
    out = a_star_search(surface, start=(3, 0), goal=(0, 1),
                        barriers=[0], x="lon", y="lat")
    arr = np.asarray(out.data)
    expected = np.array([
        [np.nan, np.nan, np.nan, np.nan],
        [0.0, np.nan, np.nan, np.nan],
        [np.nan, 1.41421356, np.nan, np.nan],
        [np.nan, np.nan, 2.82842712, np.nan],
        [np.nan, 4.24264069, np.nan, np.nan]])
    np.testing.assert_allclose(arr, expected, equal_nan=True, rtol=1e-6)


def test_straight_path():
    data = np.zeros((5, 5))
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    ys = np.asarray(agg["y"].data)
    xs = np.asarray(agg["x"].data)
    out = np.asarray(a_star_search(agg, (ys[2], xs[0]), (ys[2], xs[4])).data)
    # path along row 2 with costs 0..4
    np.testing.assert_allclose(out[2], [0, 1, 2, 3, 4])
    assert np.isnan(out[[0, 1, 3, 4]]).all()


def test_no_path():
    data = np.zeros((3, 5))
    data[:, 2] = -1  # wall
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    ys, xs = np.asarray(agg["y"].data), np.asarray(agg["x"].data)
    out = np.asarray(a_star_search(agg, (ys[1], xs[0]), (ys[1], xs[4]),
                                   barriers=[-1]).data)
    assert np.isnan(out).all()


def test_connectivity_4():
    data = np.zeros((3, 3))
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    ys, xs = np.asarray(agg["y"].data), np.asarray(agg["x"].data)
    out8 = np.asarray(a_star_search(agg, (ys[0], xs[0]), (ys[2], xs[2])).data)
    out4 = np.asarray(a_star_search(agg, (ys[0], xs[0]), (ys[2], xs[2]),
                                    connectivity=4).data)
    assert np.nanmax(out8) == pytest.approx(2 * np.sqrt(2))
    assert np.nanmax(out4) == pytest.approx(4.0)


def test_snap_and_warnings():
    data = np.zeros((4, 4))
    data[0, 0] = -1
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    ys, xs = np.asarray(agg["y"].data), np.asarray(agg["x"].data)
    with pytest.warns(Warning):
        a_star_search(agg, (ys[0], xs[0]), (ys[3], xs[3]), barriers=[-1])
    out = np.asarray(a_star_search(agg, (ys[0], xs[0]), (ys[3], xs[3]),
                                   barriers=[-1], snap_start=True).data)
    assert np.isfinite(out).sum() > 0


def test_validation(surface):
    with pytest.raises(ValueError):
        a_star_search(surface, (0, 0), (1, 1), x="bogus")
    with pytest.raises(ValueError):
        a_star_search(surface, (0, 0), (1, 1), x="lon", y="lat",
                      connectivity=6)
    with pytest.raises(ValueError):
        a_star_search(surface, (99, 99), (1, 1), x="lon", y="lat")


def test_native_astar_matches_python():
    # native C++ A* and the python heapq fallback must be bit-identical
    # (same tie-breaking, same re-parenting, same costs)
    import xrspatial_tpu.pathfinding as P
    from xrspatial_tpu.native import get_astar
    if get_astar() is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    for conn in (4, 8):
        for trial in range(4):
            h, w = 37, 53
            blocked = rng.random((h, w)) < 0.3
            blocked[0, 0] = False
            blocked[h - 1, w - 1] = False
            start, goal = (0, 0), (h - 1, w - 1)
            nat = P._astar_native(blocked, start, goal, conn)
            py = P._astar(blocked, start, goal, P._neighborhood(conn))
            assert (nat[0] is None) == (py[0] is None)
            if nat[0] is not None:
                assert nat[0] == py[0]
                d_n, d_p = nat[1], py[1]
                cells = np.array(nat[0])
                np.testing.assert_array_equal(
                    d_n[cells[:, 0], cells[:, 1]],
                    d_p[cells[:, 0], cells[:, 1]])
