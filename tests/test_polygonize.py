"""Tests for experimental polygonize."""

import numpy as np
import pytest

from xrspatial_tpu import DataArray
from xrspatial_tpu.experimental import polygonize


def _area(ring):
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])


def test_single_region():
    raster = DataArray(np.ones((3, 4)))
    column, polys = polygonize(raster)
    assert column == [1.0]
    assert len(polys) == 1
    ext = polys[0][0]
    assert len(polys[0]) == 1  # no holes
    np.testing.assert_array_equal(ext[0], ext[-1])  # closed ring
    assert _area(ext) == pytest.approx(12.0)  # 3x4 pixels
    assert _area(ext) > 0  # anticlockwise exterior


def test_two_regions_and_values():
    data = np.array([[1, 1, 2, 2],
                     [1, 1, 2, 2]], dtype=np.int64)
    column, polys = polygonize(DataArray(data))
    assert column == [1, 2]
    assert [len(p) for p in polys] == [1, 1]
    assert _area(polys[0][0]) == pytest.approx(4.0)
    assert _area(polys[1][0]) == pytest.approx(4.0)


def test_hole():
    data = np.ones((5, 5), dtype=np.int64)
    data[2, 2] = 9
    column, polys = polygonize(DataArray(data))
    # region 1 (the ring of 1s) has a hole; region 2 is the 9 cell
    assert column == [1, 9]
    rings_1 = polys[0]
    assert len(rings_1) == 2
    assert _area(rings_1[0]) == pytest.approx(25.0)  # exterior incl. hole bbox
    assert _area(rings_1[1]) == pytest.approx(-1.0)  # hole, clockwise
    assert _area(polys[1][0]) == pytest.approx(1.0)


def test_connectivity_4_vs_8():
    data = np.array([[1, 0],
                     [0, 1]], dtype=np.int64)
    c4, p4 = polygonize(DataArray(data))
    assert len(c4) == 4  # all four cells separate regions
    # 8-connectivity: the diagonal cells form ONE region per value, but a
    # diagonal junction cannot be a single valid simple-features ring
    # (the reference emits an OGC-invalid self-touching ring there); we
    # emit one VALID polygon entry per positive ring instead
    c8, p8 = polygonize(DataArray(data), connectivity=8)
    assert sorted(c8) == [0, 0, 1, 1]
    from xrspatial_tpu.experimental.polygonize import _signed_area
    for rings in p8:
        assert len(rings) == 1              # no bogus holes
        assert _signed_area(rings[0]) == 1.0  # each cell, correct area


def test_mask():
    data = np.ones((3, 3), dtype=np.int64)
    mask = DataArray(np.array([[1, 1, 1],
                               [1, 0, 1],
                               [1, 1, 1]], dtype=np.int64))
    column, polys = polygonize(DataArray(data), mask=mask)
    assert column == [1]
    assert len(polys[0]) == 2  # masked center becomes a hole


def test_transform():
    data = np.ones((2, 2), dtype=np.int64)
    # x' = 10 + 2x, y' = 100 + 3y
    transform = np.array([2.0, 0.0, 10.0, 0.0, 3.0, 100.0])
    column, polys = polygonize(DataArray(data), transform=transform)
    ext = polys[0][0]
    assert ext[:, 0].min() == 10.0 and ext[:, 0].max() == 14.0
    assert ext[:, 1].min() == 100.0 and ext[:, 1].max() == 106.0


def test_nan_excluded():
    data = np.ones((3, 3))
    data[1, 1] = np.nan
    column, polys = polygonize(DataArray(data))
    assert column == [1.0]
    assert len(polys[0]) == 2  # NaN center is a hole


def test_validation():
    with pytest.raises(ValueError):
        polygonize(DataArray(np.ones((2, 2))), connectivity=6)
    with pytest.raises(ValueError):
        polygonize(DataArray(np.ones((2, 2))), transform=np.zeros(4))
    with pytest.raises(ValueError):
        polygonize(DataArray(np.ones((2, 2))), mask=DataArray(np.ones((3, 3))))
    with pytest.raises(ValueError):
        polygonize(DataArray(np.ones((2, 2))), return_type="bogus")
