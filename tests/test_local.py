"""Tests for the local (cell stats) toolset."""

from collections import Counter

import numpy as np
import pytest

from xrspatial_tpu import DataArray, Dataset
from xrspatial_tpu.local import (cell_stats, combine, equal_frequency,
                                 greater_frequency, highest_position,
                                 lesser_frequency, lowest_position,
                                 popularity, rank)


@pytest.fixture
def ds():
    a = np.array([[1., 2., 3.],
                  [4., 5., 6.]])
    b = np.array([[2., 2., 1.],
                  [4., 7., np.nan]])
    c = np.array([[1., 2., 2.],
                  [0., 5., 6.]])
    return Dataset({
        "a": DataArray(a, dims=("y", "x"), name="a"),
        "b": DataArray(b, dims=("y", "x"), name="b"),
        "c": DataArray(c, dims=("y", "x"), name="c"),
        "ref": DataArray(np.array([[1., 2., 1.], [2., 3., 1.]]),
                         dims=("y", "x"), name="ref"),
    })


def _cube(ds, names):
    return np.stack([np.asarray(ds[n].data) for n in names])


def test_cell_stats_sum(ds):
    out = np.asarray(cell_stats(ds, data_vars=["a", "b", "c"]).data)
    expected = _cube(ds, ["a", "b", "c"]).sum(axis=0)
    np.testing.assert_allclose(out, expected, equal_nan=True)
    assert np.isnan(out[1, 2])  # NaN propagates (non-nan-aware sum)


@pytest.mark.parametrize("func", ["max", "mean", "median", "min", "std"])
def test_cell_stats_funcs(ds, func):
    out = np.asarray(cell_stats(ds, data_vars=["a", "b", "c"],
                                func=func).data)
    npf = getattr(np, func)
    expected = npf(_cube(ds, ["a", "b", "c"]), axis=0)
    np.testing.assert_allclose(out, expected, equal_nan=True)


def test_cell_stats_validation(ds):
    with pytest.raises(TypeError):
        cell_stats("not a dataset")
    with pytest.raises(ValueError):
        cell_stats(ds, func="nope")
    with pytest.raises(ValueError):
        cell_stats(ds, data_vars=["missing"])
    with pytest.raises(TypeError):
        cell_stats(ds, data_vars="a")


def test_combine(ds):
    out = combine(ds, data_vars=["a", "b", "c"])
    arr = np.asarray(out.data)
    # first occurrences get 1, 2, 3...; repeats reuse ids; NaN rows NaN
    assert arr[0, 0] == 1.0
    assert arr[0, 1] == 2.0
    assert np.isnan(arr[1, 2])
    # identical combos share an id
    key = out.attrs["key"]
    assert key[1] == (1.0, 2.0, 1.0)
    combos = [tuple(_cube(ds, ["a", "b", "c"])[:, i, j])
              for i in range(2) for j in range(3)]
    seen = {}
    expected = []
    nxt = 1
    for cb in combos:
        if np.isnan(cb).any():
            expected.append(np.nan)
        elif cb in seen:
            expected.append(seen[cb])
        else:
            seen[cb] = nxt
            expected.append(nxt)
            nxt += 1
    np.testing.assert_allclose(arr.ravel(), expected, equal_nan=True)


def test_frequencies(ds):
    cube = _cube(ds, ["a", "b", "c"])
    ref = np.asarray(ds["ref"].data)
    nan_mask = np.isnan(cube).any(axis=0)

    out = np.asarray(lesser_frequency(ds, "ref",
                                      data_vars=["a", "b", "c"]).data)
    expected = np.where(nan_mask, np.nan, (ref[None] > cube).sum(axis=0))
    np.testing.assert_allclose(out, expected, equal_nan=True)

    out = np.asarray(equal_frequency(ds, "ref",
                                     data_vars=["a", "b", "c"]).data)
    expected = np.where(nan_mask, np.nan, (ref[None] == cube).sum(axis=0))
    np.testing.assert_allclose(out, expected, equal_nan=True)

    out = np.asarray(greater_frequency(ds, "ref",
                                       data_vars=["a", "b", "c"]).data)
    expected = np.where(nan_mask, np.nan, (ref[None] < cube).sum(axis=0))
    np.testing.assert_allclose(out, expected, equal_nan=True)


def test_frequency_excludes_ref_by_default(ds):
    out = np.asarray(lesser_frequency(ds, "ref").data)
    assert out.shape == (2, 3)
    with pytest.raises(ValueError):
        lesser_frequency(ds, "ref", data_vars=["ref", "a"])
    with pytest.raises(TypeError):
        lesser_frequency(ds, 3)


def test_positions(ds):
    cube = _cube(ds, ["a", "b", "c"])
    nan_mask = np.isnan(cube).any(axis=0)
    out = np.asarray(lowest_position(ds, data_vars=["a", "b", "c"]).data)
    expected = np.where(nan_mask, np.nan, cube.argmin(axis=0) + 1.0)
    np.testing.assert_allclose(out, expected, equal_nan=True)
    out = np.asarray(highest_position(ds, data_vars=["a", "b", "c"]).data)
    expected = np.where(nan_mask, np.nan, cube.argmax(axis=0) + 1.0)
    np.testing.assert_allclose(out, expected, equal_nan=True)


def test_popularity(ds):
    out = np.asarray(popularity(ds, "ref", data_vars=["a", "b", "c"]).data)
    cube = _cube(ds, ["a", "b", "c"])
    ref = np.asarray(ds["ref"].data)
    # oracle: reference loop semantics (local.py:546-633)
    expected = np.empty((2, 3))
    for i in range(2):
        for j in range(3):
            comb = cube[:, i, j]
            r = int(ref[i, j]) - 1
            counts = sorted(dict(Counter(comb)).keys())
            if np.isnan(comb).any() or len(counts) >= len(comb):
                expected[i, j] = np.nan
            elif len(counts) == 1:
                expected[i, j] = counts[0]
            elif r >= len(counts):
                expected[i, j] = np.nan
            else:
                expected[i, j] = counts[r]
    np.testing.assert_allclose(out, expected, equal_nan=True)


def test_rank(ds):
    out = np.asarray(rank(ds, "ref", data_vars=["a", "b", "c"]).data)
    cube = _cube(ds, ["a", "b", "c"])
    ref = np.asarray(ds["ref"].data)
    expected = np.empty((2, 3))
    for i in range(2):
        for j in range(3):
            comb = sorted(cube[:, i, j])
            r = int(ref[i, j]) - 1
            if np.isnan(comb).any() or r >= len(comb):
                expected[i, j] = np.nan
            else:
                expected[i, j] = comb[r]
    np.testing.assert_allclose(out, expected, equal_nan=True)
