"""Local (cell-by-cell, across-variables) toolset over Datasets.

TPU-native counterpart of reference ``xrspatial/local.py``: the reference
iterates every pixel with ``np.nditer`` + python tuples (local.py:66-73 —
"very slow pure Python" per SURVEY §2) — here all ops are vectorized
reductions over a stacked (V, H, W) cube; per-pixel sorted-unique logic
(popularity/rank) uses sort + cumsum dedup tricks along the variable axis.

Semantics preserved exactly, including the quirks: NaN in any DATA
variable makes the output cell NaN, but a NaN in the *reference*
variable of the frequency tools yields 0, not NaN (the reference only
NaN-checks the data vars, local.py:233 — NaN comparisons are all
False); positions are 1-indexed with first-occurrence ties;
``popularity`` indexes the *sorted unique values* (not sorted by
frequency) and returns NaN when all values are distinct; outputs are
bare DataArrays without coords, exactly like the reference's
``xr.DataArray(final_arr)`` returns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .xrlib import DataArray, Dataset

__all__ = ["cell_stats", "combine", "lesser_frequency", "equal_frequency",
           "greater_frequency", "lowest_position", "highest_position",
           "popularity", "rank"]

_FUNCS = ("max", "mean", "median", "min", "std", "sum")


def _validate(raster, data_vars, ref_var=None):
    if not isinstance(raster, Dataset):
        raise TypeError(
            "Expected raster to be a 'xarray.Dataset'. "
            f"Received '{type(raster).__name__}' instead.")
    if ref_var is not None:
        if not isinstance(ref_var, str):
            raise TypeError(
                "Expected ref_var to be a 'str'. "
                f"Received '{type(ref_var).__name__}' instead.")
        if ref_var not in list(raster.data_vars):
            raise ValueError('raster must contain ref_var.')
    if data_vars:
        if (not isinstance(data_vars, list)
                or not all(isinstance(v, str) for v in data_vars)):
            raise TypeError('Expected data_vars to be a list of string.')
        if not set(data_vars).issubset(set(raster.data_vars)):
            raise ValueError(
                "raster must contain all the variables of data_vars. "
                f"The variables available are '{list(raster.data_vars)}'.")
        if ref_var is not None and ref_var in data_vars:
            raise ValueError('ref_var must not be an element of data_vars.')
    else:
        data_vars = list(raster.data_vars)
        if ref_var is not None:
            data_vars.remove(ref_var)
    return data_vars


def _stack(raster, data_vars):
    return jnp.stack(
        [jnp.asarray(raster[v].data, dtype=jnp.float64
                     if jax.config.jax_enable_x64 else jnp.float32)
         for v in data_vars], axis=0)


def _nan_any(cube):
    return jnp.any(jnp.isnan(cube), axis=0)


def cell_stats(raster: Dataset, data_vars=None, func: str = 'sum'):
    """Per-cell statistic across Dataset variables
    (max/mean/median/min/std/sum)."""
    if not isinstance(raster, Dataset):
        raise TypeError(
            "Expected raster to be a 'xarray.Dataset'. "
            f"Received '{type(raster).__name__}' instead.")
    if func not in _FUNCS:
        raise ValueError(
            f'{func} is not supported. '
            f"The supported types are '{list(_FUNCS)}'.")
    data_vars = _validate(raster, data_vars)
    cube = _stack(raster, data_vars)
    out = {
        'max': lambda c: jnp.max(c, axis=0),
        'mean': lambda c: jnp.mean(c, axis=0),
        'median': lambda c: jnp.median(c, axis=0),
        'min': lambda c: jnp.min(c, axis=0),
        'std': lambda c: jnp.std(c, axis=0),
        'sum': lambda c: jnp.sum(c, axis=0),
    }[func](cube)
    return DataArray(out)


def combine(raster: Dataset, data_vars=None):
    """Assign one output id per unique combination of variable values.

    Ids are 1..n in first-occurrence scan order; any-NaN cells are NaN.
    The id -> combination mapping is stored in ``attrs['key']``.
    """
    data_vars = _validate(raster, data_vars)
    cube = np.stack([np.asarray(raster[v].data) for v in data_vars], axis=0)
    v, h, w = cube.shape
    rows = cube.reshape(v, -1).T  # (H*W, V)
    nan_mask = np.isnan(rows).any(axis=1)

    out = np.full(rows.shape[0], np.nan)
    clean = rows[~nan_mask]
    if clean.shape[0]:
        _, first_idx, inverse = np.unique(clean, axis=0, return_index=True,
                                          return_inverse=True)
        # renumber so ids follow first-occurrence order
        order = np.argsort(np.argsort(first_idx))
        ids = order[inverse] + 1
        out[~nan_mask] = ids
        unique_values = {}
        uniq_rows = clean[np.sort(first_idx)]
        for i, row in enumerate(uniq_rows):
            unique_values[i + 1] = tuple(row.tolist())
    else:
        unique_values = {}
    final = DataArray(out.reshape(h, w))
    final.attrs['key'] = unique_values
    return final


def _frequency(raster, ref_var, data_vars, op):
    data_vars = _validate(raster, data_vars, ref_var)
    cube = _stack(raster, data_vars)
    ref = jnp.asarray(raster[ref_var].data, dtype=cube.dtype)
    count = jnp.sum(op(ref[None], cube), axis=0).astype(cube.dtype)
    out = jnp.where(_nan_any(cube), jnp.nan, count)
    return DataArray(out)  # stays on device (bare coords = reference)


def lesser_frequency(raster: Dataset, ref_var: str, data_vars=None):
    """Count of variables whose value is less than the reference."""
    return _frequency(raster, ref_var, data_vars, lambda r, c: r > c)


def equal_frequency(raster: Dataset, ref_var: str, data_vars=None):
    """Count of variables whose value equals the reference."""
    return _frequency(raster, ref_var, data_vars, lambda r, c: r == c)


def greater_frequency(raster: Dataset, ref_var: str, data_vars=None):
    """Count of variables whose value is greater than the reference."""
    return _frequency(raster, ref_var, data_vars, lambda r, c: r < c)


def _position(raster, data_vars, arg_fn):
    data_vars = _validate(raster, data_vars)
    cube = _stack(raster, data_vars)
    pos = arg_fn(cube, axis=0) + 1
    out = jnp.where(_nan_any(cube), jnp.nan, pos.astype(cube.dtype))
    return DataArray(out)  # stays on device (bare coords = reference)


def lowest_position(raster: Dataset, data_vars=None):
    """1-indexed variable position of the per-cell minimum (first tie)."""
    return _position(raster, data_vars, jnp.argmin)


def highest_position(raster: Dataset, data_vars=None):
    """1-indexed variable position of the per-cell maximum (first tie)."""
    return _position(raster, data_vars, jnp.argmax)


def popularity(raster: Dataset, ref_var: str, data_vars=None):
    """Value selected from each cell's sorted unique values by the
    reference index; NaN when all values are distinct."""
    data_vars = _validate(raster, data_vars, ref_var)
    cube = _stack(raster, data_vars)
    v = cube.shape[0]
    ref_idx = (jnp.asarray(raster[ref_var].data).astype(jnp.int32) - 1)

    s = jnp.sort(cube, axis=0)
    is_new = jnp.concatenate(
        [jnp.ones((1,) + s.shape[1:], bool), s[1:] != s[:-1]], axis=0)
    distinct_rank = jnp.cumsum(is_new, axis=0) - 1  # (V, H, W)
    n_unique = jnp.sum(is_new, axis=0)

    # negative reference indices wrap (python list-indexing semantics of
    # the reference's comb_counts[comb_ref], local.py:627)
    eff_idx = jnp.where(ref_idx < 0, n_unique + ref_idx, ref_idx)
    pick = is_new & (distinct_rank == eff_idx[None])
    picked = jnp.sum(jnp.where(pick, s, 0.0), axis=0)

    out = jnp.where(n_unique == 1, s[0], picked)
    out = jnp.where((ref_idx >= n_unique) & (n_unique != 1), jnp.nan, out)
    out = jnp.where(_nan_any(cube) | (n_unique >= v), jnp.nan, out)
    return DataArray(np.asarray(out))


def rank(raster: Dataset, ref_var: str, data_vars=None):
    """Per-cell value at the reference's rank in ascending sorted order."""
    data_vars = _validate(raster, data_vars, ref_var)
    cube = _stack(raster, data_vars)
    v = cube.shape[0]
    ref_idx = (jnp.asarray(raster[ref_var].data).astype(jnp.int32) - 1)
    s = jnp.sort(cube, axis=0)
    # negative ranks wrap, like the reference's comb[comb_ref] list indexing
    eff_idx = jnp.where(ref_idx < 0, v + ref_idx, ref_idx)
    gathered = jnp.take_along_axis(
        s, jnp.clip(eff_idx, 0, v - 1)[None], axis=0)[0]
    out = jnp.where(_nan_any(cube) | (ref_idx >= v) | (eff_idx < 0),
                    jnp.nan, gathered)
    return DataArray(np.asarray(out))
