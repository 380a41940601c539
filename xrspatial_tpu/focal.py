"""Focal statistics: mean filter, masked-window apply, focal_stats, hotspots.

TPU-native counterpart of reference ``xrspatial/focal.py``: the Numba
masked-window gather (+ per-stat funcs, :268-326) and the seven per-stat
CUDA kernels (:476-754) lower to one fused shifted-reads program
(kernels/window.py) that computes ALL requested statistics in a single pass
over the kernel footprint; ``hotspots`` fuses convolution + z-score +
classification under one jit, mirroring the reference's hand-fused dask
path (:940-984).  Distribution: window-radius halos via the shared
ppermute engine (the generalization of step-4's radius-1 halos).
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np

from .convolution import convolve_2d, custom_kernel
from .dataset_support import supports_dataset
from .kernels.dispatch import run_stencil
from .kernels.window import (UNROLL_MAX_OFFSETS, hotspots_classify,
                             kernel_offsets, window_stats)
from .utils import to_jax, wrap_like, x64
from .xrlib import DataArray

__all__ = ["mean", "apply", "focal_stats", "hotspots"]

_STAT_NAMES = ("mean", "max", "min", "range", "std", "var", "sum")


# Named stat functions, usable as `func=` for apply(); each also works as a
# plain numpy callable on a window buffer (the host escape hatch for custom
# functions mirrors the reference's numba-func contract, focal.py:305-326).

def _tag(fn, name):
    fn._stat = name
    return fn


_calc_mean = _tag(lambda a: np.nanmean(a), "mean")
_calc_sum = _tag(lambda a: np.nansum(a), "sum")
_calc_min = _tag(lambda a: np.nanmin(a), "min")
_calc_max = _tag(lambda a: np.nanmax(a), "max")
_calc_std = _tag(lambda a: np.nanstd(a), "std")
_calc_var = _tag(lambda a: np.nanvar(a), "var")
_calc_range = _tag(lambda a: np.nanmax(a) - np.nanmin(a), "range")


@supports_dataset
def mean(agg, passes: int = 1, excludes=[np.nan], name: str = 'mean'):
    """3x3 NaN-excluding mean filter, run `passes` times.

    Cells whose value equals any entry of `excludes` (NaN-aware equality)
    are left unchanged; all others become the nanmean of their clipped
    3x3 neighborhood.  Matches reference focal.py:44-67, including the
    output dtype: results are written back in the INPUT dtype (the
    reference assigns into ``np.zeros_like(data)``), so integer rasters
    get truncated means.
    """
    in_dtype = agg.data.dtype
    with x64():
        out = to_jax(agg, None).astype(jnp.float64)
        for _ in range(passes):
            out = _mean_distributed(out, excludes)
        out = out.astype(in_dtype)
    return wrap_like(agg, out, name)


def _mean_distributed(data, excludes):
    # clipped-window semantics at shard edges are reproduced by the NaN
    # halo (nanmean ignores padding either way)
    excl = jnp.asarray(np.asarray(excludes, dtype=np.float64))
    return run_stencil(_mean_kernel_jit, 1, data, excl)


@jax.jit
def _mean_kernel_jit(block, excl):
    from .kernels.window import _focal_mean_one_pass
    return _focal_mean_one_pass(block, excl, excl.shape[0])


import os
from functools import lru_cache


def _use_pallas(data=None) -> bool:
    if os.environ.get("XRSPATIAL_NO_PALLAS") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    # small outputs get placed wholly in VMEM by XLA and overflow the 16MB
    # budget; the fused-XLA path is fine (and fast) at these sizes anyway
    return data is None or data.size >= (2048 * 2048)


@lru_cache(maxsize=256)
def _stats_kernel(offsets: tuple, stats: tuple):
    # One jitted program for gather + all stats + stack: XLA reuses
    # intermediate buffers, keeping peak memory at input + padded + output.
    @jax.jit
    def kern(block):
        outs = window_stats(block, offsets, stats)
        return jnp.stack([outs[s] for s in stats])
    return kern


@lru_cache(maxsize=256)
def _stats_kernel_pallas(offsets: tuple, stats: tuple):
    from .kernels.pallas_window import focal_stats_pallas
    from .kernels.pallas_window2 import (focal_stats_tiled,
                                         tiled_radius_supported)
    ry = max(abs(dy) for dy, _ in offsets)
    rx = max(abs(dx) for _, dx in offsets)

    def kern(block):
        h, w = block.shape
        # tile interiors need th > 2*ry (tiled) / a >=2 grid dim (halo
        # windows); thin rasters take the fused-XLA path instead, and
        # huge kernels take the conv/reduce-window formulation (the
        # unrolled Pallas bodies would be compile-pathological)
        if len(offsets) > UNROLL_MAX_OFFSETS:
            return _stats_kernel(offsets, stats)(block)
        if (tiled_radius_supported(ry, rx)
                and h > 2 * ry + 8 and w > 2 * rx + 128):
            # classic-pipeline tiled kernel: ~2x the emit_pipeline variant
            return focal_stats_tiled(block, offsets, stats)
        if h >= 16 and w >= 256:
            return focal_stats_pallas(block, offsets, stats)
        return _stats_kernel(offsets, stats)(block)
    return kern


def _window_stats_distributed(data, kernel: np.ndarray, stats: tuple):
    offsets = kernel_offsets(kernel)
    ry = max(abs(dy) for dy, _ in offsets) if offsets else 0
    rx = max(abs(dx) for _, dx in offsets) if offsets else 0
    kern = (_stats_kernel_pallas(offsets, stats) if _use_pallas(data)
            else _stats_kernel(offsets, stats))
    return run_stencil(kern, (ry, rx), data)


def apply(raster, kernel, func=_calc_mean, name: str = 'focal_apply'):
    """Apply a function over a masked kernel window at every pixel.

    `func` may be one of the named stat functions in this module (fast,
    fused on-device path) or any Python callable taking the (Kh, Kw)
    window buffer (NaN outside the kernel/raster) — the host escape
    hatch, matching the reference's numba-function contract.
    """
    if not isinstance(raster, DataArray):
        raise TypeError("`raster` must be instance of DataArray")
    if raster.ndim != 2:
        raise ValueError("`raster` must be 2D")
    kernel = custom_kernel(np.asarray(kernel))

    stat = getattr(func, "_stat", None)
    if stat in _STAT_NAMES:
        out = _window_stats_distributed(to_jax(raster), kernel, (stat,))[0]
    else:
        out = _apply_host(np.asarray(raster.data, dtype=np.float32),
                          kernel, func)
        out = jnp.asarray(out)
    return wrap_like(raster, out, name)


def _apply_host(data: np.ndarray, kernel: np.ndarray, func) -> np.ndarray:
    """Host fallback for arbitrary Python window functions.

    The window gather + kernel masking is vectorized
    (``sliding_window_view`` + one batched ``np.where`` per row-chunk,
    bounded to ~160 MB of transient windows); only the user callable
    itself runs per pixel — 10-30x the naive per-pixel copy/fancy-index
    loop, same contract (func sees a (Kh, Kw) buffer, NaN outside the
    kernel footprint / raster).  Matches the reference's numba-compiled
    custom-func apply (reference focal.py:305-326) in semantics; a
    Python callable per pixel is the honest TPU-side equivalent.
    """
    from numpy.lib.stride_tricks import sliding_window_view
    rows, cols = data.shape
    krows, kcols = kernel.shape
    hr, hc = krows // 2, kcols // 2
    padded = np.full((rows + 2 * hr, cols + 2 * hc), np.nan, dtype=data.dtype)
    padded[hr:hr + rows, hc:hc + cols] = data
    kmask = kernel == 1
    out = np.empty_like(data)
    oflat = out.reshape(-1)
    wins = sliding_window_view(padded, (krows, kcols))  # (rows, cols, Kh, Kw)
    rows_per_chunk = max(1, int(4e7 // max(cols * krows * kcols, 1)))
    for y0 in range(0, rows, rows_per_chunk):
        m = np.where(kmask, wins[y0:y0 + rows_per_chunk], np.nan)
        mflat = m.reshape(-1, krows, kcols)
        base = y0 * cols
        for i in range(mflat.shape[0]):
            oflat[base + i] = func(mflat[i])
    return out


def focal_stats(agg, kernel,
                stats_funcs=['mean', 'max', 'min', 'range', 'std', 'var',
                             'sum']):
    """Focal statistics over a kernel neighborhood for every pixel.

    Returns a 3D (stats, y, x) DataArray.  All statistics are computed in
    ONE fused pass over the kernel footprint (the reference runs a full
    pass per statistic, focal.py:782-797).

    Accuracy note: kernels with more than ~1024 cells take a
    conv/reduce-window formulation whose std/var use a single-pass
    centered sum of squares with f32 accumulation; windows whose local
    mean sits far from the raster's global mean can exceed the 1e-5
    contract there (documented trade-off — see kernels/window.py
    `_window_stats_conv`).  Small/medium kernels are unaffected.
    """
    if not isinstance(agg, DataArray):
        raise TypeError("`agg` must be instance of DataArray")
    if agg.ndim != 2:
        raise ValueError("`agg` must be 2D")
    kernel = custom_kernel(np.asarray(kernel))
    for s in stats_funcs:
        if s not in _STAT_NAMES:
            raise ValueError(f"unknown stat {s!r}; supported: {_STAT_NAMES}")

    stacked = _window_stats_distributed(to_jax(agg), kernel,
                                        tuple(stats_funcs))
    # wrap the stacked device array directly (no per-stat slicing/restack —
    # that would copy the multi-GB result twice)
    out = DataArray(stacked, dims=("stats",) + tuple(agg.dims),
                    name="focal_apply", attrs=dict(agg.attrs))
    for cname, cval in agg.coords.items():
        out.coords[cname] = cval
    out.coords["stats"] = DataArray(np.asarray(list(stats_funcs)),
                                    dims=("stats",), name="stats")
    return out


@jax.jit
def _zscore_classify(conv, global_mean, global_std):
    z = (conv - global_mean) / global_std
    return hotspots_classify(z)


def hotspots(raster, kernel) -> DataArray:
    """Statistically significant hot/cold spots (Getis-Ord style).

    Output int8 values in {0, ±90, ±95, ±99} (confidence levels).
    Fused on device: kernel-mean convolution -> global z-score ->
    classification (reference focal.py:881-984).
    """
    if not isinstance(raster, DataArray):
        raise TypeError("`raster` must be instance of DataArray")
    if raster.ndim != 2:
        raise ValueError("`raster` must be 2D")
    dtype = np.dtype(raster.data.dtype)
    if not (np.issubdtype(dtype, np.integer)
            or np.issubdtype(dtype, np.floating)):
        raise ValueError("data type must be integer or float")

    kernel = custom_kernel(np.asarray(kernel))
    data = to_jax(raster)

    global_mean = jnp.nanmean(data)
    global_std = jnp.nanstd(data)
    if float(global_std) == 0:
        raise ZeroDivisionError(
            "Standard deviation of the input raster values is 0.")

    conv = convolve_2d(data, kernel / kernel.sum())
    out = _zscore_classify(conv, global_mean, global_std)

    attrs = copy.deepcopy(dict(raster.attrs))
    attrs['unit'] = '%'
    result = wrap_like(raster, out, None)
    result.attrs = attrs
    return result
