"""Classification: binary, reclassify, quantile, natural_breaks (Jenks),
equal_interval, std_mean, head_tail_breaks, percentiles, maximum_breaks,
box_plot.

TPU-native counterpart of reference ``xrspatial/classify.py``: the per-pixel
binary-search bin kernel (classify.py:152-237) lowers to ``searchsorted`` +
gather on device; global statistics (quantiles/mean/std/max) are single
fused device reductions replacing the reference's eager dask passes; the
Jenks natural-breaks O(n^2 k) dynamic program (classify.py:508-564) runs as
a ``lax.scan`` over the sorted sample — each step vectorizes the reference's
inner loops across the VPU — with the same fixed-seed sampling
(RandomState(1234567890), classify.py:602) for cross-framework parity.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dataset_support import supports_dataset
from .utils import to_jax, wrap_like
from .xrlib import DataArray

__all__ = ["binary", "reclassify", "quantile", "natural_breaks",
           "equal_interval", "std_mean", "head_tail_breaks", "percentiles",
           "maximum_breaks", "box_plot"]


# ---------------------------------------------------------------------------
# core bin kernel
# ---------------------------------------------------------------------------

@jax.jit
def _bin_jit(data, bins, new_values):
    """val <= bins[0] -> class 0; bins[i-1] < val <= bins[i] -> class i;
    val > bins[-1] or non-finite -> NaN.  (reference classify.py:152-237)
    """
    data = data.astype(jnp.float32)
    # compare_all: gather-free bin search (bins tables are small)
    idx = jnp.searchsorted(bins.astype(jnp.float32), data, side="left",
                           method="compare_all")
    valid = jnp.isfinite(data) & (idx < bins.shape[0])
    gathered = new_values.astype(jnp.float32)[jnp.clip(idx, 0,
                                                       bins.shape[0] - 1)]
    return jnp.where(valid, gathered, jnp.nan)


def _bin(agg_or_data, bins, new_values):
    data = agg_or_data.data if isinstance(agg_or_data, DataArray) \
        else agg_or_data
    return _bin_jit(jnp.asarray(data), jnp.asarray(np.asarray(bins)),
                    jnp.asarray(np.asarray(new_values)))


@jax.jit
def _finite_or_nan(data):
    data = data.astype(jnp.float32)
    return jnp.where(jnp.isinf(data), jnp.nan, data)


# ---------------------------------------------------------------------------
# binary / reclassify
# ---------------------------------------------------------------------------

@jax.jit
def _binary_jit(data, values):
    data = data.astype(jnp.float32)
    member = jnp.zeros(data.shape, bool)
    # `values` is a small 1-D set; one fused comparison per value
    for i in range(values.shape[0]):
        member = member | (data == values[i])
    return jnp.where(jnp.isfinite(data),
                     member.astype(jnp.float32), jnp.nan)


@supports_dataset
def binary(agg, values, name='binary') -> DataArray:
    """1 where the cell value is in `values`, 0 otherwise; NaN/inf -> NaN."""
    vals = jnp.asarray(np.asarray(values, dtype=np.float32))
    out = _binary_jit(to_jax(agg), vals)
    return wrap_like(agg, out, name)


@supports_dataset
def reclassify(agg, bins, new_values,
               name: Optional[str] = 'reclassify') -> DataArray:
    """Classify into `new_values` by user-defined upper-bound `bins`."""
    if len(bins) != len(new_values):
        raise ValueError(
            'bins and new_values mismatch. Should have same length.')
    out = _bin(agg, bins, new_values)
    return wrap_like(agg, out, name)


# ---------------------------------------------------------------------------
# quantile / percentiles / equal_interval / std_mean / box_plot
# ---------------------------------------------------------------------------

@jax.jit
def _nanpercentile_jit(data, p):
    return jnp.nanpercentile(_finite_or_nan(data).ravel(), p)


def _nanpercentile(data, p_np):
    """nanpercentile dispatch: the sort-free radix select on TPU at
    scale (bit-identical; kernels/selection.py — jnp.nanpercentile's
    full lax.sort costs ~70 ms at 16.7M elements), else the jnp path.
    Mesh-sharded rasters take the SAME radix kernel class with the
    per-pass histograms psum-combined across the mesh (per-shard data
    never gathers; kernels/selection.py::nanpercentile_select_sharded),
    mirroring the reference's uniform dask distribution of quantile
    (/root/reference/xrspatial/classify.py:202)."""
    from .kernels.selection import (nanpercentile_select,
                                    nanpercentile_select_sharded,
                                    use_radix_percentile)
    from .parallel.halo import get_raster_mesh
    p_np = np.asarray(p_np, dtype=np.float32)
    if use_radix_percentile(data.size):
        mesh = get_raster_mesh(data)
        if mesh is None:
            return nanpercentile_select(_finite_or_nan(data).ravel(),
                                        jnp.asarray(p_np), int(p_np.size))
        return nanpercentile_select_sharded(_finite_or_nan(data),
                                            jnp.asarray(p_np),
                                            int(p_np.size), mesh)
    return _nanpercentile_jit(data, jnp.asarray(p_np))


def _quantile_bins(data, k: int) -> np.ndarray:
    w = 100.0 / k
    p = np.arange(w, 100 + w, w)
    if p[-1] > 100.0:
        p[-1] = 100.0
    q = np.asarray(_nanpercentile(data, p))
    return np.unique(q)


@supports_dataset
def quantile(agg, k: int = 4, name: Optional[str] = 'quantile') -> DataArray:
    """Classify into `k` quantile classes (equal counts per class)."""
    data = to_jax(agg)
    q = _quantile_bins(data, k)
    if q.shape[0] < k:
        print("Quantile Warning: Not enough unique values "
              "for k classes (using {} bins)".format(q.shape[0]))
        k = q.shape[0]
    out = _bin(data, q, np.arange(k))
    return wrap_like(agg, out, name)


@supports_dataset
def percentiles(agg, pct: Optional[List] = None,
                name: Optional[str] = 'percentiles') -> DataArray:
    """Classify by explicit percentile breakpoints (default [25,50,75,100])."""
    if pct is None:
        pct = [25, 50, 75, 100]
    for p in pct:
        if not 0 < p <= 100:
            raise ValueError("percentiles must be in (0, 100]")
    data = to_jax(agg)
    q = np.unique(np.asarray(
        _nanpercentile(data, np.asarray(pct, dtype=float))))
    out = _bin(data, q, np.arange(len(q)))
    return wrap_like(agg, out, name)


@jax.jit
def _min_max_jit(data):
    clean = _finite_or_nan(data)
    return jnp.nanmin(clean), jnp.nanmax(clean)


@supports_dataset
def equal_interval(agg, k: int = 5,
                   name: Optional[str] = 'equal_interval') -> DataArray:
    """Classify into `k` classes of equal value-range width."""
    data = to_jax(agg)
    mn, mx = _min_max_jit(data)
    min_data, max_data = float(mn), float(mx)
    width = (max_data - min_data) / k
    if width == 0 or not np.isfinite(width):
        # constant raster: one class (the reference crashes with
        # ZeroDivisionError here; degrading gracefully instead)
        cuts = np.array([max_data])
    else:
        cuts = np.arange(min_data + width, max_data + width, width)
        if cuts.shape[0] > k:
            cuts = cuts[0:k]
        cuts[-1] = max_data
    out = _bin(data, cuts, np.arange(cuts.shape[0]))
    return wrap_like(agg, out, name)


@jax.jit
def _mean_std_max_jit(data):
    clean = _finite_or_nan(data)
    return jnp.nanmean(clean), jnp.nanstd(clean), jnp.nanmax(clean)


@supports_dataset
def std_mean(agg, name: Optional[str] = 'std_mean') -> DataArray:
    """Classify by standard deviations from the mean
    (breaks at mean ± 1σ, ± 2σ, max)."""
    data = to_jax(agg)
    m, s, mx = (float(v) for v in _mean_std_max_jit(data))
    bins = np.sort(np.unique([m - 2 * s, m - s, m + s, m + 2 * s, mx]))
    out = _bin(data, bins, np.arange(len(bins)))
    return wrap_like(agg, out, name)


@supports_dataset
def box_plot(agg, hinge: float = 1.5,
             name: Optional[str] = 'box_plot') -> DataArray:
    """Classify by box-plot fences: q1-h*iqr, q1, q2, q3, q3+h*iqr, max."""
    data = to_jax(agg)
    q = np.asarray(_nanpercentile(data, [25.0, 50.0, 75.0]))
    q1, q2, q3 = (float(v) for v in q)
    if not np.isfinite([q1, q2, q3]).all():
        # all-NaN input: the fences are undefined; all-NaN output
        return wrap_like(agg, jnp.full(data.shape, jnp.nan, jnp.float32),
                         name)
    max_v = float(_min_max_jit(data)[1])
    iqr = q3 - q1
    raw = [q1 - hinge * iqr, q1, q2, q3, q3 + hinge * iqr, max_v]
    bins = np.sort(np.unique(raw))
    bins = bins[bins <= max_v]
    if bins[-1] < max_v:
        bins = np.append(bins, max_v)
    out = _bin(data, bins, np.arange(len(bins)))
    return wrap_like(agg, out, name)


# ---------------------------------------------------------------------------
# head/tail breaks
# ---------------------------------------------------------------------------

@jax.jit
def _masked_mean_count(data, mask):
    cnt = jnp.sum(mask)
    total = jnp.sum(jnp.where(mask, data, 0.0))
    return total / jnp.maximum(cnt, 1), cnt


@supports_dataset
def head_tail_breaks(agg,
                     name: Optional[str] = 'head_tail_breaks') -> DataArray:
    """Head/Tail Breaks: iteratively split at the mean while the head
    holds <= 40% of the data (heavy-tailed distributions)."""
    data = _finite_or_nan(to_jax(agg))
    mask = jnp.isfinite(data)
    bins = []
    total = int(jnp.sum(mask))
    while total > 1:
        mean_v, _ = _masked_mean_count(data, mask)
        mean_f = float(mean_v)
        bins.append(mean_f)
        new_mask = mask & (data > mean_f)
        head = int(jnp.sum(new_mask))
        if head == 0 or head / total > 0.40:
            break
        mask = new_mask
        total = head
    if not bins:
        bins = [float(jnp.nanmean(data))]
    bins.append(float(jnp.nanmax(data)))
    bins = np.array(bins)
    out = _bin(data, bins, np.arange(len(bins)))
    return wrap_like(agg, out, name)


# ---------------------------------------------------------------------------
# maximum breaks
# ---------------------------------------------------------------------------

@supports_dataset
def maximum_breaks(agg, k: int = 5,
                   name: Optional[str] = 'maximum_breaks') -> DataArray:
    """Break at the k-1 largest gaps between sorted unique values."""
    values = np.asarray(to_jax(agg)).ravel()
    values = values[np.isfinite(values)]
    uv = np.unique(values)
    if uv.size == 0:
        # all-NaN input: all-NaN output (graceful; the reference indexes
        # the empty unique array and raises)
        return wrap_like(agg, jnp.full(to_jax(agg).shape, jnp.nan,
                                       jnp.float32), name)
    if len(uv) < k:
        bins = uv
    else:
        diffs = np.diff(uv)
        n_gaps = min(k - 1, len(diffs))
        top = np.argsort(diffs, kind='stable')[-n_gaps:]
        top.sort()
        bins = np.array([(uv[i] + uv[i + 1]) / 2.0 for i in top])
        bins = np.append(bins, float(uv[-1]))
    out = _bin(agg, bins, np.arange(len(bins)))
    return wrap_like(agg, out, name)


# ---------------------------------------------------------------------------
# natural breaks (Jenks) — lax.scan dynamic program
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_classes",))
def _jenks_matrices_jit(data, n_classes: int):
    """Lower-class-limit matrix of the Jenks DP (reference classify.py:508-564).

    ``data`` is sorted ascending, float32, length n.  The reference's two
    nested loops over (l, m) become a scan over l with the m-loop
    vectorized: windowed sums via reversed cumulative sums, and the
    running-min update (ties -> larger m) via a reversed argmin.
    """
    n = data.shape[0]
    kk = n_classes + 1

    lcl = jnp.zeros((n + 1, kk), jnp.float32)
    lcl = lcl.at[1, 1:].set(1.0)
    var_comb = jnp.zeros((n + 1, kk), jnp.float32)
    var_comb = var_comb.at[2:, 1:].set(jnp.inf)

    idx_m = jnp.arange(n)

    def step(carry, l):
        lcl, var_comb = carry
        # t[j] = data[l-1-j] (window values, right to left); mask j >= l
        gather_idx = jnp.clip(l - 1 - idx_m, 0, n - 1)
        t = data[gather_idx]
        valid_m = idx_m < l
        w = (idx_m + 1).astype(jnp.float32)
        csum = jnp.cumsum(t.astype(jnp.float32))
        csumsq = jnp.cumsum((t * t).astype(jnp.float32))
        variance_m = csumsq - (csum * csum) / w          # (n,)
        i4 = l - 1 - idx_m                                # (n,)
        inner_ok = valid_m & (i4 >= 1)

        def upd(j, state):
            lcl, var_comb = state
            cand = variance_m + var_comb[jnp.clip(i4, 0, n), j - 1]
            cand = jnp.where(inner_ok, cand, jnp.inf)
            # running ">=" update === minimum with largest-m tie-break
            rev = cand[::-1]
            m_star = (n - 1) - jnp.argmin(rev)
            best = cand[m_star]
            take = best <= var_comb[l, j]  # matches reference's >= compare
            lcl = lcl.at[l, j].set(jnp.where(
                take, (l - m_star).astype(jnp.float32), lcl[l, j]))
            var_comb = var_comb.at[l, j].set(jnp.minimum(var_comb[l, j],
                                                         best))
            return lcl, var_comb

        lcl, var_comb = jax.lax.fori_loop(2, kk, upd, (lcl, var_comb))
        full_var = variance_m[l - 1]  # m = l-1 (whole window)
        lcl = lcl.at[l, 1].set(1.0)
        var_comb = var_comb.at[l, 1].set(full_var)
        return (lcl, var_comb), None

    (lcl, var_comb), _ = jax.lax.scan(step, (lcl, var_comb),
                                      jnp.arange(2, n + 1))
    return lcl


def _run_jenks(sample_data: np.ndarray, n_classes: int) -> np.ndarray:
    data = np.sort(sample_data).astype(np.float32)
    lcl = np.asarray(_jenks_matrices_jit(jnp.asarray(data), n_classes))
    k = data.shape[0]
    kclass = np.zeros(n_classes + 1, dtype=np.float32)
    kclass[0] = data[0]
    kclass[-1] = data[-1]
    count_num = n_classes
    while count_num > 1:
        elt = int(lcl[k][count_num] - 2)
        kclass[count_num - 1] = data[elt]
        k = int(lcl[k][count_num] - 1)
        count_num -= 1
    return kclass


def _natural_break_bins(values: np.ndarray, num_sample: Optional[int],
                        k: int, max_data: float):
    num_data = values.size
    if num_sample is not None and num_sample < num_data:
        # fixed-seed linspace+shuffle sampling for cross-framework parity
        # (reference classify.py:598-609)
        generator = np.random.RandomState(1234567890)
        idx = np.linspace(0, num_data, num_data, endpoint=False,
                          dtype=np.uint32)
        generator.shuffle(idx)
        sample_data = values[idx[:num_sample]]
    else:
        sample_data = values

    sample_data = np.asarray(sample_data)
    sample_data = sample_data[np.isfinite(sample_data)]
    uv = np.unique(sample_data)
    uvk = len(uv)

    if uvk < k:
        with warnings.catch_warnings():
            warnings.simplefilter('default')
            warnings.warn('natural_breaks Warning: Not enough unique values '
                          'in data array for {} classes. '
                          'n_samples={} should be >= n_clusters={}. '
                          'Using k={} instead.'.format(k, uvk, k, uvk),
                          Warning)
        uv.sort()
        bins = uv
    else:
        centroids = _run_jenks(sample_data, k)
        bins = np.array(centroids[1:])
        bins[-1] = max_data
    return bins, uvk


@supports_dataset
def natural_breaks(agg, num_sample: Optional[int] = 20000,
                   name: Optional[str] = 'natural_breaks',
                   k: int = 5) -> DataArray:
    """Jenks natural-breaks classification into `k` classes.

    Fits on a fixed-seed sample of `num_sample` points (the DP is O(n^2 k));
    the DP itself runs on device via lax.scan.
    """
    data = to_jax(agg)
    values = np.asarray(data).ravel()
    if not np.isfinite(values).any():
        # no finite values to fit on: every cell is NaN out (graceful;
        # the reference's jenks sampler would raise on an empty sample)
        return wrap_like(agg, jnp.full(data.shape, jnp.nan, jnp.float32),
                         name)
    max_data = float(_min_max_jit(data)[1])
    bins, uvk = _natural_break_bins(values, num_sample, k, max_data)
    out = _bin(data, bins, np.arange(uvk))
    return wrap_like(agg, out, name)
