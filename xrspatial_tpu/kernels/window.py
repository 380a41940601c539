"""Masked window reductions: convolution, focal statistics, hotspots.

TPU-native counterpart of the reference's focal/convolution kernels
(``focal.py:305-326`` masked-window gather + per-stat Numba funcs,
``focal.py:476-754`` per-stat CUDA kernels, ``convolution.py:285-365``):
each kernel footprint cell becomes one shifted read of a NaN-padded input,
and XLA fuses the shift/accumulate chain into a single VMEM-tiled loop.
All requested statistics share one pass over the shifts (the reference runs
one full pass per statistic).

Semantics mirrored:
- window cells where kernel != 1 or out-of-bounds are excluded (NaN in the
  reference's gather buffer, focal.py:305-326); every output pixel is
  computed — focal ops have NO NaN border.
- convolution has a NaN border of the kernel radius and does NOT skip NaNs
  inside (convolution.py:285-313).
- std/var are population (ddof=0) two-pass, matching np.nanstd on the
  window buffer.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["window_stats", "convolve2d_jit", "hotspots_classify",
           "focal_mean_pass", "kernel_offsets"]


def kernel_offsets(kernel: np.ndarray) -> Tuple[Tuple[int, int], ...]:
    """(dy, dx) offsets (relative to center) of the kernel's 1-cells."""
    kh, kw = kernel.shape
    cy, cx = kh // 2, kw // 2
    offs = [(int(y - cy), int(x - cx))
            for y, x in zip(*np.nonzero(kernel == 1))]
    return tuple(offs)


def _shifted(padded, dy, dx, h, w, ry, rx):
    return jax.lax.dynamic_slice(padded, (ry + dy, rx + dx), (h, w))


# beyond this many footprint cells the unrolled shift/accumulate chain
# is compile-pathological (a 2 km circle at 30 m cells is ~14k offsets:
# tens of minutes through the remote compile service); the conv /
# reduce-window formulation compiles as a handful of ops instead
UNROLL_MAX_OFFSETS = 1024


def _offsets_mask(offsets):
    ry = max(abs(dy) for dy, _ in offsets)
    rx = max(abs(dx) for _, dx in offsets)
    mask = np.zeros((2 * ry + 1, 2 * rx + 1), np.float32)
    for dy, dx in offsets:
        mask[dy + ry, dx + rx] = 1.0
    return mask, ry, rx


@partial(jax.jit, static_argnames=("offsets", "stats"))
def _window_stats_conv(data, offsets, stats):
    """Large-kernel focal statistics without per-offset unrolling.

    sum/count/sumsq lower to ONE lax.conv each (MXU); min/max decompose
    the kernel mask into per-row contiguous runs, each served by one
    XLA reduce_window.  NaN-exclusion semantics match the unrolled
    path.  std/var use the algebraic centered-sum-of-squares around the
    GLOBAL mean (exact shift-invariance; two-pass per-window deviations
    would need a conv per output pixel) — f32-accurate for windows
    whose local mean is not enormously far from the global mean, which
    is the documented trade-off of this huge-kernel tail path.
    """
    data = data.astype(jnp.float32)
    h, w = data.shape
    mask, ry, rx = _offsets_mask(offsets)
    kf = jnp.asarray(mask)
    ok = ~jnp.isnan(data)   # match the unrolled path: inf participates
    c = jnp.nanmean(data)
    v0 = jnp.where(ok, data - c, 0.0)

    def conv(x):
        xp = jnp.pad(x, ((ry, ry), (rx, rx)))
        # HIGHEST: the TPU conv default rounds operands to bfloat16,
        # which would cost ~8 mantissa bits on every sum/mean
        return jax.lax.conv_general_dilated(
            xp[None, None], kf[None, None], window_strides=(1, 1),
            padding="VALID", preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[0, 0]

    need_sum = any(s in stats for s in ("sum", "mean", "std", "var"))
    need_minmax = any(s in stats for s in ("min", "max", "range"))

    out = {}
    if need_sum:
        cnt = conv(ok.astype(jnp.float32))
        cnt = jnp.round(cnt)  # counts are exact ints below 2^24
        ssum_c = conv(v0)
        safe = jnp.maximum(cnt, 1.0)
        mean = jnp.where(cnt > 0, ssum_c / safe + c, jnp.nan)
        if "mean" in stats:
            out["mean"] = mean
        if "sum" in stats:
            # np.nansum of an all-NaN buffer is 0.0 (reference _calc_sum);
            # cnt*c would be 0*NaN there
            out["sum"] = jnp.where(cnt > 0, ssum_c + cnt * c, 0.0)
        if "std" in stats or "var" in stats:
            ssq_c = conv(v0 * v0)
            css = jnp.maximum(ssq_c - ssum_c * ssum_c / safe, 0.0)
            var = jnp.where(cnt > 0, css / safe, jnp.nan)
            if "var" in stats:
                out["var"] = var
            if "std" in stats:
                out["std"] = jnp.sqrt(var)
    if need_minmax:
        neg = jnp.float32(-jnp.inf)
        pos = jnp.float32(jnp.inf)
        pmax = jnp.pad(jnp.where(ok, data, neg), ((ry, ry), (rx, rx)),
                       constant_values=neg)
        pmin = jnp.pad(jnp.where(ok, data, pos), ((ry, ry), (rx, rx)),
                       constant_values=pos)
        smax = jnp.full((h, w), neg)
        smin = jnp.full((h, w), pos)
        for r in range(mask.shape[0]):
            row = mask[r]
            # contiguous runs of 1s in this kernel row
            j = 0
            while j < row.shape[0]:
                if row[j] != 1.0:
                    j += 1
                    continue
                j0 = j
                while j < row.shape[0] and row[j] == 1.0:
                    j += 1
                L = j - j0
                rw = jax.lax.reduce_window(
                    pmax, neg, jax.lax.max, (1, L), (1, 1), "VALID")
                smax = jnp.maximum(smax, rw[r:r + h, j0:j0 + w])
                rw = jax.lax.reduce_window(
                    pmin, pos, jax.lax.min, (1, L), (1, 1), "VALID")
                smin = jnp.minimum(smin, rw[r:r + h, j0:j0 + w])
        smin = jnp.where(jnp.isinf(smin), jnp.nan, smin)
        smax = jnp.where(jnp.isinf(smax), jnp.nan, smax)
        if "max" in stats:
            out["max"] = smax
        if "min" in stats:
            out["min"] = smin
        if "range" in stats:
            out["range"] = smax - smin
    return out


@partial(jax.jit, static_argnames=("offsets", "stats"))
def _window_stats_unrolled(data, offsets: Tuple[Tuple[int, int], ...],
                           stats: Tuple[str, ...]):
    data = data.astype(jnp.float32)
    h, w = data.shape
    ry = max(abs(dy) for dy, _ in offsets)
    rx = max(abs(dx) for _, dx in offsets)
    padded = jnp.pad(data, ((ry, ry), (rx, rx)), constant_values=jnp.nan)

    # Slices are re-taken inside each accumulation loop (never held as a
    # list) so peak memory stays at the accumulators — XLA fuses the slice
    # into the elementwise update.
    def each_shift():
        for dy, dx in offsets:
            yield _shifted(padded, dy, dx, h, w, ry, rx)

    need_sum = any(s in stats for s in ("sum", "mean", "std", "var"))
    need_minmax = any(s in stats for s in ("min", "max", "range"))

    cnt = ssum = None
    if need_sum:
        cnt = jnp.zeros((h, w), jnp.float32)
        ssum = jnp.zeros((h, w), jnp.float32)
        for s in each_shift():
            ok = ~jnp.isnan(s)
            cnt = cnt + ok
            ssum = ssum + jnp.where(ok, s, 0.0)
    if need_minmax:
        smin = jnp.full((h, w), jnp.inf, jnp.float32)
        smax = jnp.full((h, w), -jnp.inf, jnp.float32)
        for s in each_shift():
            smin = jnp.minimum(smin, jnp.where(jnp.isnan(s), jnp.inf, s))
            smax = jnp.maximum(smax, jnp.where(jnp.isnan(s), -jnp.inf, s))
        smin = jnp.where(jnp.isinf(smin), jnp.nan, smin)
        smax = jnp.where(jnp.isinf(smax), jnp.nan, smax)

    out = {}
    if need_sum:
        safe_cnt = jnp.maximum(cnt, 1.0)
        mean = jnp.where(cnt > 0, ssum / safe_cnt, jnp.nan)
    if "mean" in stats:
        out["mean"] = mean
    if "sum" in stats:
        # np.nansum of an all-NaN buffer is 0.0 (focal.py:_calc_sum)
        out["sum"] = ssum
    if "max" in stats:
        out["max"] = smax
    if "min" in stats:
        out["min"] = smin
    if "range" in stats:
        out["range"] = smax - smin
    if "std" in stats or "var" in stats:
        # two-pass (deviations from the window mean), matching np.nanstd
        dev2 = jnp.zeros((h, w), jnp.float32)
        for s in each_shift():
            d = s - mean
            dev2 = dev2 + jnp.where(jnp.isnan(s), 0.0, d * d)
        var = jnp.where(cnt > 0, dev2 / jnp.maximum(cnt, 1.0), jnp.nan)
        if "var" in stats:
            out["var"] = var
        if "std" in stats:
            out["std"] = jnp.sqrt(var)
    return out


def window_stats(data, offsets: Tuple[Tuple[int, int], ...],
                 stats: Tuple[str, ...]):
    """Compute focal statistics over a masked window in one fused pass.

    Returns a dict of float32 (H, W) arrays, one per requested stat in
    {mean, max, min, range, std, var, sum}.  Kernels with more than
    UNROLL_MAX_OFFSETS footprint cells take the conv / reduce-window
    formulation (the unrolled shift chain would take tens of minutes to
    compile); smaller kernels keep the fully-fused unrolled pass.
    """
    if len(offsets) > UNROLL_MAX_OFFSETS:
        return _window_stats_conv(data, tuple(offsets), tuple(stats))
    return _window_stats_unrolled(data, tuple(offsets), tuple(stats))


@partial(jax.jit, static_argnames=())
def _convolve_valid(data, kernel):
    """Cross-correlation (un-flipped kernel) over the full input, with a
    NaN ring of the kernel radius — reference convolution.py:285-313."""
    data = data.astype(jnp.float32)
    kernel = kernel.astype(jnp.float32)
    h, w = data.shape
    out = jax.lax.conv_general_dilated(
        data[None, None], kernel[None, None],
        window_strides=(1, 1), padding="VALID",
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[0, 0]
    ry = (kernel.shape[0] - 1) // 2
    rx = (kernel.shape[1] - 1) // 2
    return jnp.pad(out, ((ry, ry), (rx, rx)), constant_values=jnp.nan)


def convolve2d_jit(data, kernel):
    return _convolve_valid(data, kernel)


@partial(jax.jit, static_argnames=("n_excludes",))
def _focal_mean_one_pass(data, excludes, n_excludes):
    """One pass of the NaN-excluding 3x3 mean (reference focal.py:44-67).

    Cells equal to any exclude (NaN-aware equality) keep their value;
    all others become the nanmean of the clipped 3x3 window.
    """
    h, w = data.shape
    padded = jnp.pad(data, 1, constant_values=jnp.nan)

    cnt = jnp.zeros((h, w), data.dtype)
    ssum = jnp.zeros((h, w), data.dtype)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))
            ok = ~jnp.isnan(s)
            cnt = cnt + ok
            ssum = ssum + jnp.where(ok, s, 0.0)
    mean = jnp.where(cnt > 0, ssum / jnp.maximum(cnt, 1.0), jnp.nan)

    excluded = jnp.zeros((h, w), bool)
    for i in range(n_excludes):
        ex = excludes[i]
        excluded = excluded | jnp.where(
            jnp.isnan(ex), jnp.isnan(data), data == ex)
    return jnp.where(excluded, data, mean)


def focal_mean_pass(data, excludes):
    excl = jnp.asarray(np.asarray(excludes, dtype=np.float64))
    return _focal_mean_one_pass(data, excl, len(excludes))


@jax.jit
def hotspots_classify(z):
    """z-scores -> signed confidence levels in int8
    (reference focal.py:881-921)."""
    az = jnp.abs(z)
    conf = jnp.where(az > 2.58, 99,
                     jnp.where(az > 1.96, 95,
                               jnp.where(az > 1.65, 90, 0)))
    sign = jnp.where(z > 0, 1, jnp.where(z < 0, -1, 0))
    return (conf * sign).astype(jnp.int8)
