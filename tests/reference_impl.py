"""Independent numpy oracles reproducing the reference's op semantics.

Slow, loop-based, written straight from the documented algorithms (Horn 1981
slope/aspect, plus-stencil curvature, np.gradient hillshade, GDAL proximity
sweep behavior, etc.).  These generate golden outputs for parity tests on
small rasters; they intentionally share no code with either the reference or
the production package.
"""

from __future__ import annotations

import numpy as np


def ref_slope(data, cellsize_x, cellsize_y):
    data = data.astype(np.float32)
    h, w = data.shape
    out = np.full((h, w), np.nan, dtype=np.float32)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            win = data[y - 1:y + 2, x - 1:x + 2]
            gx = ((win[0, 2] + 2 * win[1, 2] + win[2, 2])
                  - (win[0, 0] + 2 * win[1, 0] + win[2, 0])) / (8 * cellsize_x)
            gy = ((win[2, 0] + 2 * win[2, 1] + win[2, 2])
                  - (win[0, 0] + 2 * win[0, 1] + win[0, 2])) / (8 * cellsize_y)
            p = np.float32((gx * gx + gy * gy) ** 0.5)
            out[y, x] = np.arctan(p) * 57.29578
    return out


def ref_aspect(data):
    data = data.astype(np.float32)
    h, w = data.shape
    out = np.full((h, w), np.nan, dtype=np.float32)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            win = data[y - 1:y + 2, x - 1:x + 2]
            gx = ((win[0, 2] + 2 * win[1, 2] + win[2, 2])
                  - (win[0, 0] + 2 * win[1, 0] + win[2, 0])) / 8.0
            gy = ((win[2, 0] + 2 * win[2, 1] + win[2, 2])
                  - (win[0, 0] + 2 * win[0, 1] + win[0, 2])) / 8.0
            if gx == 0 and gy == 0:
                out[y, x] = -1.0
                continue
            ang = np.arctan2(gy, -gx) * (180.0 / np.pi)
            if ang < 0:
                val = 90.0 - ang
            elif ang > 90.0:
                val = 360.0 - ang + 90.0
            else:
                val = 90.0 - ang
            out[y, x] = val
    return out


def ref_curvature(data, cellsize):
    data = data.astype(np.float32)
    h, w = data.shape
    out = np.full((h, w), np.nan, dtype=np.float32)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            dd = (data[y + 1, x] + data[y - 1, x]) / 2.0 - data[y, x]
            ee = (data[y, x + 1] + data[y, x - 1]) / 2.0 - data[y, x]
            out[y, x] = -2.0 * (dd + ee) * 100.0 / np.float32(cellsize * cellsize)
    return out


def ref_hillshade(data, azimuth=225, angle_altitude=25):
    data = data.astype(np.float32)
    az = 360.0 - azimuth
    gx, gy = np.gradient(data)
    slope = np.pi / 2.0 - np.arctan(np.sqrt(gx * gx + gy * gy))
    aspect = np.arctan2(-gx, gy)
    azrad = az * np.pi / 180.0
    altrad = angle_altitude * np.pi / 180.0
    shaded = (np.sin(altrad) * np.sin(slope)
              + np.cos(altrad) * np.cos(slope)
              * np.cos((azrad - np.pi / 2.0) - aspect))
    out = (shaded + 1) / 2
    out[(0, -1), :] = np.nan
    out[:, (0, -1)] = np.nan
    return out


def ref_convolve2d(data, kernel):
    data = data.astype(np.float32)
    h, w = data.shape
    kh, kw = kernel.shape
    ry, rx = kh // 2, kw // 2
    out = np.full((h, w), np.nan, dtype=np.float32)
    for i in range(ry, h - ry):
        for j in range(rx, w - rx):
            acc = 0.0
            for ki in range(kh):
                for kj in range(kw):
                    acc += kernel[ki, kj] * data[i + ki - ry, j + kj - rx]
            out[i, j] = acc
    return out


def ref_focal_apply(data, kernel, func):
    """func takes the (Kh,Kw) window buffer with NaN outside kernel/bounds."""
    data = data.astype(np.float32)
    h, w = data.shape
    kh, kw = kernel.shape
    ry, rx = kh // 2, kw // 2
    out = np.zeros_like(data)
    for y in range(h):
        for x in range(w):
            buf = np.full((kh, kw), np.nan, dtype=np.float32)
            for ky in range(kh):
                for kx in range(kw):
                    yy, xx = y + ky - ry, x + kx - rx
                    if 0 <= yy < h and 0 <= xx < w and kernel[ky, kx] == 1:
                        buf[ky, kx] = data[yy, xx]
            with np.errstate(all="ignore"):
                import warnings
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    out[y, x] = func(buf)
    return out


def ref_focal_mean(data, excludes=(np.nan,)):
    data = data.astype(float)
    h, w = data.shape
    out = np.zeros_like(data)
    for y in range(h):
        for x in range(w):
            v = data[y, x]
            if any((v == e) or (np.isnan(v) and np.isnan(e))
                   for e in excludes):
                out[y, x] = v
            else:
                win = data[max(y-1, 0):y+2, max(x-1, 0):x+2]
                import warnings
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    out[y, x] = np.nanmean(win)
    return out


def ref_hotspots(data, kernel):
    data = data.astype(np.float32)
    conv = ref_convolve2d(data, kernel / kernel.sum())
    m, s = np.nanmean(data), np.nanstd(data)
    z = (conv - m) / s
    out = np.zeros(data.shape, dtype=np.int8)
    az = np.abs(z)
    with np.errstate(invalid="ignore"):
        conf = np.where(az > 2.58, 99,
                        np.where(az > 1.96, 95, np.where(az > 1.65, 90, 0)))
        sign = np.where(z > 0, 1, np.where(z < 0, -1, 0))
    out[:] = (conf * sign).astype(np.int8)
    return out


def ref_bin(data, bins, new_values):
    """val <= bins[0] -> 0; bins[i-1] < val <= bins[i] -> i; else NaN."""
    data = np.asarray(data, dtype=np.float32)
    bins = np.asarray(bins)
    out = np.full(data.shape, np.nan, dtype=np.float32)
    it = np.nditer(data, flags=["multi_index"])
    for v in it:
        v = float(v)
        if not np.isfinite(v):
            continue
        for i, b in enumerate(bins):
            if v <= b:
                out[it.multi_index] = new_values[i]
                break
    return out


def ref_jenks_matrices(data, n_classes):
    """Direct loop port of the Jenks DP semantics (float32)."""
    n_data = data.shape[0]
    lcl = np.zeros((n_data + 1, n_classes + 1), dtype=np.float32)
    lcl[1, 1:] = 1.0
    var_comb = np.zeros((n_data + 1, n_classes + 1), dtype=np.float32)
    var_comb[2:, 1:] = np.inf
    variance = np.float32(0.0)
    for l in range(2, n_data + 1):  # noqa: E741
        s = np.float32(0.0)
        ss = np.float32(0.0)
        w = np.float32(0.0)
        for m in range(l):
            lower = l - m
            i4 = lower - 1
            val = np.float32(data[i4])
            w += np.float32(1.0)
            s += val
            ss += val * val
            variance = ss - (s * s) / w
            if i4 == 0:
                continue
            for j in range(2, n_classes + 1):
                nv = variance + var_comb[i4, j - 1]
                if var_comb[l, j] >= nv:
                    lcl[l, j] = lower
                    var_comb[l, j] = nv
        lcl[l, 1] = 1.0
        var_comb[l, 1] = variance
    return lcl


def ref_jenks(data, n_classes):
    data = np.sort(np.asarray(data, dtype=np.float32))
    lcl = ref_jenks_matrices(data, n_classes)
    k = data.shape[0]
    kclass = np.zeros(n_classes + 1, dtype=np.float32)
    kclass[0] = data[0]
    kclass[-1] = data[-1]
    cn = n_classes
    while cn > 1:
        elt = int(lcl[k][cn] - 2)
        kclass[cn - 1] = data[elt]
        k = int(lcl[k][cn] - 1)
        cn -= 1
    return kclass
