"""Classic-pipeline Pallas surface stencil: tile interiors + seam bands.

Round-2 redesign of the TPU surface kernel (supersedes the emit_pipeline
variant in pallas_surface.py).  Measured on a v5e chip at 16k^2
(tools/exp_stencil2.py): the classic pallas_call revolving-buffer
pipeline moves aligned (th, tw) blocks at ~690 GB/s, while
emit_pipeline's BoundedSlice halo windows plateau at ~330 GB/s for every
tile shape tried.  So instead of halo windows this kernel:

1. streams aligned, NON-overlapping blocks and computes the stencil on
   each tile's interior only (rows/cols 1..th-2) — no NaN pre-pad of the
   full raster (6.6 ms at 16k^2 by itself), no halo DMA;
2. pre-computes the seam rows (2 per horizontal tile boundary) and seam
   cols (2 per vertical boundary) exactly with the XLA epilogues
   (kernels/surface.py) on gathered bands — <<1% of the pixels — and
   passes them into the kernel as tiny (2, tw)/(th, 2) blocks that the
   kernel writes into each output tile's border rows/cols.  A post-hoc
   scatter would copy: updating seam COLUMNS of a 1 GB array through
   XLA scatter measured ~6.5 ms (minor-axis scatter materializes);
3. the outer 1-cell NaN ring (reference slope.py:59-61) is baked into
   the band values, so the kernel's single pass produces the final
   answer (ragged shapes pay one crop).

Scalars (cellsizes, hillshade sun vector) ride as (1,1) SMEM blocks;
hillshade's sin/cos are computed once OUTSIDE the kernel so every
epilogue is transcendental-free on the VPU — hillshade now takes the
Pallas path too (round 1 kept it on XLA).

Reference semantics mirrored: slope.py:56-76 (Horn), aspect.py:56-90,
curvature.py:31-41, hillshade.py:20-35.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_surface import _atan2, _atan_of_sqrt
from .surface import (DEG, aspect_from_neighbors, curvature_from_center,
                      hillshade_from_gradient, slope_from_neighbors)

__all__ = ["surface_tiled"]

TILE_H = 128
TILE_W = 8192  # 16k^2 sweeps 2026-08-17: slope 5.2 vs 7.9 ms, hillshade
# 3.8 vs 4.3 ms at 128x8192 vs 256x4096; the slope+hillshade PAIR is
# flat (8.38 vs 8.39 ms) so the headline keeps its number while the
# single-product ops gain 13-34%.  Focal keeps 256x4096 (its own sweep:
# 12.4 ms there vs 14.3 at 128x8192; 256x8192 fails to compile).


def _round_up(x, m):
    return -(-x // m) * m


def emit_surface(which, th, tw, scal, x, rb, cb, out_refs):
    """Write the surface products of one (th, tw) tile into out_refs.

    ``scal`` is the 6-tuple of SMEM scalar refs (csx, csy, sin_a,
    cos_a, sin_p, cos_p); ``x`` the tile value already read from VMEM;
    ``rb``/``cb`` the per-product seam row/column band refs.  Factored
    out of the kernel closure so the fused headline pipeline
    (pallas_pipeline.py) can share one tile read between the surface
    products and the focal statistics.

    In-session 2x2 A/B at 16k^2 (tools/exp_slope_ab2.py): for the
    3x3 SURFACE stencil, sliced windows beat pltpu.roll lane rotations
    (slope 4.96 ms sliced vs 7.45 rolled) — the opposite of the focal
    kernel, whose 27 window reads amortize rotation better than
    misaligned slices (pallas_window2).  The divide-free
    _atan_of_sqrt is the big slope win (6.51 -> 4.96 ms)."""
    csx_ref, csy_ref, sin_a_ref, cos_a_ref, sin_p_ref, cos_p_ref = scal
    need_cross = any(s in which for s in ("curvature", "hillshade"))
    if need_cross:
        b, hh = x[:-2, 1:-1], x[2:, 1:-1]
        d, f = x[1:-1, :-2], x[1:-1, 2:]
    if "curvature" in which:
        e = x[1:-1, 1:-1]

    need_horn = any(s in which for s in ("slope", "aspect"))
    if need_horn:
        # NOT the separable (smooth-then-diff) form: it is ~3%
        # faster but its FP re-association drifts 3.3e-3 deg from
        # the XLA twin (tools/exp_separable_horn.py + on-chip
        # check), past the 5e-4 parity gate; the 9-window form
        # matches to 1.5e-5 (the atan polynomial)
        a, c = x[:-2, :-2], x[:-2, 2:]
        g, ii = x[2:, :-2], x[2:, 2:]
        if not need_cross:
            b, hh = x[:-2, 1:-1], x[2:, 1:-1]
            d, f = x[1:-1, :-2], x[1:-1, 2:]
        dzdx8 = (c + 2.0 * f + ii) - (a + 2.0 * d + g)
        dzdy8 = (g + 2.0 * hh + ii) - (a + 2.0 * b + c)

    for kk, stat in enumerate(which):
        out = out_refs[kk]
        if stat == "slope":
            gx = dzdx8 * (0.125 / csx_ref[0, 0])
            gy = dzdy8 * (0.125 / csy_ref[0, 0])
            out[1:th - 1, 1:tw - 1] = _atan_of_sqrt(
                gx * gx + gy * gy) * DEG
        elif stat == "aspect":
            gx = dzdx8 * 0.125
            gy = dzdy8 * 0.125
            angle = _atan2(gy, -gx) * (180.0 / jnp.pi)
            compass = jnp.where(
                angle < 0.0, 90.0 - angle,
                jnp.where(angle > 90.0, 450.0 - angle, 90.0 - angle))
            flat = (gx == 0.0) & (gy == 0.0)
            out[1:th - 1, 1:tw - 1] = jnp.where(flat, -1.0, compass)
        elif stat == "curvature":
            cs = (csx_ref[0, 0] + csy_ref[0, 0]) * 0.5
            dd = (hh + b) * 0.5 - e
            ee = (f + d) * 0.5 - e
            # scalar divide hoisted out of the lanes (Mosaic does not
            # strength-reduce per-lane divides)
            out[1:th - 1, 1:tw - 1] = (dd + ee) * (-200.0 / (cs * cs))
        elif stat == "hillshade":
            gxr = (hh - b) * 0.5
            gyc = (f - d) * 0.5
            shaded = ((sin_a_ref[0, 0]
                       + cos_a_ref[0, 0] * (cos_p_ref[0, 0] * gyc
                                            - sin_p_ref[0, 0] * gxr))
                      * jax.lax.rsqrt(1.0 + gxr * gxr + gyc * gyc))
            out[1:th - 1, 1:tw - 1] = (shaded + 1.0) * 0.5
        # seam rows (incl. the top/bottom NaN ring rows),
        # precomputed outside by the strided-slice band pass
        out[0:1, :] = rb[kk][0:1, :]
        out[th - 1:th, :] = rb[kk][1:2, :]
        # seam columns (incl. the left/right NaN ring cols): lanes
        # 0/1 of the column band carry this tile's first/last output
        # column — writing them here replaces a post-kernel DUS
        # chain that measured ~0.7 ms/product at 16k^2
        # (tools/exp_seam_cost.py).  Column values win at corners,
        # matching the old DUS order (both compute the same stencil)
        out[:, 0:1] = cb[kk][:, 0:1]
        out[:, tw - 1:tw] = cb[kk][:, 1:2]


def _make_kernel(which, th, tw):
    k = len(which)

    def kernel(csx_ref, csy_ref, sin_a_ref, cos_a_ref, sin_p_ref, cos_p_ref,
               in_ref, *band_and_out_refs):
        rb = band_and_out_refs[:k]
        cb = band_and_out_refs[k:2 * k]
        out_refs = band_and_out_refs[2 * k:]
        emit_surface(which, th, tw,
                     (csx_ref, csy_ref, sin_a_ref, cos_a_ref, sin_p_ref,
                      cos_p_ref), in_ref[...], rb, cb, out_refs)

    return kernel


def _band_products(nb, which, csx, csy, azimuth, altitude):
    """Per-product epilogues on a gathered seam band — the exact XLA
    formulations (kernels/surface.py), so seams match the semantics the
    parity tests pin."""
    outs = []
    for stat in which:
        if stat == "slope":
            outs.append(slope_from_neighbors(nb, csx, csy))
        elif stat == "aspect":
            outs.append(aspect_from_neighbors(nb))
        elif stat == "curvature":
            outs.append(curvature_from_center(nb, (csx + csy) * 0.5))
        elif stat == "hillshade":
            outs.append(hillshade_from_gradient(nb, azimuth, altitude))
    return outs


@partial(jax.jit, static_argnames=("which", "th", "tw", "interpret"))
def surface_tiled(data, cellsize_x, cellsize_y, azimuth, angle_altitude,
                  which=("slope",), th=TILE_H, tw=TILE_W, interpret=False):
    """Tuple of (H, W) float32 surface products with 1-cell NaN borders."""
    data = data.astype(jnp.float32)
    h, w = data.shape
    th = min(th, _round_up(h, 8))
    tw = min(tw, _round_up(w, 128))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    gi, gj = hp // th, wp // tw
    padded = data
    if (hp, wp) != (h, w):
        # NaN pad only the ragged remainder; padded outputs are cropped,
        # and real interior cells never read pad (cells adjacent to the
        # array edge are seam/ring cells, recomputed in the bands)
        padded = jnp.pad(data, ((0, hp - h), (0, wp - w)),
                         constant_values=jnp.nan)

    csx = cellsize_x.astype(jnp.float32)
    csy = cellsize_y.astype(jnp.float32)
    az = azimuth.astype(jnp.float32)
    alt = angle_altitude.astype(jnp.float32)
    azrad = (360.0 - az) * (jnp.pi / 180.0)
    phi = azrad - jnp.pi / 2.0

    rowbands, colbands = surface_seam_bands(
        padded, h, w, hp, wp, th, tw, gi, gj, which, csx, csy, az, alt)

    scal = lambda v: jnp.full((1, 1), v, jnp.float32)  # noqa: E731
    smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    rb_spec = pl.BlockSpec((8, tw), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    cb_spec = pl.BlockSpec((th, 128), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    k = len(which)
    outs = pl.pallas_call(
        _make_kernel(which, th, tw),
        grid=(gi, gj),
        in_specs=[smem] * 6 + [vmem] + [rb_spec] * k + [cb_spec] * k,
        out_specs=[vmem] * k,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * k,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=max(48 * 1024 * 1024,
                                 5 * (1 + k) * th * tw * 4)),
        interpret=interpret,
    )(scal(csx), scal(csy), scal(jnp.sin(alt * (jnp.pi / 180.0))),
      scal(jnp.cos(alt * (jnp.pi / 180.0))), scal(jnp.sin(phi)),
      scal(jnp.cos(phi)), padded, *rowbands, *colbands)
    if k == 1 and not isinstance(outs, (list, tuple)):
        outs = [outs]
    outs = list(outs)
    if (hp, wp) != (h, w):
        return tuple(o[:h, :w] for o in outs)
    return tuple(outs)


def surface_seam_bands(padded, h, w, hp, wp, th, tw, gi, gj, which,
                       csx, csy, az, alt):
    """Exact XLA seam bands for the tiled surface kernel.

    Returns ``(rowbands, colbands)``: per product, an ``(8*gi, wp)``
    row band (rows 0/1 of each 8-row group = tile i's first/last output
    row) and an ``(hp, gj*128)`` column band (lanes 0/1 of each 128-lane
    group = tile j's first/last output column).  Shared by
    ``surface_tiled`` and the fused headline pipeline
    (pallas_pipeline.py).
    """
    # Each tile's first/last row (resp. column) needs cross-tile
    # neighbors the kernel never sees.  Gather them with SIX strided
    # slices per axis (one XLA op each — a per-row slice loop or an axis
    # gather costs milliseconds at 16k^2).  Garbage neighbors at the
    # array boundary are masked to NaN (they are ring cells).
    colpos = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    ring_c = (colpos == 0) | (colpos >= w - 1)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (hp, 1), 0)
    ring_r = (rowpos == 0) | (rowpos >= h - 1)

    def row_group(o):
        """Band products for rows i*th+o across all tiles: (gi, wp)."""
        md_ = padded[o::th]
        if o == 0:
            up_ = jnp.concatenate([padded[0:1], padded[th - 1::th][:-1]])
            dn_ = padded[1::th]
        else:
            up_ = padded[th - 2::th]
            dn_ = jnp.concatenate([padded[0::th][1:], padded[0:1]])
        nb = (up_[:, :-2], up_[:, 1:-1], up_[:, 2:],
              md_[:, :-2], md_[:, 1:-1], md_[:, 2:],
              dn_[:, :-2], dn_[:, 1:-1], dn_[:, 2:])
        rr = np.arange(gi) * th + o
        ok = jnp.asarray((rr > 0) & (rr < h - 1))[:, None]
        return [jnp.where(ok & ~ring_c,
                          jnp.pad(p, ((0, 0), (1, 1)),
                                  constant_values=jnp.nan), jnp.nan)
                for p in _band_products(nb, which, csx, csy, az, alt)]

    rb0 = row_group(0)
    rb1 = row_group(th - 1)
    # (gi, 2, wp) padded to (gi, 8, wp): blocks must be sublane(8)-
    # divisible; rows 0/1 of each 8-row group = tile's first/last row
    rowbands = [jnp.pad(jnp.stack([r0, r1], axis=1),
                        ((0, 0), (0, 6), (0, 0))).reshape(8 * gi, wp)
                for r0, r1 in zip(rb0, rb1)]

    # ---- column seams: per-tile bands the KERNEL writes into output
    # cols 0 / tw-1 (lanes 0/1 of a (hp, 128) strip per tile).  The old
    # post-kernel dynamic_update_slice chain cost ~0.7 ms/product at
    # 16k^2 (tools/exp_seam_cost.py); contiguous 4-column slices remain
    # ~free.  first[j] = tile j's first output col, last[j] = its last;
    # the outer ring (global col 0, and col w-1 when w == wp) is NaN,
    # and ragged tails are cropped so their seam values are dead.
    k = len(which)
    nan_colv = jnp.full((hp, 1), jnp.nan, jnp.float32)
    first = [[nan_colv for _ in range(gj)] for _ in range(k)]
    last = [[nan_colv for _ in range(gj)] for _ in range(k)]
    for j in range(1, gj):
        cc = j * tw  # seam cols: cc-1 (tile j-1 last), cc (tile j first)
        tri = jax.lax.slice_in_dim(padded, cc - 2, cc + 2, axis=1)
        nb = (tri[:-2, 0:2], tri[:-2, 1:3], tri[:-2, 2:4],
              tri[1:-1, 0:2], tri[1:-1, 1:3], tri[1:-1, 2:4],
              tri[2:, 0:2], tri[2:, 1:3], tri[2:, 2:4])
        bands = _band_products(nb, which, csx, csy, az, alt)
        for kk in range(k):
            patch = jnp.pad(bands[kk], ((1, 1), (0, 0)),
                            constant_values=jnp.nan)
            patch = jnp.where(ring_r, jnp.nan, patch)
            last[kk][j - 1] = patch[:, 0:1]
            first[kk][j] = patch[:, 1:2]
    colbands = []
    for kk in range(k):
        blocks = [jnp.pad(jnp.concatenate([first[kk][j], last[kk][j]],
                                          axis=1), ((0, 0), (0, 126)))
                  for j in range(gj)]
        colbands.append(jnp.concatenate(blocks, axis=1))

    return rowbands, colbands
