"""Classic-pipeline Pallas focal-statistics kernel: tile interiors + seams.

Round-2 redesign of the focal kernel (supersedes the emit_pipeline
variant in pallas_window.py as the TPU default) using the same scheme as
kernels/pallas_surface2.py: the classic pallas_call revolving-buffer
pipeline streams aligned NON-overlapping (th, tw) blocks at ~2x the
throughput of emit_pipeline's BoundedSlice halo windows (see
tools/exp_stencil2.py), the kernel computes every requested statistic on
each tile's interior (rows ry..th-ry-1, cols rx..tw-rx-1), and the seam
cells are computed exactly by the fused-XLA window_stats on narrow
batched strips:

- seam ROWS (2*ry per tile, incl. the raster's outer ry rows) ride into
  the kernel as a (S, rbh, tw) band input written to each output tile's
  top/bottom rows;
- seam COLUMNS are patched afterwards with contiguous strip slices +
  dynamic_update_slice (minor-axis scatter would copy the whole array;
  DUS is in-place).

Unlike the surface stencils, focal ops have NO NaN border: out-of-bounds
window cells are simply excluded, which the strips inherit from
window_stats' NaN padding.  Replaces the reference's per-stat Numba
loops (focal.py:268-326) and per-stat CUDA kernels (focal.py:476-754).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window import window_stats

__all__ = ["focal_stats_tiled", "tiled_radius_supported"]

TILE_H = 256
TILE_W = 4096  # 16k^2 sweep: ~10% over 2048 for slope AND focal


def _round_up(x, m):
    return -(-x // m) * m


def tiled_radius_supported(ry: int, rx: int) -> bool:
    """Interior tiles need th > 2*ry rows / tw > 2*rx cols of interior
    plus reasonably-sized strips; beyond this the emit_pipeline halo
    kernel (pallas_window.py) takes over."""
    return 0 < max(ry, 1) <= 32 and 0 < max(rx, 1) <= 256


def emit_focal(offsets, stats, ry, rx, th, tw, seam_cols, x, rb_ref,
               cb_ref, out_ref):
    """Write the stacked focal statistics of one (th, tw) tile into
    ``out_ref`` ((n_stats, th, tw)).  ``x`` is the tile value already
    read from VMEM; ``rb_ref``/``cb_ref`` the seam row/column band
    refs.  Factored out of the kernel closure so the fused headline
    pipeline (pallas_pipeline.py) can share one tile read between the
    surface products and the focal statistics."""
    ih, iw = th - 2 * ry, tw  # full-width rows; lane shifts via roll
    rows = {}

    def shift(dy, dx):
        # lane-ALIGNED window reads: vertical offsets are sublane
        # slices, horizontal offsets are pltpu.roll lane rotations —
        # no per-operand relayouts or masked stores (the round-2
        # version's rx+dx column slices were misaligned for every
        # dx).  Rotation-wrapped first/last rx columns of the tile
        # are garbage by construction — exactly the seam-column
        # cells the XLA strip patches overwrite post-kernel.
        row = rows.get(dy)
        if row is None:
            row = rows[dy] = x[ry + dy:ry + dy + ih, :]
        # pltpu.roll requires non-negative shifts: -dx ≡ tw-dx
        return pltpu.roll(row, (-dx) % tw, 1) if dx else row

    need_sum = any(s in stats for s in ("sum", "mean", "std", "var"))
    need_minmax = any(s in stats for s in ("min", "max", "range"))

    if need_sum:
        cnt = jnp.zeros((ih, iw), jnp.float32)
        ssum = jnp.zeros((ih, iw), jnp.float32)
        for dy, dx in offsets:
            s = shift(dy, dx)
            ok = ~jnp.isnan(s)
            cnt += ok.astype(jnp.float32)
            ssum += jnp.where(ok, s, 0.0)
        # one per-lane divide shared by mean and var (Mosaic does not
        # strength-reduce divides; reciprocal+multiply is ~1 ulp off
        # the divide, inside the 1e-3 on-chip parity gate)
        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        mean = jnp.where(cnt > 0, ssum * inv_cnt, jnp.nan)
    if need_minmax:
        smin = jnp.full((ih, iw), jnp.inf, jnp.float32)
        smax = jnp.full((ih, iw), -jnp.inf, jnp.float32)
        for dy, dx in offsets:
            s = shift(dy, dx)
            smin = jnp.minimum(smin,
                               jnp.where(jnp.isnan(s), jnp.inf, s))
            smax = jnp.maximum(smax,
                               jnp.where(jnp.isnan(s), -jnp.inf, s))
        smin = jnp.where(jnp.isinf(smin), jnp.nan, smin)
        smax = jnp.where(jnp.isinf(smax), jnp.nan, smax)
    if "std" in stats or "var" in stats:
        dev2 = jnp.zeros((ih, iw), jnp.float32)
        for dy, dx in offsets:
            s = shift(dy, dx)
            d = s - mean
            dev2 += jnp.where(jnp.isnan(s), 0.0, d * d)
        var = jnp.where(cnt > 0, dev2 * inv_cnt, jnp.nan)

    for k, stat in enumerate(stats):
        if stat == "mean":
            val = mean
        elif stat == "sum":
            val = ssum
        elif stat == "min":
            val = smin
        elif stat == "max":
            val = smax
        elif stat == "range":
            val = smax - smin
        elif stat == "var":
            val = var
        elif stat == "std":
            val = jnp.sqrt(var)
        out_ref[k, ry:th - ry, :] = val
        # seam rows from the precomputed band (cols under the column
        # patches get overwritten with identical values)
        out_ref[k, 0:ry, :] = rb_ref[k, 0:ry, :]
        out_ref[k, th - ry:th, :] = rb_ref[k, ry:2 * ry, :]
        if seam_cols:
            # seam columns in-kernel: lanes 0..rx-1 of the column
            # band are this tile's first rx output cols, lanes
            # rx..2rx-1 its last rx — written AFTER the row bands so
            # column values win at corners, matching the DUS order
            # they replace (~0.7 ms/product of post-kernel DUS on
            # the 1 GB outputs at 16k^2, tools/exp_seam_cost.py)
            out_ref[k, :, 0:rx] = cb_ref[k, :, 0:rx]
            out_ref[k, :, tw - rx:tw] = cb_ref[k, :, rx:2 * rx]


def _make_kernel(offsets, stats, ry, rx, th, tw, seam_cols):
    def kernel(in_ref, rb_ref, *cb_out):
        if seam_cols:
            cb_ref, out_ref = cb_out
        else:
            cb_ref, (out_ref,) = None, cb_out
        emit_focal(offsets, stats, ry, rx, th, tw, seam_cols, in_ref[...],
                   rb_ref, cb_ref, out_ref)

    return kernel


@partial(jax.jit, static_argnames=("offsets", "stats", "th", "tw",
                                   "interpret"))
def focal_stats_tiled(data, offsets, stats, th=TILE_H, tw=TILE_W,
                      interpret=False):
    """(S, H, W) stacked focal statistics over the masked window."""
    data = data.astype(jnp.float32)
    h, w = data.shape
    ry = max(max(abs(dy) for dy, _ in offsets), 1)
    rx = max(max(abs(dx) for _, dx in offsets), 1)
    th = min(th, _round_up(h, 8))
    tw = min(tw, _round_up(w, 128))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    gi, gj = hp // th, wp // tw
    padded = data
    if (hp, wp) != (h, w):
        padded = jnp.pad(data, ((0, hp - h), (0, wp - w)),
                         constant_values=jnp.nan)
    n_stats = len(stats)

    rowband, colband, strip_stats, bounds, seam_cols = focal_seam_bands(
        padded, h, w, hp, wp, th, tw, gi, gj, offsets, stats, ry, rx)
    rbh = _round_up(2 * ry, 8)

    # ---- main tiled kernel ----------------------------------------------
    in_specs = [pl.BlockSpec((th, tw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_stats, rbh, tw), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)]
    operands = [padded, rowband]
    if seam_cols:
        in_specs.append(pl.BlockSpec((n_stats, th, 128),
                                     lambda i, j: (0, i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(colband)
    out = pl.pallas_call(
        _make_kernel(offsets, stats, ry, rx, th, tw, seam_cols),
        grid=(gi, gj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_stats, th, tw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_stats, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=max(64 * 1024 * 1024,
                                 6 * (1 + n_stats) * th * tw * 4)),
        interpret=interpret,
    )(*operands)

    if not seam_cols:
        # huge-radius fallback: patch the seam columns post-kernel
        for idx, c in enumerate(bounds):
            t0 = max(c - rx, 0)
            t1 = min(c + rx, w)
            if t1 <= t0:
                continue
            base = idx * 4 * rx + 2 * rx - c  # strip col of raster col 0
            patch = jnp.stack([
                jax.lax.slice_in_dim(strip_stats[s], base + t0, base + t1,
                                     axis=1)
                for s in stats])
            out = jax.lax.dynamic_update_slice(out, patch, (0, 0, t0))

    if (hp, wp) != (h, w):
        return out[:, :h, :w]
    return out


def focal_seam_bands(padded, h, w, hp, wp, th, tw, gi, gj, offsets, stats,
                     ry, rx):
    """Exact fused-XLA seam bands for the tiled focal kernel.

    Returns ``(rowband, colband, strip_stats, bounds, seam_cols)``:
    ``rowband`` is (S, gi*rbh, wp) with rows 0..2ry-1 of each rbh-row
    group = tile i's first/last ry output rows; ``colband`` (when
    ``seam_cols``, i.e. 2*rx <= 128) is (S, hp, gj*128) with lanes
    0..2rx-1 of each 128-lane group = tile j's first/last rx output
    columns; otherwise ``strip_stats``/``bounds`` support the
    post-kernel DUS fallback.  Shared by ``focal_stats_tiled`` and the
    fused headline pipeline (pallas_pipeline.py).
    """
    # ---- seam-row bands: strided row slices -> batched strips ----------
    nan_row = jnp.full((1, wp), jnp.nan, jnp.float32)

    def rows_at(delta):
        """Rows i*th + delta for every tile i, as a (gi, wp) array
        (out-of-raster rows are NaN)."""
        if delta < 0:
            if gi == 1:
                return jnp.broadcast_to(nan_row, (1, wp))
            return jnp.concatenate(
                [nan_row, padded[th + delta::th][:gi - 1]])
        if delta >= th:
            if gi == 1:
                return jnp.broadcast_to(nan_row, (1, wp))
            return jnp.concatenate(
                [padded[delta - th::th][1:], nan_row])
        return padded[delta::th]

    # strip layout per tile: 3*ry input rows whose middle ry rows are the
    # band targets; two groups (tile-top targets, tile-bottom targets).
    # Window reach is ry, so targets never read across strip boundaries.
    top = jnp.stack([rows_at(d) for d in range(-ry, 2 * ry)], axis=1)
    bot = jnp.stack([rows_at(th - 2 * ry + d) for d in range(3 * ry)],
                    axis=1)
    band_in = jnp.stack([top, bot], axis=1).reshape(gi * 2 * 3 * ry, wp)
    band_stats = window_stats(band_in, offsets, stats)
    rbh = _round_up(2 * ry, 8)
    rowbands = []
    for s in stats:
        bs = band_stats[s].reshape(gi, 2, 3 * ry, wp)[:, :, ry:2 * ry]
        rowbands.append(jnp.pad(
            bs.reshape(gi, 2 * ry, wp),
            ((0, 0), (0, rbh - 2 * ry), (0, 0))).reshape(gi * rbh, wp))
    rowband = jnp.stack(rowbands)  # (S, gi*rbh, wp)

    # ---- seam columns: one batched strip pass -------------------------
    # strips of 4*rx input cols whose middle 2*rx cols are the targets
    # (cols j*tw-rx .. j*tw+rx-1, clipped at the raster edges)
    strips = []
    bounds = [j * tw for j in range(gj + 1)]
    for c in bounds:
        s0 = max(c - 2 * rx, 0)
        s1 = min(c + 2 * rx, wp)
        strip = jax.lax.slice_in_dim(padded, s0, s1, axis=1)
        # NaN-pad each strip to exactly 4*rx wide, preserving the target
        # offset (targets live at [c-rx-s0 .. ) within the strip)
        lpad = 2 * rx - (c - s0)
        rpad = 4 * rx - (s1 - s0) - lpad
        strips.append(jnp.pad(strip, ((0, 0), (lpad, rpad)),
                              constant_values=jnp.nan))
    strip_in = jnp.concatenate(strips, axis=1)  # (hp, (gj+1)*4rx)
    strip_stats = window_stats(strip_in, offsets, stats)

    # rx <= 64: the seam columns ride INTO the kernel as per-tile
    # (S, hp, 128) bands (lanes 0..rx-1 = tile's first rx output cols
    # from boundary j's right half, rx..2rx-1 = its last rx from
    # boundary j+1's left half), replacing the post-kernel DUS chain on
    # the (S, hp, wp) output (~0.7 ms/product at 16k^2).
    seam_cols = 2 * rx <= 128
    colband = None
    if seam_cols:
        per_stat = []
        for s in stats:
            blocks = []
            for j in range(gj):
                right = jax.lax.slice_in_dim(
                    strip_stats[s], j * 4 * rx + 2 * rx,
                    j * 4 * rx + 3 * rx, axis=1)
                left = jax.lax.slice_in_dim(
                    strip_stats[s], (j + 1) * 4 * rx + rx,
                    (j + 1) * 4 * rx + 2 * rx, axis=1)
                blocks.append(jnp.pad(
                    jnp.concatenate([right, left], axis=1),
                    ((0, 0), (0, 128 - 2 * rx))))
            per_stat.append(jnp.concatenate(blocks, axis=1))
        colband = jnp.stack(per_stat)  # (S, hp, gj*128)

    return rowband, colband, strip_stats, bounds, seam_cols
