"""Pallas TPU kernel: all focal statistics in one pass over VMEM tiles.

The XLA shifted-reads formulation (kernels/window.py) materializes several
full-raster accumulators (3 passes x 13 shifted reads for a circular r=1.5
kernel, ~10 GB peak on a 16k^2 input).  This kernel instead streams
(TILE+2r)-wide windows HBM->VMEM once per tile via explicit async DMA and
computes every requested statistic in-register, writing the stacked
(S, H, W) output directly:

    peak memory  = input + NaN-padded copy + output
    HBM traffic  = 1 read + S writes   (vs ~3 reads per stat)

Replaces the reference's per-stat Numba loops (focal.py:268-326) and seven
per-stat CUDA kernels (focal.py:476-754).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["focal_stats_pallas"]

# tile sizes aligned to the f32 (8, 128) VPU tiling
TILE_H = 256
TILE_W = 512


def _round_up(x, m):
    return -(-x // m) * m


def _make_kernel(offsets, stats, ry, rx, th, tw, sh, sw, gi, gj):
    n_off = len(offsets)

    def outer(in_hbm, out_hbm):
        def inner(in_ref, out_ref):
            def shift(dy, dx):
                return in_ref[ry + dy:ry + dy + th, rx + dx:rx + dx + tw]

            need_sum = any(s in stats for s in ("sum", "mean", "std", "var"))
            need_minmax = any(s in stats for s in ("min", "max", "range"))

            if need_sum:
                cnt = jnp.zeros((th, tw), jnp.float32)
                ssum = jnp.zeros((th, tw), jnp.float32)
                for dy, dx in offsets:
                    s = shift(dy, dx)
                    ok = ~jnp.isnan(s)
                    cnt += ok.astype(jnp.float32)
                    ssum += jnp.where(ok, s, 0.0)
                # one per-lane divide shared by mean and var (Mosaic
                # does not strength-reduce divides)
                inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
                mean = jnp.where(cnt > 0, ssum * inv_cnt, jnp.nan)
            if need_minmax:
                smin = jnp.full((th, tw), jnp.inf, jnp.float32)
                smax = jnp.full((th, tw), -jnp.inf, jnp.float32)
                for dy, dx in offsets:
                    s = shift(dy, dx)
                    smin = jnp.minimum(smin,
                                       jnp.where(jnp.isnan(s), jnp.inf, s))
                    smax = jnp.maximum(smax,
                                       jnp.where(jnp.isnan(s), -jnp.inf, s))
                smin = jnp.where(jnp.isinf(smin), jnp.nan, smin)
                smax = jnp.where(jnp.isinf(smax), jnp.nan, smax)
            if "std" in stats or "var" in stats:
                dev2 = jnp.zeros((th, tw), jnp.float32)
                for dy, dx in offsets:
                    s = shift(dy, dx)
                    d = s - mean
                    dev2 += jnp.where(jnp.isnan(s), 0.0, d * d)
                var = jnp.where(cnt > 0, dev2 * inv_cnt, jnp.nan)

            for k, stat in enumerate(stats):
                if stat == "mean":
                    out_ref[k] = mean
                elif stat == "sum":
                    out_ref[k] = ssum
                elif stat == "min":
                    out_ref[k] = smin
                elif stat == "max":
                    out_ref[k] = smax
                elif stat == "range":
                    out_ref[k] = smax - smin
                elif stat == "var":
                    out_ref[k] = var
                elif stat == "std":
                    out_ref[k] = jnp.sqrt(var)

        nk = len(stats)
        pltpu.emit_pipeline(
            inner,
            grid=(gi, gj),
            in_specs=[pl.BlockSpec(
                (pl.BoundedSlice(sh), pl.BoundedSlice(sw)),
                lambda i, j: (pl.ds(i * th, sh), pl.ds(j * tw, sw)))],
            out_specs=[pl.BlockSpec((nk, th, tw), lambda i, j: (0, i, j))],
        )(in_hbm, out_hbm)

    flops_per_px = n_off * (4 + 2 * ("std" in stats or "var" in stats))
    return outer, flops_per_px


@partial(jax.jit, static_argnames=("offsets", "stats", "interpret"))
def focal_stats_pallas(data, offsets, stats, interpret=False):
    """(S, H, W) stacked focal statistics of `data` over the masked window.

    offsets: tuple of (dy, dx) kernel-footprint offsets; stats: tuple of
    stat names.  Equivalent to kernels/window.py::window_stats but in one
    double-buffered streaming pass (pltpu.emit_pipeline).
    """
    data = data.astype(jnp.float32)
    h, w = data.shape
    ry = max(abs(dy) for dy, _ in offsets)
    rx = max(abs(dx) for _, dx in offsets)

    th = min(TILE_H, _round_up(max(8, h), 8))
    tw = min(TILE_W, _round_up(max(128, w), 128))
    # grid dims of 1 trip a Slice-pytree canonicalization bug in the
    # pipeline emitter; halve tiles until every grid dim is >= 2
    while -(-h // th) < 2 and th > 8:
        th = _round_up(max(th // 2, 8), 8)
    while -(-w // tw) < 2 and tw > 128:
        tw = _round_up(max(tw // 2, 128), 128)
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    sh = _round_up(th + 2 * ry, 8)
    sw = _round_up(tw + 2 * rx, 128)

    kernel, flops_px = _make_kernel(offsets, stats, ry, rx, th, tw, sh, sw,
                                    hp // th, wp // tw)

    # last tile's aligned DMA window reads up to (hp - th + sh, wp - tw + sw)
    padded = jnp.pad(
        data,
        ((ry, (hp - th + sh) - h - ry), (rx, (wp - tw + sw) - w - rx)),
        constant_values=jnp.nan)
    n_stats = len(stats)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_stats, hp, wp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_px * hp * wp,
            bytes_accessed=(hp * wp * 4) * (1 + n_stats),
            transcendentals=0),
        # double-buffered in-window + n_stats out tiles overflow the
        # 16 MB default scoped-VMEM limit for >=6 stats; size it to fit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                16 * 1024 * 1024,
                3 * (2 * sh * sw + 2 * n_stats * th * tw) * 4)),
        interpret=interpret,
    )(padded)
    return out[:, :h, :w]
