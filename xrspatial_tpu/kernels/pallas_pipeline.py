"""Fused headline pipeline: surface products + focal statistics, one pass.

The headline workload (slope + hillshade + focal mean/max/min/std of one
DEM, cf. the reference's benchmarks/benchmarks/) reads the SAME 3x3
neighborhood for every output.  ``pipeline_tiled`` computes all of them
from ONE classic-pipeline Pallas tile stream: each (th, tw) input block
is read from HBM once and the kernel writes k surface tiles plus the
(S, th, tw) focal stack — HBM traffic drops from (2 reads + 6 writes)
for the 2-way split (surface_tiled pair + focal_stats_tiled) to
(1 read + 6 writes).

Measured outcome on the v5e (tools/exp_fused_pipeline3.py, 16k^2, one
session): the fused kernel runs at ~315 GB/s (22.2 ms) and LOSES to the
2-way split (21.8 ms; surface pair 347 GB/s + focal-alone 466 GB/s) —
with 7 concurrent output streams the register allocator spills (67-89 MB
of spill slots at larger tiles) and per-kernel bandwidth drops below
what the traffic saving (1 GB less) recovers.  A variant sharing the
surface's sliced windows with the focal accumulation was worse still
(26.5 ms), and tile shapes (128-512) x (2048-4096) did not change the
picture.  terrain_pipeline therefore ships the split by default and
this kernel is OPT-IN (XRSPATIAL_FUSED_PIPELINE=1) for hardware where
the trade-off differs.  Output-ref layout notes: surface refs stay
separate (the API needs separate arrays; in-jit splits of a stacked
result would copy gigabytes); focal stats ride one stacked ref (the
layout pallas_window2 sustains 466 GB/s with).

Seam machinery is shared with the single-op kernels:
``pallas_surface2.surface_seam_bands`` + ``pallas_window2.
focal_seam_bands`` precompute exact XLA values for every tile-border
cell; the kernel writes them into the output tiles (no post-kernel DUS).

Reference semantics: slope.py:56-76, hillshade.py:20-35, focal.py
focal_stats — identical outputs to calling the ops separately.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_surface2 import (TILE_H, TILE_W, _round_up, emit_surface,
                              surface_seam_bands)
from .pallas_window2 import emit_focal, focal_seam_bands

__all__ = ["pipeline_tiled", "pipeline_supported"]


def pipeline_supported(offsets) -> bool:
    """The fused kernel carries focal seam columns in-kernel, which
    needs 2*rx <= 128 lanes and interior rows th > 2*ry."""
    ry = max(max(abs(dy) for dy, _ in offsets), 1)
    rx = max(max(abs(dx) for _, dx in offsets), 1)
    return ry <= 32 and 2 * rx <= 128


def _make_kernel(which, offsets, stats, ry, rx, th, tw):
    k = len(which)

    def kernel(csx_ref, csy_ref, sin_a_ref, cos_a_ref, sin_p_ref,
               cos_p_ref, in_ref, *rest):
        s_rb = rest[:k]
        s_cb = rest[k:2 * k]
        f_rb = rest[2 * k]
        f_cb = rest[2 * k + 1]
        outs = rest[2 * k + 2:]
        x = in_ref[...]  # ONE tile read shared by every product
        emit_surface(which, th, tw,
                     (csx_ref, csy_ref, sin_a_ref, cos_a_ref, sin_p_ref,
                      cos_p_ref), x, s_rb, s_cb, outs[:k])
        emit_focal(offsets, stats, ry, rx, th, tw, True, x, f_rb,
                   f_cb, outs[k])

    return kernel


@partial(jax.jit, static_argnames=("which", "offsets", "stats", "th",
                                   "tw", "interpret"))
def pipeline_tiled(data, cellsize_x, cellsize_y, azimuth, angle_altitude,
                   offsets, stats, which=("slope", "hillshade"),
                   th=TILE_H, tw=TILE_W, interpret=False):
    """k surface products (H, W) + one (S, H, W) focal stack, one pass."""
    data = data.astype(jnp.float32)
    h, w = data.shape
    ry = max(max(abs(dy) for dy, _ in offsets), 1)
    rx = max(max(abs(dx) for _, dx in offsets), 1)
    if not pipeline_supported(offsets):
        raise ValueError("focal window too large for the fused pipeline")
    th = min(th, _round_up(h, 8))
    tw = min(tw, _round_up(w, 128))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    gi, gj = hp // th, wp // tw
    padded = data
    if (hp, wp) != (h, w):
        padded = jnp.pad(data, ((0, hp - h), (0, wp - w)),
                         constant_values=jnp.nan)

    csx = cellsize_x.astype(jnp.float32)
    csy = cellsize_y.astype(jnp.float32)
    az = azimuth.astype(jnp.float32)
    alt = angle_altitude.astype(jnp.float32)
    azrad = (360.0 - az) * (jnp.pi / 180.0)
    phi = azrad - jnp.pi / 2.0

    s_rowbands, s_colbands = surface_seam_bands(
        padded, h, w, hp, wp, th, tw, gi, gj, which, csx, csy, az, alt)
    f_rowband, f_colband, _, _, seam_cols = focal_seam_bands(
        padded, h, w, hp, wp, th, tw, gi, gj, offsets, stats, ry, rx)
    assert seam_cols  # guaranteed by pipeline_supported
    rbh = _round_up(2 * ry, 8)

    k = len(which)
    n_stats = len(stats)
    scal = lambda v: jnp.full((1, 1), v, jnp.float32)  # noqa: E731
    smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    s_rb_spec = pl.BlockSpec((8, tw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    s_cb_spec = pl.BlockSpec((th, 128), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    f_rb_spec = pl.BlockSpec((n_stats, rbh, tw), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)
    f_cb_spec = pl.BlockSpec((n_stats, th, 128), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(which, offsets, stats, ry, rx, th, tw),
        grid=(gi, gj),
        in_specs=([smem] * 6 + [vmem] + [s_rb_spec] * k + [s_cb_spec] * k
                  + [f_rb_spec, f_cb_spec]),
        out_specs=[vmem] * k + [pl.BlockSpec(
            (n_stats, th, tw), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM)],
        out_shape=([jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * k
                   + [jax.ShapeDtypeStruct((n_stats, hp, wp),
                                           jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # 16k^2 with (256, 4096) tiles and 7 outputs needs ~91-104 MB
            # of scoped VMEM (measured; smaller caps OOM at compile)
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(scal(csx), scal(csy), scal(jnp.sin(alt * (jnp.pi / 180.0))),
      scal(jnp.cos(alt * (jnp.pi / 180.0))), scal(jnp.sin(phi)),
      scal(jnp.cos(phi)), padded, *s_rowbands, *s_colbands,
      f_rowband, f_colband)
    outs = list(outs)
    if (hp, wp) != (h, w):
        return tuple(o[..., :h, :w] for o in outs)
    return tuple(outs)
