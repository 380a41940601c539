"""Jump-flood nearest-target transform (proximity / allocation / direction).

TPU-native replacement for the reference's GDAL-ported 4-sweep dynamic
program (proximity.py:261-601): O(log n) data-parallel rounds instead of an
inherently sequential row scan, and no dask "rechunk to one chunk" scaling
cliff (proximity.py:605-612).  Each round every pixel examines 8 neighbors
at the current power-of-two stride and adopts their nearest-target
candidate if it is closer under the chosen metric; two extra stride-2/1
rounds (JFA+2) clean up the classic jump-flood corner cases.

The metric is evaluated in *coordinate space* via the raster's 1-D x/y
coordinate arrays, matching reference semantics: EUCLIDEAN, GREAT_CIRCLE
(haversine on lon/lat degrees, R=6378137), MANHATTAN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["jump_flood", "metric_distance", "EUCLIDEAN", "GREAT_CIRCLE",
           "MANHATTAN"]

EUCLIDEAN = 0
GREAT_CIRCLE = 1
MANHATTAN = 2


def metric_distance(x1, x2, y1, y2, metric: int):
    """Distance between coordinate pairs under the reference's metrics
    (proximity.py:38-219)."""
    if metric == GREAT_CIRCLE:
        lat1, lon1 = jnp.radians(y1), jnp.radians(x1)
        lat2, lon2 = jnp.radians(y2), jnp.radians(x2)
        a = (jnp.sin((lat2 - lat1) / 2.0) ** 2
             + jnp.cos(lat1) * jnp.cos(lat2)
             * jnp.sin((lon2 - lon1) / 2.0) ** 2)
        d = 6378137.0 * 2.0 * jnp.arcsin(jnp.sqrt(a))
        # excess-precision fastmath can make lat-lat != 0; pin exact zeros
        same = (x1 == x2) & (y1 == y2)
        return jnp.where(same, 0.0, d).astype(jnp.float32)
    if metric == MANHATTAN:
        return (jnp.abs(x1 - x2) + jnp.abs(y1 - y2)).astype(jnp.float32)
    dx = x1 - x2
    dy = y1 - y2
    return jnp.sqrt(dx * dx + dy * dy).astype(jnp.float32)


def _shift_simple(arr, dy, dx, fill):
    """Shift so out[i,j] = arr[i+dy, j+dx]; out-of-bounds -> fill."""
    h, w = arr.shape
    py0, py1 = max(-dy, 0), max(dy, 0)
    px0, px1 = max(-dx, 0), max(dx, 0)
    p = jnp.pad(arr, ((py0, py1), (px0, px1)), constant_values=fill)
    return p[py0 + dy:py0 + dy + h, px0 + dx:px0 + dx + w]


@partial(jax.jit, static_argnames=("metric", "shape"))
def _jfa_rounds(ty, tx, xs, ys, metric, shape):
    """Run the jump-flood rounds.  ty/tx: nearest-target row/col per pixel
    (-1 = none yet).  xs/ys: 1-D coordinate arrays."""
    h, w = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    px = xs[cols]
    py = ys[rows]

    def cand_dist(cty, ctx):
        d = metric_distance(px, xs[jnp.clip(ctx, 0, w - 1)],
                            py, ys[jnp.clip(cty, 0, h - 1)], metric)
        return jnp.where(cty >= 0, d, jnp.inf)

    def one_round(state, k):
        ty, tx, best = state
        for sy in (-1, 0, 1):
            for sx in (-1, 0, 1):
                if sy == 0 and sx == 0:
                    continue
                nty = _shift_simple(ty, sy * k, sx * k, -1)
                ntx = _shift_simple(tx, sy * k, sx * k, -1)
                nd = cand_dist(nty, ntx)
                better = nd < best
                ty = jnp.where(better, nty, ty)
                tx = jnp.where(better, ntx, tx)
                best = jnp.where(better, nd, best)
        return ty, tx, best

    best = cand_dist(ty, tx)
    max_dim = max(h, w)
    strides = []
    k = 1
    while k < max_dim:
        k *= 2
    k //= 2
    while k >= 1:
        strides.append(k)
        k //= 2
    strides += [2, 1]  # JFA+2 cleanup

    state = (ty, tx, best)
    for k in strides:
        state = one_round(state, k)
    return state


def jump_flood(target_mask, xs, ys, metric: int):
    """(distance, ty, tx) for every pixel; ty/tx = -1 where no target."""
    h, w = target_mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ty = jnp.where(target_mask, rows, -1)
    tx = jnp.where(target_mask, cols, -1)
    ty, tx, dist = _jfa_rounds(ty, tx, xs.astype(jnp.float32),
                               ys.astype(jnp.float32), metric, (h, w))
    return dist, ty, tx
