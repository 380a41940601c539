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
        # subtract in DEGREES, then convert: the reference runs this in
        # f64 where order is harmless (proximity.py:90-135); in f32,
        # radians-then-subtract loses ~2e-1 relative on near-coincident
        # points (both operands round at ~1-radian magnitude) while
        # degrees-then-radians keeps the delta exact
        dlat_h = jnp.radians(y2 - y1) * 0.5
        dlon_h = jnp.radians(x2 - x1) * 0.5
        a = (jnp.sin(dlat_h) ** 2
             + jnp.cos(jnp.radians(y1)) * jnp.cos(jnp.radians(y2))
             * jnp.sin(dlon_h) ** 2)
        d = 6378137.0 * 2.0 * jnp.arcsin(jnp.sqrt(a))
        # excess-precision fastmath can make lat-lat != 0; pin exact zeros
        same = (x1 == x2) & (y1 == y2)
        return jnp.where(same, 0.0, d).astype(jnp.float32)
    if metric == MANHATTAN:
        return (jnp.abs(x1 - x2) + jnp.abs(y1 - y2)).astype(jnp.float32)
    dx = x1 - x2
    dy = y1 - y2
    return jnp.sqrt(dx * dx + dy * dy).astype(jnp.float32)


def _metric_key(x1, x2, y1, y2, metric: int):
    """Monotone comparison key for `metric_distance` — skips the sqrt /
    arcsin per JFA neighbor candidate; `_metric_finalize` converts the
    winning key to the true distance once at the end."""
    if metric == GREAT_CIRCLE:
        # degrees-first deltas: see metric_distance
        dlat_h = jnp.radians(y2 - y1) * 0.5
        dlon_h = jnp.radians(x2 - x1) * 0.5
        a = (jnp.sin(dlat_h) ** 2
             + jnp.cos(jnp.radians(y1)) * jnp.cos(jnp.radians(y2))
             * jnp.sin(dlon_h) ** 2)
        same = (x1 == x2) & (y1 == y2)
        return jnp.where(same, 0.0, a).astype(jnp.float32)
    if metric == MANHATTAN:
        return (jnp.abs(x1 - x2) + jnp.abs(y1 - y2)).astype(jnp.float32)
    dx = x1 - x2
    dy = y1 - y2
    return (dx * dx + dy * dy).astype(jnp.float32)


def _metric_finalize(key, metric: int):
    if metric == GREAT_CIRCLE:
        return (6378137.0 * 2.0
                * jnp.arcsin(jnp.sqrt(key))).astype(jnp.float32)
    if metric == MANHATTAN:
        return key
    return jnp.sqrt(key)



@partial(jax.jit, static_argnames=("strides", "metric", "shape"))
def _jfa_rounds(tx_w, ty_w, tval, xs, ys, strides, metric, shape):
    """Jump-flood rounds over carried target *coordinates* (and value).

    Gather-free AND compile-light: one lax.scan over the stride schedule;
    neighbor reads are jnp.roll (a pair of contiguous slices) with
    iota-based validity masks instead of per-element gathers (pathological
    on TPU) or per-stride pads (graph blow-up).
    """
    h, w = shape
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))

    inf = jnp.float32(jnp.inf)

    def cand_dist(ctx, cty):
        d = _metric_key(px, ctx, py, cty, metric)
        return jnp.where(jnp.isfinite(ctx), d, inf)

    def _shift_inf(arr, shift: int, axis: int):
        """out[..i..] = arr[..i + shift..] with +inf fill (static pad +
        slice — fuses ~2x better through XLA than roll's concat, and the
        inf-coordinate fill makes out-of-bounds candidates infinitely far
        with no iota validity masks at all)."""
        if shift == 0:
            return arr
        pads = [(0, 0)] * arr.ndim
        pads[axis] = (max(-shift, 0), max(shift, 0))
        p = jnp.pad(arr, pads, constant_values=jnp.inf)
        start = [0] * arr.ndim
        start[axis] = max(-shift, 0) + shift
        return jax.lax.dynamic_slice(p, start, arr.shape)

    def round_body(k: int):
        # one JFA round at a STATIC stride.  The target channels ride
        # stacked as (C, h, w) so the eight neighbors share separable
        # 1-axis shifts (3 row variants, then column shifts per variant);
        # inf-filled shifts make out-of-bounds candidates infinitely far,
        # so no validity masks are needed.
        def f(state):
            S, best = state
            rowvar = {-1: _shift_inf(S, -k, 1), 0: S,
                      1: _shift_inf(S, k, 1)}
            for sy in (-1, 0, 1):
                for sx in (-1, 0, 1):
                    if sy == 0 and sx == 0:
                        continue
                    N = rowvar[sy] if sx == 0 else _shift_inf(
                        rowvar[sy], sx * k, 2)
                    nd = cand_dist(N[0], N[1])
                    better = nd < best
                    S = jnp.where(better[None], N, S)
                    best = jnp.where(better, nd, best)
            return (S, best)
        return f

    # strides are a static schedule of powers of two: scan over a branch
    # SELECTOR and lax.switch into per-stride bodies, keeping strides
    # static inside the graph while the scan keeps the graph small
    # (13 branches for 16k, not an unrolled 13-round program)
    ks = [int(k) for k in strides]
    uniq = sorted(set(ks))
    branches = [round_body(k) for k in uniq]
    sel = jnp.asarray([uniq.index(k) for k in ks], jnp.int32)

    def one_round(state, s):
        return jax.lax.switch(s, branches, state), None

    best = cand_dist(tx_w, ty_w)
    # proximity/direction never read target values; dropping the channel
    # cuts the carried roll traffic by a third
    S0 = (jnp.stack([tx_w, ty_w, tval]) if tval is not None
          else jnp.stack([tx_w, ty_w]))
    (S, best), _ = jax.lax.scan(one_round, (S0, best), sel)
    tval_out = S[2] if tval is not None else None
    return S[0], S[1], tval_out, _metric_finalize(best, metric)


def manhattan_transform(target_mask, xs, ys, values=None, need_coords=True):
    """EXACT separable Manhattan nearest-target transform: 4 scans, no
    jump flood.

    |dx|+|dy| decomposes: phase 1 finds each column's nearest seed in y
    (last-valid scans down/up — the nearest-in-|dy| seed of a column is
    one of the two), phase 2 solves D(x) = min_j g(j) + |x_q - x_j| as a
    prefix/suffix min-plus:  left = x_q + cummin(g - x_j),
    right = -x_q + revcummin(g + x_j).  Provably exact (the euclidean
    analog is NOT — see BENCH_NOTES round-3: weighted 1-D jump floods
    have unfixable information loss), validated vs brute force over 60
    random/non-uniform layouts (tools/exp_manhattan_scans.py).  Replaces
    14 8-neighbor JFA rounds with 4 scans; payload channels (target
    coords / value) ride the scans only when the caller needs them
    (allocation/direction).  Reference metric: proximity.py:171-219.
    """
    h, w = target_mask.shape
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    inf = jnp.float32(jnp.inf)
    ty0 = jnp.where(target_mask, ys[:, None], inf)
    payload0 = []
    if values is not None:
        payload0.append(jnp.where(target_mask, values.astype(jnp.float32),
                                  0.0))

    def last_valid(a, b):
        keep = jnp.isfinite(b[0])
        return tuple(jnp.where(keep, bb, aa) for aa, bb in zip(a, b))

    dn = jax.lax.associative_scan(last_valid, (ty0, *payload0), axis=0)
    up = jax.lax.associative_scan(last_valid, (ty0, *payload0), axis=0,
                                  reverse=True)
    py = jnp.broadcast_to(ys[:, None], (h, w))
    gd = jnp.where(jnp.isfinite(dn[0]), jnp.abs(py - dn[0]), inf)
    gu = jnp.where(jnp.isfinite(up[0]), jnp.abs(py - up[0]), inf)
    use_d = gd <= gu
    g = jnp.minimum(gd, gu)
    col = [jnp.where(use_d, d_, u_) for d_, u_ in zip(dn, up)]

    xrow = jnp.broadcast_to(xs[None, :], (h, w))
    kl = jnp.where(jnp.isfinite(g), g - xrow, inf)
    kr = jnp.where(jnp.isfinite(g), g + xrow, inf)
    if not need_coords and values is None:
        # distance only: single-channel cumulative mins
        dist = jnp.minimum(jax.lax.cummin(kl, axis=1) + xrow,
                           jax.lax.cummin(kr, axis=1, reverse=True) - xrow)
        none_tx = jnp.where(jnp.isfinite(dist), 0.0, inf)
        return dist, none_tx, none_tx, None

    pay = []
    if need_coords:
        pay += [xrow, col[0]]          # target x, target y
    if values is not None:
        pay.append(col[-1])            # target value

    def mp(a, b):
        bwins = b[0] <= a[0]
        return tuple(jnp.where(bwins, bb, aa) for aa, bb in zip(a, b))

    left = jax.lax.associative_scan(mp, (kl, *pay), axis=1)
    right = jax.lax.associative_scan(mp, (kr, *pay), axis=1, reverse=True)
    dl = left[0] + xrow
    dr = right[0] - xrow
    lwins = dl <= dr
    dist = jnp.where(lwins, dl, dr)
    outs = [jnp.where(lwins, l_, r_) for l_, r_ in zip(left[1:], right[1:])]
    fin = jnp.isfinite(dist)
    if need_coords:
        tx = jnp.where(fin, outs[0], inf)
        ty = jnp.where(fin, outs[1], inf)
    else:
        tx = ty = jnp.where(fin, 0.0, inf)
    tval = None
    if values is not None:
        tval = jnp.where(fin, outs[-1], 0.0)
    return dist, tx, ty, tval


@partial(jax.jit, static_argnames=("need_coords", "flip_x"))
def _manhattan_flipped(target_mask, xs, ys, values, need_coords, flip_x):
    """One jitted unit around the Manhattan scan path (eager op-by-op
    dispatch through the axon tunnel costs ~1-2 s PER op — unjitted,
    the 4-scan transform took 2 minutes at 512^2; jitted it is ms).
    flip_x reverses a descending x-axis so the min-plus prefix/suffix
    decomposition sees ascending coordinates."""
    if flip_x:
        target_mask = target_mask[:, ::-1]
        xs = xs[::-1]
        if values is not None:
            values = values[:, ::-1]
    dist, tx, ty, tval = manhattan_transform(
        target_mask, xs, ys, values=values, need_coords=need_coords)
    if flip_x:
        dist = dist[:, ::-1]
        tx = tx[:, ::-1]
        ty = ty[:, ::-1]
        tval = None if tval is None else tval[:, ::-1]
    return dist, tx, ty, tval


def _stride_schedule(max_dim: int) -> np.ndarray:
    strides = []
    k = 1
    while k < max_dim:
        k *= 2
    k //= 2
    while k >= 1:
        strides.append(k)
        k //= 2
    strides += [2, 1]  # JFA+2 cleanup
    return np.asarray(strides, dtype=np.int32)


def packed_state_plan(xs_np, ys_np, metric):
    """Host-side gate for the packed-index Pallas JFA state
    (pallas_jfa.py): one int32 iy<<15|ix channel instead of two float32
    world-coordinate channels halves every round's HBM traffic (each
    single-round kernel is a 9-read+1-write sweep of the state).

    Bit-parity conditions (packed keys must equal the unpacked path's
    keys EXACTLY — both must be the correctly-rounded f32 of the same
    real number):
    - each axis is exactly affine as reals: coords[i] == c0 + i*step in
      float64 with step representable in f32 — then coords[i]-coords[j]
      and (i-j)*step are the same real, and one f32 subtraction vs one
      f32 multiply round it identically;
    - world coordinates reconstruct bitwise in the epilogue:
      f32(c0 + f32(i*step)) == coords[i] for every i (allocation/
      direction compare coordinates exactly);
    - dims fit the 15-bit packing.
    Returns ((step_y, step_x), (y0, x0)) or None to keep the
    coordinate-carrying kernels.  GREAT_CIRCLE always returns None (its
    key needs trig of the coordinates, not deltas).
    """
    if metric == GREAT_CIRCLE:
        return None
    xs_np = np.asarray(xs_np, dtype=np.float32)
    ys_np = np.asarray(ys_np, dtype=np.float32)
    h, w = ys_np.size, xs_np.size
    if not (1 < h <= 32768 and 1 < w <= 32768):
        return None

    def axis_plan(cs):
        n = cs.size
        s64 = (np.float64(cs[-1]) - np.float64(cs[0])) / (n - 1)
        s32 = np.float32(s64)
        if np.float64(s32) != s64 or s64 == 0.0 or not np.isfinite(s64):
            return None
        idx = np.arange(n, dtype=np.float64)
        if not np.array_equal(np.float64(cs),
                              np.float64(cs[0]) + idx * s64):
            return None
        rec = (np.float32(cs[0])
               + (idx.astype(np.float32) * s32)).astype(np.float32)
        if not np.array_equal(rec, cs):
            return None
        return float(s32), float(cs[0])

    py = axis_plan(ys_np)
    px = axis_plan(xs_np)
    if py is None or px is None:
        return None
    return ((py[0], px[0]), (py[1], px[1]))


def manhattan_scan_plan(xs_np, ys_np):
    """Host-side dispatch decision for the exact Manhattan scan
    transform: it needs monotone coordinate axes (any raster axis
    order).  Returns flip_x (True when the descending x-axis must be
    reversed so the min-plus prefix/suffix split sees ascending
    coordinates) or None when the path must not be used — a
    non-monotone coordinate vector (never produced by rasters, but
    legal input), or a TPU raster beyond 1024^2: XLA:TPU code for the
    associative scans grows with pixel AREA (measured executables
    3.9 MB at 512^2 -> 14 MB at 1024^2; a 2048^2 compile ran >28 min
    through the remote-compile service) so larger rasters keep the
    metric-general JFA, which is equally exact and compiles in
    seconds."""
    xs_np = np.asarray(xs_np)
    ys_np = np.asarray(ys_np)
    if jax.default_backend() == "tpu" and \
            max(xs_np.size, ys_np.size) > 1024:
        return None
    dxs = np.diff(xs_np)
    dys = np.diff(ys_np)
    mono = ((dxs >= 0).all() or (dxs <= 0).all()) and \
           ((dys >= 0).all() or (dys <= 0).all())
    if not mono:
        return None
    return bool(dxs.size) and bool(dxs[0] < 0)


def jump_flood(target_mask, xs, ys, metric: int, values=None,
               need_coords=True, manhattan_plan="auto",
               packed_plan="auto", allow_pallas=True, mesh=None):
    """(distance, target_x, target_y, target_value) per pixel.

    target_x/y are world coordinates of the nearest target (inf where no
    target exists); target_value is the raster value at that target.
    `need_coords=False` lets the Manhattan scan path skip its coordinate
    payload channels (proximity/allocation never read them; JFA carries
    coordinates as its state regardless).  `manhattan_plan` /
    `packed_plan` are the manhattan_scan_plan / packed_state_plan
    results when the caller runs under jit (traced coordinates cannot
    be inspected); "auto" decides here.
    """
    h, w = target_mask.shape
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    if metric == MANHATTAN:
        plan = manhattan_plan
        if plan == "auto":
            plan = (manhattan_scan_plan(xs, ys)
                    if not isinstance(xs, jax.core.Tracer) else None)
        if plan is not None:
            return _manhattan_flipped(target_mask, xs, ys, values,
                                      need_coords, plan)

    from .pallas_jfa import (jfa_rounds_packed, jfa_rounds_pallas,
                             use_packed_jfa, use_pallas_jfa)
    strides = tuple(int(k) for k in _stride_schedule(max(h, w)))
    if mesh is not None and use_packed_jfa():
        # distributed packed JFA: per-shard single-round kernels behind
        # a per-round halo exchange (parallel/jfa_sharded.py); big
        # strides stay as GSPMD shift rounds.  Falls through to the XLA
        # scan path (still distributed via GSPMD) when the packed plan
        # or shard geometry rules it out.
        pplan = packed_plan
        if pplan == "auto":
            pplan = (packed_state_plan(xs, ys, metric)
                     if not isinstance(xs, jax.core.Tracer) else None)
        from ..parallel.jfa_sharded import (jump_flood_packed_sharded,
                                            use_sharded_jfa)
        if use_sharded_jfa(mesh, h, w, pplan):
            return jump_flood_packed_sharded(
                target_mask, values, strides, metric, values is not None,
                pplan, mesh, use_pallas=use_pallas_jfa(h, w, metric))
    use_pallas = allow_pallas and use_pallas_jfa(h, w, metric)
    if use_pallas:
        pplan = packed_plan
        if pplan == "auto":
            pplan = (packed_state_plan(xs, ys, metric)
                     if not isinstance(xs, jax.core.Tracer) else None)
        if pplan is not None and use_packed_jfa():
            return jfa_rounds_packed(
                target_mask, values, strides, metric,
                values is not None, pplan)

    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))
    inf = jnp.float32(jnp.inf)
    tx_w = jnp.where(target_mask, px, inf)
    ty_w = jnp.where(target_mask, py, inf)
    if values is None:
        tval = None
    else:
        tval = jnp.where(target_mask, values.astype(jnp.float32), 0.0)

    if use_pallas:
        # Pallas rounds: candidates sliced in VMEM instead of shifted
        # through HBM (VERDICT r1 #2); coordinates ride as 1-D vectors
        tx_w, ty_w, tval, best = jfa_rounds_pallas(
            tx_w, ty_w, tval if tval is not None else tx_w, xs, ys,
            strides, metric, values is not None)
        return _metric_finalize(best, metric), tx_w, ty_w, tval

    tx_w, ty_w, tval, dist = _jfa_rounds(tx_w, ty_w, tval, xs, ys, strides,
                                         metric, (h, w))
    return dist, tx_w, ty_w, tval
