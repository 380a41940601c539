"""Distributed jump-flood: single-chip-class JFA kernels on a mesh.

Round-3 verdict task: mesh-sharded rasters used to silently lose the
Pallas JFA (a 25x fallback to the XLA scan).  Here the SAME
single-round kernel classes run per shard under ``shard_map`` with a
per-round halo exchange of the packed state:

- strides <= 256 (the pad/tile width; these dominate the schedule —
  9 of 14 rounds at 4096^2 including the JFA+2 cleanup) exchange a
  width-k halo of the packed int32 state (plus the value channel for
  allocation) via the two-phase ppermute engine (halo.py), then run
  ONE local Pallas round per shard (`_multi_round_small` for k < 128,
  the t=128/256 tile-jump `_large_round` for k in {128, 256});
- strides > 256 run as global XLA shift rounds over the sharded
  arrays — GSPMD lowers the static pad+slice shifts to collective
  permutes across shard edges, so these few large rounds stay
  distributed too (no gather, no replication).

Exactness: a round at stride k reads only cells <= k away, and the
halo refreshed immediately before it carries the neighbors' CURRENT
state, so every shard computes exactly the cells the unsharded round
would — the result is bit-identical to the single-device packed path
(kernels/pallas_jfa.py::jfa_rounds_packed), which is itself proven
bit-identical to the coordinate-carrying path by
kernels/jfa.py::packed_state_plan.

Off TPU (the virtual-mesh test environment) the per-shard round body
is the same 8-neighbor selection as static window slices of the
halo-extended block — identical arithmetic, no Pallas — so the halo
choreography itself is bit-parity-tested against the global
``jump_flood`` on the 8-device CPU mesh.

Reference analog: uniform dask distribution of proximity
(/root/reference/xrspatial/proximity.py:603-627).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..kernels.jfa import _metric_finalize, _stride_schedule
from ..kernels.pallas_jfa import (T, _key_packed, _large_round,
                                  _multi_round_small, _PACK_BITS,
                                  _PACK_MASK)
from .halo import HaloSpec, halo_extend

__all__ = ["jump_flood_packed_sharded", "use_sharded_jfa"]


def use_sharded_jfa(mesh, h, w, pplan) -> bool:
    """The per-shard Pallas rounds need the packed state (exactly-affine
    coordinate axes) and local shards that are multiples of the T=256
    tile on both axes (the kernels' grid layout).  Anything else keeps
    the GSPMD XLA-scan path (distributed, just slower)."""
    import os
    if os.environ.get("XRSPATIAL_NO_SHARDED_JFA") == "1":
        return False
    if pplan is None or mesh is None:
        return False
    ny, nx = mesh.shape["y"], mesh.shape["x"]
    if h % ny or w % nx:
        return False
    hl, wl = h // ny, w // nx
    if jax.default_backend() == "tpu":
        return hl % T == 0 and wl % T == 0
    # off-TPU (virtual mesh): the slice-based local body has no tile
    # constraint, only that every stride <= 256 fits the local shard
    return min(hl, wl) >= 1


def _shift_fill(arr, shift: int, axis: int, fill):
    """out[..i..] = arr[..i + shift..], constant fill out of bounds
    (static pad + slice; jfa.py::_shift_inf with a custom fill)."""
    if shift == 0:
        return arr
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (max(-shift, 0), max(shift, 0))
    p = jnp.pad(arr, pads, constant_values=fill)
    start = [0] * arr.ndim
    start[axis] = max(-shift, 0) + shift
    return jax.lax.dynamic_slice(p, start, arr.shape)


def _fills(with_val):
    return (-1, 0.0) if with_val else (-1,)


def _select_packed(best, st, cand, piy, pix, metric, syx):
    nd = _key_packed(piy, pix, cand[0], metric, syx)
    better = nd < best
    return (jnp.where(better, nd, best),
            [jnp.where(better, c, s) for s, c in zip(st, cand)])


def _xla_packed_round_global(state, k: int, piy, pix, metric, syx,
                             with_val):
    """One global JFA round at stride k over the sharded arrays: the 8
    neighbors are separable static shifts, which GSPMD partitions into
    collective permutes across shard edges."""
    best = _key_packed(piy, pix, state[0], metric, syx)
    fills = _fills(with_val)
    rowvar = {}
    for sx in (-1, 0, 1):
        rowvar[sx] = ([_shift_fill(c, sx * k, 1, f)
                       for c, f in zip(state, fills)]
                      if sx else state)
    for sy in (-1, 0, 1):
        for sx in (-1, 0, 1):
            if sy == 0 and sx == 0:
                continue
            cand = [_shift_fill(c, sy * k, 0, f)
                    for c, f in zip(rowvar[sx], fills)] \
                if sy else rowvar[sx]
            best, state = _select_packed(best, state, cand, piy, pix,
                                         metric, syx)
    return state


def _local_round_slices(ext, k: int, piy, pix, metric, syx):
    """Per-shard round body off TPU: static window slices of the
    halo-extended block (same 8-candidate selection arithmetic as the
    Pallas kernels — the CPU-mesh twin for bit-parity tests)."""
    hl, wl = piy.shape
    own = [e[k:k + hl, k:k + wl] for e in ext]
    best = _key_packed(piy, pix, own[0], metric, syx)
    for sy in (-1, 0, 1):
        for sx in (-1, 0, 1):
            if sy == 0 and sx == 0:
                continue
            cand = [e[k + sy * k:k + sy * k + hl,
                      k + sx * k:k + sx * k + wl] for e in ext]
            best, own = _select_packed(best, own, cand, piy, pix,
                                       metric, syx)
    return own


def _local_round_pallas(ext, k: int, oy, ox, h, w, metric, syx,
                        with_val):
    """Per-shard Pallas round: pad the halo-extended block out to the
    kernels' tile layout and run the SAME single-round kernel as the
    unsharded path.  Pad cells beyond the exchanged halo are
    valid-if-arbitrary relays (pallas_jfa.py module docstring) — the
    round reads only <= k deep, i.e. only real halo data."""
    C = 2 if with_val else 1
    hl = ext[0].shape[0] - 2 * k
    wl = ext[0].shape[1] - 2 * k
    t = k if k in (128, 256) else T
    pad = t if k in (128, 256) else T
    extra = pad - k
    fills = _fills(with_val)
    st = [jnp.pad(e, ((extra, extra), (extra, extra)),
                  constant_values=f) for e, f in zip(ext, fills)]
    HP, WP = hl + 2 * pad, wl + 2 * pad
    # global index vectors for the padded local block, edge-clamped
    # (pad/halo cell positions are never read for output cells)
    xsp = jnp.clip(ox - pad + jnp.arange(WP, dtype=jnp.int32), 0, w - 1)
    ysp = jnp.clip(oy - pad + jnp.arange(HP, dtype=jnp.int32), 0, h - 1)
    xs2 = jnp.broadcast_to(xsp[None, :], (8, WP))
    ys2 = jnp.broadcast_to(ysp[:, None], (HP, 128))
    if k in (128, 256):
        out = _large_round(jnp.int32(1), st, xs2, ys2, C, metric, t=t,
                           syx=syx)
    else:
        out = _multi_round_small(st, xs2, ys2, (k,), C, metric, syx=syx)
    return [o[pad:pad + hl, pad:pad + wl] for o in out]


@partial(jax.jit, static_argnames=("strides", "metric", "with_val",
                                   "plan", "mesh", "use_pallas"))
def jump_flood_packed_sharded(target_mask, values, strides, metric,
                              with_val, plan, mesh, use_pallas=True):
    """Distributed ``jump_flood`` over a ('y', 'x')-sharded raster.

    Same contract as kernels/pallas_jfa.py::jfa_rounds_packed:
    (distance, target_x, target_y, target_value_or_None).  Outputs stay
    sharded over the mesh.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    syx, (y0, x0) = plan
    h, w = target_mask.shape
    ny, nx = mesh.shape["y"], mesh.shape["x"]
    hl, wl = h // ny, w // nx
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    packed = jnp.where(target_mask,
                       jnp.bitwise_or(jnp.left_shift(iy, _PACK_BITS), ix),
                       jnp.int32(-1))
    state = [packed]
    if with_val:
        state.append(jnp.where(target_mask, values.astype(jnp.float32),
                               0.0))

    big = tuple(k for k in strides if k > T)
    small = tuple(k for k in strides if k <= T)

    for k in big:  # few rounds: log2(max_dim / 256)
        state = _xla_packed_round_global(state, k, iy, ix, metric, syx,
                                         with_val)

    fills = _fills(with_val)

    def local_phase(*st):
        st = list(st)
        oy = jax.lax.axis_index("y").astype(jnp.int32) * hl
        ox = jax.lax.axis_index("x").astype(jnp.int32) * wl
        piy = oy + jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 0)
        pix = ox + jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 1)
        for k in small:
            ext = [halo_extend(c, HaloSpec(k, k), mesh, fill=f)
                   for c, f in zip(st, fills)]
            if use_pallas:
                st = _local_round_pallas(ext, k, oy, ox, h, w, metric,
                                         syx, with_val)
            else:
                st = _local_round_slices(ext, k, piy, pix, metric, syx)
        return tuple(st)

    spec = P("y", "x")
    out = shard_map(local_phase, mesh=mesh,
                    in_specs=(spec,) * len(state),
                    out_specs=(spec,) * len(state),
                    check_rep=False)(*state)
    pk = out[0]
    valid = pk >= 0
    tiy = jax.lax.shift_right_arithmetic(pk, _PACK_BITS)
    tix = jnp.bitwise_and(pk, _PACK_MASK)
    inf = jnp.float32(jnp.inf)
    t_x = jnp.where(valid, jnp.float32(x0)
                    + tix.astype(jnp.float32) * jnp.float32(syx[1]), inf)
    t_y = jnp.where(valid, jnp.float32(y0)
                    + tiy.astype(jnp.float32) * jnp.float32(syx[0]), inf)
    best = _key_packed(iy, ix, pk, metric, syx)
    t_val = out[1] if with_val else None
    return _metric_finalize(best, metric), t_x, t_y, t_val
