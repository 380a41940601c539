"""Pallas TPU jump-flood rounds: proximity at memory speed.

Round-2 redesign of the JFA inner loop (VERDICT r1 #2).  The XLA scan
formulation (kernels/jfa.py) materializes every shifted candidate field
through HBM — ~45 ms per round at 4096^2, 0.66 s total.  Here each round
is ONE Pallas program and the 8 neighbor candidates are sliced out of
VMEM, so a round costs roughly one read + one write of the carried
state.  Two kernels cover the whole power-of-two stride schedule with
ONE compilation each (compile time through the remote-compile service
dominates multi-program designs):

- `small` (stride < T): one round per kernel; each grid step stitches
  its 3x3 aligned neighbor tiles into a VMEM composite and runs the
  round on a static (T+2k)^2 window.  (Round 3 measured multi-round
  fusion NEGATIVE: each extra in-kernel round costs ~3.7 ms at 4096^2
  regardless of window size, more than a full fresh sweep — 9 fused
  rounds 35.0 ms vs 9 single-round kernels 22.3 ms, same session.)
- `large` (stride = m*T): classic-pipeline tile jumps; the 8 neighbor
  tiles are separate block inputs whose index maps read the jump `m`
  from a scalar-prefetch argument (PrefetchScalarGridSpec), so every
  m reuses one binary.  Block indices clamp at the grid edge.

Correctness around the edges uses a RELAY argument instead of masks:
the state is padded by one full tile (T) of +inf target coordinates,
and every value ever written is selected from existing state values —
i.e. real target coordinates or inf.  Pad cells may adopt targets and
relay them inward (candidate distances are always evaluated against the
READING cell's own coordinates, so a relayed target is just another
valid candidate); clamped windows/blocks at the pad border therefore
produce valid-if-arbitrary relays, never garbage.  Interior cells see
exactly the XLA formulation's semantics, and exactness is enforced by
the same JFA+2 cleanup schedule and brute-force parity tests.

Reference counterpart: the GDAL-ported 4-sweep scan
(xrspatial proximity.py:442-601); metrics proximity.py:38-219.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["jfa_rounds_pallas", "use_pallas_jfa"]

T = 256           # block edge (and pad width) for every JFA kernel
# Round-3 measurements (tools/profile_jfa.py, burst-timed): a tile-jump
# round at 4096^2 costs 2.3 ms (~730 GB/s of its nominal 9-read+1-write
# traffic) and BEATS the 3-view row-strip form (3.5 ms) that round 3
# briefly shipped — aligned (T, T) block streams are this chip's fast
# path, so the row-strip kernel was removed again.


def use_pallas_jfa(h, w, metric) -> bool:
    import os
    if os.environ.get("XRSPATIAL_NO_PALLAS") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    from .jfa import GREAT_CIRCLE
    if metric == GREAT_CIRCLE and \
            os.environ.get("XRSPATIAL_PALLAS_GREAT_CIRCLE") == "0":
        return False  # escape hatch back to the XLA scan path
    return min(h, w) >= 512


# minimax-fitted polynomial trig for the in-kernel great-circle key:
# Mosaic compiles real sin/cos in unrolled select chains pathologically
# (~26 min), while mul/add chains are cheap (precedent: pallas_surface's
# _atan/_atan2).  sin over |x| <= pi (abs err 7.7e-9) and cos over
# |x| <= pi/2 (abs err 6.8e-10) — both below f32 resolution.  Domains
# hold because great-circle inputs are validated lon/lat degrees:
# |dlon/2|, |dlat/2| <= pi and |lat| <= pi/2 in radians.
_SIN_COEF = (9.999999994768e-01, -1.666666610845e-01, 8.333323683243e-03,
             -1.984064744377e-04, 2.753825574372e-06, -2.475214500289e-08,
             1.369737114320e-10)
_COS_COEF = (9.999999998457e-01, -4.999999951157e-01, 4.166664188194e-02,
             -1.388843240483e-03, 2.476377060755e-05, -2.611502420073e-07)


def _poly_even(coef, x):
    t = x * x
    acc = jnp.float32(coef[-1])
    for c in coef[-2::-1]:
        acc = acc * t + jnp.float32(c)
    return acc


def _sin_poly(x):
    return x * _poly_even(_SIN_COEF, x)


def _cos_poly(x):
    return _poly_even(_COS_COEF, x)


_DEG2RAD = 0.017453292519943295


def _gc_key_poly(px, ctx, py, cty):
    """Polynomial haversine comparison key: sin^2(dlat/2) +
    cos(lat1) cos(lat2) sin^2(dlon/2), identical structure to the XLA
    scan path's _metric_key (same subtractions of nearby degree values,
    so small-separation precision matches); only the final trig is
    polynomial.  The winning candidate's TRUE distance is recomputed
    with exact trig in the XLA epilogue, so distances are unaffected —
    the poly only orders candidates (near-tie orderings may differ,
    the documented deviation class)."""
    half = jnp.float32(_DEG2RAD * 0.5)
    slat = _sin_poly((cty - py) * half)
    slon = _sin_poly((ctx - px) * half)
    clat1 = _cos_poly(py * jnp.float32(_DEG2RAD))
    clat2 = _cos_poly(cty * jnp.float32(_DEG2RAD))
    a = slat * slat + clat1 * clat2 * (slon * slon)
    same = (px == ctx) & (py == cty)
    return jnp.where(same, jnp.float32(0.0), a)


def _key(px, ctx, py, cty, metric: int):
    """Monotone candidate key with inf for inf-coordinate (no-target /
    pad) candidates.  In-kernel form: great-circle uses the polynomial
    key; the epilogue recomputes the exact key via _key_exact."""
    from .jfa import GREAT_CIRCLE, _metric_key
    if metric == GREAT_CIRCLE:
        d = _gc_key_poly(px, ctx, py, cty)
    else:
        d = _metric_key(px, ctx, py, cty, metric)
    return jnp.where(jnp.isfinite(ctx), d, jnp.float32(jnp.inf))


def _key_exact(px, ctx, py, cty, metric: int):
    """Exact-trig key for the final distance (XLA epilogue)."""
    from .jfa import _metric_key
    d = _metric_key(px, ctx, py, cty, metric)
    return jnp.where(jnp.isfinite(ctx), d, jnp.float32(jnp.inf))


def use_packed_jfa() -> bool:
    import os
    return os.environ.get("XRSPATIAL_NO_PACKED_JFA") != "1"


_PACK_BITS = 15          # iy<<15 | ix; dims <= 32768 (packed_state_plan)
_PACK_MASK = (1 << _PACK_BITS) - 1


def _key_packed(piy, pix, cand, metric, syx):
    """Key for the packed-index state: cand is int32 iy<<15|ix (or the
    -1 no-target sentinel), piy/pix the cell's own int32 index planes,
    syx the STATIC (step_y, step_x) cell sizes.  kernels/jfa.py::
    packed_state_plan guarantees f32(delta_idx)*step is bit-identical
    to the world-coordinate subtraction the unpacked kernels round, so
    keys — and therefore every selection — match the unpacked path
    exactly."""
    from .jfa import MANHATTAN
    sy, sx = syx
    ciy = jax.lax.shift_right_arithmetic(cand, _PACK_BITS)
    cix = jnp.bitwise_and(cand, _PACK_MASK)
    dy = (piy - ciy).astype(jnp.float32) * jnp.float32(sy)
    dx = (pix - cix).astype(jnp.float32) * jnp.float32(sx)
    if metric == MANHATTAN:
        d = jnp.abs(dx) + jnp.abs(dy)
    else:
        d = dx * dx + dy * dy
    return jnp.where(cand >= 0, d, jnp.float32(jnp.inf))


def _start_key(px, py, S, metric, syx):
    if syx is not None:
        return _key_packed(py, px, S[0], metric, syx)
    return _key(px, S[0], py, S[1], metric)


def _select(best, S, cand, px, py, metric, syx=None):
    if syx is not None:
        nd = _key_packed(py, px, cand[0], metric, syx)
    else:
        nd = _key(px, cand[0], py, cand[1], metric)
    better = nd < best
    S = [jnp.where(better, c, s) for s, c in zip(S, cand)]
    return jnp.where(better, nd, best), S


def _round_up(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("ks", "C", "metric", "emit_best",
                                   "syx"))
def _multi_round_small(state, xs2, ys2, ks, C, metric, emit_best=False,
                       syx=None):
    """Small-stride round kernel: each grid step loads the 3x3 ALIGNED
    neighbor tiles of its output tile (halo sum(ks) <= T), stitches them
    into a (3T, 3T) VMEM composite, and runs the round sequence on
    shrinking static windows of it.  jfa_rounds_pallas now always
    passes SINGLE-round groups ks=(k,) — multi-round fusion measured
    negative value (module docstring; tools/exp_jfa_groups.py) — but
    the multi-round form is kept working for A/B re-checks on future
    hardware.

    Round-3 rewrite: the previous form streamed one overlapped
    (T+2H, T+2H) BoundedSlice window per tile through emit_pipeline and
    measured ~55-95 GB/s; aligned (T, T) block reads run at ~700 GB/s on
    this chip (tools/profile_jfa.py), so reading MORE bytes in aligned
    form is ~4x faster end-to-end.

    Edge behavior: neighbor-tile indices clamp at the grid border; the
    state is padded by one full tile (pad T >= halo), so only pure-pad
    tiles ever clamp and their cells carry valid-if-arbitrary relay
    values (module docstring), never garbage.
    """
    HP = ys2.shape[0]
    WP = xs2.shape[1]
    H = sum(ks)
    assert H <= T, ks
    gi, gj = HP // T, WP // T
    offs = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]

    def view_spec(sy, sx):
        return pl.BlockSpec(
            (T, T),
            lambda i, j, sy=sy, sx=sx: (jnp.clip(i + sy, 0, gi - 1),
                                        jnp.clip(j + sx, 0, gj - 1)),
            memory_space=pltpu.VMEM)

    def kernel(*refs):
        views = refs[:9 * C]
        xrow = jnp.concatenate(
            [refs[9 * C + t][...][0:1, :] for t in range(3)], axis=1)
        ycol = jnp.concatenate(
            [refs[9 * C + 3 + t][...][:, 0:1] for t in range(3)], axis=0)
        outs = refs[9 * C + 6:]
        win = []
        for c in range(C):
            rows = [jnp.concatenate(
                [views[((r * 3) + cc) * C + c][...] for cc in range(3)],
                axis=1) for r in range(3)]
            win.append(jnp.concatenate(rows, axis=0))
        pxw = jnp.broadcast_to(xrow, (3 * T, 3 * T))
        pyw = jnp.broadcast_to(ycol, (3 * T, 3 * T))
        # normalize the halo to exactly H on all sides
        o = T - H
        sz = T + 2 * H
        cur = [a[o:o + sz, o:o + sz] for a in win]
        pxc = pxw[o:o + sz, o:o + sz]
        pyc = pyw[o:o + sz, o:o + sz]
        best = _start_key(pxc, pyc, cur, metric, syx)
        r = H
        for k in ks:
            sz = T + 2 * (r - k)
            own = [a[k:k + sz, k:k + sz] for a in cur]
            nb = best[k:k + sz, k:k + sz]
            pxn = pxc[k:k + sz, k:k + sz]
            pyn = pyc[k:k + sz, k:k + sz]
            for sy in (-1, 0, 1):
                for sx in (-1, 0, 1):
                    if sy == 0 and sx == 0:
                        continue
                    cand = [a[k + sy * k:k + sy * k + sz,
                              k + sx * k:k + sx * k + sz] for a in cur]
                    nb, own = _select(nb, own, cand, pxn, pyn, metric,
                                      syx)
            cur, best, pxc, pyc, r = own, nb, pxn, pyn, r - k
        for o_ref, v in zip(outs, cur):
            o_ref[...] = v
        if emit_best:
            # after the final round best covers exactly the (T, T) output
            # tile; emitting it here lets the caller skip an epilogue
            # key recompute over the whole raster (measured 7.9 ms at
            # 4096^2, tools/profile_jfa.py).  Only exact for metrics
            # whose in-kernel key is the exact key (not great-circle's
            # polynomial ordering key).
            outs[C][...] = best

    in_specs = []
    for sy, sx in offs:
        in_specs += [view_spec(sy, sx)] * C
    for sx in (-1, 0, 1):
        in_specs.append(pl.BlockSpec(
            (8, T), lambda i, j, sx=sx: (0, jnp.clip(j + sx, 0, gj - 1)),
            memory_space=pltpu.VMEM))
    for sy in (-1, 0, 1):
        in_specs.append(pl.BlockSpec(
            (T, 128), lambda i, j, sy=sy: (jnp.clip(i + sy, 0, gi - 1), 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((T, T), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    ins = []
    for _ in offs:
        ins += list(state)
    n_out = C + 1 if emit_best else C
    out_shapes = [jax.ShapeDtypeStruct((HP, WP), s.dtype) for s in state]
    if emit_best:
        out_shapes.append(jax.ShapeDtypeStruct((HP, WP), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins, xs2, xs2, xs2, ys2, ys2, ys2)
    return list(outs)


@partial(jax.jit, static_argnames=("C", "metric", "t", "syx"))
def _large_round(m, state, xs2, ys2, C, metric, t=T, syx=None):
    """One tile-jump round at stride m*t.  t=T for strides >= T; t=128
    runs the stride-128 round as its own tile-jump (128 is the lane
    width, the smallest efficient block edge), which drops it out of the
    fused small group and halves that group's carried halo."""
    HP = ys2.shape[0]
    WP = xs2.shape[1]
    gi, gj = HP // t, WP // t
    offs = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]

    def view_spec(sy, sx):
        return pl.BlockSpec(
            (t, t),
            lambda i, j, m_ref: (jnp.clip(i + sy * m_ref[0], 0, gi - 1),
                                 jnp.clip(j + sx * m_ref[0], 0, gj - 1)),
            memory_space=pltpu.VMEM)

    def kernel(m_ref, *refs):
        # refs: 9 views per channel (offset-major), xs row, ys col, C outs
        views = refs[:9 * C]
        px_t = jnp.broadcast_to(refs[9 * C][...][0:1, :], (t, t))
        py_t = jnp.broadcast_to(refs[9 * C + 1][...][:, 0:1], (t, t))
        outs = refs[9 * C + 2:]
        own_i = offs.index((0, 0))
        cur = [views[own_i * C + c][...] for c in range(C)]
        best = _start_key(px_t, py_t, cur, metric, syx)
        for oi, (sy, sx) in enumerate(offs):
            if sy == 0 and sx == 0:
                continue
            cand = [views[oi * C + c][...] for c in range(C)]
            best, cur = _select(best, cur, cand, px_t, py_t, metric,
                                syx)
        for o, v in zip(outs, cur):
            o[...] = v

    in_specs = []
    for sy, sx in offs:
        in_specs += [view_spec(sy, sx)] * C
    tile = pl.BlockSpec((t, t), lambda i, j, m_ref: (i, j),
                        memory_space=pltpu.VMEM)
    xs_spec = pl.BlockSpec((8, t), lambda i, j, m_ref: (0, j),
                           memory_space=pltpu.VMEM)
    ys_spec = pl.BlockSpec((t, 128), lambda i, j, m_ref: (i, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gi, gj),
        in_specs=in_specs + [xs_spec, ys_spec],
        out_specs=[tile] * C,
    )
    ins = []
    for _ in offs:
        ins += list(state)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((HP, WP), s.dtype)
                   for s in state],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(jnp.full((1,), m, jnp.int32), *ins, xs2, ys2)
    return list(outs)


@partial(jax.jit, static_argnames=("strides", "metric", "with_val"))
def jfa_rounds_pallas(tx_w, ty_w, tval, xs, ys, strides, metric, with_val):
    """Run the full JFA stride schedule with Pallas rounds.

    tx_w/ty_w/tval are the unpadded (h, w) arrays of
    kernels/jfa.py::jump_flood; xs (w,) / ys (h,) are the 1-D coordinate
    vectors (the kernels broadcast them in-VMEM — the 2-D coordinate
    planes never exist in HBM).  Returns (tx, ty, tval_or_None,
    best_key) — the same contract as _jfa_rounds (the caller finalizes
    the metric).
    """
    from .jfa import GREAT_CIRCLE
    h, w = tx_w.shape
    hp = -(-h // T) * T
    wp = -(-w // T) * T
    pads = ((T, T + hp - h), (T, T + wp - w))
    inf = jnp.float32(jnp.inf)
    state = [jnp.pad(tx_w, pads, constant_values=inf),
             jnp.pad(ty_w, pads, constant_values=inf)]
    C = 2
    if with_val:
        state.append(jnp.pad(tval, pads, constant_values=0.0))
        C = 3
    xsp = jnp.pad(xs.astype(jnp.float32), pads[1], mode="edge")
    ysp = jnp.pad(ys.astype(jnp.float32), pads[0], mode="edge")
    xs2 = jnp.broadcast_to(xsp[None, :], (8, wp + 2 * T))
    ys2 = jnp.broadcast_to(ysp[:, None], (hp + 2 * T, 128))

    large = [k // T for k in strides if k >= T]
    mid = [k for k in strides if 128 <= k < T]  # the stride-128 round
    small = [k for k in strides if k < 128]

    if large:
        def big_body(st, m):
            return tuple(_large_round(m, list(st), xs2, ys2, C,
                                      metric)), None
        st, _ = jax.lax.scan(big_body, tuple(state),
                             jnp.asarray(large, jnp.int32))
        state = list(st)
    for k in mid:
        # its own T=128 tile-jump round: keeps the fused small group's
        # halo at <=130 (sum of the remaining strides + cleanup), whose
        # first-round windows would otherwise be 3x the tile area
        state = _large_round(k // 128, state, xs2, ys2, C, metric, t=128)
    best_p = None
    if small:
        # ONE round per kernel: fusing consecutive rounds into a shared
        # composite was measured NEGATIVE value on the v5e — each extra
        # in-kernel round costs ~3.7 ms (size-independent; the shrinking
        # windows don't shrink the cost) while a fresh single-round
        # sweep costs ~2.5 ms including its HBM reads (4096^2: 9 fused
        # rounds 35.0 ms vs 9 single-round groups 22.3 ms, one session;
        # /tmp probe logged in BENCH_NOTES round 3).  Single-round
        # bodies also compile fast per kernel — great-circle's 9-round
        # fused body took ~166 s cold; its per-stride bodies are tiny.
        groups = [(k,) for k in small]
        for gidx, g in enumerate(groups):
            # the last group emits its final best key, replacing a
            # whole-raster epilogue recompute (7.9 ms at 4096^2); the
            # great-circle in-kernel key is a polynomial ORDERING key,
            # so that metric keeps the exact-trig recompute
            emit = gidx == len(groups) - 1 and metric != GREAT_CIRCLE
            state = _multi_round_small(state, xs2, ys2, g, C, metric,
                                       emit_best=emit)
            if emit:
                best_p = state.pop()

    crop = lambda a: a[T:T + h, T:T + w]  # noqa: E731
    tx, ty = crop(state[0]), crop(state[1])
    tv = crop(state[2]) if with_val else None
    if best_p is not None:
        best = crop(best_p)
    else:
        px = jnp.broadcast_to(xs.astype(jnp.float32)[None, :], (h, w))
        py = jnp.broadcast_to(ys.astype(jnp.float32)[:, None], (h, w))
        best = _key_exact(px, tx, py, ty, metric)
    return tx, ty, tv, best


@partial(jax.jit, static_argnames=("strides", "metric", "with_val",
                                   "plan"))
def jfa_rounds_packed(target_mask, values, strides, metric, with_val,
                      plan):
    """Packed-index JFA: the state is ONE int32 iy<<15|ix channel
    (plus a float value channel for allocation) instead of two float32
    world-coordinate channels — each single-round kernel is a
    9-read+1-write HBM sweep of the state, so halving the channel count
    halves the dominant cost of every round.

    Gated by kernels/jfa.py::packed_state_plan, which proves the keys
    (and therefore every selection) are bit-identical to the
    coordinate-carrying path: the coordinate axes are exactly affine,
    so f32(delta_index)*step and the world-coordinate subtraction are
    the same correctly-rounded real, and the epilogue's world-
    coordinate reconstruction is verified bitwise against the actual
    coordinate vectors.  `plan` is ((step_y, step_x), (y0, x0)).

    Returns (distance, target_x, target_y, target_value) — the full
    jump_flood contract (distances finalized here; for euclidean/
    manhattan the in-kernel key IS the exact key, so the final small
    round emits it directly).
    """
    from .jfa import _metric_finalize
    syx, (y0, x0) = plan
    h, w = target_mask.shape
    hp = -(-h // T) * T
    wp = -(-w // T) * T
    pads = ((T, T + hp - h), (T, T + wp - w))
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    packed = jnp.where(target_mask,
                       jnp.bitwise_or(jnp.left_shift(iy, _PACK_BITS), ix),
                       jnp.int32(-1))
    state = [jnp.pad(packed, pads, constant_values=-1)]
    C = 1
    if with_val:
        state.append(jnp.pad(
            jnp.where(target_mask, values.astype(jnp.float32), 0.0),
            pads, constant_values=0.0))
        C = 2
    # own-position planes in INDEX space (int32); pad cells keep their
    # edge-clamped index — they are relay cells whose values are always
    # evaluated against the reader's own position, so any index is valid
    xsp = jnp.pad(jnp.arange(w, dtype=jnp.int32), pads[1], mode="edge")
    ysp = jnp.pad(jnp.arange(h, dtype=jnp.int32), pads[0], mode="edge")
    xs2 = jnp.broadcast_to(xsp[None, :], (8, wp + 2 * T))
    ys2 = jnp.broadcast_to(ysp[:, None], (hp + 2 * T, 128))

    large = [k // T for k in strides if k >= T]
    mid = [k for k in strides if 128 <= k < T]
    small = [k for k in strides if k < 128]

    if large:
        def big_body(st, m):
            return tuple(_large_round(m, list(st), xs2, ys2, C,
                                      metric, syx=syx)), None
        st, _ = jax.lax.scan(big_body, tuple(state),
                             jnp.asarray(large, jnp.int32))
        state = list(st)
    for k in mid:
        state = _large_round(k // 128, state, xs2, ys2, C, metric,
                             t=128, syx=syx)
    best_p = None
    for gidx, k in enumerate(small):
        emit = gidx == len(small) - 1
        state = _multi_round_small(state, xs2, ys2, (k,), C, metric,
                                   emit_best=emit, syx=syx)
        if emit:
            best_p = state.pop()

    crop = lambda a: a[T:T + h, T:T + w]  # noqa: E731
    pk = crop(state[0])
    valid = pk >= 0
    tiy = jax.lax.shift_right_arithmetic(pk, _PACK_BITS)
    tix = jnp.bitwise_and(pk, _PACK_MASK)
    inf = jnp.float32(jnp.inf)
    # bitwise-verified reconstruction (packed_state_plan condition 2)
    t_x = jnp.where(valid, jnp.float32(x0)
                    + tix.astype(jnp.float32) * jnp.float32(syx[1]), inf)
    t_y = jnp.where(valid, jnp.float32(y0)
                    + tiy.astype(jnp.float32) * jnp.float32(syx[0]), inf)
    if best_p is not None:
        best = crop(best_p)
    else:  # degenerate schedule with no small strides
        piy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        pix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        best = _key_packed(piy, pix, pk, metric, syx)
    t_val = crop(state[1]) if with_val else None
    return _metric_finalize(best, metric), t_x, t_y, t_val
