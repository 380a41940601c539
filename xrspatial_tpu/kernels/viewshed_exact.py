"""Exact viewshed at ~N^1.5 cost: angle-sorted bucket evaluation.

The pairwise path (kernels/viewshed.py) evaluates the GRASS r.viewshed
predicate (reference viewshed.py:909-1028 corner spans, :1485-1491
status-structure query) for every target against ALL cells — O(N^2).
This module computes the *bit-identical* result with ~sqrt(N)-fold less
work by pruning candidates geometrically, replacing the reference's
sequential sweep + red-black tree with static-shape batched evaluation:

1. all cells are sorted by center angle ``a1`` (host argsort) and targets
   are processed in angle buckets of ``C``;
2. a bucket's candidate blockers are a conservative SUPERSET of every
   cell whose angular span can cover any bucket angle:
   - cells are tiered by index-distance rho from the viewpoint; a cell at
     distance rho has angular halfspan <= asin(sqrt(2)/2 / rho), so tier
     candidates are one contiguous slice of the tier's angle-sorted table
     (bucket range widened by the tier's halfspan bound);
   - near cells (rho <= R0, huge spans) and cells whose span crosses
     angle 0 are candidates for every bucket;
3. each bucket runs the shared predicate `_interp_blocked_max` over its
   (C x E) candidate block — extra candidates fail the exact cover test
   and contribute -inf, and float max is order-independent, so the result
   matches the pairwise oracle bit-for-bit.

All predicate math is float64 (reference contract, viewshed.py:1549-1561)
on attribute planes computed once on the host (`cell_attrs_host`) and
shared with the pairwise path.
"""

from __future__ import annotations

from functools import partial, reduce
from math import asin

import jax
import jax.numpy as jnp
import numpy as np

from .viewshed import (INVISIBLE, PI, _calculate_angle,  # noqa: F401
                       _corner_diffs_np, _corner_elev_np, _corner_offsets,
                       _interp_blocked_max, _np_rects, _visibility_epilogue,
                       cell_attrs_host, cell_attrs_subset,
                       cell_attrs_subset_fn)

__all__ = ["viewshed_grid_exact"]

_PLANES = ("key", "a0", "a1", "a2", "g0", "g1", "g2")

# index-distance tier boundaries (ratio 2: the per-tier halfspan bound
# asin(sqrt(2)/2 / r_lo) overshoots a cell's true halfspan by at most
# ~2x); the first bound is also the near-set radius
_TIER_BOUNDS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192,
                16384)

# safety margin added to the analytic halfspan bound: covers float
# rounding of the f32 sort keys / bucket endpoints vs the true f64
# angles (>= 2 * _E_ANG + margin; the bound itself is exact
# real-arithmetic)
_W_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


def _blocker_table(at, idx):
    """Host-side f64 attribute table for the candidate cells `idx`
    (uploaded packed by `_build_tables`)."""
    tab = {f: at[f][idx] for f in _PLANES}
    tab["valid_b"] = at["valid_b"][idx]
    tab["idx"] = idx.astype(np.int64)
    return tab


def _tier_cache(at, vp_row, vp_col):
    """Target-independent half of the plan: the near/crossing global
    candidate set and per-tier angle-sorted cell tables.  Computed once
    per (raster, viewpoint) and shared between the f32 screen plan and
    the f64 re-evaluation plan (the per-tier argsorts over all N cells
    are the expensive part of planning)."""
    n = at["a1"].size
    h, w = at["shape"]
    a1 = at["a1"]
    crossing = at["a0"] > at["a2"]
    rows, cols = np.divmod(np.arange(n), w)
    rho = np.hypot(rows - vp_row, cols - vp_col)

    glob_mask = (rho <= _TIER_BOUNDS[0]) | crossing
    glob_idx = np.nonzero(glob_mask)[0]

    tier_list = []
    bounds = [b for b in _TIER_BOUNDS if b < rho.max()] + [np.inf]
    for r_lo, r_hi in zip(bounds[:-1], bounds[1:]):
        mask = (rho > r_lo) & (rho <= r_hi) & ~crossing
        tidx = np.nonzero(mask)[0]
        if tidx.size == 0:
            continue
        W = asin(min(1.0, 0.7071067811865476 / r_lo)) + _W_EPS
        order = np.argsort(a1[tidx], kind="stable")
        tidx = tidx[order]
        tier_list.append((tidx, a1[tidx], W))
    return glob_idx, tier_list


def _bucket_plan(at, vp_row, vp_col, C, targets=None, cache=None,
                 dense_order=None, unify_E=False):
    """Host-side plan: target permutation, tier tables, slice offsets.

    ``targets`` restricts the TARGET side to a subset of cell indices
    (used for the f64 re-evaluation of screen-ambiguous targets); the
    candidate tiers always cover every cell.  ``cache`` (from
    `_tier_cache`) skips recomputing the target-independent tier sorts.
    ``dense_order`` optionally supplies the all-cells angle argsort
    (the screen cache already computed it — a second 16.7M-element
    argsort cost ~2.5 s at 4096^2 on the 1-cpu host)."""
    a1 = at["a1"]
    if cache is None:
        cache = _tier_cache(at, vp_row, vp_col)
    glob_idx, tier_list = cache

    if targets is None:
        n_all = a1.size
        targets = np.arange(n_all, dtype=np.int64)
        dense = True
    else:
        n_all = a1.size
        dense = False
    n_t = targets.size
    C = min(C, n_t)
    if dense and dense_order is not None:
        perm = dense_order
    else:
        perm = np.argsort(a1[targets], kind="stable")
    a1s = a1[targets][perm]

    if dense:
        A = -(-n_t // C)
        lo_t = np.minimum(np.arange(A, dtype=np.int64) * C, n_t - C)
        if n_t % C == 0:
            # buckets tile the permutation exactly — skip the 16.7M
            # two-level fancy gather
            tperm = targets[perm]
        else:
            tperm = targets[perm[(lo_t[:, None]
                                  + np.arange(C)[None, :]).ravel()]]
        starts = a1s[lo_t]
        ends = a1s[lo_t + C - 1]
    else:
        # SPARSE target subsets (the f64 re-eval of screen-ambiguous
        # cells) must bucket by ANGLE SPAN, not just count: C scattered
        # targets can span the whole circle, making every tier's
        # candidate window the entire tier (measured 4e10 f64 pair
        # evals = ~55 s at 4096^2).  Quantize angle into cells of dmax,
        # sub-chunk each cell by C, and pad short buckets by repeating
        # their last member (duplicates write equal values).
        #
        # dmax trades bucket FILL against window width: closed-form
        # models mispredict both the pow2 window rounding and the
        # subset's angular clustering, so sweep a geometric dmax menu
        # and take the plan minimizing the ACTUAL evaluation volume
        # A * sumE (each candidate plan is just searchsorted calls).
        g0 = 4.0 * C / max(n_all, 1) * 2.0 * np.pi
        arange_t = np.arange(n_t, dtype=np.int64)
        best = None
        for mult in (1.0, 4.0, 16.0, 64.0, 256.0):
            dmax = min(g0 * mult, 7.0)
            cell = np.floor(a1s / dmax).astype(np.int64)
            first = np.zeros(n_t, dtype=bool)
            first[0] = True
            first[1:] = cell[1:] != cell[:-1]
            cell_start = np.maximum.accumulate(
                np.where(first, arange_t, 0))
            new_b = ((arange_t - cell_start) % C) == 0
            s_b = np.nonzero(new_b)[0]
            e_b = np.append(s_b[1:], n_t)
            # pad the bucket COUNT to a power of two (the scan length
            # is a compile-time constant; a data-dependent A would
            # recompile per call) by repeating the last bucket
            A = 1 << (max(int(s_b.size), 8) - 1).bit_length()
            pad = A - s_b.size
            if pad:
                s_b = np.append(s_b, np.full(pad, s_b[-1]))
                e_b = np.append(e_b, np.full(pad, e_b[-1]))
            starts = a1s[s_b]
            ends = a1s[e_b - 1]
            sumE = 0
            for tidx, ta1, W in tier_list:
                los_t = np.searchsorted(ta1, starts - W, side="left")
                his_t = np.searchsorted(ta1, ends + W, side="right")
                need = max(int((his_t - los_t).max()), 128)
                sumE += 1 << (need - 1).bit_length()
            if best is None or A * sumE < best[0]:
                best = (A * sumE, s_b, e_b, A)
            if dmax >= 7.0:
                break
        _, s_b, e_b, A = best
        member = s_b[:, None] + np.minimum(np.arange(C)[None, :],
                                           (e_b - s_b - 1)[:, None])
        tperm = targets[perm[member.ravel()]]
        starts = a1s[s_b]
        ends = a1s[e_b - 1]

    tiers = []
    for tidx, ta1, W in tier_list:
        los = np.searchsorted(ta1, starts - W, side="left")
        his = np.searchsorted(ta1, ends + W, side="right")
        # next power of two: the eval-block shapes come from E, so a
        # small shape menu keeps the XLA program stable across
        # viewpoints/rasters (compile reuse) at <=2x extra masked work
        need = max(int((his - los).max()), 128)
        E = 1 << (need - 1).bit_length()
        tiers.append((tidx, los, E))
    if unify_E and not dense and tiers:
        # level-2 screen plans only: unify every tier's window length
        # to the max — each new viewpoint produces a different
        # ambiguous set, and per-tier E variation multiplies distinct
        # static shapes for the level-2 screen, each costing a remote
        # compile of ~minutes (the dominant re-eval cost; round-5
        # on-chip measurement).  Wider windows are sound supersets
        # (the clamp epilogue argument).  The ORACLE paths keep exact
        # per-tier windows: their compile is cheap and unification
        # inflates the gathered-table upload ~3x.
        E_uni = max(E for _, _, E in tiers)
        tiers = [(tidx, los, E_uni) for tidx, los, _ in tiers]
    return tperm, glob_idx, tiers, A, C


def viewshed_grid_exact(data, vp_row: int, vp_col: int,
                        observer_elev: float, target_elev: float,
                        ew_res: float, ns_res: float, chunk: int = 512):
    """Exact visibility grid at any size (bit-identical to viewshed_grid).

    Enables x64 internally at the call boundary (jax.enable_x64 inside a
    jit trace is a silent no-op — the f64 uploads and the jitted
    evaluation must both see it).
    """
    import os
    from ..utils import x64
    chunk = int(os.environ.get("XRSPATIAL_VS_EXACT_CHUNK", chunk))
    mark = _phase_timer()
    data_np = np.asarray(data, dtype=np.float64)
    h, w = data_np.shape
    n = h * w
    vp_elev = data_np[vp_row, vp_col] + observer_elev

    if os.environ.get("XRSPATIAL_VS_NO_SCREEN") == "1":
        at = cell_attrs_host(data_np, vp_row, vp_col, observer_elev,
                             target_elev, ew_res, ns_res)
        mark("attrs")
        tperm, glob_idx, tiers, A, C = _bucket_plan(at, vp_row, vp_col,
                                                    chunk)
        with x64():
            vis_np = _run_buckets_f64(at, tperm, glob_idx, tiers, A, C)
        visible = np.empty(n, dtype=bool)
        # clamped-overlap duplicates write equal values
        visible[tperm] = vis_np
    else:
        visible = _screened_visibility(data_np, vp_row, vp_col,
                                       observer_elev, target_elev,
                                       ew_res, ns_res, chunk, mark)

    with x64():
        visible_dev = jnp.asarray(visible.reshape(h, w))
        return _visibility_epilogue(jnp.asarray(data_np), visible_dev,
                                    jnp.float64(vp_elev),
                                    jnp.int32(vp_row), jnp.int32(vp_col),
                                    jnp.float64(target_elev),
                                    jnp.float64(ew_res),
                                    jnp.float64(ns_res), (h, w))


def _pad_tab(tab, L):
    """Pad a host candidate table up to a coarse length quantum: table
    lengths are compile-time shapes, so exact sizes would recompile on
    every viewpoint move; inert pad entries are filtered by the
    predicate (valid_b False -> -inf)."""
    cur = tab["idx"].shape[0]
    if cur >= L:
        return tab
    pad = L - cur
    return {f: np.pad(v, (0, pad),
                      constant_values=(False if f in ("valid_b",
                                                      "crossing")
                                       else -1 if f == "idx"
                                       else 0.0))
            for f, v in tab.items()}


def _build_tables(at, glob_idx, tiers, make_table):
    """Build the [glob, tier...] candidate tables host-side and upload
    each FIELD once as a packed concatenation, carved back into tables
    with one jitted static-slice dispatch — per-table-per-field uploads
    (13 fields x ~7 tables) each paid a ~10 ms tunnel roundtrip, which
    dominated this phase."""
    host = [_pad_tab(make_table(at, glob_idx),
                     _round_up(glob_idx.size, 1024))]
    metas = []
    for tidx, los, E in tiers:
        L = max(E, _round_up(tidx.size, 16384))
        host.append(_pad_tab(make_table(at, tidx), L))
        # clamp so the fixed-length slice stays in-bounds (extra
        # candidates from clamping are filtered by the cover test)
        metas.append((np.minimum(np.maximum(los, 0),
                                 L - E).astype(np.int32), E))
    offs = tuple(int(o) for o in
                 np.cumsum([0] + [t["idx"].size for t in host]))
    packed = {f: jnp.asarray(np.concatenate([t[f] for t in host]))
              for f in host[0]}
    dev = _carve(packed, offs)
    tier_tabs = [(tab, E) for tab, (_, E) in zip(dev[1:], metas)]
    tier_los = [jnp.asarray(los) for los, _ in metas]
    return dev[0], tier_tabs, tier_los


@partial(jax.jit, static_argnames=("offs",))
def _carve(packed, offs):
    """One dispatch that slices the per-field upload back into the
    [glob, tier...] tables (eager per-field slices would each pay a
    tunnel dispatch)."""
    return tuple(
        {f: jax.lax.slice_in_dim(v, offs[i], offs[i + 1])
         for f, v in packed.items()}
        for i in range(len(offs) - 1))


def _run_buckets_f64_gathered(attrs_of, tperm, glob_idx, tiers, A, C,
                              mark=lambda label: None):
    """Float64 bucket evaluation for a SMALL target subset: instead of
    uploading full per-tier f64 tables (O(N) device bytes — the old
    re-eval cost more than the whole screen), gather on the host ONLY
    the (A, E) candidate slices each bucket actually reads, flatten them
    to (A*E,) concatenated blocks, and hand the unchanged scan kernel
    stride-E offsets.  Identical candidate supersets + identical
    predicate => bit-identical visibility.

    ``attrs_of(flat_idx) -> dict`` supplies the f64 attributes at
    arbitrary flat indices (cell_attrs_subset_fn, or a gather from
    full planes — bit-identical either way)."""
    # build EVERY table host-side first, then upload each field ONCE as
    # a concatenation of [glob, tier1, tier2, ...] and carve it back up
    # with static device slices: ~90 per-field uploads at ~10 ms tunnel
    # roundtrip each were most of this path's cost
    host_tabs = []

    def _host_tab(flat, inb):
        a = attrs_of(flat)
        tab = {f: a[f] for f in _PLANES}
        tab["valid_b"] = a["valid_b"] & inb
        tab["idx"] = np.where(inb, flat, -1).astype(np.int64)
        return tab

    gpad = _round_up(glob_idx.size, 1024)
    gext = np.pad(glob_idx, (0, gpad - glob_idx.size))
    host_tabs.append(_host_tab(
        gext, np.arange(gpad) < glob_idx.size))
    Es = []
    for tidx, los, E in tiers:
        # same clamp semantics as _build_tables: slices stay in-bounds
        # of the padded table; pad rows are invalid (filtered by the
        # predicate), clamp-overlap extras fail the cover test
        los = np.minimum(np.maximum(los, 0), max(tidx.size - E, 0))
        pos = los[:, None] + np.arange(E)[None, :]
        flat = tidx[np.minimum(pos, tidx.size - 1)].ravel()
        inb = (pos < tidx.size).ravel()
        host_tabs.append(_host_tab(flat, inb))
        Es.append(E)
    mark("reeval/host-gather")

    lens = [t["idx"].size for t in host_tabs]
    offs = tuple(int(o) for o in np.cumsum([0] + lens))
    packed = {f: jnp.asarray(np.concatenate([t[f] for t in host_tabs]))
              for f in host_tabs[0]}
    dev_tabs = _carve(packed, offs)
    mark("reeval/upload+carve")

    ta = attrs_of(tperm)
    tgt = {
        "a1": jnp.asarray(ta["a1"]),
        "key": jnp.asarray(ta["key"]),
        "grad_t": jnp.asarray(ta["grad_t"]),
        "idx": jnp.asarray(tperm.astype(np.int64)),
    }
    tier_tabs = [(tab, E) for tab, E in zip(dev_tabs[1:], Es)]
    tier_los = [jnp.asarray((np.arange(A, dtype=np.int64) * E)
                            .astype(np.int32)) for E in Es]
    vis = _eval_buckets_run(tgt, dev_tabs[0], tier_tabs, tier_los, A, C)
    out = np.asarray(vis).ravel()
    mark("reeval/eval+fetch")
    return out


def _run_buckets_f64(at, tperm, glob_idx, tiers, A, C):
    """The float64 bucket evaluation over `tperm` targets (flat bool)."""
    tgt = {
        "a1": jnp.asarray(at["a1"][tperm]),
        "key": jnp.asarray(at["key"][tperm]),
        "grad_t": jnp.asarray(at["grad_t"][tperm]),
        "idx": jnp.asarray(tperm.astype(np.int64)),
    }
    glob, tier_tabs, tier_los = _build_tables(at, glob_idx, tiers,
                                              _blocker_table)
    vis = _eval_buckets_run(tgt, glob, tier_tabs, tier_los, A, C)
    return np.asarray(vis).ravel()


def _phase_timer():
    """Env-gated phase timing (XRSPATIAL_VS_TIMING=1): prints wall time
    of each exact-viewshed phase to stderr for perf diagnosis."""
    import os
    import sys
    import time
    if os.environ.get("XRSPATIAL_VS_TIMING") != "1":
        return lambda label: None
    state = {"t": time.perf_counter()}

    def mark(label):
        now = time.perf_counter()
        print(f"# vs_exact {label}: {now - state['t']:.3f}s",
              file=sys.stderr, flush=True)
        state["t"] = now
    return mark


# ---------------------------------------------------------------------------
# Device-expanded float32 interval screen (round 4)
#
# The screen never touches f64 host planes: the host computes only f32
# elevation DIFFERENCE planes (f64 subtract then cast — the subtraction
# must happen in f64 or cancellation costs ~ulp(elev) absolute error),
# a separable f32 center-angle plane for sorting/windows, and the tier
# partition; everything else (corner angles, gradients, interpolation
# slopes, tolerance fields) is expanded ON DEVICE from 5 small uploaded
# fields per candidate (int32 idx, 3 diffs, shift flag).
#
# float32 error budget (validated by tools/measure_screen_errors.py on
# both CPU and TPU backends; constants are >= 3x the measured maxima):
#   _E_ANG: |f32 angle - f64 angle| for a0/a1/a2/a1e and the target's
#           sort angle (arctan + quadrant assembly + 2pi unwrap).
#   _TAU_C: cover band; must exceed 2*_E_ANG so the widened test
#           (al > a0 - _TAU_C) captures every truly-covering pair and
#           the narrowed test only fires on truly-covering pairs.
#   _TAU_GR: RELATIVE gradient band (diff cast + f32 atan + divide —
#           all relative error sources; see the note at the constant).
#   _TAU_K: relative key band ((dx*ew)^2 + (dy*ns)^2 in f32).
#   _KA_S:  interpolation angle-error amplification: |gi - gi_true| <=
#           gband + span * KA / min(d10, d21) for in-span evaluation,
#           gband = _TG_ABS + _TAU_GR * max|g|.
#   _KA_W:  same plus linear EXTRAPOLATION across the tau_c cover band
#           (maybe-pairs can sit up to _TAU_C + 2*_E_ANG outside the
#           span; the interpolant is extended linearly, so near-edge
#           spurious candidates get a TIGHT bound instead of the
#           max-corner clamp — the clamp made ~3% of rugged-terrain
#           targets ambiguous).
#   gi is clipped to [min3, max3] before the tolerance is applied, so
#   even degenerate segments (d -> 0) yield sound bounds: the true
#   value lies in [min3 - gband, max3 + gband] for covering pairs.
# ---------------------------------------------------------------------------

_E_ANG = 2e-6
_TAU_C = np.float32(6e-6)      # cover band (> 2*_E_ANG + margin)
_TAU_K = np.float32(2e-6)      # relative key band
_KA_S = np.float32(8 * _E_ANG)
_KA_W = np.float32(8 * _E_ANG + 2 * 6e-6)
# Gradient bands are RELATIVE to the gradient magnitude (plus a dust
# floor): every error source in g = atan(diff32 / dist32) is relative —
# diff32 is an f32 cast of an f64-computed difference (0.5 ulp REL),
# dist/divide are ~1 ulp rel, and atan evaluates small arguments as
# x*poly(x^2) so its implementation error is relative too (measured
# 4e-7 * |g| worst-case across backends).  An ABSOLUTE band here was
# the round-4 ambiguity disaster: far flat-water cells have |g| ~ 1e-3
# and true decision margins ~ vp/d^2 ~ 1e-6 absolute = 7e-4 RELATIVE —
# far above the f32 noise but below any sound absolute band, which
# made ~25% of a 4096^2 water terrain ambiguous and tripped the f64
# valve.
_TAU_GR = np.float32(1.5e-6)   # relative gradient band (>= 3.7x measured)
_TG_ABS = np.float32(1e-10)    # absolute dust floor for |g| ~ 0

# tolerance sets for the two screen levels, as static tuples
# (tau_c, ka_s, ka_w, tau_gr, tg_abs, tau_k).  Level 1 (f32) bands are
# the constants above.  Level 2 re-screens level-1-ambiguous targets in
# DEVICE float64 (exact f64 diffs uploaded; angles/gradients from exact
# integer coordinates), where the only deviations from the host-numpy
# f64 attributes are libm-vs-XLA ulp differences — measured < 9e-16 on
# CPU and < 5.2e-14 on TPU's emulated f64
# (tools/measure_screen_errors.py --f64), so 1e-12-scale bands classify
# everything except true f64-epsilon ties, which fall through to the
# host-f64 oracle evaluation.
_TAUS_F32 = (float(_TAU_C), float(_KA_S), float(_KA_W),
             float(_TAU_GR), float(_TG_ABS), float(_TAU_K))
_TAUS_F64 = (1e-12, 8e-12, 1e-11, 1e-12, 1e-30, 1e-12)

# below this many level-1-ambiguous targets the f64 re-screen is
# skipped in favour of the gathered f64 oracle (same pair volume, one
# fewer compile family; see the shortcut in _screened_visibility)
_L2_MIN_AMB = 2048
# gathered-oracle volume ceiling (elements = A * sum(E)): above this
# the host-gather + ~12-field f64 tunnel upload costs more than the
# device-resident L2 re-screen (on-chip A/B at 1024^2: 2.4M elements
# took 10-12 s gathered vs 3.9 s re-screened; 512^2's 278k elements
# took 0.35 s gathered — crossover sits near 1.5-2 s either way)
_DIRECT_MAX_ELEMS = 1 << 19
# level-2 re-screen slab size (targets per slab, angle-ordered): bounds
# the grouped-scan window volume (A*sumE pairs — 2048 buckets at 4096^2
# crashed the worker), tightens windows to each slab's angle range, and
# keeps one compile family + one f64 table build across slabs
_L2_SLAB = 8192


def _angle_plane32(h, w, vp_row, vp_col):
    """Separable f32 center-angle plane: |dr| x (1/|dc|) outer product
    through one arctan pass, quadrant-assembled with the same slab
    rectangles as _calculate_angle_np.  Only used as a sort key / window
    coordinate — any value within _E_ANG of the true f64 angle is sound
    (windows are widened by _W_EPS >= 2*_E_ANG)."""
    dr = np.abs(np.arange(h, dtype=np.float32) - np.float32(vp_row))
    adc = np.abs(np.arange(w, dtype=np.float32) - np.float32(vp_col))
    rec = np.where(adc == 0.0, np.float32(1.0), adc)
    rec = (np.float32(1.0) / rec).astype(np.float32)
    ang = np.arctan(dr[:, None] * rec[None, :])
    out = np.zeros((h, w), dtype=np.float32)
    r, c = _np_rects(h, w, vp_row, vp_col)
    pi = np.float32(np.pi)
    out[r[0], c[2]] = ang[r[0], c[2]]
    out[r[0], c[0]] = pi - ang[r[0], c[0]]
    out[r[2], c[0]] = pi + ang[r[2], c[0]]
    out[r[2], c[2]] = np.float32(2.0 * np.pi) - ang[r[2], c[2]]
    out[r[0], c[1]] = np.float32(np.pi / 2.0)
    out[r[2], c[1]] = np.float32(3.0 * np.pi / 2.0)
    out[r[1], c[2]] = 0.0
    out[r[1], c[0]] = pi
    out[r[1], c[1]] = 0.0
    return out


def _screen_cache(data_np, vp_row, vp_col, observer_elev, target_elev,
                  ew_res, ns_res):
    """Host half of the screen: f32 difference planes, f32 angle plane,
    tier partition (ONE global argsort + a stable tier re-sort instead
    of per-tier argsorts), and crossing-cell duplication.

    Crossing cells — spans wrapping through angle 0 — are exactly the
    east ray (row == vp_row, col > vp_col; structural, verified against
    a0 > a2 in tests).  Each appears twice in its tier table: at its
    center angle 0 covering [a0 - 2pi, a2], and as a +2pi copy (sort
    key 2pi) covering [a0, a2 + 2pi]; both interpolate identically to
    the f64 predicate's unwrap, so no bucket needs crossing-aware
    logic."""
    h, w = data_np.shape
    vp_elev = data_np[vp_row, vp_col] + observer_elev
    d2 = data_np - vp_elev
    # corner diffs are averaged on the DIFF plane (association differs
    # from avg-then-subtract by f64 ulps — far inside both screen
    # levels' bands; the host-f64 oracle keeps its own exact attrs)
    pad = np.pad(d2, 1, constant_values=np.nan)
    d_e64 = _corner_diffs_np(d2, vp_row, vp_col, pad=pad)
    d_x64 = _corner_diffs_np(d2, vp_row, vp_col, enter=False, pad=pad)
    del pad
    d_c64 = d2.ravel()
    d_e64 = d_e64.ravel()
    d_x64 = d_x64.ravel()
    d_c = d_c64.astype(np.float32)
    d_e = d_e64.astype(np.float32)
    d_x = d_x64.astype(np.float32)
    if target_elev == 0.0:
        d_t64 = d_c64
        d_t = d_c
    else:
        d_t64 = d_c64 + target_elev
        d_t = d_t64.astype(np.float32)
    a1 = _angle_plane32(h, w, vp_row, vp_col).ravel()

    dr = np.arange(h, dtype=np.float32) - np.float32(vp_row)
    dc = np.arange(w, dtype=np.float32) - np.float32(vp_col)
    rho2 = (np.abs(dr)[:, None] ** 2 + np.abs(dc)[None, :] ** 2).ravel()
    tid = np.zeros(rho2.size, dtype=np.int8)
    for b in _TIER_BOUNDS:
        tid += rho2 > np.float32(b) ** 2
    order = np.argsort(a1, kind="stable")
    ord2 = order[np.argsort(tid[order], kind="stable")]
    counts = np.bincount(tid, minlength=len(_TIER_BOUNDS) + 1)
    two_pi = np.float32(2.0 * np.pi)
    # the crossing (east-ray) cells are one contiguous flat-index range
    ray_lo = vp_row * w + vp_col
    ray_hi = vp_row * w + w

    def extend(idx_sorted):
        cross = (idx_sorted > ray_lo) & (idx_sorted < ray_hi)
        cidx = idx_sorted[cross]
        ext = np.concatenate([idx_sorted, cidx])
        keys = np.concatenate([a1[idx_sorted],
                               np.full(cidx.size, two_pi, np.float32)])
        shifted = np.zeros(ext.size, dtype=bool)
        shifted[idx_sorted.size:] = True
        return ext.astype(np.int64), keys, shifted

    glob_idx, _, glob_shift = extend(ord2[:counts[0]])
    off = int(counts[0])
    tiers = []
    for t in range(1, counts.size):
        cnt = int(counts[t])
        if cnt == 0:
            continue
        tidx = ord2[off:off + cnt]
        off += cnt
        W = asin(min(1.0, 0.7071067811865476 / _TIER_BOUNDS[t - 1])) \
            + _W_EPS
        tiers.append(extend(tidx) + (W,))
    return dict(a1=a1, d_c=d_c, d_e=d_e, d_x=d_x, d_t=d_t,
                d_c64=d_c64, d_e64=d_e64, d_x64=d_x64, d_t64=d_t64,
                glob=(glob_idx, glob_shift), tiers=tiers, order=order,
                vp_elev=vp_elev, shape=(h, w))


def _screen_build_tables(sc, glob_idx, glob_shift, tiers, tier_shifts,
                         f64=False):
    """[glob, tier...] screen-input tables: per candidate only int32
    idx, the 3 elevation diffs, and the crossing-copy flag — the
    13 derived predicate fields are expanded on device
    (_expand_table), so host gather+upload volume is ~16 B/candidate
    instead of ~52.  ``f64`` selects the exact f64 diff planes for the
    level-2 re-screen."""
    ft = np.float64 if f64 else np.float32
    s = "64" if f64 else ""

    def tab(idx, shifted, L):
        m = idx.size
        out = {
            "idx": np.full(L, -1, np.int32),
            "sh": np.zeros(L, dtype=bool),
            "dc": np.zeros(L, ft),
            "de": np.zeros(L, ft),
            "dx": np.zeros(L, ft),
        }
        out["idx"][:m] = idx
        out["sh"][:m] = shifted
        out["dc"][:m] = sc["d_c" + s][idx]
        out["de"][:m] = sc["d_e" + s][idx]
        out["dx"][:m] = sc["d_x" + s][idx]
        return out

    # 256-entry glob quantum (pow2 above 1024: fewer distinct static
    # shapes, hence fewer remote compiles, once the pad fraction is
    # small anyway): the screen evaluates every target against the
    # whole padded glob table, so its pad is pure pair work
    gsz = glob_idx.size
    gL = (_round_up(gsz, 256) if gsz <= 1024
          else 1 << (gsz - 1).bit_length())
    host = [tab(glob_idx, glob_shift, gL)]
    metas = []
    for (tidx, los, E), shifted in zip(tiers, tier_shifts):
        # L must divide into whole E-blocks for the grouped window
        # gather (_group_plan); E is a power of two <= the pad quantum
        L = _round_up(max(E, _round_up(tidx.size, 16384)), E)
        host.append(tab(tidx, shifted, L))
        metas.append((np.minimum(np.maximum(los, 0),
                                 L - E).astype(np.int32), E))
    offs = tuple(int(o) for o in
                 np.cumsum([0] + [t["idx"].size for t in host]))
    packed = {f: jnp.asarray(np.concatenate([t[f] for t in host]))
              for f in host[0]}
    return packed, offs, metas


def _expand_table(tab, w, vp_row, vp_col, ew, ns, taus=_TAUS_F32):
    """Per-candidate derived fields computed on device from
    (idx, diffs, shift): corner angles via the shared quadrant table,
    gradients, unwrapped span/node, interpolation slopes, [min3, max3]
    clip range, and the sure/maybe tolerance fields.  Validity (pad
    entries, NaN elevation, the viewpoint itself) is folded into the
    cover bounds (a0w/a0n = +inf kills both tests).

    The working dtype follows the diff fields: f32 for screen level 1,
    f64 (exact diffs) for the level-2 re-screen; ``taus`` supplies the
    matching tolerance set."""
    dt = tab["dc"].dtype
    tau_c, ka_s, ka_w, tau_gr, tg_abs, _ = (jnp.asarray(t, dt)
                                            for t in taus)
    idx = tab["idx"]
    safe = jnp.maximum(idx, 0)
    row = safe // w
    col = safe - row * w
    dy = (row - vp_row).astype(dt)
    dx = (col - vp_col).astype(dt)
    e_dy, e_dx, x_dy, x_dx = _corner_offsets(row, col, vp_row, vp_col,
                                             xp=jnp)
    ey0 = dy + e_dy
    ex0 = dx + e_dx
    ey2 = dy + x_dy
    ex2 = dx + x_dx
    a0 = _calculate_angle(ex0, ey0, 0.0, 0.0, xp=jnp)
    a1 = _calculate_angle(dx, dy, 0.0, 0.0, xp=jnp)
    a2 = _calculate_angle(ex2, ey2, 0.0, 0.0, xp=jnp)

    def grad(d, py, px):
        d2 = (px * ew) ** 2 + (py * ns) ** 2
        return jnp.arctan(d / jnp.sqrt(jnp.where(d2 == 0, 1.0, d2)))

    g0 = grad(tab["de"], ey0, ex0)
    g1 = grad(tab["dc"], dy, dx)
    g2 = grad(tab["dx"], ey2, ex2)
    key = (dx * ew) ** 2 + (dy * ns) ** 2

    two_pi = jnp.asarray(2.0 * PI, dt)
    zero = jnp.asarray(0.0, dt)
    crossing = (dy == 0.0) & (dx > 0.0)
    sh = tab["sh"]
    a0u = a0 - jnp.where(crossing & ~sh, two_pi, zero)
    shift2 = jnp.where(crossing & sh, two_pi, zero)
    a2u = a2 + shift2
    a1e = a1 + shift2
    d10 = a1e - a0u
    d21 = a2u - a1e
    tiny = jnp.asarray(1e-12 if dt == jnp.float32 else 1e-200, dt)
    s01 = (g0 - g1) / jnp.maximum(d10, tiny)
    s21 = (g2 - g1) / jnp.maximum(d21, tiny)
    mx = jnp.maximum(g0, jnp.maximum(g1, g2))
    mn = jnp.minimum(g0, jnp.minimum(g1, g2))
    span = mx - mn
    dmin = jnp.maximum(jnp.minimum(d10, d21), tiny)
    one = jnp.asarray(1.0, dt)
    gband = tg_abs + tau_gr * jnp.maximum(jnp.abs(mn), jnp.abs(mx))
    tol_s = gband + span * jnp.minimum(one, ka_s / dmin)
    tol_w = gband + span * jnp.minimum(one, ka_w / dmin)

    valid = ((idx >= 0) & jnp.isfinite(tab["dc"])
             & ((row != vp_row) | (col != vp_col)))
    inf = jnp.asarray(jnp.inf, dt)
    a0w = jnp.where(valid, a0u - tau_c, inf)
    a0n = jnp.where(valid, a0u + tau_c, inf)
    return dict(a0w=a0w, a0n=a0n, a2w=a2u + tau_c, a2n=a2u - tau_c,
                a1e=a1e, g1=g1, s01=s01, s21=s21, mn=mn, mx=mx,
                ts=tol_s, tw=tol_w, key=key, idx=idx)


def _screen_pairs(al, kt_lo, kt_hi, it, c):
    """Sound (hi, lo) bounds per target over one candidate block — the
    lean pair kernel: 2 interval tests, 2 key tests, one linear
    interpolation (slopes precomputed per candidate, no divides, no
    crossing selects).  Broadcast contract: the target operands carry
    trailing length-1 candidate axes, the candidate fields in ``c`` are
    already shaped to broadcast against them (candidates on the
    trailing axes, 1 or 2 of them); the max reduces every candidate
    axis."""
    ninf = jnp.asarray(-jnp.inf, c["g1"].dtype)
    kb = c["key"]
    not_self = c["idx"] != it
    maybe = ((al > c["a0w"]) & (al < c["a2w"])
             & (kb < kt_hi) & not_self)
    sure = ((al > c["a0n"]) & (al < c["a2n"])
            & (kb < kt_lo) & not_self)
    d = al - c["a1e"]
    gi = c["g1"] + d * jnp.where(d < 0, -c["s01"], c["s21"])
    gi = jnp.clip(gi, c["mn"], c["mx"])
    red = tuple(range(1, gi.ndim))
    hi = jnp.max(jnp.where(maybe, gi + c["tw"], ninf), axis=red)
    lo = jnp.max(jnp.where(sure, gi - c["ts"], ninf), axis=red)
    return hi, lo


# per-scan-step target count for the screen evaluation: B buckets of C
# targets are evaluated per step against one shared contiguous window
# per tier.  Larger groups amortize the lax.scan step overhead but
# widen every tier window by ~B*C extra candidates (the group spans a
# wider angle range), so this is a step-latency vs pair-work tradeoff.
_GROUP_TARGETS = 4096


def _group_plan(metas, A, C):
    """Host grouping of the A angle-sorted buckets into G = A/B groups
    that share one CONTIGUOUS block-quantized candidate window per tier.

    The round-4 batched formulation (one (G, B*C, NB*E) broadcast-reduce
    per tier over `jnp.take` row-gathered windows) executed
    pathologically on TPU — 78-108 s warm at 1024^2, with a 275-530 s
    first-execution penalty per static shape (measured on-chip, round
    5).  The screen therefore evaluates as a lax.scan over groups whose
    body reads each tier window with a contiguous `dynamic_slice` — the
    same shape-stable pattern as the f64 bucket path
    (`_eval_buckets_impl`), which measures milliseconds per step.

    Soundness of the window superset: extra candidates beyond a
    bucket's exact slice either fail the cover test (the plan already
    guarantees every candidate that can cover a bucket's targets is in
    that bucket's slice) or are genuine covering pairs, which the
    predicate's max treats identically (supersets are idempotent for
    hi; for lo they only add TRUE pairs, keeping lo <= the true
    blocked max) — same argument the slice-clamp epilogue has always
    relied on.

    Returns (B, rows, NBs): rows[t] is the (G,) int32 first-block
    index per group, NBs[t] the pow2-quantized per-group block count.
    `_screen_run` caps NB at the tier's total block count and clamps
    the start so every window is a valid in-table slice."""
    B = 1
    while B * 2 * C <= _GROUP_TARGETS and A % (B * 2) == 0:
        B *= 2
    G = A // B
    rows, NBs = [], []
    for los, E in metas:
        lo2 = los.reshape(G, B)
        rmin = lo2.min(axis=1) // E
        rmax = (lo2.max(axis=1) + E - 1) // E + 1
        nb = int((rmax - rmin).max()) if A else 2
        nb = 1 << (max(nb, 2) - 1).bit_length()
        rows.append(rmin.astype(np.int32))
        NBs.append(nb)
    return B, tuple(rows), tuple(NBs)


# stacked-field order for the scan windows (idx rides separately as
# int32 — flat indices above 2^24 are not exact in f32)
_F13 = ("a0w", "a0n", "a2w", "a2n", "a1e", "g1", "s01", "s21", "mn",
        "mx", "ts", "tw", "key")


def _screen_run(packed, tperm, a1_t, d_t, rows, offs, A, C, Es, NBs, B,
                w, vp_row, vp_col, ew, ns, vp_flat, taus=_TAUS_F32):
    """Carve the packed upload, expand every candidate table, and
    evaluate every bucket — returning per-target (visible, ambiguous)
    classification bits.

    Deliberately split into THREE jits (carve / per-table expansion /
    the scan) instead of one: the remote-compile service prices a
    program superlinearly in its op count (CLAUDE.md: a fused 9-round
    JFA body took 166 s vs ~10 s single-round), and the fused form of
    this function measured 115 s cold at 512^2.  The per-table
    expansion jit is keyed only on the table's padded length (a small
    quantized menu, shared across sizes/viewpoints through the
    persistent cache); the scan jit body is ~25 ops per tier."""
    tabs = _carve(packed, offs)
    stacks = tuple(_expand_stack(t, w, vp_row, vp_col, ew, ns,
                                 E if i else None, taus)
                   for i, (t, E) in enumerate(zip(tabs, (0,) + Es)))
    if _use_pallas_screen(taus, a1_t, B, C, stacks[0][1].shape[0]):
        return _screen_pallas_run(
            stacks[0], stacks[1:], tperm, a1_t, d_t, rows, A, C, Es,
            NBs, B, w, vp_row, vp_col, ew, ns, vp_flat,
            interpret=_PALLAS_SCREEN_INTERPRET)
    return _screen_scan(stacks[0], stacks[1:], tperm, a1_t, d_t, rows,
                        A, C, Es, NBs, B, w, vp_row, vp_col, ew, ns,
                        vp_flat, taus)


# test hook: True routes the Pallas screen through interpret mode on
# any backend (tests/test_viewshed.py pins bit-parity vs _screen_scan)
_PALLAS_SCREEN_INTERPRET = False


def _use_pallas_screen(taus, a1_t, B, C, Lg):
    """Pallas pair-kernel eligibility: OPT-IN via
    XRSPATIAL_SCREEN_PALLAS=1 (or the interpret test hook).  On-chip
    A/Bs (BENCH_NOTES round 5) measured the Pallas kernel warm-equal to
    the XLA scan screen (256^2 0.26 s, 512^2 0.8 s, 1024^2 ~10 s end to
    end either way) while its cold compile costs 145-375 s through the
    remote-compile service vs the scan's 2-4 s — so the scan stays the
    default and the kernel is kept as a validated alternative.  f32
    level-1 screen only (f64 is the rare large-ambiguity re-screen),
    lane-aligned target and glob blocks."""
    import os
    if taus != _TAUS_F32 or a1_t is None:
        return False
    if os.environ.get("XRSPATIAL_NO_PALLAS") == "1":
        return False
    if (B * C) % 128 or Lg % 128:
        return False
    if _PALLAS_SCREEN_INTERPRET:
        return True
    return (os.environ.get("XRSPATIAL_SCREEN_PALLAS") == "1"
            and jax.default_backend() == "tpu")


@partial(jax.jit, static_argnames=("A", "C", "Es", "NBs", "B", "w",
                                   "interpret"))
def _screen_pallas_run(glob, stacks, tperm, a1_t, d_t, rows, A, C, Es,
                       NBs, B, w, vp_row, vp_col, ew, ns, vp_flat,
                       interpret=False):
    """Target prep + Pallas pair kernel + classification — the Pallas
    twin of `_screen_scan` (identical plan, identical predicate
    function object, identical classification; kernels/pallas_screen.py
    documents why the scan's XLA execution had to be replaced)."""
    from .pallas_screen import screen_hilo_pallas
    dt = d_t.dtype
    tau_k = jnp.asarray(_TAUS_F32[5], dt)
    tau_gr = jnp.asarray(_TAUS_F32[3], dt)
    tg_abs = jnp.asarray(_TAUS_F32[4], dt)
    row = tperm // w
    col = tperm - row * w
    dy = (row - vp_row).astype(dt)
    dx = (col - vp_col).astype(dt)
    key_t = (dx * ew) ** 2 + (dy * ns) ** 2
    one = jnp.asarray(1.0, dt)
    gt = jnp.arctan(d_t / jnp.sqrt(jnp.where(key_t == 0, one, key_t)))
    kt_hi = key_t * (one + tau_k)
    kt_lo = key_t * (one - tau_k)
    hi, lo = screen_hilo_pallas(glob, stacks, a1_t, kt_lo, kt_hi,
                                tperm, rows, A, C, Es, NBs, B,
                                interpret=interpret)
    tcls = tg_abs + tau_gr * jnp.abs(gt)
    vis = hi <= gt - tcls
    blk = lo > gt + tcls
    amb = ~(vis | blk) | (tperm == vp_flat)
    return vis, amb


@partial(jax.jit, static_argnames=("w", "E", "taus"))
def _expand_stack(tab, w, vp_row, vp_col, ew, ns, E=None,
                  taus=_TAUS_F32):
    """Expand one candidate table and stack the 13 predicate fields —
    its own jit so the trig-heavy expansion graph compiles once per
    padded table length, not once per full screen-shape signature.

    ``E=None`` (the global table) returns ((13, L), (L,) idx).  With a
    tier block length E the fields come back BLOCK-LEADING as
    ((L/E, 13, E), (L/E, E) idx): the scan reads group windows with a
    `dynamic_slice` on the LEADING block axis — one contiguous DMA.  A
    traced-start slice on the minor-most axis lowers to a gather-class
    op, which executed pathologically (214 s WARM at 512^2, measured
    on-chip round 5 — same class as CLAUDE.md's per-element-gather
    cliff)."""
    ex = _expand_table(tab, w, vp_row, vp_col, ew, ns, taus)
    if E is None:
        return jnp.stack([ex[f] for f in _F13]), ex["idx"]
    nblk = ex["idx"].shape[0] // E
    stk = jnp.stack([ex[f].reshape(nblk, E) for f in _F13], axis=1)
    return stk, ex["idx"].reshape(nblk, E)


@partial(jax.jit, static_argnames=("A", "C", "Es", "NBs", "B", "w",
                                   "taus"))
def _screen_scan(glob, stacks, tperm, a1_t, d_t, rows, A, C, Es, NBs,
                 B, w, vp_row, vp_col, ew, ns, vp_flat,
                 taus=_TAUS_F32):
    """The screen evaluation: a lax.scan over the G = A/B bucket
    groups — each step evaluates its B*C targets against the small
    global table plus one CONTIGUOUS dynamic-sliced window per tier
    (see _group_plan for why the round-4 take-gathered batched form
    was abandoned)."""
    dt = d_t.dtype
    tau_k = jnp.asarray(taus[5], dt)
    tau_gr = jnp.asarray(taus[3], dt)
    tg_abs = jnp.asarray(taus[4], dt)

    row = tperm // w
    col = tperm - row * w
    dy = (row - vp_row).astype(dt)
    dx = (col - vp_col).astype(dt)
    if a1_t is None:
        # level-2 (f64): target angles computed on device from exact
        # integer coordinates — the f32 host plane is far outside the
        # 1e-12 cover band
        a1_t = _calculate_angle(dx, dy, 0.0, 0.0, xp=jnp)
    key_t = (dx * ew) ** 2 + (dy * ns) ** 2
    one = jnp.asarray(1.0, dt)
    gt = jnp.arctan(d_t / jnp.sqrt(jnp.where(key_t == 0, one, key_t)))
    kt_hi = key_t * (one + tau_k)
    kt_lo = key_t * (one - tau_k)

    G = A // B
    T = B * C
    gstk, gidx = glob
    glob_c = {f: gstk[i][None] for i, f in enumerate(_F13)}
    glob_c["idx"] = gidx[None]
    xs = dict(al=a1_t.reshape(G, T), klo=kt_lo.reshape(G, T),
              khi=kt_hi.reshape(G, T), it=tperm.reshape(G, T),
              r=(jnp.stack(rows, axis=1) if rows
                 else jnp.zeros((G, 0), jnp.int32)))

    zero = jnp.int32(0)

    def body(_, x):
        al = x["al"][:, None]
        klo = x["klo"][:, None]
        khi = x["khi"][:, None]
        it = x["it"][:, None]
        hi, lo = _screen_pairs(al, klo, khi, it, glob_c)
        al3 = al[:, :, None]
        klo3 = klo[:, :, None]
        khi3 = khi[:, :, None]
        it3 = it[:, :, None]
        for t, ((stk, idx), E, NB) in enumerate(zip(stacks, Es, NBs)):
            nblk = idx.shape[0]
            nb = min(NB, nblk)
            r = jnp.minimum(x["r"][t], nblk - nb)
            wnd = jax.lax.dynamic_slice(stk, (r, zero, zero),
                                        (nb, len(_F13), E))
            c = {f: wnd[:, i][None] for i, f in enumerate(_F13)}
            c["idx"] = jax.lax.dynamic_slice(idx, (r, zero),
                                             (nb, E))[None]
            h2, l2 = _screen_pairs(al3, klo3, khi3, it3, c)
            hi = jnp.maximum(hi, h2)
            lo = jnp.maximum(lo, l2)
        return None, (hi, lo)

    _, (hi, lo) = jax.lax.scan(body, None, xs)
    hi = hi.reshape(A * C)
    lo = lo.reshape(A * C)

    tcls = tg_abs + tau_gr * jnp.abs(gt)
    vis = hi <= gt - tcls
    blk = lo > gt + tcls
    # NaN targets fail both comparisons -> ambiguous; the viewpoint
    # target's device gt is wrong (dist == 0 guard), force re-eval
    amb = ~(vis | blk) | (tperm == vp_flat)
    return vis, amb


def _screened_visibility(data_np, vp_row, vp_col, observer_elev,
                         target_elev, ew_res, ns_res, chunk, mark):
    """Interval-screened exact visibility: the device-expanded float32
    pass computes per target a SOUND [blocked_lo, blocked_hi] interval
    for the max blocker gradient; targets whose interval straddles
    their own gradient band (plus every NaN, plus the viewpoint) are
    re-evaluated with the full float64 predicate over a subset bucket
    plan built from cell_attrs_subset gathers — full f64 planes are
    never computed unless the safety valve trips.  Bit-identical to
    the f64-only path by construction: the f32 pass only CLASSIFIES,
    with tolerances that dominate every rounding error (see the error
    budget above; validated bitwise across sizes/seeds in tests and
    against the pairwise oracle on chip)."""
    from ..utils import x64
    h, w = data_np.shape
    n = h * w
    sc = _screen_cache(data_np, vp_row, vp_col, observer_elev,
                       target_elev, ew_res, ns_res)
    mark("cache")
    plan_cache = (sc["glob"][0],
                  [(ext, keys, W) for ext, keys, _, W in sc["tiers"]])
    at32 = {"a1": sc["a1"]}
    tperm, glob_idx, tiers, A, C = _bucket_plan(at32, vp_row, vp_col,
                                                chunk, cache=plan_cache,
                                                dense_order=sc["order"])
    mark("plan")
    tier_shifts = [sh for _, _, sh, _ in sc["tiers"]]
    packed, offs, metas = _screen_build_tables(sc, glob_idx,
                                               sc["glob"][1], tiers,
                                               tier_shifts)
    Es = tuple(E for _, E in metas)
    B, rows_np, NBs = _group_plan(metas, A, C)
    rows = tuple(jnp.asarray(r) for r in rows_np)
    mark("tables")
    vis_d, amb_d = _screen_run(
        packed, jnp.asarray(tperm.astype(np.int32)),
        jnp.asarray(sc["a1"][tperm]), jnp.asarray(sc["d_t"][tperm]),
        rows, offs, A, C, Es, NBs, B, w,
        jnp.int32(vp_row), jnp.int32(vp_col),
        jnp.float32(ew_res), jnp.float32(ns_res),
        jnp.int32(vp_row * w + vp_col))
    vis = np.asarray(vis_d).ravel()
    amb = np.asarray(amb_d).ravel()
    mark("screen+fetch")

    visible = np.empty(n, dtype=bool)
    visible[tperm] = vis

    amb_idx = np.unique(tperm[amb])
    if amb_idx.size:
        if amb_idx.size > max(0.05 * n, 4096):
            # safety valve: screening failed to separate (flat/ramp
            # degeneracies) — run full f64 over the same (extended)
            # candidate tables; duplicates evaluate identically
            at = cell_attrs_host(data_np, vp_row, vp_col, observer_elev,
                                 target_elev, ew_res, ns_res)
            with x64():
                vis_np = _run_buckets_f64(at, tperm, glob_idx, tiers,
                                          A, C)
            visible[tperm] = vis_np
            mark("reeval/full-valve")
            return visible
        if amb_idx.size <= _L2_MIN_AMB:
            # small ambiguous sets MAY skip the device-f64 re-screen
            # and go straight to the gathered f64 oracle — but only
            # when the oracle's data volume is small: the gathered path
            # host-builds and tunnel-uploads A*sum(E) elements times
            # ~12 f64 fields, which on chip costs ~30 MB/s end to end.
            # At 1024^2 (amb=1318 but A*sumE=2.4M elements ~ 235 MB)
            # the oracle measured 10-12 s warm while the L2 re-screen
            # (device-resident f64 tables) finished in 3.9 s, bitwise
            # equal — so the route is by volume, not by target count
            # (on-chip A/B, BENCH_NOTES round 5).
            L = 1 << (max(int(amb_idx.size), 128) - 1).bit_length()
            sub = np.pad(amb_idx, (0, L - amb_idx.size), mode="edge")
            tperm_a, glob_a, tiers_a, A_a, C_a = _bucket_plan(
                at32, vp_row, vp_col, min(chunk, 128), targets=sub,
                cache=plan_cache)
            gath_elems = sum(A_a * E for _, _, E in tiers_a)
            if gath_elems <= _DIRECT_MAX_ELEMS:
                mark(f"reeval/plan-direct amb={amb_idx.size} A={A_a} "
                     f"sumE={sum(E for _, _, E in tiers_a)}")
                with x64():
                    attrs_of = cell_attrs_subset_fn(
                        data_np, vp_row, vp_col, observer_elev,
                        target_elev, ew_res, ns_res)
                    vis_a = _run_buckets_f64_gathered(
                        attrs_of, tperm_a, glob_a, tiers_a, A_a, C_a,
                        mark=mark)
                visible[tperm_a] = vis_a
                mark("reeval")
                return visible
            mark(f"reeval/plan-direct-skip amb={amb_idx.size} "
                 f"gath_elems={gath_elems}")
        # level 2: re-screen the ambiguous subset in DEVICE float64
        # (exact f64 diffs, 1e-12-scale bands) — classifies everything
        # except true f64-epsilon ties, so the expensive host-f64
        # oracle only ever sees a handful of targets.  The subset is
        # processed in ANGLE-ORDERED SLABS of <= _L2_SLAB targets:
        # the unslabbed 4096^2 plan (A=2048 buckets) crashed the TPU
        # worker (the grouped-scan window volume scales with A*sumE —
        # the ADVICE r4 NB-outlier hazard), while slabs bound every
        # per-step read, tighten windows (each slab spans a narrow
        # angle range), and share ONE f64 table build + ONE compile
        # family via a common window width across slabs (wider windows
        # are sound supersets — the clamp-epilogue argument).
        order_amb = np.argsort(sc["a1"][amb_idx], kind="stable")
        amb_sorted = amb_idx[order_amb]
        nslab = -(-amb_sorted.size // _L2_SLAB)
        plans = []
        for si in range(nslab):
            sl = amb_sorted[si * _L2_SLAB:(si + 1) * _L2_SLAB]
            Ls = 1 << (max(int(sl.size), 128) - 1).bit_length()
            subs = np.pad(sl, (0, Ls - sl.size), mode="edge")
            plans.append(_bucket_plan(
                at32, vp_row, vp_col, min(chunk, 128), targets=subs,
                cache=plan_cache, unify_E=True))
        E_all = max(E for _, _, tiers_p, _, _ in plans
                    for _, _, E in tiers_p)
        mark(f"reeval/plan amb={amb_idx.size} slabs={nslab} "
             f"E={E_all} A={[p[3] for p in plans]}")
        del packed  # free the level-1 f32 tables before the f64 build
        amb2_parts = []
        with x64():
            packed2 = None
            for tperm_a, glob_i, tiers_p, A_a, C_a in plans:
                tiers_u = [(tidx, los, E_all)
                           for tidx, los, _ in tiers_p]
                if packed2 is None:
                    packed2, offs2, metas2 = _screen_build_tables(
                        sc, glob_i, sc["glob"][1], tiers_u,
                        tier_shifts, f64=True)
                    Ls_tab = [(offs2[i + 1] - offs2[i])
                              for i in range(1, len(offs2) - 1)]
                else:
                    # tables are slab-independent — only the per-slab
                    # window starts (metas) change
                    metas2 = [
                        (np.minimum(np.maximum(los, 0),
                                    Lt - E_all).astype(np.int32),
                         E_all)
                        for (_, los, _), Lt in zip(tiers_u, Ls_tab)]
                B2, rows2_np, NB2 = _group_plan(metas2, A_a, C_a)
                vis2_d, amb2_d = _screen_run(
                    packed2, jnp.asarray(tperm_a.astype(np.int32)),
                    None, jnp.asarray(sc["d_t64"][tperm_a]),
                    tuple(jnp.asarray(r) for r in rows2_np), offs2,
                    A_a, C_a, tuple(E for _, E in metas2), NB2, B2, w,
                    jnp.int32(vp_row), jnp.int32(vp_col),
                    jnp.float64(ew_res), jnp.float64(ns_res),
                    jnp.int32(vp_row * w + vp_col), taus=_TAUS_F64)
                vis2 = np.asarray(vis2_d).ravel()
                amb2 = np.asarray(amb2_d).ravel()
                visible[tperm_a] = vis2
                amb2_parts.append(tperm_a[amb2])
        mark("reeval/screen2")

        amb2_idx = np.unique(np.concatenate(amb2_parts))
        if amb2_idx.size:
            L2 = 1 << (max(int(amb2_idx.size), 128) - 1).bit_length()
            sub2 = np.pad(amb2_idx, (0, L2 - amb2_idx.size),
                          mode="edge")
            tperm_b, glob_b, tiers_b, A_b, C_b = _bucket_plan(
                at32, vp_row, vp_col, min(chunk, 128), targets=sub2,
                cache=plan_cache)
            mark(f"reeval/plan2 amb2={amb2_idx.size} A={A_b} "
                 f"sumE={sum(E for _, _, E in tiers_b)}")
            # route by data volume: the gathered path moves A*sum(E)
            # elements (subset-attrs gather + upload), the table path
            # the full padded tiers (~n) and needs the full f64
            # planes.  Both evaluate identical candidate supersets
            # with the identical f64 predicate => bit-identical.
            gath_elems = sum(A_b * E for _, _, E in tiers_b)
            tab_elems = sum(max(E, _round_up(tidx.size, 16384))
                            for tidx, _, E in tiers_b)
            with x64():
                if gath_elems < tab_elems:
                    attrs_of = cell_attrs_subset_fn(
                        data_np, vp_row, vp_col, observer_elev,
                        target_elev, ew_res, ns_res)
                    vis_b = _run_buckets_f64_gathered(
                        attrs_of, tperm_b, glob_b, tiers_b, A_b, C_b,
                        mark=mark)
                else:
                    at = cell_attrs_host(data_np, vp_row, vp_col,
                                         observer_elev, target_elev,
                                         ew_res, ns_res)
                    vis_b = _run_buckets_f64(at, tperm_b, glob_b,
                                             tiers_b, A_b, C_b)
            visible[tperm_b] = vis_b
    mark("reeval")
    return visible


@partial(jax.jit, static_argnames=("A", "C", "Es"))
def _eval_buckets_impl(tgt, glob, tabs, tier_los, A, C, Es):
    """f64 bucket evaluation: lax.scan over buckets; each tier window
    is read as two E-aligned blocks from a BLOCK-LEADING (L/E, E)
    table layout — a leading-axis `dynamic_slice` (contiguous DMA).
    The aligned block pair [j*E, (j+2)*E) always covers the planned
    element window [lo, lo+E); candidates outside the planned window
    cannot cover any bucket target (the plan guarantee is that all
    covering candidates lie inside it), so they fail the predicate's
    cover test and contribute -inf — bit-identical.  A traced-start
    slice on the minor-most axis lowers to a gather-class op (the
    round-5 on-chip screen measurement: 214 s warm at 512^2)."""
    zero = jnp.int32(0)
    tabs2 = tuple(
        {f: v.reshape(v.shape[0] // E, E) for f, v in tab.items()}
        for tab, E in zip(tabs, Es))
    xs = {f: tgt[f].reshape(A, C) for f in ("a1", "key", "idx",
                                            "grad_t")}
    xs["j"] = (jnp.stack(
        [jnp.clip(los // Es[t], 0, tabs2[t]["idx"].shape[0]
                  - min(2, tabs2[t]["idx"].shape[0]))
         for t, los in enumerate(tier_los)], axis=1).astype(jnp.int32)
        if tier_los else jnp.zeros((A, 0), jnp.int32))

    def body(_, x):
        al = x["a1"][:, None]
        kt = x["key"][:, None]
        it = x["idx"][:, None]
        gts = x["grad_t"]

        def run(c):
            return _interp_blocked_max(
                al, kt, it, c["key"][None], c["a0"][None], c["a1"][None],
                c["a2"][None], c["g0"][None], c["g1"][None], c["g2"][None],
                c["valid_b"][None], c["idx"][None])

        maxes = [run(glob)]
        for t, (tab, E) in enumerate(zip(tabs2, Es)):
            nblk = tab["idx"].shape[0]
            nb = min(2, nblk)
            c = {f: jax.lax.dynamic_slice(
                     v, (x["j"][t], zero), (nb, E)).reshape(nb * E)
                 for f, v in tab.items()}
            maxes.append(run(c))
        blocked = reduce(jnp.maximum, maxes)
        return None, blocked <= gts

    _, vis = jax.lax.scan(body, None, xs)
    return vis


def _eval_buckets_run(tgt, glob, tier_tabs, tier_los, A, C):
    tabs = tuple(tab for tab, _ in tier_tabs)
    Es = tuple(E for _, E in tier_tabs)
    return _eval_buckets_impl(tgt, glob, tabs, tuple(tier_los), A, C, Es)
