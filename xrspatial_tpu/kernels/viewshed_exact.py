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

from .viewshed import (INVISIBLE, PI, _interp_blocked_max,  # noqa: F401
                       _visibility_epilogue, cell_attrs_host)

__all__ = ["viewshed_grid_exact"]

_PLANES = ("key", "a0", "a1", "a2", "g0", "g1", "g2")

# index-distance tier boundaries; the first is also the near-set radius
_TIER_BOUNDS = (8, 32, 128, 512, 2048, 8192)

# safety margin added to the analytic halfspan bound (float rounding of
# host-computed angles; the bound itself is exact real-arithmetic)
_W_EPS = 1e-9


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


def _blocker_table(at, idx):
    """Host-side f64 attribute table for the candidate cells `idx`
    (uploaded packed by `_build_tables`)."""
    tab = {f: at[f][idx] for f in _PLANES}
    tab["valid_b"] = at["valid_b"][idx]
    tab["idx"] = idx.astype(np.int64)
    return tab


def _blocker_table_screen(at, idx):
    """float32 candidate table for the interval-screen pass.

    Branch decisions that the f64 path derives from comparisons
    (crossing, angle unwrap) are precomputed HERE in float64 and shipped
    as data, so the screen's only approximations are value casts and
    f32 arithmetic — both covered by the interval tolerances."""
    two_pi = 2.0 * np.pi
    a0 = at["a0"][idx]
    a1 = at["a1"][idx]
    a2 = at["a2"][idx]
    crossing = a0 > a2
    tab = {
        "key": at["key"][idx].astype(np.float32),
        "a0": a0.astype(np.float32),
        "a2": a2.astype(np.float32),
        "a1e": np.where(crossing & (a1 < a0), a1 + two_pi,
                        a1).astype(np.float32),
        "a2e": np.where(crossing & (a2 < a0), a2 + two_pi,
                        a2).astype(np.float32),
        "g0": at["g0"][idx].astype(np.float32),
        "g1": at["g1"][idx].astype(np.float32),
        "g2": at["g2"][idx].astype(np.float32),
        "crossing": crossing,
        "valid_b": at["valid_b"][idx],
        "idx": idx.astype(np.int32),
    }
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


def _bucket_plan(at, vp_row, vp_col, C, targets=None, cache=None):
    """Host-side plan: target permutation, tier tables, slice offsets.

    ``targets`` restricts the TARGET side to a subset of cell indices
    (used for the f64 re-evaluation of screen-ambiguous targets); the
    candidate tiers always cover every cell.  ``cache`` (from
    `_tier_cache`) skips recomputing the target-independent tier sorts."""
    a1 = at["a1"]
    if cache is None:
        cache = _tier_cache(at, vp_row, vp_col)
    glob_idx, tier_list = cache

    if targets is None:
        targets = np.arange(a1.size, dtype=np.int64)
    n_t = targets.size
    C = min(C, n_t)
    A = -(-n_t // C)
    perm = np.argsort(a1[targets], kind="stable")
    a1s = a1[targets][perm]

    lo_t = np.minimum(np.arange(A, dtype=np.int64) * C, n_t - C)
    tperm = targets[perm[(lo_t[:, None] + np.arange(C)[None, :]).ravel()]]
    starts = a1s[lo_t]
    ends = a1s[lo_t + C - 1]

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
    at = cell_attrs_host(data_np, vp_row, vp_col, observer_elev,
                         target_elev, ew_res, ns_res)
    mark("attrs")
    h, w = at["shape"]
    n = h * w

    screen = os.environ.get("XRSPATIAL_VS_NO_SCREEN") != "1"
    if screen:
        visible = _screened_visibility(at, vp_row, vp_col, chunk)
    else:
        tperm, glob_idx, tiers, A, C = _bucket_plan(at, vp_row, vp_col,
                                                    chunk)
        with x64():
            vis_np = _run_buckets_f64(at, tperm, glob_idx, tiers, A, C)
        visible = np.empty(n, dtype=bool)
        # clamped-overlap duplicates write equal values
        visible[tperm] = vis_np

    with x64():
        visible_dev = jnp.asarray(visible.reshape(h, w))
        return _visibility_epilogue(jnp.asarray(data_np), visible_dev,
                                    jnp.float64(at["vp_elev"]),
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


def _run_buckets_f64_gathered(at, tperm, glob_idx, tiers, A, C,
                              mark=lambda label: None):
    """Float64 bucket evaluation for a SMALL target subset: instead of
    uploading full per-tier f64 tables (O(N) device bytes — the old
    re-eval cost more than the whole screen), gather on the host ONLY
    the (A, E) candidate slices each bucket actually reads, flatten them
    to (A*E,) concatenated blocks, and hand the unchanged scan kernel
    stride-E offsets.  Identical candidate supersets + identical
    predicate => bit-identical visibility."""
    # build EVERY table host-side first, then upload each field ONCE as
    # a concatenation of [glob, tier1, tier2, ...] and carve it back up
    # with static device slices: ~90 per-field uploads at ~10 ms tunnel
    # roundtrip each were most of this path's cost
    host_tabs = []

    def _host_tab(flat, valid, idx):
        tab = {f: at[f][flat] for f in _PLANES}
        tab["valid_b"] = valid
        tab["idx"] = idx
        return tab

    gpad = _round_up(glob_idx.size, 1024)
    gext = np.pad(glob_idx, (0, gpad - glob_idx.size))
    host_tabs.append(_host_tab(
        gext, np.pad(at["valid_b"][glob_idx],
                     (0, gpad - glob_idx.size)),
        np.pad(glob_idx.astype(np.int64), (0, gpad - glob_idx.size),
               constant_values=-1)))
    Es = []
    for tidx, los, E in tiers:
        # same clamp semantics as _build_tables: slices stay in-bounds
        # of the padded table; pad rows are invalid (filtered by the
        # predicate), clamp-overlap extras fail the cover test
        los = np.minimum(np.maximum(los, 0), max(tidx.size - E, 0))
        pos = los[:, None] + np.arange(E)[None, :]
        flat = tidx[np.minimum(pos, tidx.size - 1)].ravel()
        inb = (pos < tidx.size).ravel()
        host_tabs.append(_host_tab(
            flat, at["valid_b"][flat] & inb,
            np.where(inb, flat, -1).astype(np.int64)))
        Es.append(E)
    mark("reeval/host-gather")

    lens = [t["idx"].size for t in host_tabs]
    offs = tuple(int(o) for o in np.cumsum([0] + lens))
    packed = {f: jnp.asarray(np.concatenate([t[f] for t in host_tabs]))
              for f in host_tabs[0]}
    dev_tabs = _carve(packed, offs)
    mark("reeval/upload+carve")

    tgt = {
        "a1": jnp.asarray(at["a1"][tperm]),
        "key": jnp.asarray(at["key"][tperm]),
        "grad_t": jnp.asarray(at["grad_t"][tperm]),
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


def _screened_visibility(at, vp_row, vp_col, chunk):
    """Interval-screened exact visibility: a float32 pass computes per
    target a SOUND [blocked_lo, blocked_hi] interval for the max
    blocker gradient; targets whose interval straddles their own
    gradient band (plus every NaN) are re-evaluated with the full
    float64 predicate over a subset bucket plan.  Bit-identical to the
    f64-only path by construction — the f32 pass only ever CLASSIFIES,
    with tolerances that dominate every cast and rounding error
    (validated bitwise across sizes/seeds in tests and on chip;
    ambiguity measured ~0.1-1% of targets on fBm terrains).
    Measured margins: no sampled target on seeded terrains was decided
    by less than 1e-4 while the f32 evaluation deviates < 1e-6
    (tools/exp notes in BENCH_NOTES round 3)."""
    from ..utils import x64
    mark = _phase_timer()
    n = at["a1"].size
    cache = _tier_cache(at, vp_row, vp_col)
    tperm, glob_idx, tiers, A, C = _bucket_plan(at, vp_row, vp_col, chunk,
                                                cache=cache)
    mark("plan")
    tgt32 = {
        "a1": jnp.asarray(at["a1"][tperm].astype(np.float32)),
        "key": jnp.asarray(at["key"][tperm].astype(np.float32)),
        "idx": jnp.asarray(tperm.astype(np.int32)),
    }
    glob, tier_tabs, tier_los = _build_tables(at, glob_idx, tiers,
                                              _blocker_table_screen)
    mark("tables")
    hi, lo = _eval_buckets_screen_run(tgt32, glob, tier_tabs, tier_los,
                                      A, C)
    hi = np.asarray(hi).ravel().astype(np.float64)
    lo = np.asarray(lo).ravel().astype(np.float64)
    mark("screen+fetch")

    gt32 = at["grad_t"][tperm].astype(np.float32).astype(np.float64)
    tau_g = 1e-6
    sure_vis = hi <= gt32 - tau_g
    sure_blk = lo > gt32 + tau_g
    amb = ~(sure_vis | sure_blk)  # NaN comparisons land here

    visible = np.empty(n, dtype=bool)
    visible[tperm] = sure_vis

    amb_idx = np.unique(tperm[amb])
    if amb_idx.size:
        if amb_idx.size > max(0.05 * n, 4096):
            # safety valve: screening failed to separate — run full f64
            with x64():
                vis_np = _run_buckets_f64(at, tperm, glob_idx, tiers,
                                          A, C)
            visible[tperm] = vis_np
            return visible
        # pad the subset to a power-of-two length quantum (stable
        # compile shapes); edge-repeat duplicates write equal values
        L = 1 << (max(int(amb_idx.size), 128) - 1).bit_length()
        sub = np.pad(amb_idx, (0, L - amb_idx.size), mode="edge")
        tperm_a, glob_i, tiers_a, A_a, C_a = _bucket_plan(
            at, vp_row, vp_col, min(chunk, 128), targets=sub,
            cache=cache)
        mark("reeval/plan")
        # route by data volume: the gathered path moves A*sum(E)
        # elements (host fancy-gather + upload), the table path the
        # full padded tiers (~n).  Few ambiguous targets -> gathered
        # wins (38 targets at 1024^2: 2.5 s -> 0.9 s); many -> the
        # A*E slices dwarf the tables (2048^2: gathered-everywhere
        # measured 38 s of re-eval vs ~7 s for tables).  Both paths
        # evaluate identical candidate supersets with the identical
        # f64 predicate => bit-identical either way.
        gath_elems = sum(A_a * E for _, _, E in tiers_a)
        tab_elems = sum(max(E, _round_up(tidx.size, 16384))
                        for tidx, _, E in tiers_a)
        with x64():
            if gath_elems < tab_elems:
                vis_a = _run_buckets_f64_gathered(at, tperm_a, glob_i,
                                                  tiers_a, A_a, C_a,
                                                  mark=mark)
            else:
                vis_a = _run_buckets_f64(at, tperm_a, glob_i, tiers_a,
                                         A_a, C_a)
        visible[tperm_a] = vis_a
    mark("reeval")
    return visible


# float32 interval tolerances (see _interp_blocked_screen): generous
# multiples of worst-case cast+rounding bounds for values in the
# predicate's ranges (angles <= 4*pi unwrapped, gradients in
# [-pi/2, pi/2], keys compared relatively)
_TAU_A = np.float32(4e-6)    # absolute angle error bound
_TAU_C = np.float32(1e-5)    # cover-comparison band (> 2*_TAU_A)
_TAU_G = np.float32(1e-6)    # gradient value band
_TAU_K = np.float32(2e-6)    # relative key band
_D_RISKY = np.float32(6.4e-5)  # 16*_TAU_A: segment too thin to divide


def _interp_blocked_screen(al, key_t, idx_t, c):
    """(blocked_hi, blocked_lo) per target over one candidate block —
    sound float32 bounds on the f64 `_interp_blocked_max` result.

    Soundness: maybe-active (widened cover/closer bands) is a superset
    of truly-active, sure-active (narrowed bands) a subset; for every
    truly-active pair the true interpolated gradient lies in
    [min(g0,g1,g2)-tau_g, max(g0,g1,g2)+tau_g] (in-range piecewise
    interpolation of cast values), so the clamped per-pair bounds hold
    even where the f32 ratio is untrustworthy; where both segment
    widths are comfortably > the angle-error bound the tighter
    gi +- tol bound applies, with tol covering the division's error
    amplification (8*tau_a / segment width, capped).  Branch decisions
    the f64 path takes on comparisons are either precomputed in f64
    (crossing, candidate unwrap — shipped as data) or proven stable for
    sure-active pairs (the narrowed cover band keeps |al - a0| > tau_c
    - tau_a, so the target-unwrap comparison cannot flip)."""
    crossing = c["crossing"][None]
    a0 = c["a0"][None]
    a2 = c["a2"][None]
    a1e = c["a1e"][None]
    a2e = c["a2e"][None]
    g0 = c["g0"][None]
    g1 = c["g1"][None]
    g2 = c["g2"][None]
    base = (c["idx"][None] != idx_t) & c["valid_b"][None]

    cov_w = jnp.where(crossing,
                      (al > a0 - _TAU_C) | (al < a2 + _TAU_C),
                      (al > a0 - _TAU_C) & (al < a2 + _TAU_C))
    cov_n = jnp.where(crossing,
                      (al > a0 + _TAU_C) | (al < a2 - _TAU_C),
                      (al > a0 + _TAU_C) & (al < a2 - _TAU_C))
    key_b = c["key"][None]
    maybe = cov_w & (key_b < key_t * (1.0 + _TAU_K)) & base
    sure = cov_n & (key_b < key_t * (1.0 - _TAU_K)) & base

    two_pi = jnp.float32(2.0 * PI)
    ale = jnp.where(crossing & (al < a0), al + two_pi, al)
    seg1 = ale < a1e
    seg2 = ale > a1e
    d10 = jnp.abs(a1e - a0)
    d21 = jnp.abs(a2e - a1e)
    d10s = jnp.where(d10 > 0, d10, jnp.float32(1.0))
    d21s = jnp.where(d21 > 0, d21, jnp.float32(1.0))
    gi = jnp.where(
        seg1, g1 + (g0 - g1) * (a1e - ale) / d10s,
        jnp.where(seg2, g1 + (g2 - g1) * (ale - a1e) / d21s, g1))

    min3 = jnp.minimum(g0, jnp.minimum(g1, g2))
    max3 = jnp.maximum(g0, jnp.maximum(g1, g2))
    span = max3 - min3
    dmin = jnp.minimum(d10s, d21s)
    rt = jnp.minimum(jnp.float32(1.0),
                     (8.0 * _TAU_A) / jnp.maximum(dmin, jnp.float32(1e-9)))
    tol = _TAU_G + span * rt
    risky = (d10 < _D_RISKY) | (d21 < _D_RISKY)
    hi_p = jnp.where(risky, max3 + _TAU_G,
                     jnp.minimum(gi + tol, max3 + _TAU_G))
    lo_p = jnp.where(risky, min3 - _TAU_G,
                     jnp.maximum(gi - tol, min3 - _TAU_G))
    ninf = jnp.float32(-jnp.inf)
    hi = jnp.max(jnp.where(maybe, hi_p, ninf), axis=1)
    lo = jnp.max(jnp.where(sure, lo_p, ninf), axis=1)
    return hi, lo


@partial(jax.jit, static_argnames=("A", "C", "Es"))
def _eval_buckets_screen_impl(tgt, glob, tabs, tier_los, A, C, Es):
    def body(_, k):
        def sl(arr):
            return jax.lax.dynamic_slice(arr, (k * C,), (C,))

        al = sl(tgt["a1"])[:, None]
        kt = sl(tgt["key"])[:, None]
        it = sl(tgt["idx"])[:, None]

        his = []
        los_ = []
        h, l = _interp_blocked_screen(al, kt, it, glob)
        his.append(h)
        los_.append(l)
        for tab, los, E in zip(tabs, tier_los, Es):
            lo = los[k]
            c = {f: jax.lax.dynamic_slice(v, (lo,), (E,))
                 for f, v in tab.items()}
            h, l = _interp_blocked_screen(al, kt, it, c)
            his.append(h)
            los_.append(l)
        return None, (reduce(jnp.maximum, his), reduce(jnp.maximum, los_))

    _, (hi, lo) = jax.lax.scan(body, None, jnp.arange(A))
    return hi, lo


def _eval_buckets_screen_run(tgt, glob, tier_tabs, tier_los, A, C):
    tabs = tuple(tab for tab, _ in tier_tabs)
    Es = tuple(E for _, E in tier_tabs)
    return _eval_buckets_screen_impl(tgt, glob, tabs, tuple(tier_los),
                                     A, C, Es)


@partial(jax.jit, static_argnames=("A", "C", "Es"))
def _eval_buckets_impl(tgt, glob, tabs, tier_los, A, C, Es):
    def body(_, k):
        def sl(arr):
            return jax.lax.dynamic_slice(arr, (k * C,), (C,))

        al = sl(tgt["a1"])[:, None]
        kt = sl(tgt["key"])[:, None]
        it = sl(tgt["idx"])[:, None]
        gts = sl(tgt["grad_t"])

        def run(c):
            return _interp_blocked_max(
                al, kt, it, c["key"][None], c["a0"][None], c["a1"][None],
                c["a2"][None], c["g0"][None], c["g1"][None], c["g2"][None],
                c["valid_b"][None], c["idx"][None])

        maxes = [run(glob)]
        for tab, los, E in zip(tabs, tier_los, Es):
            lo = los[k]
            c = {f: jax.lax.dynamic_slice(v, (lo,), (E,))
                 for f, v in tab.items()}
            maxes.append(run(c))
        blocked = reduce(jnp.maximum, maxes)
        return None, blocked <= gts

    _, vis = jax.lax.scan(body, None, jnp.arange(A))
    return vis


def _eval_buckets_run(tgt, glob, tier_tabs, tier_los, A, C):
    tabs = tuple(tab for tab, _ in tier_tabs)
    Es = tuple(E for _, E in tier_tabs)
    return _eval_buckets_impl(tgt, glob, tabs, tuple(tier_los), A, C, Es)
