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

from .viewshed import (INVISIBLE, _interp_blocked_max,  # noqa: F401
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
    """Device-side attribute table for the candidate cells `idx`."""
    tab = {f: jnp.asarray(at[f][idx]) for f in _PLANES}
    tab["valid_b"] = jnp.asarray(at["valid_b"][idx])
    tab["idx"] = jnp.asarray(idx.astype(np.int64))
    return tab


def _bucket_plan(at, vp_row, vp_col, C):
    """Host-side plan: target permutation, tier tables, slice offsets."""
    n = at["a1"].size
    h, w = at["shape"]
    a1 = at["a1"]
    crossing = at["a0"] > at["a2"]
    rows, cols = np.divmod(np.arange(n), w)
    rho = np.hypot(rows - vp_row, cols - vp_col)

    C = min(C, n)
    A = -(-n // C)
    perm = np.argsort(a1, kind="stable")
    a1s = a1[perm]

    lo_t = np.minimum(np.arange(A, dtype=np.int64) * C, n - C)
    tperm = perm[(lo_t[:, None] + np.arange(C)[None, :]).ravel()]
    starts = a1s[lo_t]
    ends = a1s[lo_t + C - 1]

    glob_mask = (rho <= _TIER_BOUNDS[0]) | crossing
    glob_idx = np.nonzero(glob_mask)[0]

    tiers = []
    bounds = [b for b in _TIER_BOUNDS if b < rho.max()] + [np.inf]
    for r_lo, r_hi in zip(bounds[:-1], bounds[1:]):
        mask = (rho > r_lo) & (rho <= r_hi) & ~crossing
        tidx = np.nonzero(mask)[0]
        if tidx.size == 0:
            continue
        W = asin(min(1.0, 0.7071067811865476 / r_lo)) + _W_EPS
        order = np.argsort(a1[tidx], kind="stable")
        tidx = tidx[order]
        ta1 = a1[tidx]
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
    data_np = np.asarray(data, dtype=np.float64)
    at = cell_attrs_host(data_np, vp_row, vp_col, observer_elev,
                         target_elev, ew_res, ns_res)
    h, w = at["shape"]
    n = h * w
    tperm, glob_idx, tiers, A, C = _bucket_plan(at, vp_row, vp_col, chunk)

    with x64():
        tgt = {
            "a1": jnp.asarray(at["a1"][tperm]),
            "key": jnp.asarray(at["key"][tperm]),
            "grad_t": jnp.asarray(at["grad_t"][tperm]),
            "idx": jnp.asarray(tperm.astype(np.int64)),
        }
        # pad the global and tier tables up to coarse length quanta:
        # table lengths are compile-time shapes, so exact sizes would
        # recompile on every viewpoint move; inert pad entries are
        # filtered by the predicate (valid_b False -> -inf)
        def pad_tab(tab, L):
            cur = tab["idx"].shape[0]
            if cur >= L:
                return tab
            pad = L - cur
            return {f: jnp.pad(v, (0, pad),
                               constant_values=(False if f == "valid_b"
                                                else -1 if f == "idx"
                                                else 0.0))
                    for f, v in tab.items()}

        glob = pad_tab(_blocker_table(at, glob_idx),
                       _round_up(glob_idx.size, 1024))
        tier_tabs = []
        tier_los = []
        for tidx, los, E in tiers:
            L = max(E, _round_up(tidx.size, 16384))
            tab = pad_tab(_blocker_table(at, tidx), L)
            # clamp so the fixed-length slice stays in-bounds (extra
            # candidates from clamping are filtered by the cover test)
            los = np.minimum(np.maximum(los, 0), L - E).astype(np.int32)
            tier_tabs.append((tab, E))
            tier_los.append(jnp.asarray(los))

        vis = _eval_buckets_run(tgt, glob, tier_tabs, tier_los, A, C)
        vis_np = np.asarray(vis).ravel()
        visible = np.empty(n, dtype=bool)
        # clamped-overlap duplicates write equal values
        visible[tperm] = vis_np
        visible_dev = jnp.asarray(visible.reshape(h, w))

        return _visibility_epilogue(jnp.asarray(data_np), visible_dev,
                                    jnp.float64(at["vp_elev"]),
                                    jnp.int32(vp_row), jnp.int32(vp_col),
                                    jnp.float64(target_elev),
                                    jnp.float64(ew_res),
                                    jnp.float64(ns_res), (h, w))


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
