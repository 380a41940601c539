"""Zonal statistics, crosstab, apply, regions, trim/crop, canvas sizing.

TPU-native counterpart of reference ``xrspatial/zonal.py`` (2062 LoC):
the sort-and-stride core (zonal.py:105-163) and dask tree-reduction
(:181-277) are replaced by **segment reductions** — zones map to dense
segment ids and ``jax.ops.segment_sum/min/max`` produce every default
statistic in one fused device pass (no sort, no per-zone host loop).
``crosstab`` lowers to a (zone, category) histogram via one segment_sum
over combined ids.  ``regions`` replaces the reference's quadratic two-pass
labeling (:1406-1549) with iterative min-label propagation to fixpoint
under ``lax.while_loop``.  Custom python ``stats_funcs`` callables use a
documented host escape hatch (they cannot be traced).
"""

from __future__ import annotations

from math import sqrt
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .utils import validate_arrays
from .xrlib import DataArray, Dataset

__all__ = ["stats", "crosstab", "apply", "regions", "trim", "crop",
           "suggest_zonal_canvas", "get_full_extent"]

_DEFAULT_STATS_NAMES = ["mean", "max", "min", "sum", "std", "var", "count",
                        "majority"]
# max distinct float categories fetched via device gather (beyond this a
# raster is continuous-valued, and big gathers are pathological on TPU)
_UNIQUE_GATHER_CAP = 65536


# ---------------------------------------------------------------------------
# device segment-reduction core
# ---------------------------------------------------------------------------

def _unique_zones_host(zones_np: np.ndarray) -> np.ndarray:
    if np.issubdtype(zones_np.dtype, np.integer):
        return np.unique(zones_np)  # ints are always finite; skip mask copy
    return np.unique(zones_np[np.isfinite(zones_np)])


def _fits_int32(a: np.ndarray) -> bool:
    """True if every value of an integer host array is exactly
    representable in int32 (device upload canonicalizes to int32 with
    SILENT wraparound when x64 is off)."""
    if a.size == 0 or np.can_cast(a.dtype, np.int32):
        return True
    return (int(a.min()) >= -(2 ** 31)) and (int(a.max()) < 2 ** 31)


@jax.jit
def _segment_ids(zones, unique_zones):
    """Dense segment index per pixel; len(unique) for non-finite zones.

    `method='compare_all'`: binary-search gathers are pathological on TPU
    (12 s at 16.7M pixels); broadcast compares against the small zone
    table run in milliseconds.
    """
    z = zones.ravel()
    method = "compare_all" if unique_zones.shape[0] <= 4096 else "scan"
    idx = jnp.searchsorted(unique_zones, z, method=method)
    idx = jnp.clip(idx, 0, unique_zones.shape[0] - 1)
    hit = jnp.isfinite(z) & (unique_zones[idx] == z)
    return jnp.where(hit, idx, unique_zones.shape[0])


from functools import partial


@partial(jax.jit, static_argnames=("num_segments", "has_nodata"))
def _segment_stats_sorted(values, seg_ids, num_segments, nodata, has_nodata):
    """Per-zone sum/count/sumsq/min/max with NaN+nodata exclusion.

    Sort-based: scatter-adds (jax.ops.segment_sum) are pathological on
    TPU.  One 2-key sort (zone, value) makes zones contiguous AND
    value-ordered, so min/max are the segment endpoints and sums come from
    float64 cumulative sums differenced at segment boundaries (f64 scan of
    f32 data keeps the boundary differences exact to ~1e-16 relative).
    """
    v = values.ravel().astype(jnp.float32)
    valid = jnp.isfinite(v)
    if has_nodata:
        valid = valid & (v != nodata)
    seg = jnp.where(valid, seg_ids, num_segments).astype(jnp.int32)
    vs = jnp.where(valid, v, 0.0)

    seg_sorted, v_sorted = jax.lax.sort((seg, vs), num_keys=2)

    # Two-level f64 prefix sums (f64 intra-block + f64 block-cumsum).
    # This path only runs on CPU (_use_sorted_segments), where f64 is
    # native: an earlier f32 intra-block cumsum drifted the boundary
    # differences ~2e-5 relative on low-count zones (running-total ulps).
    n = v_sorted.shape[0]
    block = 256
    nb = -(-n // block)
    npad = nb * block

    def two_level_prefix(x):
        xp = jnp.pad(x.astype(jnp.float64), (0, npad - n)).reshape(nb, block)
        intra = jnp.cumsum(xp, axis=1)
        totals = intra[:, -1]
        blockcum = jnp.concatenate(
            [jnp.zeros((1,), jnp.float64), jnp.cumsum(totals)])

        def at(idx):
            # exclusive prefix sum at flat position idx (0..n)
            b = idx // block
            r = idx - b * block
            intra_part = jnp.where(
                r > 0,
                intra[jnp.clip(b, 0, nb - 1),
                      jnp.clip(r - 1, 0, block - 1)], 0.0)
            return blockcum[jnp.clip(b, 0, nb)] + intra_part
        return at

    prefix_v = two_level_prefix(v_sorted)
    prefix_v2 = two_level_prefix(v_sorted * v_sorted)

    bounds = jnp.searchsorted(seg_sorted,
                              jnp.arange(num_segments + 1, dtype=jnp.int32))
    start = bounds[:-1]
    end = bounds[1:]

    ssum64 = prefix_v(end) - prefix_v(start)
    ssumsq64 = prefix_v2(end) - prefix_v2(start)
    cnt64 = (end - start).astype(jnp.float64)
    # centered sum of squares in f64: the prefix sums are f64-exact to
    # ~1e-16 relative, so the algebraic form stays far inside 1e-5
    css = jnp.where(
        cnt64 > 0,
        ssumsq64 - ssum64 * ssum64 / jnp.maximum(cnt64, 1.0), 0.0)
    ssum = ssum64.astype(jnp.float32)
    cnt = cnt64.astype(jnp.float32)
    nonempty = end > start
    smin = jnp.where(nonempty, v_sorted[jnp.clip(start, 0, v.shape[0] - 1)],
                     jnp.inf)
    smax = jnp.where(nonempty,
                     v_sorted[jnp.clip(end - 1, 0, v.shape[0] - 1)],
                     -jnp.inf)
    return ssum, cnt, css.astype(jnp.float32), smin, smax


def _segment_stats_scatter(values, seg_ids, num_segments, nodata,
                           has_nodata, chunk=16384):
    """Scatter-based variant (jax.ops.segment_*), chunk-compensated.

    Fallback for zone counts beyond the matmul ceiling.  A single flat
    segment_sum accumulates each bin sequentially in f32 and drifts
    ~3e-3 at 16.7M elements; chunking bounds the sequential run to
    `chunk` adds, and the cross-chunk accumulators plus the centered
    sum-of-squares run in genuine float64.

    x64 MUST be enabled at this boundary, outside the jit: `jax.enable_x64`
    has no effect once a trace is underway, so an in-body `with x64():`
    silently demotes every "f64" accumulator to f32 (and the catastrophic
    cancellation in css returns — std 13.7 vs a true 0.003 on a
    low-spread/large-mean zone).
    """
    from .utils import x64
    with x64():
        return _segment_stats_scatter_impl(values, seg_ids, num_segments,
                                           nodata, has_nodata, chunk)


@partial(jax.jit, static_argnames=("num_segments", "has_nodata", "chunk"))
def _segment_stats_scatter_impl(values, seg_ids, num_segments, nodata,
                                has_nodata, chunk=16384):
    v = values.ravel().astype(jnp.float32)
    valid = jnp.isfinite(v)
    if has_nodata:
        valid = valid & (v != nodata)
    seg = jnp.where(valid, seg_ids, num_segments).astype(jnp.int32)
    vz = jnp.where(valid, v, 0.0)
    n = num_segments + 1

    sz = v.shape[0]
    n_chunks = -(-sz // chunk)
    npad = n_chunks * chunk
    vs = jnp.pad(vz, (0, npad - sz)).reshape(n_chunks, chunk)
    ss = jnp.pad(seg, (0, npad - sz),
                 constant_values=num_segments).reshape(n_chunks, chunk)
    vinf = jnp.pad(jnp.where(valid, v, jnp.inf), (0, npad - sz),
                   constant_values=jnp.inf).reshape(n_chunks, chunk)
    vninf = jnp.pad(jnp.where(valid, v, -jnp.inf), (0, npad - sz),
                    constant_values=-jnp.inf).reshape(n_chunks, chunk)
    wts = jnp.pad(valid.astype(jnp.float32),
                  (0, npad - sz)).reshape(n_chunks, chunk)

    seg_sum = partial(jax.ops.segment_sum, num_segments=n)
    seg_min = partial(jax.ops.segment_min, num_segments=n)
    seg_max = partial(jax.ops.segment_max, num_segments=n)

    # fold over chunks with f64 accumulators: O(n) memory (a vmap over
    # chunks would materialize (n_chunks, n) scatter results — gigabytes
    # in exactly the million-zone regime this path serves); the caller
    # enables x64 before tracing so these dtypes are honoured
    # per-zone css is invariant under a GLOBAL shift s:
    # css_z = sum_z (x-s)^2 - (sum_z (x-s))^2 / n_z  for any constant s.
    # Centering on the global mean before squaring keeps the squares near
    # the spread scale, so the algebraic form never cancels — without it
    # even f64 squares of large-mean values leave ~1e-13-relative css
    # noise (std 0.00492 vs true 0.00500 on 200k values of 1000±0.005)
    gshift = (jnp.sum(vz.astype(jnp.float64))
              / jnp.maximum(jnp.sum(valid.astype(jnp.float64)), 1.0))

    def body(carry, inp):
        a_sum, a_cnt, a_sq, a_min, a_max = carry
        vs_c, ss_c, vinf_c, vninf_c, wts_c = inp
        # cast BEFORE the segment ops: an f32 intra-chunk sum of squares
        # of large-mean values rounds away a small spread entirely (std
        # 13.6 vs true 0.005 on the canary above) — the f64 cast must
        # cover the shift, the squaring and the scatter accumulation
        v64 = (vs_c.astype(jnp.float64) - gshift) * wts_c
        a_sum = a_sum + seg_sum(v64, ss_c)
        a_cnt = a_cnt + seg_sum(wts_c, ss_c).astype(jnp.float64)
        a_sq = a_sq + seg_sum(v64 * v64, ss_c)
        a_min = jnp.minimum(a_min, seg_min(vinf_c, ss_c))
        a_max = jnp.maximum(a_max, seg_max(vninf_c, ss_c))
        return (a_sum, a_cnt, a_sq, a_min, a_max), None

    init = (jnp.zeros((n,), jnp.float64), jnp.zeros((n,), jnp.float64),
            jnp.zeros((n,), jnp.float64),
            jnp.full((n,), jnp.inf, jnp.float32),
            jnp.full((n,), -jnp.inf, jnp.float32))
    (ssumc64, cnt64, ssumsq64, smin, smax), _ = jax.lax.scan(
        body, init, (vs, ss, vinf, vninf, wts))
    # shifted algebraic centered sum of squares (exact per the identity)
    css = jnp.maximum(
        ssumsq64 - ssumc64 * ssumc64 / jnp.maximum(cnt64, 1.0), 0.0)
    # un-shift the sums for the downstream mean/sum stats
    ssum64 = ssumc64 + gshift * cnt64
    return (ssum64[:-1].astype(jnp.float32), cnt64[:-1].astype(jnp.float32),
            css[:-1].astype(jnp.float32), smin[:-1].astype(jnp.float32),
            smax[:-1].astype(jnp.float32))


@partial(jax.jit,
         static_argnames=("num_segments", "has_nodata", "need_var",
                          "slab", "chunk"))
def _segment_stats_matmul(values, seg_ids, num_segments, nodata, has_nodata,
                          need_var=True, slab=4096, chunk=65536):
    """One-hot matmul variant: the TPU default, for ANY zone count.

    Each pixel chunk builds its (chunk, slab) one-hot zone matrix and
    reduces via the MXU — measured ~50x faster than scatter segment ops at
    16.7M elements AND far more accurate (per-chunk accumulation: 2e-7
    relative vs scatter's 3e-3 sequential-f32 drift).  Zone counts above
    `slab` run as an outer lax.scan over 4096-wide zone slabs (one-hot
    memory stays bounded at chunk*slab*4 bytes; the pixel data is re-read
    once per slab, trivial next to the one-hot compute).

    Variance uses a true TWO-PASS centered sum of squares
    css = sum((x - mean_zone)^2): the single-pass E[x^2]-E[x]^2 form
    cancels catastrophically in f32 for low-spread zones (errors up to
    ~0.2 absolute on std observed at 16k zones).  Pass 2 reconstructs
    each pixel's zone mean with the same one-hot matmul (a per-element
    table gather is pathological on TPU) and is skipped when neither
    std nor var was requested (`need_var=False`).
    """
    v = values.ravel().astype(jnp.float32)
    valid = jnp.isfinite(v)
    if has_nodata:
        valid = valid & (v != nodata)
    nz = num_segments
    slab = min(slab, nz)  # static: nz is a static argname
    n_slabs = -(-nz // slab)
    nzp = n_slabs * slab  # overflow bin = nzp: matches no slab's iota
    seg = jnp.where(valid, seg_ids, nzp).astype(jnp.int32)
    vz = jnp.where(valid, v, 0.0)

    n = v.shape[0]
    n_chunks = -(-n // chunk)
    npad = n_chunks * chunk
    vs = jnp.pad(vz, (0, npad - n)).reshape(n_chunks, chunk)
    ss = jnp.pad(seg, (0, npad - n),
                 constant_values=nzp).reshape(n_chunks, chunk)
    base_iota = jnp.arange(slab, dtype=jnp.int32)
    los = jnp.arange(0, nzp, slab, dtype=jnp.int32)

    def slab_body(_, lo):
        iota = lo + base_iota

        def step(carry, inp):
            ssum, cnt, smin, smax = carry
            vc, sc = inp
            oh = (sc[:, None] == iota[None, :]).astype(jnp.float32)
            ssum = ssum + jnp.dot(vc, oh,
                                  preferred_element_type=jnp.float32)
            cnt = cnt + jnp.sum(oh, axis=0)
            smin = jnp.minimum(smin, jnp.min(
                jnp.where(oh > 0, vc[:, None], jnp.inf), axis=0))
            smax = jnp.maximum(smax, jnp.max(
                jnp.where(oh > 0, vc[:, None], -jnp.inf), axis=0))
            return (ssum, cnt, smin, smax), None

        init = (jnp.zeros(slab, jnp.float32), jnp.zeros(slab, jnp.float32),
                jnp.full(slab, jnp.inf, jnp.float32),
                jnp.full(slab, -jnp.inf, jnp.float32))
        out, _ = jax.lax.scan(step, init, (vs, ss))
        return None, out

    _, res = jax.lax.scan(slab_body, None, los)  # each: (n_slabs, slab)
    ssum2d, cnt2d, smin2d, smax2d = res
    ssum, cnt, smin, smax = (r.reshape(nzp)[:nz] for r in res)

    if not need_var:
        return ssum, cnt, jnp.zeros_like(ssum), smin, smax

    mu2d = jnp.where(cnt2d > 0, ssum2d / jnp.maximum(cnt2d, 1.0), 0.0)

    def step2(css, inp):
        vc, sc = inp

        def mu_body(acc, xs):
            lo, mu_s = xs
            iota = lo + base_iota
            oh = (sc[:, None] == iota[None, :]).astype(jnp.float32)
            return acc + jnp.dot(oh, mu_s,
                                 preferred_element_type=jnp.float32), None

        mu_pix, _ = jax.lax.scan(mu_body, jnp.zeros_like(vc), (los, mu2d))
        dd = (vc - mu_pix) ** 2

        def css_body(_, lo):
            iota = lo + base_iota
            oh = (sc[:, None] == iota[None, :]).astype(jnp.float32)
            return None, jnp.dot(dd, oh,
                                 preferred_element_type=jnp.float32)

        _, contrib = jax.lax.scan(css_body, None, los)
        return css + contrib, None

    css2d, _ = jax.lax.scan(step2, jnp.zeros((n_slabs, slab), jnp.float32),
                            (vs, ss))
    return ssum, cnt, css2d.reshape(nzp)[:nz], smin, smax


# total-zone ceiling above which the matmul slab scan would be slower
# than chunk-compensated scatter (the slab width itself is the `slab`
# default on the matmul kernels)
_MATMUL_MAX_ZONES_TOTAL = 65536


@partial(jax.jit, static_argnames=("nz", "has_nodata", "need_var",
                                   "slab", "chunk"))
def _dense_stats_presence(values, zones, zmin, nz, nodata, has_nodata,
                          need_var=True, slab=4096, chunk=65536):
    """Matmul segment stats over the DENSE integer zone range
    [zmin, zmin+nz), plus a per-bin pixel-presence histogram.

    Lets device-resident integer zones skip the host round trip entirely
    (no np.unique of the raster, no separate segment-id pass): bins are
    z - zmin; empty bins are filtered afterwards from the tiny per-bin
    fetch.  Presence counts ALL pixels of a zone (a zone whose values are
    all NaN still exists with NaN statistics, matching the host path).
    Zone ranges above `slab` run as an outer lax.scan over 4096-wide
    slabs, same scheme as _segment_stats_matmul.
    """
    v = values.ravel().astype(jnp.float32)
    # rebase BEFORE the int32 cast: ids with large magnitude but a small
    # range must not overflow the cast (the dense gate also bounds the
    # raw range to int32, belt and braces)
    z = (zones.ravel() - zmin).astype(jnp.int32)
    valid = jnp.isfinite(v)
    if has_nodata:
        valid = valid & (v != nodata)
    slab = min(slab, nz)  # static: nz is a static argname
    n_slabs = -(-nz // slab)
    nzp = n_slabs * slab  # overflow bin = nzp: matches no slab's iota
    segv = jnp.where(valid, z, nzp)
    vz = jnp.where(valid, v, 0.0)

    n = v.shape[0]
    n_chunks = -(-n // chunk)
    npad = n_chunks * chunk
    vs = jnp.pad(vz, (0, npad - n)).reshape(n_chunks, chunk)
    ss = jnp.pad(segv, (0, npad - n),
                 constant_values=nzp).reshape(n_chunks, chunk)
    zs = jnp.pad(z, (0, npad - n),
                 constant_values=nzp).reshape(n_chunks, chunk)
    base_iota = jnp.arange(slab, dtype=jnp.int32)

    los = jnp.arange(0, nzp, slab, dtype=jnp.int32)

    def slab_body(_, lo):
        iota = lo + base_iota

        def step(carry, inp):
            ssum, cnt, smin, smax, pres = carry
            vc, sc, zc = inp
            oh = (sc[:, None] == iota[None, :]).astype(jnp.float32)
            ohp = (zc[:, None] == iota[None, :]).astype(jnp.float32)
            ssum = ssum + jnp.dot(vc, oh,
                                  preferred_element_type=jnp.float32)
            cnt = cnt + jnp.sum(oh, axis=0)
            pres = pres + jnp.sum(ohp, axis=0)
            smin = jnp.minimum(smin, jnp.min(
                jnp.where(oh > 0, vc[:, None], jnp.inf), axis=0))
            smax = jnp.maximum(smax, jnp.max(
                jnp.where(oh > 0, vc[:, None], -jnp.inf), axis=0))
            return (ssum, cnt, smin, smax, pres), None

        init = (jnp.zeros(slab, jnp.float32), jnp.zeros(slab, jnp.float32),
                jnp.full(slab, jnp.inf, jnp.float32),
                jnp.full(slab, -jnp.inf, jnp.float32),
                jnp.zeros(slab, jnp.float32))
        out, _ = jax.lax.scan(step, init, (vs, ss, zs))
        return None, out

    _, res = jax.lax.scan(slab_body, None, los)  # each: (n_slabs, slab)
    ssum2d, cnt2d, smin2d, smax2d, pres2d = res

    if need_var:
        # pass 2: two-pass centered sum of squares (see
        # _segment_stats_matmul — same scheme, same rationale)
        mu2d = jnp.where(cnt2d > 0, ssum2d / jnp.maximum(cnt2d, 1.0), 0.0)

        def step2(css, inp):
            vc, sc = inp

            def mu_body(acc, xs):
                lo, mu_s = xs
                iota = lo + base_iota
                oh = (sc[:, None] == iota[None, :]).astype(jnp.float32)
                return acc + jnp.dot(
                    oh, mu_s, preferred_element_type=jnp.float32), None

            mu_pix, _ = jax.lax.scan(mu_body, jnp.zeros_like(vc),
                                     (los, mu2d))
            dd = (vc - mu_pix) ** 2

            def css_body(_, lo):
                iota = lo + base_iota
                oh = (sc[:, None] == iota[None, :]).astype(jnp.float32)
                return None, jnp.dot(dd, oh,
                                     preferred_element_type=jnp.float32)

            _, contrib = jax.lax.scan(css_body, None, los)
            return css + contrib, None

        css2d, _ = jax.lax.scan(
            step2, jnp.zeros((n_slabs, slab), jnp.float32), (vs, ss))
    else:
        css2d = jnp.zeros((n_slabs, slab), jnp.float32)

    # one stacked result -> ONE device->host fetch (each separate small
    # fetch pays the ~30 ms tunnel roundtrip)
    stacked = jnp.stack([ssum2d, cnt2d, css2d, smin2d, smax2d, pres2d])
    return stacked.reshape(6, nzp)[:, :nz]


@jax.jit
def _int_min_max(z):
    return jnp.min(z), jnp.max(z)


@partial(jax.jit, static_argnames=("nz", "slab", "chunk"))
def _presence_only(zones, zmin, nz, slab=4096, chunk=262144):
    """Per-bin pixel counts over the dense integer range [zmin, zmin+nz).

    Slabbed like _segment_stats_matmul so the transient one-hot stays
    bounded at chunk*slab*4 bytes for any zone range.
    """
    z = (zones.ravel() - zmin).astype(jnp.int32)
    slab = min(slab, nz)
    n_slabs = -(-nz // slab)
    nzp = n_slabs * slab
    n = z.shape[0]
    n_chunks = -(-n // chunk)
    npad = n_chunks * chunk
    zs = jnp.pad(z, (0, npad - n), constant_values=nzp).reshape(n_chunks,
                                                                chunk)
    base_iota = jnp.arange(slab, dtype=jnp.int32)

    def slab_body(_, lo):
        iota = lo + base_iota

        def step(pres, zc):
            oh = (zc[:, None] == iota[None, :]).astype(jnp.float32)
            return pres + jnp.sum(oh, axis=0), None

        pres, _ = jax.lax.scan(step, jnp.zeros(slab, jnp.float32), zs)
        return None, pres

    if n_slabs == 1:
        return slab_body(None, jnp.int32(0))[1]
    _, res = jax.lax.scan(
        slab_body, None, jnp.arange(0, nzp, slab, dtype=jnp.int32))
    return res.reshape(nzp)[:nz]


@jax.jit
def _dense_to_compact(zones, zmin, comp_table):
    """Compact segment ids from dense integer zones via a small-table
    lookup (bins absent from the raster never occur, so no miss check)."""
    idx = jnp.clip((zones.ravel() - zmin).astype(jnp.int32), 0,
                   comp_table.shape[0] - 1)
    return comp_table[idx]


def _unique_float_device(vdata, nodata_values):
    """Sorted-unique of the finite values of a device-resident float
    raster, without fetching the raster to host.

    One single-operand f32 sort (fast on the TPU backend: ~70 ms at
    16.7M elements) + a boundary mask; only the scalar count and the
    tiny (k,) unique table cross the tunnel — replaces the multi-second
    full-raster np.unique round trip (r1 known gap).
    """
    v = vdata.ravel().astype(jnp.float32)
    v = jnp.sort(jnp.where(jnp.isfinite(v), v, jnp.inf))
    if v.shape[0] == 0:
        return np.array([], dtype=np.float32)
    new = jnp.concatenate(
        [jnp.ones((1,), bool), v[1:] != v[:-1]]) & jnp.isfinite(v)
    k = int(jnp.sum(new))  # scalar fetch
    if k == 0:
        return np.array([], dtype=np.float32)
    if k > _UNIQUE_GATHER_CAP:
        # a continuous-valued raster, not categories: the k-element
        # device gather would be pathological on TPU (and a k-column
        # crosstab is no more useful than the host error/result).  Fall
        # back to the safe host unique
        values_np = np.asarray(vdata).ravel()
        finite = np.isfinite(values_np)
        u = np.unique(values_np[finite]).astype(np.float32)
    else:
        idx = jnp.nonzero(new, size=k)[0]
        u = np.asarray(v[idx])
    if nodata_values is not None:
        u = u[u != np.float32(nodata_values)]
    return u


def _unique_and_seg_ids(zdata):
    """(unique_zones host array, compact seg_ids device array), using the
    dense device path for device-resident integer zones (no full-raster
    host fetch) and the host np.unique path otherwise."""
    dense = _dense_zone_range(zdata)
    if dense is not None:
        zmin, nz = dense
        present = np.asarray(_presence_only(zdata, zmin, nz)) > 0
        unique = (zmin + np.nonzero(present)[0]).astype(
            np.dtype(zdata.dtype))
        comp = np.cumsum(present) - 1
        comp_t = jnp.asarray(
            np.where(present, comp, len(unique)).astype(np.int32))
        return unique, _dense_to_compact(zdata, zmin, comp_t)
    zones_np = np.asarray(zdata)
    unique = _unique_zones_host(zones_np)
    return unique, _segment_ids(jnp.asarray(zdata), jnp.asarray(unique))


# zones-array -> (zmin, zmax) memo: the range fetch is a device->host
# scalar roundtrip (~30 ms through the axon tunnel) that GATES tracing
# (nz is a static shape), so repeat stats/crosstab calls on the same
# zones array would pay it every time.  Keyed by a weakref so entries
# die with their array; jax.Array contents are immutable, so the cached
# range can never go stale.
_zone_range_memo = {}


def _int_min_max_cached(zdata):
    import weakref
    key = id(zdata)
    hit = _zone_range_memo.get(key)
    if hit is not None and hit[0]() is zdata:
        return hit[1]
    mn_d, mx_d = _int_min_max(zdata)
    # one stacked fetch, not two sequential scalar roundtrips
    mn, mx = (int(v) for v in np.asarray(jnp.stack([mn_d, mx_d])))

    def _drop(_ref, key=key):
        _zone_range_memo.pop(key, None)

    try:
        _zone_range_memo[key] = (weakref.ref(zdata, _drop), (mn, mx))
    except TypeError:
        pass  # not weakref-able: skip caching
    return mn, mx


def _dense_zone_range(zdata):
    """(zmin, nz) for the dense device path, or None if unsuitable:
    requires a device-resident integer zones array whose value range fits
    the matmul gate."""
    if _use_sorted_segments():
        return None  # CPU: host unique is cheap, sorted path preferred
    if not isinstance(zdata, jax.Array) or isinstance(zdata, np.ndarray):
        return None
    if not jnp.issubdtype(zdata.dtype, jnp.integer) or zdata.size == 0:
        return None
    zmin, zmax = _int_min_max_cached(zdata)
    if zmin < -(2 ** 31) or zmax >= 2 ** 31:
        return None  # raw ids would overflow the device int32 math
    nz = zmax - zmin + 1
    if not 0 < nz <= _MATMUL_MAX_ZONES_TOTAL:
        return None
    return zmin, nz


def _use_sorted_segments() -> bool:
    import os
    forced = os.environ.get("XRSPATIAL_SORTED_SEGMENTS")
    if forced is not None:
        return forced == "1"
    # multi-key lax.sort is minutes-slow on the axon TPU backend (and a
    # killed client wedges the worker); scatter is correct and measured
    # working there
    return jax.default_backend() != "tpu"


def _segment_stats(values, seg_ids, num_segments, nodata, has_nodata,
                   need_var=True):
    if _use_sorted_segments():
        return _segment_stats_sorted(values, seg_ids, num_segments, nodata,
                                     has_nodata)
    if 0 < num_segments <= _MATMUL_MAX_ZONES_TOTAL:
        return _segment_stats_matmul(values, seg_ids, num_segments, nodata,
                                     has_nodata, need_var)
    return _segment_stats_scatter(values, seg_ids, num_segments, nodata,
                                  has_nodata)


def _derived_stats(ssum, cnt, css, smin, smax):
    cnt_np = np.asarray(cnt, dtype=np.float64)
    ssum_np = np.asarray(ssum, dtype=np.float64)
    css_np = np.asarray(css, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt_np > 0, ssum_np / cnt_np, np.nan)
        var = np.where(cnt_np > 0, css_np / cnt_np, np.nan)
        var = np.maximum(var, 0.0)
        std = np.sqrt(var)
    out = {
        "mean": mean,
        "max": np.where(cnt_np > 0, np.asarray(smax, np.float64), np.nan),
        "min": np.where(cnt_np > 0, np.asarray(smin, np.float64), np.nan),
        "sum": np.where(cnt_np > 0, ssum_np, np.nan),
        "std": std,
        "var": var,
        "count": np.where(cnt_np > 0, cnt_np, np.nan),
    }
    return out


def _majority_host(zones_np, values_np, unique_zones, nodata):
    """Most frequent value per zone (host lexsort; reference zonal.py:56-69)."""
    z = zones_np.ravel()
    v = values_np.ravel().astype(np.float64)
    valid = np.isfinite(z) & np.isfinite(v)
    if nodata is not None:
        valid &= (v != nodata)
    z, v = z[valid], v[valid]
    out = np.full(len(unique_zones), np.nan)
    if len(z) == 0:
        return out
    order = np.lexsort((v, z))
    z, v = z[order], v[order]
    zone_pos = np.searchsorted(z, unique_zones, side="left")
    zone_end = np.searchsorted(z, unique_zones, side="right")
    for i, (s, e) in enumerate(zip(zone_pos, zone_end)):
        if e > s:
            vals, counts = np.unique(v[s:e], return_counts=True)
            out[i] = vals[np.argmax(counts)]
    return out


def _stats_host_custom(zones_np, values_np, unique_zones, zone_ids,
                       func, nodata):
    """Escape hatch for arbitrary python stats callables
    (reference zonal.py:144-163 semantics)."""
    z = zones_np.ravel()
    v = values_np.ravel()
    order = np.argsort(z)
    z_sorted, v_sorted = z[order], v[order]
    out = np.full(len(unique_zones), np.nan)
    starts = np.searchsorted(z_sorted, unique_zones, side="left")
    ends = np.searchsorted(z_sorted, unique_zones, side="right")
    for i, uz in enumerate(unique_zones):
        if uz not in zone_ids:
            continue
        vals = v_sorted[starts[i]:ends[i]]
        vals = vals[np.isfinite(vals) & (vals != nodata)]
        if len(vals) > 0:
            out[i] = func(vals)
    return out


def stats(
    zones: DataArray,
    values,
    zone_ids: Optional[List[Union[int, float]]] = None,
    stats_funcs: Union[Dict, List] = _DEFAULT_STATS_NAMES,
    nodata_values: Union[int, float] = None,
    return_type: str = 'pandas.DataFrame',
):
    """Summary statistics of `values` for each zone in `zones`.

    Default statistics run as fused segment reductions on device; custom
    callables in a dict `stats_funcs` run on host (documented escape
    hatch).  ``return_type='xarray.DataArray'`` broadcasts each zone's
    statistic back to its pixels as a (stats, y, x) DataArray.
    """
    if isinstance(values, Dataset):
        if return_type != 'pandas.DataFrame':
            raise ValueError(
                "return_type must be 'pandas.DataFrame' when values is a "
                "Dataset")
        dfs = []
        for var in values.data_vars:
            df = stats(zones, values[var], zone_ids, stats_funcs,
                       nodata_values, 'pandas.DataFrame')
            df = df.rename(columns={c: f'{var}_{c}' for c in df.columns
                                    if c != 'zone'})
            dfs.append(df)
        result = dfs[0]
        for df in dfs[1:]:
            result = result.merge(df, on='zone', how='outer')
        return result

    validate_arrays(zones, values)
    for arr, label in ((zones, "zones"), (values, "values")):
        dt = np.dtype(arr.data.dtype)
        if not (np.issubdtype(dt, np.integer)
                or np.issubdtype(dt, np.floating)):
            raise ValueError(
                f"`{label}` must be an array of integers or floats.")

    custom_funcs: Dict[str, Callable] = {}
    if isinstance(stats_funcs, list):
        for s in stats_funcs:
            if s not in _DEFAULT_STATS_NAMES:
                raise ValueError(
                    f"Invalid stat name. {s} option not supported.")
        stat_names = list(stats_funcs)
    elif isinstance(stats_funcs, dict):
        stat_names = list(stats_funcs.keys())
        custom_funcs = dict(stats_funcs)
    else:
        raise ValueError("stats_funcs must be a list or dict")

    has_nodata = nodata_values is not None
    nodata = jnp.float32(nodata_values if has_nodata else 0.0)
    needs_host_zones = bool(custom_funcs) or "majority" in stat_names
    need_var = bool(custom_funcs) or bool(
        {"std", "var"} & set(stat_names))
    zdata = zones.data
    if (not needs_host_zones and isinstance(zdata, np.ndarray)
            and jax.default_backend() == "tpu"
            and np.issubdtype(zdata.dtype, np.integer)
            and _fits_int32(zdata)):
        # host-numpy inputs: one up-front upload lets the dense device
        # path run (np.unique of a large raster on host costs seconds).
        # Ids outside int32 stay on host — jnp.asarray would silently
        # WRAP them (x64 is off) before the dense gate could reject them
        zdata = jnp.asarray(zdata)
    dense = None if needs_host_zones else _dense_zone_range(zdata)
    zones_np = None
    values_np = None  # materialized lazily for host paths

    if dense is not None:
        # device-resident integer zones: dense matmul bins, no host
        # round trip of the raster and no separate unique/segment-id pass
        zmin, nz_dense = dense
        stacked = np.asarray(_dense_stats_presence(
            jnp.asarray(values.data), zdata, zmin, nz_dense,
            nodata, has_nodata,
            need_var))  # (6, nz): one fetch for all outputs
        present = stacked[5] > 0
        unique_zones = zmin + np.nonzero(present)[0]
        raw = tuple(stacked[i][present] for i in range(5))
        seg_ids = None  # derived lazily for the DataArray return path
    else:
        zones_np = np.asarray(zones.data)
        unique_zones = _unique_zones_host(zones_np)
        uz = jnp.asarray(unique_zones)
        seg_ids = _segment_ids(jnp.asarray(zones.data), uz)
        if _use_sorted_segments():
            from .utils import x64
            with x64():  # float64 prefix sums inside the sorted variant
                raw = _segment_stats(jnp.asarray(values.data), seg_ids,
                                     len(unique_zones), nodata, has_nodata)
        else:
            raw = _segment_stats(jnp.asarray(values.data), seg_ids,
                                 len(unique_zones), nodata, has_nodata,
                                 need_var)
        if len(unique_zones):  # batch the 5 per-zone fetches into one
            raw = tuple(np.asarray(jnp.stack(raw)))

    if zone_ids is None:
        sel_zones = unique_zones
    else:
        sel = np.unique(zone_ids)
        sel_zones = np.array([z for z in sel if z in unique_zones])
    derived = _derived_stats(*raw)

    per_zone: Dict[str, np.ndarray] = {}
    for s in stat_names:
        if custom_funcs:
            func = custom_funcs[s]
            if values_np is None:
                values_np = np.asarray(values.data)
            per_zone[s] = _stats_host_custom(
                zones_np, values_np, unique_zones, set(sel_zones.tolist()),
                func, nodata_values)
        elif s == "majority":
            if values_np is None:
                values_np = np.asarray(values.data)
            per_zone[s] = _majority_host(zones_np, values_np, unique_zones,
                                         nodata_values)
        else:
            per_zone[s] = derived[s]

    sel_mask = np.isin(unique_zones, sel_zones)
    if return_type == 'xarray.DataArray':
        if seg_ids is None:  # dense path skipped the segment-id pass
            seg_ids = _segment_ids(jnp.asarray(zones.data),
                                   jnp.asarray(unique_zones))
        # broadcast each zone's statistic back to its pixels (device gather)
        tables = []
        for s in stat_names:
            tbl = np.where(sel_mask, per_zone[s], np.nan)
            tables.append(np.append(tbl, np.nan))  # overflow bin -> NaN
        tables = jnp.asarray(np.stack(tables))  # (S, nz+1)
        out = tables[:, seg_ids].reshape((len(stat_names),) + values.shape)
        result = DataArray(
            out, dims=('stats',) + tuple(values.dims), attrs=values.attrs)
        for cname, cval in values.coords.items():
            result.coords[cname] = cval
        result.coords['stats'] = DataArray(np.asarray(stat_names),
                                           dims=('stats',))
        return result

    sel_idx = np.nonzero(sel_mask)[0]
    data = {"zone": unique_zones[sel_idx]}
    for s in stat_names:
        data[s] = np.asarray(per_zone[s])[sel_idx]
    return pd.DataFrame(data)


# ---------------------------------------------------------------------------
# crosstab
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nz", "nc", "has_nodata"))
def _crosstab_counts(zones_seg, values, unique_cats, nz, nc, nodata,
                     has_nodata):
    """(nz, nc) count histogram + (nz,) total-valid counts."""
    v = values.ravel().astype(jnp.float32)
    valid = jnp.isfinite(v)
    if has_nodata:
        valid = valid & (v != nodata)
    cat_idx = jnp.searchsorted(unique_cats, v, method="compare_all")
    cat_idx = jnp.clip(cat_idx, 0, nc - 1)
    cat_hit = valid & (unique_cats[cat_idx] == v)

    combined = jnp.where(cat_hit & (zones_seg < nz),
                         zones_seg * nc + cat_idx, nz * nc)
    counts = jax.ops.segment_sum(jnp.ones_like(v), combined,
                                 num_segments=nz * nc + 1)[:-1]
    totals_seg = jnp.where(valid & (zones_seg < nz), zones_seg, nz)
    totals = jax.ops.segment_sum(jnp.ones_like(v), totals_seg,
                                 num_segments=nz + 1)[:-1]
    return counts.reshape(nz, nc), totals


def crosstab(
    zones: DataArray,
    values: DataArray,
    zone_ids: List[Union[int, float]] = None,
    cat_ids: List[Union[int, float]] = None,
    layer: Optional[int] = None,
    agg: Optional[str] = "count",
    nodata_values: Optional[Union[int, float]] = None,
) -> pd.DataFrame:
    """Cross-tabulated categorical stats between `zones` and `values`.

    2D values: per-(zone, category) counts or percentages via one device
    histogram.  3D values: per-layer segment statistics
    (min/max/mean/sum/std/var/count).
    """
    agg_2d = ("count", "percentage")
    agg_3d = ("min", "max", "mean", "sum", "std", "var", "count")
    if values.ndim == 2:
        if agg not in agg_2d:
            raise ValueError(
                f"`agg` method for 2D data array must be one of {agg_2d}")
        if zones.shape != values.shape:
            raise ValueError("Incompatible shapes between `zones` "
                             "and `values`")
    elif values.ndim == 3:
        if agg not in agg_3d:
            raise ValueError(
                f"`agg` method for 3D data array must be one of {agg_3d}")
    else:
        raise ValueError("`values` must be 2D or 3D")

    zdata = zones.data
    vdata = values.data
    if jax.default_backend() == "tpu":
        # one up-front upload so host-numpy inputs ride the device paths
        # (dense bins / device sort-unique) instead of host np.unique.
        # Integer ids outside int32 stay on host — jnp.asarray would
        # silently WRAP them (x64 is off)
        if (isinstance(zdata, np.ndarray)
                and np.issubdtype(zdata.dtype, np.integer)
                and _fits_int32(zdata)):
            zdata = jnp.asarray(zdata)
        if (isinstance(vdata, np.ndarray) and values.ndim == 2
                and (not np.issubdtype(vdata.dtype, np.integer)
                     or _fits_int32(vdata))):
            vdata = jnp.asarray(vdata)

    unique_zones, seg_ids = _unique_and_seg_ids(zdata)
    if zone_ids is None:
        sel_zones = unique_zones
    else:
        sel_zones = np.array([z for z in np.unique(zone_ids)
                              if z in unique_zones])
    nz = len(unique_zones)
    has_nodata = nodata_values is not None
    nodata = jnp.float32(nodata_values if has_nodata else 0.0)

    if values.ndim == 3:
        if layer is None:
            layer = 0
        try:
            dims = values.dims
            layer_dim = dims[layer]
            layer_labels = np.asarray(values[layer_dim].data)
        except (IndexError, KeyError):
            raise ValueError("Invalid `layer`")
        # move the categorical dim first
        axes = (layer,) + tuple(i for i in range(values.ndim) if i != layer)
        cube = jnp.transpose(jnp.asarray(values.data), axes)
        if zones.shape != cube.shape[1:]:
            raise ValueError("Incompatible shapes")
        if cat_ids is None:
            cats = layer_labels
        else:
            cats = np.array([c for c in cat_ids if c in layer_labels])
        result = {"zone": None}
        sel_mask = np.isin(unique_zones, sel_zones)
        result["zone"] = unique_zones[sel_mask]
        from .utils import x64
        for c in cats:
            li = int(np.nonzero(layer_labels == c)[0][0])
            if _use_sorted_segments():
                with x64():
                    raw = _segment_stats(cube[li], seg_ids, nz, nodata,
                                         has_nodata)
            else:
                raw = _segment_stats(cube[li], seg_ids, nz, nodata,
                                     has_nodata,
                                     need_var=agg in ("std", "var"))
            derived = _derived_stats(*raw)
            col = derived[agg]
            if agg == "count":
                # empty zones count as 0 in crosstab (reference
                # _stats_count on an empty selection)
                col = np.nan_to_num(col, nan=0.0)
            result[c] = np.asarray(col)[sel_mask]
        return pd.DataFrame(result)

    # 2D case
    dense_v = _dense_zone_range(vdata)
    if dense_v is not None:
        vmin, nv = dense_v
        vpres = np.asarray(_presence_only(vdata, vmin, nv)) > 0
        # keep the host path's column-label dtype (ints stay ints)
        unique_cats = (vmin + np.nonzero(vpres)[0]).astype(
            np.dtype(vdata.dtype))
        if has_nodata:
            unique_cats = unique_cats[unique_cats != nodata_values]
    elif (isinstance(vdata, jax.Array) and not isinstance(vdata, np.ndarray)
            and jax.default_backend() == "tpu"
            and not jnp.issubdtype(vdata.dtype, jnp.integer)):
        # device-resident float categories: sort-unique on device (labels
        # round through f32 — documented deviation for this path).
        # Integer rasters with a wide value range skip this (f32 would
        # merge codes above 2^24 BEFORE the exact-int path could act)
        # and fall through to the exact host unique below
        unique_cats = _unique_float_device(vdata, nodata_values).astype(
            np.dtype(vdata.dtype))
    else:
        values_np_flat = np.asarray(vdata).ravel()
        finite = np.isfinite(values_np_flat)
        if has_nodata:
            finite &= (values_np_flat != nodata_values)
        unique_cats = np.unique(values_np_flat[finite])
    if cat_ids is None:
        cats = unique_cats
    else:
        # Deliberate deviation (PARITY.md #6): with a proper-subset cat_ids
        # the reference's _single_zone_crosstab_2d folds skipped categories'
        # counts into the next selected column (its cat cursor only advances
        # on selected categories, reference zonal.py:747-791).  We report
        # exact per-category counts instead.
        cats = np.array([c for c in cat_ids if c in unique_cats])

    nc = len(unique_cats)
    cats_dev = jnp.asarray(unique_cats.astype(np.float32))
    v_count = vdata
    nodata_c, has_nodata_c = nodata, has_nodata
    if (nc and np.issubdtype(np.asarray(unique_cats).dtype, np.integer)
            and max(abs(int(unique_cats[0])),
                    abs(int(unique_cats[-1]))) >= 2 ** 24):
        # float32 cannot represent such labels exactly (integer codes
        # above 2^24 collide), so the histogram runs over exact-int
        # compact indices; invalid/nodata cells map to NaN (nodata is
        # already excluded from unique_cats)
        if isinstance(vdata, np.ndarray):
            flat = vdata.ravel()
            idx = np.clip(np.searchsorted(unique_cats, flat), 0, nc - 1)
            hit = unique_cats[idx] == flat
            v_count = np.where(hit, idx, np.nan).astype(
                np.float32).reshape(vdata.shape)
        else:
            seg = _segment_ids(vdata, jnp.asarray(unique_cats))
            v_count = jnp.where(seg < nc, seg.astype(jnp.float32),
                                jnp.nan).reshape(vdata.shape)
        cats_dev = jnp.arange(nc, dtype=jnp.float32)
        nodata_c, has_nodata_c = jnp.float32(0.0), False

    counts, totals = _crosstab_counts(
        seg_ids, jnp.asarray(v_count), cats_dev,
        nz, nc, nodata_c, has_nodata_c)
    counts = np.asarray(counts)
    totals = np.array(totals, dtype=np.float32)  # writable copy

    sel_mask = np.isin(unique_zones, sel_zones)
    out = {"zone": unique_zones[sel_mask]}
    if agg == "percentage":
        totals[totals == 0] = np.nan
    for c in cats:
        ci = int(np.nonzero(unique_cats == c)[0][0])
        col = counts[:, ci]
        if agg == "percentage":
            col = col / totals * 100
        out[c] = col[sel_mask]
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# apply / regions / trim / crop / canvas
# ---------------------------------------------------------------------------

def apply(zones: DataArray, values: DataArray, func: Callable,
          nodata: Optional[int] = 0):
    """Apply `func` in place to `values` cells whose zone != `nodata`.

    Mirrors reference zonal.py:1157-1263 (including in-place mutation and
    the 3D z-broadcast of the zone mask).
    """
    if not isinstance(zones, DataArray):
        raise TypeError("zones must be instance of DataArray")
    if not isinstance(values, DataArray):
        raise TypeError("values must be instance of DataArray")
    if zones.ndim != 2:
        raise ValueError("zones must be 2D")
    if values.ndim not in (2, 3):
        raise ValueError("values must be either 2D or 3D coordinates")
    if zones.shape != values.shape[:2]:
        raise ValueError("Incompatible shapes between `zones` and `values`")
    if not np.issubdtype(np.dtype(zones.data.dtype), np.integer):
        raise ValueError("`zones.values` must be an array of integers")
    vdt = np.dtype(values.data.dtype)
    if not (np.issubdtype(vdt, np.integer) or np.issubdtype(vdt, np.floating)):
        raise ValueError("`values` must be an array of integers or float")

    zones_np = np.asarray(zones.data)
    in_zone = zones_np != nodata
    if values.ndim == 3:
        in_zone = np.repeat(in_zone[:, :, np.newaxis], values.shape[-1],
                            axis=-1)
    vals = np.asarray(values.data)
    try:
        transformed = np.asarray(func(vals))
        if transformed.shape != vals.shape:
            raise ValueError
    except Exception:
        transformed = np.vectorize(func)(vals)
    values.data = jnp.asarray(np.where(in_zone, transformed, vals))


@partial(jax.jit, static_argnames=("n8",))
def _label_propagate(data, n8):
    """Connected-component labels by iterative min-label propagation.

    Pixels are connected when approximately equal (|a-b| <= atol+rtol|b|,
    reference zonal.py:1455-1457).  Fixpoint under lax.while_loop — the
    TPU-native replacement for the reference's sequential two-pass scan.
    """
    h, w = data.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # int32 labels: float32 flat indices collide above 2^24 pixels and
    # would silently merge distinct regions on >4096^2 rasters
    init = rows * w + cols
    nanmask = jnp.isnan(data)
    big = jnp.int32(h * w + 1)
    init = jnp.where(nanmask, big, init)

    if n8:
        offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                   (1, -1), (1, 0), (1, 1)]
    else:
        offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]

    padded_data = jnp.pad(data, 1, constant_values=jnp.nan)

    def neighbor(arr, dy, dx, fill):
        p = jnp.pad(arr, 1, constant_values=fill)
        return jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w))

    def connected(dy, dx):
        nb_val = jax.lax.dynamic_slice(padded_data, (1 + dy, 1 + dx), (h, w))
        return (jnp.abs(nb_val - data) <= (1e-08 + 1e-05 * jnp.abs(data))) \
            & ~jnp.isnan(nb_val) & ~nanmask

    conns = [connected(dy, dx) for dy, dx in offsets]

    def body(state):
        labels, _ = state
        new = labels
        for (dy, dx), conn in zip(offsets, conns):
            nb = neighbor(labels, dy, dx, big)
            new = jnp.minimum(new, jnp.where(conn, nb, big))
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return jnp.where(nanmask, big, labels)  # int32; `big` marks NaN cells


def regions(raster: DataArray, neighborhood: int = 4,
            name: str = "regions") -> DataArray:
    """Label connected regions of approximately-equal cells.

    Output ids are 1..n in scan (row-major) order of each region's first
    pixel; NaN cells stay NaN.
    """
    if neighborhood not in (4, 8):
        raise ValueError("`neighborhood` must be 4 or 8")
    data = jnp.asarray(raster.data, dtype=jnp.float32)
    labels = np.asarray(_label_propagate(data, neighborhood == 8))

    # renumber to scan-order 1..n (labels are exact int32; h*w+1 marks
    # NaN cells)
    flat = labels.ravel()
    finite = flat != labels.size + 1
    uniq, first_idx, inverse = np.unique(flat[finite], return_index=True,
                                         return_inverse=True)
    # float64 output when ids would not be exact in float32
    out_dt = np.float32 if len(uniq) < 2 ** 24 else np.float64
    out = np.full(labels.shape, np.nan, dtype=out_dt)
    order = np.argsort(np.argsort(first_idx))
    out.ravel()[finite] = order[inverse] + 1
    if out_dt is np.float64:
        # jnp.asarray would silently downcast to f32 (x64 off) and
        # re-collide the ids; scope x64 for the upload
        from .utils import x64
        with x64():
            payload = jnp.asarray(out)
    else:
        payload = jnp.asarray(out)
    result = DataArray(payload, name=name, dims=raster.dims,
                       attrs=dict(raster.attrs))
    for cname, cval in raster.coords.items():
        result.coords[cname] = cval
    return result


def _edge_extent(mask_keep: np.ndarray):
    """First/last row and col indices where mask_keep has any True."""
    rows = np.nonzero(mask_keep.any(axis=1))[0]
    cols = np.nonzero(mask_keep.any(axis=0))[0]
    if len(rows) == 0 or len(cols) == 0:
        return None
    return rows[0], rows[-1], cols[0], cols[-1]


def trim(raster: DataArray, values=(np.nan,), name: str = "trim"):
    """Drop edge rows/cols that contain only the given values.

    Matches the reference's strict-equality semantics (zonal.py:1652-1733):
    NaN entries never compare equal, so NaN is only trimmed via actual
    value matches.
    """
    data = np.asarray(raster.data)
    nodata = np.zeros(data.shape, dtype=bool)
    for v in values:
        nodata |= (data == v)
    extent = _edge_extent(~nodata)
    if extent is None:
        arr = raster[0:0, 0:0]
    else:
        top, bottom, left, right = extent
        arr = raster[top:bottom + 1, left:right + 1]
    arr.name = name
    return arr


def crop(zones: DataArray, values: DataArray, zones_ids,
         name: str = "crop"):
    """Crop `values` to the bounding box of cells whose zone is in
    `zones_ids` (reference zonal.py:1846-1940)."""
    data = np.asarray(zones.data)
    keep = np.zeros(data.shape, dtype=bool)
    for v in zones_ids:
        keep |= (data == v)
    extent = _edge_extent(keep)
    if extent is None:
        arr = values[0:0, 0:0]
    else:
        top, bottom, left, right = extent
        arr = values[top:bottom + 1, left:right + 1]
    arr.name = name
    return arr


def get_full_extent(crs: str):
    """Full extent of a map projection ('Mercator' or 'Geographic')."""
    crs_codes = {
        "Mercator": ((-20e6, 20e6), (-20e6, 20e6)),
        "Geographic": ((-180, 180), (-90, 90)),
    }
    return crs_codes[crs]


def suggest_zonal_canvas(
    smallest_area: Union[int, float],
    x_range: Union[tuple, list],
    y_range: Union[tuple, list],
    crs: str = "Mercator",
    min_pixels: int = 25,
) -> tuple:
    """Canvas (height, width) so the smallest polygon rasterizes with at
    least `min_pixels` (reference zonal.py:1304-1404)."""
    full_xrange, full_yrange = get_full_extent(crs)
    xmin, xmax = full_xrange
    ymin, ymax = full_yrange
    aspect_ratio = (xmax - xmin) / (ymax - ymin)
    pixel_area = smallest_area / min_pixels
    total_area = (xmax - xmin) * (ymax - ymin)
    total_pixels = total_area / pixel_area
    h = sqrt(total_pixels / aspect_ratio)
    w = aspect_ratio * h
    canvas_h = int(h * (y_range[1] - y_range[0]) / (ymax - ymin))
    canvas_w = int(w * (x_range[1] - x_range[0]) / (xmax - xmin))
    return canvas_h, canvas_w
