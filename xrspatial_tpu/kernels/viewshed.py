"""Viewshed: GRASS r.viewshed semantics, reformulated data-parallel.

The reference (``xrspatial/viewshed.py``) runs Kreveld's radial sweep with a
flat-array red-black tree (viewshed.py:63-1502) — inherently sequential.
This module computes the *same* visibility predicate pairwise, fully
vectorized: a cell C is visible iff no cell B that is closer to the
viewpoint and whose angular span (enter/exit corner angles,
viewshed.py:909-1028) covers C's center angle has an interpolated gradient
(piecewise-linear between enter/center/exit gradients,
viewshed.py:430-449) above C's gradient.  This is exactly the predicate
the sweep's status structure evaluates at every CENTER event
(viewshed.py:1485-1502), without the tree.

Work is O(N^2) over cells, evaluated in target-row chunks on the VPU —
practical to ~1k^2 rasters on a TPU chip; larger rasters trade exactness
for the O(N * rays) batched line-of-sight variant (future work, same
module).

float64 throughout (reference contract, viewshed.py:1549-1561).
"""

from __future__ import annotations

from functools import partial
from math import pi as PI

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["viewshed_grid", "INVISIBLE"]

INVISIBLE = -1


def _calculate_angle(ex, ey, vx, vy, xp=jnp):
    """Vectorized port of viewshed.py:1030-1062 (angle in [0, 2pi)).

    `xp` selects the array module: attrs are computed ONCE on the host in
    numpy float64 (shared verbatim by the pairwise oracle and the exact
    bucket-LOS path, so their agreement is bit-level by construction).
    """
    ang = xp.arctan(xp.abs(ey - vy) / xp.where(ex == vx, 1.0,
                                               xp.abs(ex - vx)))
    q1 = (ex > vx) & (ey < vy)
    q2 = (vx > ex) & (vy > ey)
    q3 = (vx > ex) & (vy < ey)
    q4 = (vx < ex) & (vy < ey)
    out = xp.where(q1, ang,
          xp.where(q2, PI - ang,
          xp.where(q3, PI + ang,
          xp.where(q4, 2.0 * PI - ang, 0.0))))
    out = xp.where((vx == ex) & (vy > ey), PI / 2.0, out)
    out = xp.where((vx == ex) & (vy < ey), 3.0 * PI / 2.0, out)
    out = xp.where((vy == ey) & (ex > vx), 0.0, out)
    out = xp.where((vy == ey) & (vx > ex), PI, out)
    out = xp.where((ex == vx) & (ey == vy), 0.0, out)
    return out


def _corner_offsets(rows, cols, vp_row, vp_col, xp=jnp):
    """(enter_dy, enter_dx, exit_dy, exit_dx) per cell — vectorized
    viewshed.py:909-1028 quadrant table."""
    jnp = xp  # noqa: F841 — body below uses the module-agnostic alias
    north = rows < vp_row
    south = rows > vp_row
    west = cols < vp_col
    east = cols > vp_col
    same_row = rows == vp_row
    same_col = cols == vp_col

    # enter corner
    e_dy = jnp.where(north & west, -0.5,
            jnp.where(north & same_col, 0.5,
            jnp.where(north & east, 0.5,
            jnp.where(same_row & east, 0.5,
            jnp.where(south & east, 0.5,
            jnp.where(south & same_col, -0.5,
            jnp.where(south & west, -0.5,
            jnp.where(same_row & west, -0.5, 0.0))))))))
    e_dx = jnp.where(north & west, 0.5,
            jnp.where(north & same_col, 0.5,
            jnp.where(north & east, 0.5,
            jnp.where(same_row & east, -0.5,
            jnp.where(south & east, -0.5,
            jnp.where(south & same_col, -0.5,
            jnp.where(south & west, -0.5,
            jnp.where(same_row & west, 0.5, 0.0))))))))
    # exit corner
    x_dy = jnp.where(north & west, 0.5,
            jnp.where(north & same_col, 0.5,
            jnp.where(north & east, -0.5,
            jnp.where(same_row & east, -0.5,
            jnp.where(south & east, -0.5,
            jnp.where(south & same_col, -0.5,
            jnp.where(south & west, 0.5,
            jnp.where(same_row & west, 0.5, 0.0))))))))
    x_dx = jnp.where(north & west, -0.5,
            jnp.where(north & same_col, -0.5,
            jnp.where(north & east, -0.5,
            jnp.where(same_row & east, -0.5,
            jnp.where(south & east, 0.5,
            jnp.where(south & same_col, 0.5,
            jnp.where(south & west, 0.5,
            jnp.where(same_row & west, 0.5, 0.0))))))))
    return e_dy, e_dx, x_dy, x_dx


def _np_rects(h, w, vp_row, vp_col):
    """The 3x3 rectangle partition of the grid around the viewpoint:
    row bands [0, vp), [vp, vp+1), (vp, h) x same for columns.  Every
    quadrant mask in the attrs helpers is a union of these rectangles,
    so the host fast paths below can replace full-array `where` chains
    (~30 memory passes at 2048^2, the real cost — numpy's arctan of
    4.2M cells is only ~20 ms) with slab writes, bit-identically."""
    r = (slice(0, vp_row), slice(vp_row, vp_row + 1), slice(vp_row + 1, h))
    c = (slice(0, vp_col), slice(vp_col, vp_col + 1), slice(vp_col + 1, w))
    return r, c


def _calculate_angle_np(drows, dcols):
    """Host fast path of `_calculate_angle` — identical values, masked
    writes instead of the 9-deep where chain.  ``drows``/``dcols`` are
    ey - vy and ex - vx; all quantities are exact half-integers in f64
    so the pre-subtraction loses nothing."""
    h, w = drows.shape
    ex_eq = dcols == 0.0
    ang = np.arctan(np.abs(drows) / np.where(ex_eq, 1.0, np.abs(dcols)))

    out = np.zeros((h, w), dtype=np.float64)
    q1 = (dcols > 0) & (drows < 0)
    q2 = (dcols < 0) & (drows < 0)
    q3 = (dcols < 0) & (drows > 0)
    q4 = (dcols > 0) & (drows > 0)
    out[q1] = ang[q1]
    out[q2] = PI - ang[q2]
    out[q3] = PI + ang[q3]
    out[q4] = 2.0 * PI - ang[q4]
    out[ex_eq & (drows < 0)] = PI / 2.0
    out[ex_eq & (drows > 0)] = 3.0 * PI / 2.0
    ey_eq = drows == 0.0
    out[ey_eq & (dcols > 0)] = 0.0
    out[ey_eq & (dcols < 0)] = PI
    out[ex_eq & ey_eq] = 0.0
    return out


def _corner_offsets_np(h, w, vp_row, vp_col):
    """Host fast path of `_corner_offsets`: the quadrant table written
    as 9 rectangle slabs per plane (bit-identical constants)."""
    r, c = _np_rects(h, w, vp_row, vp_col)
    planes = []
    # per-plane constants in (north, same_row, south) x (west, same_col,
    # east) order, transcribed from the generic where chain
    tables = (
        ((-0.5, 0.5, 0.5), (-0.5, 0.0, 0.5), (-0.5, -0.5, 0.5)),   # e_dy
        ((0.5, 0.5, 0.5), (0.5, 0.0, -0.5), (-0.5, -0.5, -0.5)),   # e_dx
        ((0.5, 0.5, -0.5), (0.5, 0.0, -0.5), (0.5, -0.5, -0.5)),   # x_dy
        ((-0.5, -0.5, -0.5), (0.5, 0.0, -0.5), (0.5, 0.5, 0.5)),   # x_dx
    )
    for tab in tables:
        plane = np.empty((h, w), dtype=np.float64)
        for i in range(3):
            for j in range(3):
                plane[r[i], c[j]] = tab[i][j]
        planes.append(plane)
    return tuple(planes)


def _corner_elev_np(data, vp_row, vp_col, enter, pad=None):
    """Host fast path of `_corner_elev`: the (sy, sx) selection masks
    are a 4-rectangle pinwheel around the viewpoint, so the 4-neighbor
    corner average is computed once per cell on its own slab (the
    generic path evaluates it 4x over the full array and selects).
    ``enter`` picks the enter- vs exit-corner pinwheel orientation;
    ``pad`` optionally supplies the NaN-padded plane."""
    h, w = data.shape
    p = np.pad(data, 1, constant_values=np.nan) if pad is None else pad
    out = data.copy()  # covers the viewpoint cell (zero offsets)
    vr, vc = vp_row, vp_col
    if enter:
        # (sy,sx) -> rect: NW+W, N+NE, E+SE, S+SW
        rects = (((-1, 1), (0, vr + 1, 0, vc)),
                 ((1, 1), (0, vr, vc, w)),
                 ((1, -1), (vr, h, vc + 1, w)),
                 ((-1, -1), (vr + 1, h, 0, vc + 1)))
    else:
        # exit corner: NW+N, NE+E, SE+S, SW+W
        rects = (((1, -1), (0, vr, 0, vc + 1)),
                 ((-1, -1), (0, vr + 1, vc + 1, w)),
                 ((-1, 1), (vr + 1, h, vc, w)),
                 ((1, 1), (vr, h, 0, vc)))
    for (sy, sx), (r0, r1, c0, c1) in rects:
        if r0 >= r1 or c0 >= c1:
            continue
        center = data[r0:r1, c0:c1]
        diag = p[1 + sy + r0:1 + sy + r1, 1 + sx + c0:1 + sx + c1]
        vert = p[1 + sy + r0:1 + sy + r1, 1 + c0:1 + c1]
        horiz = p[1 + r0:1 + r1, 1 + sx + c0:1 + sx + c1]
        avg = (diag + vert + horiz + center) / 4.0
        out[r0:r1, c0:c1] = np.where(np.isnan(avg), center, avg)
    return out


def _corner_diffs_np(d2, vp_row, vp_col, enter=True, pad=None):
    """`_corner_elev_np` evaluated on a difference plane (elev -
    vp_elev): same pinwheel rectangles and (diag+vert+horiz+center)/4
    association, but averaging DIFFS — equal to avg-then-subtract up to
    f64 association ulps.  Only the interval screen consumes this (its
    tolerance bands dominate the drift by >10^4); the exact f64 oracle
    paths keep `_corner_elev_np` on raw elevations.  ``pad`` optionally
    shares the NaN-padded plane between the enter/exit calls (a 1 GB
    allocation at 4096^2)."""
    return _corner_elev_np(d2, vp_row, vp_col, enter=enter, pad=pad)


def _gradient_np(dy_px, dx_px, elev, vp_elev, ew_res, ns_res, vp_cell):
    """Host fast path of `_gradient`: same formula evaluated with
    in-place ufuncs, the d2 == 0 guard applied as a scalar fix at
    ``vp_cell`` — for every caller the pixel offsets are zero ONLY at
    the viewpoint (corner offsets are +-0.5 everywhere else), so the
    generic path's two full-array wheres reduce to one cell."""
    diff = elev - vp_elev
    d2 = dx_px * ew_res
    d2 *= d2
    t = dy_px * ns_res
    t *= t
    d2 += t
    r, c = vp_cell
    d2[r, c] = 1.0
    np.sqrt(d2, out=d2)
    np.divide(diff, d2, out=d2)
    grad = np.arctan(d2, out=d2)
    grad[r, c] = np.sign(diff[r, c]) * (PI / 2.0)
    return grad


def _corner_elev(data, dy_sign, dx_sign, xp=jnp):
    """Mean of the 4 cells sharing the corner at (row+dy, col+dx); falls
    back to the cell's own value when any of the 4 is OOB/NaN
    (viewshed.py:885-905)."""
    jnp = xp  # noqa: F841 — module-agnostic alias (static shifts only)
    h, w = data.shape
    if xp is np:
        p = np.pad(data, 1, constant_values=np.nan)
    else:
        p = xp.pad(data, 1, constant_values=xp.nan)
    center = data

    def nb(dy, dx):
        return p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    out = jnp.full((h, w), jnp.nan)
    for sy in (-1, 1):
        for sx in (-1, 1):
            diag = nb(sy, sx)
            vert = nb(sy, 0)
            horiz = nb(0, sx)
            avg = (diag + vert + horiz + center) / 4.0
            avg = jnp.where(jnp.isnan(avg), center, avg)
            sel = (dy_sign == sy * 0.5) & (dx_sign == sx * 0.5)
            out = jnp.where(sel, avg, out)
    return jnp.where((dy_sign == 0.0) & (dx_sign == 0.0), center, out)


def _gradient(dy_px, dx_px, elev, vp_elev, ew_res, ns_res, xp=jnp):
    """atan((elev - vp_elev)/dist); +-pi/2 at the viewpoint
    (viewshed.py:1072-1096)."""
    diff = elev - vp_elev
    d2 = (dx_px * ew_res) ** 2 + (dy_px * ns_res) ** 2
    grad = xp.arctan(diff / xp.sqrt(xp.where(d2 == 0, 1.0, d2)))
    at_vp = d2 == 0
    return xp.where(at_vp, xp.sign(diff) * PI / 2.0, grad)


def _interp_blocked_max(al, key_t, idx_t, key_b, a0, a1, a2, g0, g1, g2,
                        valid_b, idx_b):
    """Max interpolated blocker gradient per target — the GRASS status-
    structure query (reference viewshed.py:1485-1491), evaluated for a
    (C, 1) column of targets against an (E,)/(1, E) row of candidate
    blockers.  Shared verbatim by the pairwise oracle and the exact
    bucket-LOS path so both compute bit-identical results: the candidate
    SET may differ (the bucket path evaluates a conservative superset of
    the covering cells) but inactive candidates contribute -inf and the
    float max is order-independent."""
    two_pi = 2.0 * PI
    crossing = a0 > a2
    cover = jnp.where(crossing,
                      (al > a0) | (al < a2),
                      (al > a0) & (al < a2))
    closer = key_b < key_t
    not_self = idx_b != idx_t
    active = cover & closer & not_self & valid_b

    # interpolation in unwrapped angle coordinates
    a1e = jnp.where(crossing & (a1 < a0), a1 + two_pi, a1)
    a2e = jnp.where(crossing & (a2 < a0), a2 + two_pi, a2)
    ale = jnp.where(crossing & (al < a0), al + two_pi, al)

    seg1 = ale < a1e
    seg2 = ale > a1e
    d10 = jnp.where(a1e != a0, a1e - a0, 1.0)
    d21 = jnp.where(a2e != a1e, a2e - a1e, 1.0)
    gi = jnp.where(
        seg1, g1 + (g0 - g1) * (a1e - ale) / d10,
        jnp.where(seg2,
                  g1 + (g2 - g1) * (ale - a1e) / d21,
                  g1))
    gi = jnp.where(active, gi, -jnp.inf)
    return jnp.max(gi, axis=1)


@partial(jax.jit, static_argnames=("chunk",))
def _pairwise_visibility(key, a0, a1, a2, g0, g1, g2, grad_t, is_vp,
                         chunk=256):
    """max blocked gradient per cell -> visibility comparison.

    All inputs flat (N,).  Evaluated in chunks of targets against all
    potential blockers.
    """
    n = key.shape[0]

    # blocker invalid if its gradients are NaN (NODATA never blocks,
    # matching NaN-comparison semantics in the sweep)
    valid_b = jnp.isfinite(g1) & ~is_vp

    def chunk_max(alpha_c, key_c, idx_c):
        # (C, N) interactions
        return _interp_blocked_max(
            alpha_c[:, None], key_c[:, None], idx_c[:, None],
            key[None], a0[None], a1[None], a2[None],
            g0[None], g1[None], g2[None], valid_b[None],
            jnp.arange(n)[None])

    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    alpha_p = jnp.pad(a1, (0, n_pad - n))
    key_p = jnp.pad(key, (0, n_pad - n))
    idx_p = jnp.pad(jnp.arange(n), (0, n_pad - n), constant_values=-1)

    blocked = jax.lax.map(
        lambda args: chunk_max(*args),
        (alpha_p.reshape(n_chunks, chunk), key_p.reshape(n_chunks, chunk),
         idx_p.reshape(n_chunks, chunk)))
    blocked = blocked.reshape(n_pad)[:n]
    return blocked <= grad_t


def cell_attrs_host(data_np, vp_row: int, vp_col: int, observer_elev: float,
                    target_elev: float, ew_res: float, ns_res: float):
    """All per-cell predicate attributes, computed ONCE on the host in
    numpy float64 — the single source both exact paths consume.

    Returns a dict of flat (N,) float64 arrays: key (squared weighted
    distance), a0/a1/a2 (enter/center/exit angles), g0/g1/g2 (gradients),
    grad_t (target gradient), plus is_vp / valid_b masks.
    """
    data = np.asarray(data_np, dtype=np.float64)
    h, w = data.shape
    vp_elev = data[vp_row, vp_col] + observer_elev

    # every coordinate below is an exact half-integer in f64, so the
    # slab-written fast paths (_*_np) produce bit-identical values to
    # the generic xp= helpers regardless of association order — pinned
    # by tests/test_viewshed.py::test_attrs_fast_paths_bitwise
    dr = np.arange(h, dtype=np.float64) - np.float64(vp_row)
    dc = np.arange(w, dtype=np.float64) - np.float64(vp_col)
    drow = np.broadcast_to(dr[:, None], (h, w))
    dcol = np.broadcast_to(dc[None, :], (h, w))

    e_dy, e_dx, x_dy, x_dx = _corner_offsets_np(h, w, vp_row, vp_col)
    enter_elev = _corner_elev_np(data, vp_row, vp_col, enter=True)
    exit_elev = _corner_elev_np(data, vp_row, vp_col, enter=False)
    # corner-relative coordinate grids (reuse the offset buffers)
    e_dy += dr[:, None]
    e_dx += dc[None, :]
    x_dy += dr[:, None]
    x_dx += dc[None, :]

    # angles: note _calculate_angle takes (x, y) with y as ROW index and
    # "north" = smaller row
    with np.errstate(invalid="ignore"):
        a0 = _calculate_angle_np(e_dy, e_dx)
        a1 = _calculate_angle_np(drow, dcol)
        a2 = _calculate_angle_np(x_dy, x_dx)

        vp_cell = (vp_row, vp_col)
        g0 = _gradient_np(e_dy, e_dx, enter_elev, vp_elev, ew_res, ns_res,
                          vp_cell)
        g1 = _gradient_np(drow, dcol, data, vp_elev, ew_res, ns_res,
                          vp_cell)
        g2 = _gradient_np(x_dy, x_dx, exit_elev, vp_elev, ew_res, ns_res,
                          vp_cell)
        grad_t = _gradient_np(drow, dcol, data + target_elev,
                              vp_elev, ew_res, ns_res, vp_cell)

    key = (dc * ew_res) ** 2 + ((dr * ns_res) ** 2)[:, None]
    is_vp = np.zeros((h, w), dtype=bool)
    is_vp[vp_row, vp_col] = True
    valid_b = np.isfinite(g1)
    valid_b[vp_row, vp_col] = False
    return {
        "key": key.ravel(), "a0": a0.ravel(), "a1": a1.ravel(),
        "a2": a2.ravel(), "g0": g0.ravel(), "g1": g1.ravel(),
        "g2": g2.ravel(), "grad_t": grad_t.ravel(),
        "is_vp": is_vp.ravel(), "valid_b": valid_b.ravel(),
        "vp_elev": vp_elev, "shape": (h, w),
    }


def cell_attrs_subset(data_np, flat_idx, vp_row: int, vp_col: int,
                      observer_elev: float, target_elev: float,
                      ew_res: float, ns_res: float):
    """f64 predicate attributes at SCATTERED flat indices — bit-identical
    per element to `cell_attrs_host` (pinned by
    tests/test_viewshed.py::test_attrs_subset_bitwise), at O(|subset|)
    cost.  The f64 re-evaluation of screen-ambiguous targets only needs
    attrs at its gathered candidate/target positions, so computing the
    full planes (seconds at 4096^2 on a 1-cpu host) is wasted work.
    """
    return cell_attrs_subset_fn(data_np, vp_row, vp_col, observer_elev,
                                target_elev, ew_res, ns_res)(flat_idx)


def cell_attrs_subset_fn(data_np, vp_row: int, vp_col: int,
                         observer_elev: float, target_elev: float,
                         ew_res: float, ns_res: float):
    """Factory form of `cell_attrs_subset`: pads the elevation grid once
    and returns ``fn(flat_idx) -> attrs dict`` for repeated gathered
    lookups (one per candidate tier plus the target side)."""
    data = np.asarray(data_np, dtype=np.float64)
    h, w = data.shape
    p = np.pad(data, 1, constant_values=np.nan)
    vp_elev = data[vp_row, vp_col] + observer_elev

    def fn(flat_idx):
        return _cell_attrs_at(data, p, flat_idx, vp_row, vp_col, vp_elev,
                              target_elev, ew_res, ns_res)

    return fn


def _cell_attrs_at(data, p, flat_idx, vp_row, vp_col, vp_elev,
                   target_elev, ew_res, ns_res):
    h, w = data.shape
    idx = np.asarray(flat_idx, dtype=np.int64)
    rows, cols = np.divmod(idx, w)

    dr = rows.astype(np.float64) - np.float64(vp_row)
    dc = cols.astype(np.float64) - np.float64(vp_col)

    # corner offsets via the same 3x3 quadrant tables as
    # _corner_offsets_np (band index 0/1/2 = north/same/south etc.)
    bi = (rows >= vp_row).astype(np.int64) + (rows > vp_row)
    bj = (cols >= vp_col).astype(np.int64) + (cols > vp_col)
    tables = (
        ((-0.5, 0.5, 0.5), (-0.5, 0.0, 0.5), (-0.5, -0.5, 0.5)),   # e_dy
        ((0.5, 0.5, 0.5), (0.5, 0.0, -0.5), (-0.5, -0.5, -0.5)),   # e_dx
        ((0.5, 0.5, -0.5), (0.5, 0.0, -0.5), (0.5, -0.5, -0.5)),   # x_dy
        ((-0.5, -0.5, -0.5), (0.5, 0.0, -0.5), (0.5, 0.5, 0.5)),   # x_dx
    )
    e_dy, e_dx, x_dy, x_dx = (np.asarray(t, dtype=np.float64)[bi, bj]
                              for t in tables)
    e_dy = e_dy + dr
    e_dx = e_dx + dc
    x_dy = x_dy + dr
    x_dx = x_dx + dc

    # enter/exit corner elevations: the pinwheel (sy, sx) selection of
    # _corner_elev_np, evaluated per element with the identical
    # (diag + vert + horiz + center) / 4 association
    center = data[rows, cols]

    def corner(enter):
        if enter:
            sy = np.where(rows <= vp_row,
                          np.where(cols < vp_col, -1,
                                   np.where(rows < vp_row, 1,
                                            np.where(cols >= vp_col + 1,
                                                     1, -1))),
                          np.where(cols >= vp_col + 1, 1, -1))
            sx = np.where((rows <= vp_row) & (cols < vp_col), 1,
                          np.where((rows < vp_row) & (cols >= vp_col), 1,
                                   -1))
        else:
            sy = np.where((rows < vp_row) & (cols <= vp_col), 1,
                          np.where((rows <= vp_row) & (cols > vp_col), -1,
                                   np.where((rows > vp_row)
                                            & (cols >= vp_col), -1, 1)))
            sx = np.where((rows < vp_row) & (cols <= vp_col), -1,
                          np.where((rows <= vp_row) & (cols > vp_col), -1,
                                   np.where((rows > vp_row)
                                            & (cols >= vp_col), 1, 1)))
        diag = p[1 + rows + sy, 1 + cols + sx]
        vert = p[1 + rows + sy, 1 + cols]
        horiz = p[1 + rows, 1 + cols + sx]
        avg = (diag + vert + horiz + center) / 4.0
        out = np.where(np.isnan(avg), center, avg)
        return np.where((rows == vp_row) & (cols == vp_col), center, out)

    enter_elev = corner(True)
    exit_elev = corner(False)

    def angle(drows, dcols):
        ex_eq = dcols == 0.0
        ang = np.arctan(np.abs(drows) / np.where(ex_eq, 1.0,
                                                 np.abs(dcols)))
        out = np.zeros(idx.shape, dtype=np.float64)
        out[(dcols > 0) & (drows < 0)] = ang[(dcols > 0) & (drows < 0)]
        q2 = (dcols < 0) & (drows < 0)
        q3 = (dcols < 0) & (drows > 0)
        q4 = (dcols > 0) & (drows > 0)
        out[q2] = PI - ang[q2]
        out[q3] = PI + ang[q3]
        out[q4] = 2.0 * PI - ang[q4]
        out[ex_eq & (drows < 0)] = PI / 2.0
        out[ex_eq & (drows > 0)] = 3.0 * PI / 2.0
        ey_eq = drows == 0.0
        out[ey_eq & (dcols > 0)] = 0.0
        out[ey_eq & (dcols < 0)] = PI
        out[ex_eq & ey_eq] = 0.0
        return out

    at_vp = (rows == vp_row) & (cols == vp_col)

    def gradient(dy_px, dx_px, elev):
        diff = elev - vp_elev
        d2 = dx_px * ew_res
        d2 = d2 * d2
        t = dy_px * ns_res
        t = t * t
        d2 = d2 + t
        d2 = np.where(at_vp, 1.0, d2)
        grad = np.arctan(diff / np.sqrt(d2))
        return np.where(at_vp, np.sign(diff) * (PI / 2.0), grad)

    with np.errstate(invalid="ignore"):
        a0 = angle(e_dy, e_dx)
        a1 = angle(dr, dc)
        a2 = angle(x_dy, x_dx)
        g0 = gradient(e_dy, e_dx, enter_elev)
        g1 = gradient(dr, dc, center)
        g2 = gradient(x_dy, x_dx, exit_elev)
        grad_t = gradient(dr, dc, center + target_elev)

    key = (dc * ew_res) ** 2 + (dr * ns_res) ** 2
    valid_b = np.isfinite(g1)
    valid_b[at_vp] = False
    return {
        "key": key, "a0": a0, "a1": a1, "a2": a2,
        "g0": g0, "g1": g1, "g2": g2, "grad_t": grad_t,
        "is_vp": at_vp, "valid_b": valid_b,
        "vp_elev": vp_elev, "shape": (h, w),
    }


@partial(jax.jit, static_argnames=("shape",))
def _visibility_epilogue(data, visible, vp_elev, vp_row, vp_col,
                         target_elev, ew_res, ns_res, shape):
    """Vertical angle for visible cells (viewshed.py:1257-1273)."""
    h, w = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float64)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float64)
    vp_r = vp_row.astype(jnp.float64)
    vp_c = vp_col.astype(jnp.float64)
    key = ((cols - vp_c) * ew_res) ** 2 + ((rows - vp_r) * ns_res) ** 2
    is_vp = (rows == vp_r) & (cols == vp_c)

    diff = vp_elev - (data + target_elev)
    dist = jnp.sqrt(jnp.where(key == 0, 1.0, key))
    vert = jnp.where(
        diff == 0.0, 90.0,
        jnp.where(diff > 0, jnp.arctan(dist / jnp.where(diff == 0, 1.0,
                                                        diff)) * 180.0 / PI,
                  jnp.arctan(jnp.abs(diff) / dist) * 180.0 / PI + 90.0))
    out = jnp.where(visible, vert, float(INVISIBLE))
    return jnp.where(is_vp, 180.0, out)


def viewshed_grid(data, vp_row: int, vp_col: int, observer_elev: float,
                  target_elev: float, ew_res: float, ns_res: float):
    """Visibility grid (vertical angles, INVISIBLE=-1, viewpoint=180).

    Exact GRASS predicate, evaluated PAIRWISE (every target against all
    cells) — the small-raster exact path; the bucket-LOS variant in
    viewshed_exact.py computes the identical result at ~N^1.5 cost.
    """
    data_np = np.asarray(data, dtype=np.float64)
    at = cell_attrs_host(data_np, vp_row, vp_col, observer_elev,
                         target_elev, ew_res, ns_res)
    h, w = at["shape"]
    visible = _pairwise_visibility(
        jnp.asarray(at["key"]), jnp.asarray(at["a0"]),
        jnp.asarray(at["a1"]), jnp.asarray(at["a2"]),
        jnp.asarray(at["g0"]), jnp.asarray(at["g1"]),
        jnp.asarray(at["g2"]), jnp.asarray(at["grad_t"]),
        jnp.asarray(at["is_vp"])).reshape(h, w)
    return _visibility_epilogue(jnp.asarray(data_np), visible,
                                jnp.float64(at["vp_elev"]),
                                jnp.int32(vp_row), jnp.int32(vp_col),
                                jnp.float64(target_elev),
                                jnp.float64(ew_res), jnp.float64(ns_res),
                                (h, w))


# ---------------------------------------------------------------------------
# XDraw wavefront variant - O(N * max_dim) with SHIFT-only memory access
# (per-element gathers are pathological on TPU; XDraw's inward-neighbor
# interpolation needs only 3x3 shifted reads of the running max-slope)
# ---------------------------------------------------------------------------


def _shift(arr, dy, dx, fill):
    h, w = arr.shape
    py0, py1 = max(-dy, 0), max(dy, 0)
    px0, px1 = max(-dx, 0), max(dx, 0)
    p = jnp.pad(arr, ((py0, py1), (px0, px1)), constant_values=fill)
    return p[py0 + dy:py0 + dy + h, px0 + dx:px0 + dx + w]


@partial(jax.jit, static_argnames=("shape",))
def _viewshed_xdraw_impl(data, vp_row, vp_col, observer_elev, target_elev,
                         ew_res, ns_res, shape):
    """XDraw: rings of Chebyshev distance k are processed outward; each
    cell interpolates the max slope-to-viewpoint of its two inward
    neighbors along the ray.  All memory access is via 3x3 shifts.
    """
    h, w = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    vp_r = vp_row.astype(jnp.float32)
    vp_c = vp_col.astype(jnp.float32)
    vp_elev = (data[vp_row, vp_col] + observer_elev).astype(jnp.float32)

    dy = rows - vp_r
    dx = cols - vp_c
    ady = jnp.abs(dy)
    adx = jnp.abs(dx)
    ring = jnp.maximum(ady, adx).astype(jnp.int32)

    wx = dx * ew_res
    wy = dy * ns_res
    dist_w = jnp.sqrt(wx * wx + wy * wy)
    safe_d = jnp.maximum(dist_w, 1e-12)
    slope_self = (data - vp_elev) / safe_d          # blocker slope
    slope_tgt = (data + target_elev - vp_elev) / safe_d

    # inward neighbor pair: primary = one step toward the vp along the
    # dominant axis; secondary = primary plus one step on the minor axis.
    sy = jnp.sign(dy)
    sx = jnp.sign(dx)
    dom_y = ady >= adx
    p_dy = jnp.where(dom_y, -sy, 0.0)
    p_dx = jnp.where(dom_y, 0.0, -sx)
    s_dy = -sy
    s_dx = -sx
    # interpolation weight of the secondary neighbor: the ray crosses ring
    # k-1 at minor coordinate m* = minor*(k-1)/k, which lies between the
    # secondary (minor-1) and primary (minor) neighbors; linear
    # interpolation puts weight (minor - m*) = minor/k on the secondary
    denom = jnp.maximum(jnp.maximum(ady, adx), 1.0)
    minor = jnp.minimum(ady, adx)
    use_sec = jnp.where(dom_y, adx > 0, ady > 0)
    wsec = jnp.where(use_sec, minor / denom, 0.0)

    neginf = jnp.float32(-jnp.inf)

    def shifted_for(offs_dy, offs_dx, m):
        """m shifted so each cell reads m[cell + (offs_dy, offs_dx)] for its
        own (sign-dependent) offsets — selected from the 8 static shifts."""
        out = jnp.full((h, w), neginf)
        for ody in (-1, 0, 1):
            for odx in (-1, 0, 1):
                if ody == 0 and odx == 0:
                    continue
                sel = (offs_dy == ody) & (offs_dx == odx)
                out = jnp.where(sel, _shift(m, ody, odx, neginf), out)
        return out

    max_k = int(np.maximum(h, w))

    def body(k, m):
        mp = shifted_for(p_dy, p_dx, m)
        ms = shifted_for(s_dy, s_dx, m)
        both = jnp.isfinite(mp) & jnp.isfinite(ms)
        interp = jnp.where(both, mp * (1.0 - wsec) + ms * wsec,
                           jnp.maximum(mp, ms))
        on_ring = ring == k
        blocked_slope = jnp.where(k == 1, neginf, interp)
        new_m = jnp.maximum(blocked_slope, slope_self)
        return jnp.where(on_ring, new_m, m)

    init = jnp.full((h, w), neginf)
    init = init.at[vp_row, vp_col].set(-jnp.inf)
    m = jax.lax.fori_loop(1, max_k + 1, body, init)

    # visibility: the max slope of strictly-inward terrain must not exceed
    # the (target-adjusted) slope of the cell
    mp = shifted_for(p_dy, p_dx, m)
    ms = shifted_for(s_dy, s_dx, m)
    both = jnp.isfinite(mp) & jnp.isfinite(ms)
    inward_max = jnp.where(both, mp * (1.0 - wsec) + ms * wsec,
                           jnp.maximum(mp, ms))
    inward_max = jnp.where(ring <= 1, neginf, inward_max)
    visible = inward_max <= slope_tgt

    diff = vp_elev - (data + target_elev)
    vert = jnp.where(
        diff == 0.0, 90.0,
        jnp.where(diff > 0,
                  jnp.arctan(safe_d / jnp.where(diff == 0, 1.0, diff))
                  * 180.0 / PI,
                  jnp.arctan(jnp.abs(diff) / safe_d) * 180.0 / PI + 90.0))
    out = jnp.where(visible, vert, float(INVISIBLE))
    out = jnp.where(jnp.isnan(data), float(INVISIBLE), out)
    is_vp = (rows == vp_r) & (cols == vp_c)
    return jnp.where(is_vp, 180.0, out)




# ---------------------------------------------------------------------------
# Octant-scan XDraw: same recurrence as _viewshed_xdraw_impl but scheduled
# as four lax.scans over half-planes.  Each ring touches only its own
# column/row vector instead of the whole raster: O(N) total work instead
# of O(N * max_dim).  With the corrected interpolation weights the
# diagonal rays depend only on previous diagonal cells, so the half-plane
# scans are self-contained.
# ---------------------------------------------------------------------------


def _halfplane_scan(s_T, dy_vec, vp_minor, n_major):
    """Scan an x-dominant half plane.

    s_T: (W, H) slope values transposed so scan steps walk the major axis;
    column j of the original array is s_T[j].  dy_vec: (H,) minor-axis
    offsets (r - vp_row).  vp_minor: major-axis index of the viewpoint.
    Returns (W, H) M values (max slope along ray, including own cell) for
    cells with dx > 0 in scan direction; -inf elsewhere.
    """
    h = dy_vec.shape[0]
    ady = jnp.abs(dy_vec)
    sy = jnp.sign(dy_vec)
    neginf = jnp.float32(-jnp.inf)

    def step(m_prev, inp):
        s_col, dxf = inp
        mask = (ady <= dxf) & (dxf > 0)
        prim = m_prev
        # secondary: one row toward the vp axis
        up = jnp.concatenate([jnp.full((1,), neginf), m_prev[:-1]])
        down = jnp.concatenate([m_prev[1:], jnp.full((1,), neginf)])
        sec = jnp.where(sy > 0, up, jnp.where(sy < 0, down, prim))
        use_sec = ady > 0
        wsec = jnp.where(use_sec, ady / jnp.maximum(dxf, 1.0), 0.0)
        both = jnp.isfinite(prim) & jnp.isfinite(sec)
        interp = jnp.where(both, prim * (1.0 - wsec) + sec * wsec,
                           jnp.maximum(prim, sec))
        blocked = jnp.where(dxf == 1.0, neginf, interp)
        m_new = jnp.where(mask, jnp.maximum(blocked, s_col), neginf)
        return m_new, m_new

    n_steps = s_T.shape[0]
    dxs = (jnp.arange(n_steps, dtype=jnp.float32)
           - jnp.float32(vp_minor))
    init = jnp.full((h,), neginf)
    _, out = jax.lax.scan(step, init, (s_T, dxs))
    return out


def _halfplane_scan4(slope_self, dy_vec, dx_vec, vp_row, vp_col, shape):
    """All four half-plane scans as ONE lax.scan with a (4, N) carry.

    The four scans are independent and share the step recurrence, so
    stacking them quarters the sequential step count (the scans were the
    whole wall time of the single-device XDraw path; each step is tiny
    VPU work).  Non-square rasters pad to N = max(h, w); padded steps
    and carry lanes produce -inf and are sliced away.
    Returns (m_e, m_w, m_s, m_n) in raster orientation, matching the
    separate `_halfplane_scan` calls bit-for-bit modulo XLA fusion.
    """
    h, w = shape
    n = max(h, w)
    neginf = jnp.float32(-jnp.inf)
    s_T = jnp.swapaxes(slope_self, 0, 1)

    def pad2(a):
        return jnp.pad(a, ((0, n - a.shape[0]), (0, n - a.shape[1])),
                       constant_values=neginf)

    def pad1(v):
        # padded minor offsets: huge |offset| -> never inside the mask
        return jnp.pad(v, (0, n - v.shape[0]),
                       constant_values=jnp.float32(3 * n))

    seq = jnp.stack([pad2(s_T), pad2(s_T[::-1]),
                     pad2(slope_self), pad2(slope_self[::-1])], axis=1)
    minor = jnp.stack([pad1(dy_vec), pad1(dy_vec),
                       pad1(dx_vec), pad1(dx_vec)])           # (4, N)
    vpm = jnp.stack([vp_col.astype(jnp.float32),
                     jnp.float32(w - 1) - vp_col.astype(jnp.float32),
                     vp_row.astype(jnp.float32),
                     jnp.float32(h - 1) - vp_row.astype(jnp.float32)])

    ady = jnp.abs(minor)
    sy = jnp.sign(minor)
    use_sec = ady > 0

    def step(m_prev, inp):
        s_t, dxf = inp                 # (4, N), (4, 1)
        mask = (ady <= dxf) & (dxf > 0)
        prim = m_prev
        up = jnp.concatenate([jnp.full((4, 1), neginf), m_prev[:, :-1]], 1)
        down = jnp.concatenate([m_prev[:, 1:], jnp.full((4, 1), neginf)], 1)
        sec = jnp.where(sy > 0, up, jnp.where(sy < 0, down, prim))
        wsec = jnp.where(use_sec, ady / jnp.maximum(dxf, 1.0), 0.0)
        both = jnp.isfinite(prim) & jnp.isfinite(sec)
        interp = jnp.where(both, prim * (1.0 - wsec) + sec * wsec,
                           jnp.maximum(prim, sec))
        blocked = jnp.where(dxf == 1.0, neginf, interp)
        m_new = jnp.where(mask, jnp.maximum(blocked, s_t), neginf)
        return m_new, m_new

    dxs = (jnp.arange(n, dtype=jnp.float32)[:, None, None]
           - vpm[None, :, None])       # (N, 4, 1)
    init = jnp.full((4, n), neginf)
    _, out = jax.lax.scan(step, init, (seq, dxs))   # (N, 4, N)

    m_e = jnp.swapaxes(out[:w, 0, :h], 0, 1)
    m_w = jnp.swapaxes(out[:w, 1, :h], 0, 1)[:, ::-1]
    m_s = out[:h, 2, :w]
    m_n = out[:h, 3, :w][::-1]
    return m_e, m_w, m_s, m_n


def _xdraw_fields(data, vp_row, vp_col, observer_elev, target_elev,
                  ew_res, ns_res, shape):
    """Shared prologue of the octant-scan paths: per-cell slopes and
    viewpoint-relative geometry."""
    h, w = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    vp_r = vp_row.astype(jnp.float32)
    vp_c = vp_col.astype(jnp.float32)
    vp_elev = (data[vp_row, vp_col] + observer_elev).astype(jnp.float32)

    dy = rows - vp_r
    dx = cols - vp_c
    wx = dx * ew_res
    wy = dy * ns_res
    dist_w = jnp.sqrt(wx * wx + wy * wy)
    safe_d = jnp.maximum(dist_w, 1e-12)
    slope_self = (data - vp_elev) / safe_d
    slope_self = jnp.where(dist_w > 0, slope_self, -jnp.inf)
    slope_tgt = jnp.where(
        dist_w > 0,
        (data + target_elev - vp_elev) / safe_d, jnp.inf)
    dy_vec = (jnp.arange(h, dtype=jnp.float32) - vp_r)
    dx_vec = (jnp.arange(w, dtype=jnp.float32) - vp_c)
    return (dy, dx, safe_d, slope_self, slope_tgt, dy_vec, dx_vec, vp_elev)


def _xdraw_scan_e(slope_self, dy_vec, dx_vec, vp_row, vp_col):
    w = dx_vec.shape[0]
    s_T = jnp.swapaxes(slope_self, 0, 1)
    return jnp.swapaxes(_halfplane_scan(s_T, dy_vec, vp_col, w), 0, 1)


def _xdraw_scan_w(slope_self, dy_vec, dx_vec, vp_row, vp_col):
    w = dx_vec.shape[0]
    s_T = jnp.swapaxes(slope_self, 0, 1)
    return jnp.swapaxes(
        _halfplane_scan(s_T[::-1], dy_vec, w - 1 - vp_col, w), 0, 1)[:, ::-1]


def _xdraw_scan_s(slope_self, dy_vec, dx_vec, vp_row, vp_col):
    h = dy_vec.shape[0]
    return _halfplane_scan(slope_self, dx_vec, vp_row, h)


def _xdraw_scan_n(slope_self, dy_vec, dx_vec, vp_row, vp_col):
    h = dy_vec.shape[0]
    return _halfplane_scan(slope_self[::-1], dx_vec, h - 1 - vp_row, h)[::-1]


_XDRAW_SCANS = (_xdraw_scan_e, _xdraw_scan_w, _xdraw_scan_s, _xdraw_scan_n)


def _xdraw_octant_masks(dy, dx):
    """Disjoint cell->scan assignment matching the combine select."""
    ady = jnp.abs(dy)
    adx = jnp.abs(dx)
    x_dom = adx >= ady
    return (x_dom & (dx >= 0), x_dom & (dx < 0),
            ~x_dom & (dy >= 0), ~x_dom & (dy < 0))


@partial(jax.jit, static_argnames=("shape",))
def _viewshed_xdraw_scan_impl(data, vp_row, vp_col, observer_elev,
                              target_elev, ew_res, ns_res, shape):
    h, w = shape
    (dy, dx, safe_d, slope_self, slope_tgt, dy_vec, dx_vec,
     vp_elev) = _xdraw_fields(data, vp_row, vp_col, observer_elev,
                              target_elev, ew_res, ns_res, shape)
    ady = jnp.abs(dy)
    adx = jnp.abs(dx)

    if max(h, w) <= 8192:
        m_e, m_w, m_s, m_n = _halfplane_scan4(slope_self, dy_vec, dx_vec,
                                              vp_row, vp_col, shape)
    else:
        # the stacked scan materializes a padded (N, 4, N) input stack
        # plus an equally-sized scan output (~2x extra HBM at 16k^2);
        # very large rasters take the four separate scans instead
        m_e, m_w, m_s, m_n = (f(slope_self, dy_vec, dx_vec,
                                vp_row, vp_col) for f in _XDRAW_SCANS)

    x_dom = adx >= ady
    m = jnp.where(x_dom, jnp.where(dx >= 0, m_e, m_w),
                  jnp.where(dy >= 0, m_s, m_n))

    return _xdraw_epilogue(m, data, dy, dx, safe_d, slope_tgt, vp_elev,
                           target_elev, shape)


def _xdraw_epilogue(m, data, dy, dx, safe_d, slope_tgt, vp_elev,
                    target_elev, shape):
    """Combined max-slope field -> visibility + vertical angles."""
    h, w = shape
    ady = jnp.abs(dy)
    adx = jnp.abs(dx)
    # inward max (excluding the cell itself): same interpolation as the
    # ring version's final pass
    sy = jnp.sign(dy)
    sx = jnp.sign(dx)
    dom_y = ady >= adx
    p_dy = jnp.where(dom_y, -sy, 0.0)
    p_dx = jnp.where(dom_y, 0.0, -sx)
    s_dy = -sy
    s_dx = -sx
    denom = jnp.maximum(jnp.maximum(ady, adx), 1.0)
    minor = jnp.minimum(ady, adx)
    use_sec = jnp.where(dom_y, adx > 0, ady > 0)
    wsec = jnp.where(use_sec, minor / denom, 0.0)
    ring = jnp.maximum(ady, adx).astype(jnp.int32)
    neginf = jnp.float32(-jnp.inf)

    def shifted_for(offs_dy, offs_dx, arr):
        out = jnp.full((h, w), neginf)
        for ody in (-1, 0, 1):
            for odx in (-1, 0, 1):
                if ody == 0 and odx == 0:
                    continue
                sel = (offs_dy == ody) & (offs_dx == odx)
                out = jnp.where(sel, _shift(arr, ody, odx, neginf), out)
        return out

    mp = shifted_for(p_dy, p_dx, m)
    ms = shifted_for(s_dy, s_dx, m)
    both = jnp.isfinite(mp) & jnp.isfinite(ms)
    inward_max = jnp.where(both, mp * (1.0 - wsec) + ms * wsec,
                           jnp.maximum(mp, ms))
    inward_max = jnp.where(ring <= 1, neginf, inward_max)
    visible = inward_max <= slope_tgt

    diff = vp_elev - (data + target_elev)
    vert = jnp.where(
        diff == 0.0, 90.0,
        jnp.where(diff > 0,
                  jnp.arctan(safe_d / jnp.where(diff == 0, 1.0, diff))
                  * 180.0 / PI,
                  jnp.arctan(jnp.abs(diff) / safe_d) * 180.0 / PI + 90.0))
    out = jnp.where(visible, vert, float(INVISIBLE))
    out = jnp.where(jnp.isnan(data), float(INVISIBLE), out)
    is_vp = (dy == 0.0) & (dx == 0.0)
    return jnp.where(is_vp, 180.0, out)


def viewshed_grid_los(data, vp_row: int, vp_col: int, observer_elev: float,
                      target_elev: float, ew_res: float, ns_res: float):
    """Wavefront (XDraw) viewshed for large rasters: four octant lax.scans
    (O(N) work) producing the same recurrence as the ring version."""
    data = jnp.asarray(data, dtype=jnp.float32)
    return _viewshed_xdraw_scan_impl(
        data, jnp.int32(vp_row), jnp.int32(vp_col),
        jnp.float32(observer_elev), jnp.float32(target_elev),
        jnp.float32(ew_res), jnp.float32(ns_res), data.shape)


# banded distributed-XDraw depth: each device advances its minor-axis
# shard K major-axis steps between carry-halo refreshes (the recurrence
# couples minor-axis neighbors at most one row per step, so a K-row
# halo refreshed every K steps reproduces the unsharded scan exactly);
# larger K means fewer ppermutes but 2K extra computed rows per device
_BAND_K = 64


def _xdraw_banded_pass(slope, vp_major, vp_minor, n_cells, flat_mesh,
                       K0=_BAND_K):
    """Forward+reverse major-axis half-plane scans with the MINOR axis
    sharded over ``flat_mesh`` — the memory-scaling half of the
    distributed XDraw (each device holds its minor-axis shard plus a
    K-row halo instead of the whole raster).

    slope: (minor, major) f32 plane oriented so scan steps walk axis 1.
    vp_major / vp_minor: (1,) f32 / (1,) f32 viewpoint indices on the
    two axes.  Returns (2, minor, major) M fields (forward, reverse,
    reverse already un-reflected), minor-axis sharded.

    Exactness: within a band of K steps an owned row's dependency cone
    reaches at most K rows across the shard edge; the halo rows are
    refreshed at band start with the neighbor's OWNED carry values
    (which are exact), so every owned output equals the unsharded
    scan's bit-for-bit (identical step arithmetic, identical operand
    values).  Band-padding columns only ever FEED later padding (fwd)
    or enter with the same -inf carry the unsharded scan starts from
    (rev), and padded minor rows are masked out by huge offsets —
    the same arguments `_halfplane_scan4` already relies on."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    hm, wm = slope.shape
    nd = flat_mesh.size
    H_pad = -(-hm // nd) * nd
    Hs = H_pad // nd
    K = max(1, min(K0, Hs))
    W_pad = -(-wm // K) * K
    nb = W_pad // K
    R = Hs + 2 * K
    neginf = jnp.float32(-jnp.inf)
    big = jnp.float32(3 * max(hm, wm))

    sp = jnp.pad(slope, ((0, H_pad - hm), (0, W_pad - wm)),
                 constant_values=neginf)
    sp = jax.lax.with_sharding_constraint(
        sp, NamedSharding(flat_mesh, P("d", None)))
    perm_up = [(i, i + 1) for i in range(nd - 1)]
    perm_dn = [(i + 1, i) for i in range(nd - 1)]

    @partial(shard_map, mesh=flat_mesh,
             in_specs=(P("d", None), P(), P()),
             out_specs=P(None, "d", None), check_rep=False)
    def run(s_own, vp_maj, vp_min):
        vp_maj = vp_maj[0]
        vp_min = vp_min[0]
        d = jax.lax.axis_index("d")

        # one-time slope halo: K owned edge rows from each neighbor
        su = jax.lax.ppermute(s_own[-K:], "d", perm_up)
        sd = jax.lax.ppermute(s_own[:K], "d", perm_dn)
        halo_up = jnp.where(d > 0, su, neginf)
        halo_dn = jnp.where(d < nd - 1, sd, neginf)
        s_ext = jnp.concatenate([halo_up, s_own, halo_dn], axis=0)

        g = d * Hs + jnp.arange(R, dtype=jnp.int32) - K
        minor_off = jnp.where((g >= 0) & (g < hm),
                              g.astype(jnp.float32) - vp_min, big)
        ady = jnp.abs(minor_off)[None]          # (1, R)
        sy = jnp.sign(minor_off)[None]
        use_sec = ady > 0
        vpm = jnp.stack([vp_maj, jnp.float32(W_pad - 1) - vp_maj])

        seq = jnp.stack([s_ext.T, s_ext.T[::-1]])       # (2, W_pad, R)
        xs = jnp.swapaxes(seq, 0, 1).reshape(nb, K, 2, R)

        def step(mm, inp):
            s_t, dxf = inp                       # (2, R), (2, 1)
            mask = (ady <= dxf) & (dxf > 0)
            up = jnp.concatenate(
                [jnp.full((2, 1), neginf), mm[:, :-1]], 1)
            down = jnp.concatenate(
                [mm[:, 1:], jnp.full((2, 1), neginf)], 1)
            sec = jnp.where(sy > 0, up, jnp.where(sy < 0, down, mm))
            wsec = jnp.where(use_sec, ady / jnp.maximum(dxf, 1.0), 0.0)
            both = jnp.isfinite(mm) & jnp.isfinite(sec)
            interp = jnp.where(both, mm * (1.0 - wsec) + sec * wsec,
                               jnp.maximum(mm, sec))
            blocked = jnp.where(dxf == 1.0, neginf, interp)
            m_new = jnp.where(mask, jnp.maximum(blocked, s_t), neginf)
            return m_new, m_new

        def band(m, inp):
            xs_b, b = inp                        # (K, 2, R), scalar
            fu = jax.lax.ppermute(m[:, Hs:Hs + K], "d", perm_up)
            fd = jax.lax.ppermute(m[:, K:2 * K], "d", perm_dn)
            m = m.at[:, :K].set(jnp.where(d > 0, fu, neginf))
            m = m.at[:, K + Hs:].set(jnp.where(d < nd - 1, fd, neginf))
            cols = (b * K + jnp.arange(K, dtype=jnp.float32))
            dxf = cols[:, None, None] - vpm[None, :, None]  # (K, 2, 1)
            m, ys = jax.lax.scan(step, m, (xs_b, dxf))
            return m, ys                         # ys (K, 2, R)

        init = jnp.full((2, R), neginf)
        _, out = jax.lax.scan(
            band, init, (xs, jnp.arange(nb, dtype=jnp.float32)))
        # (nb, K, 2, R) -> (2, Hs, W_pad), owned rows only
        return out.reshape(W_pad, 2, R).transpose(1, 2, 0)[:, K:K + Hs]

    m2 = run(sp, jnp.full((1,), vp_major, jnp.float32),
             jnp.full((1,), vp_minor, jnp.float32))
    fwd = m2[0, :hm, :wm]
    # the reverse lane's step t holds padded column W_pad-1-t, so a
    # flip puts results back in column order; real columns are a prefix
    rev = m2[1, :, ::-1][:hm, :wm]
    return fwd, rev


def viewshed_grid_los_sharded_banded(data, mesh, vp_row: int,
                                     vp_col: int, observer_elev: float,
                                     target_elev: float, ew_res: float,
                                     ns_res: float):
    """Memory-scaling mesh-distributed XDraw: all four octant scans are
    SHARDED along their minor axis over every device of the mesh
    (`_xdraw_banded_pass`), replacing the replicate-whole-raster scheme
    — per-device footprint is the shard plus a K-row band halo, and
    per-device scan work is ~4/P of the single-device path.  The E/W
    pair runs row-sharded; the S/N pair runs on the transposed plane
    (column-sharded), reshared across the mesh by GSPMD.  Bit-identical
    to `viewshed_grid_los` (asserted in tests/test_parallel.py and the
    driver dryrun).

    Reference parity: the reference's dask story chunks the raster but
    still gathers for its sequential sweep (SURVEY §2.2 row 3); this
    formulation is the TPU-native replacement — wavefront recurrences
    with banded halo exchanges over ICI."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    data = jnp.asarray(data, dtype=jnp.float32)
    shape = data.shape
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("d",))

    @partial(jax.jit, static_argnames=())
    def impl(data, vp_r, vp_c):
        (dy, dx, safe_d, slope_self, slope_tgt, dy_vec, dx_vec,
         vp_elev) = _xdraw_fields(data, vp_r, vp_c,
                                  jnp.float32(observer_elev),
                                  jnp.float32(target_elev),
                                  jnp.float32(ew_res),
                                  jnp.float32(ns_res), shape)
        vpr = vp_r.astype(jnp.float32)
        vpc = vp_c.astype(jnp.float32)
        m_e, m_w = _xdraw_banded_pass(slope_self, vpc, vpr, 0, flat_mesh)
        m_s_t, m_n_t = _xdraw_banded_pass(slope_self.T, vpr, vpc, 0,
                                          flat_mesh)
        m_s = m_s_t.T
        m_n = m_n_t.T
        x_dom = jnp.abs(dx) >= jnp.abs(dy)
        m = jnp.where(x_dom, jnp.where(dx >= 0, m_e, m_w),
                      jnp.where(dy >= 0, m_s, m_n))
        m = jax.lax.with_sharding_constraint(
            m, NamedSharding(flat_mesh, P("d", None)))
        return _xdraw_epilogue(m, data, dy, dx, safe_d, slope_tgt,
                               vp_elev, jnp.float32(target_elev), shape)

    return impl(data, jnp.int32(vp_row), jnp.int32(vp_col))


def viewshed_grid_los_sharded(data, mesh, vp_row: int, vp_col: int,
                              observer_elev: float, target_elev: float,
                              ew_res: float, ns_res: float):
    """Mesh-distributed XDraw: each device runs ONE masked octant scan and
    a `pmax` over the mesh combines them (lax.switch picks the scan by the
    device's flattened index; with more than 4 devices scans duplicate —
    the max combine is idempotent).  Work per device drops ~4x; memory is
    replicated (each scan needs the full raster, exactly like the
    reference's single-node sweep).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    data = jnp.asarray(data, dtype=jnp.float32)
    shape = data.shape
    n_x = mesh.shape["x"]
    n_dev = mesh.size

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=P(), check_rep=False)
    def run(data_rep, vp_r, vp_c):
        vp_r = vp_r[0]
        vp_c = vp_c[0]
        (dy, dx, safe_d, slope_self, slope_tgt, dy_vec, dx_vec,
         vp_elev) = _xdraw_fields(data_rep, vp_r, vp_c,
                                  jnp.float32(observer_elev),
                                  jnp.float32(target_elev),
                                  jnp.float32(ew_res), jnp.float32(ns_res),
                                  shape)
        masks = _xdraw_octant_masks(dy, dx)
        if n_dev >= 4:
            # one masked scan per device, combined with pmax (scans
            # duplicate harmlessly when n_dev is not a multiple of 4)
            dev = jax.lax.axis_index("y") * n_x + jax.lax.axis_index("x")

            def branch(i):
                def f(_):
                    mi = _XDRAW_SCANS[i](slope_self, dy_vec, dx_vec,
                                         vp_r, vp_c)
                    return jnp.where(masks[i], mi, -jnp.inf)
                return f

            m_part = jax.lax.switch(dev % 4, [branch(i) for i in range(4)],
                                    None)
            m = jax.lax.pmax(m_part, ("y", "x"))
        else:
            # fewer devices than octants: a per-device single scan would
            # DROP octants (wrong visibility); run all 4 scans on every
            # device instead (replicated compute, no combine).  Same HBM
            # gate as the single-device path: the stacked scan's padded
            # (N, 4, N) input + output doubles footprint at 16k^2
            if max(shape) <= 8192:
                m_e, m_w, m_s, m_n = _halfplane_scan4(
                    slope_self, dy_vec, dx_vec, vp_r, vp_c, shape)
            else:
                m_e, m_w, m_s, m_n = (f(slope_self, dy_vec, dx_vec,
                                        vp_r, vp_c) for f in _XDRAW_SCANS)
            parts = (m_e, m_w, m_s, m_n)
            m = jnp.full(shape, -jnp.inf)
            for mk, mi in zip(masks, parts):
                m = jnp.where(mk, mi, m)
        return _xdraw_epilogue(m, data_rep, dy, dx, safe_d, slope_tgt,
                               vp_elev, jnp.float32(target_elev), shape)

    rep = jax.lax.with_sharding_constraint(
        data, jax.sharding.NamedSharding(mesh, P()))
    return run(rep, jnp.full((1,), vp_row, jnp.int32),
               jnp.full((1,), vp_col, jnp.int32))
