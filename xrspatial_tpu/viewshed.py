"""Viewshed: visible cells from an observer location.

TPU-native counterpart of reference ``xrspatial/viewshed.py``.  Rasters up
to ``_EXACT_MAX_CELLS`` (1024x1024) evaluate the exact GRASS r.viewshed
visibility predicate — the reference's radial sweep + red-black tree
(viewshed.py:1337-1502) reformulated as angle-sorted bucket evaluation
(kernels/viewshed_exact.py, ~N^1.5 work, float64, bit-identical to the
pairwise oracle in kernels/viewshed.py).  Larger rasters default to the
octant-scan XDraw wavefront — an O(N) *approximation* whose
interpolated-blocker model differs from the GRASS angular-span predicate
beyond near-tie cells (measured agreement is pinned by
tests/test_viewshed.py; see PARITY.md) — with ``exact=True`` forcing the
exact bucket path at ANY size.  Output: vertical angle in degrees
[0, 180] for visible cells (0 = straight up, 90 = level, 180 = the
viewpoint itself), -1 for invisible cells.
"""

from __future__ import annotations

import warnings

from typing import Union

import numpy as np

from .kernels.viewshed import (viewshed_grid_los,
                               viewshed_grid_los_sharded,
                               viewshed_grid_los_sharded_banded)
from .kernels.viewshed_exact import viewshed_grid_exact
from .parallel.halo import get_raster_mesh
from .utils import wrap_like
from .xrlib import DataArray

__all__ = ["viewshed"]

OBS_ELEV = 0
TARGET_ELEV = 0

# above this cell count the default switches from the exact bucket
# evaluation (~N^1.5 work; f32-screened f64 predicate) to the XDraw
# approximation (O(N), float32); exact=True keeps the exact path at any
# size.  TRUE on-chip warm costs (round 5, single tunnel client,
# device->host fetch as the barrier, phase-timed): 0.06-0.18 s at
# 128^2, 0.26 s at 256^2, 0.8 s at 512^2, ~4 s at 1024^2, ~14 s at
# 2048^2.  (An earlier round-5 table claiming "25 s at 256^2 / ~990 s
# at 1024^2, execution-bound" — which briefly lowered this ceiling to
# 128^2 — was measured on ONE CPU CORE by accident: the profiling
# scripts imported make_terrain from a tool that forces
# jax_platforms=cpu at import.  BENCH_NOTES round 5 records the
# post-mortem; tools/terrain_util.py now prevents a recurrence.)  The
# ceiling is 1024^2: the largest size with warm cost in single-digit
# seconds.  Cold adds a once-per-(machine, size) remote-compile wave
# (~1-4 min), served from the persistent compilation cache afterwards.
_EXACT_MAX_CELLS = 1024 * 1024


def viewshed(raster: DataArray,
             x: Union[int, float],
             y: Union[int, float],
             observer_elev: float = OBS_ELEV,
             target_elev: float = TARGET_ELEV,
             exact: Union[bool, None] = None) -> DataArray:
    """Calculate the viewshed of `raster` for an observer at (x, y).

    Parameters
    ----------
    raster : DataArray
        2D elevation raster with 'x' and 'y' coordinates.
    x, y : observer location in coordinate space (snapped to the nearest
        cell, reference viewshed.py:1526-1533).
    observer_elev : float
        Height of the observer above the terrain.
    target_elev : float
        Height of hypothetical targets above the terrain; a cell is
        visible if a target at that height above it can be seen.
    exact : bool, optional
        ``True`` forces the exact GRASS predicate (angle-sorted bucket
        evaluation, ~N^1.5 work, float64) at any size; ``False`` forces
        the XDraw octant-scan approximation; ``None`` (default) selects
        by size (exact up to 1024x1024 cells — see the _EXACT_MAX_CELLS
        note for the round-5 on-chip measurements behind this ceiling).

    Notes
    -----
    Rasters with at most 1024x1024 cells use the exact GRASS predicate
    (angular spans + interpolated gradients, float64 decisions behind a
    sound float32 interval screen), computed by the angle-sorted bucket
    formulation in kernels/viewshed_exact.py — bit-identical to the
    reference's sweep semantics, at ~N^1.5 cost instead of the O(N^2)
    pairwise form.  Larger rasters use the XDraw
    octant-scan approximation (float32): an O(N) wavefront whose
    interpolated-blocker errors can flip visibility at cells that are
    not exact ties (measured agreement ~99.5%; bound asserted in
    tests/test_viewshed.py and recorded in PARITY.md); ``exact=True``
    keeps the exact path at any size.
    """
    mesh = get_raster_mesh(raster.data)

    y_coords = np.asarray(raster['y'].data)
    x_coords = np.asarray(raster['x'].data)

    if not (x_coords.min() <= x <= x_coords.max()):
        raise ValueError("x argument outside of raster x_range")
    if not (y_coords.min() <= y <= y_coords.max()):
        raise ValueError("y argument outside of raster y_range")

    height, width = raster.shape
    y_view = int(np.argmin(np.abs(y_coords - y)))
    x_view = int(np.argmin(np.abs(x_coords - x)))

    ew_res = (x_coords[-1] - x_coords[0]) / (width - 1)
    ns_res = (y_coords[-1] - y_coords[0]) / (height - 1)

    # keep the raster on device: np.asarray here would round-trip the
    # whole array through the host (a 64 MB fetch costs ~1 s through the
    # device tunnel; the kernels jnp.asarray their input themselves)
    use_exact = (height * width <= _EXACT_MAX_CELLS
                 if exact is None else bool(exact))
    if use_exact:
        if mesh is not None:
            # the exact bucket evaluation is host-orchestrated
            # (no distributed formulation)
            warnings.warn(
                "viewshed(exact): input is mesh-sharded but the exact "
                "predicate runs on ONE device (correct, not distributed).",
                UserWarning, stacklevel=2)
        out = viewshed_grid_exact(raster.data, y_view, x_view,
                                  observer_elev, target_elev,
                                  ew_res, ns_res)
    elif mesh is not None:
        # distributed XDraw: all four octant scans sharded along their
        # minor axis with banded carry-halo exchanges — per-device
        # memory is the shard + a K-row halo, per-device work ~4/P of
        # the single-device scans (kernels/viewshed.py
        # viewshed_grid_los_sharded_banded; bit-identical).
        # XRSPATIAL_XDRAW_REPLICATED=1 selects the legacy scheme (work
        # /4 but the whole raster replicated per device).
        import os
        if os.environ.get("XRSPATIAL_XDRAW_REPLICATED") == "1":
            out = viewshed_grid_los_sharded(
                raster.data, mesh, y_view, x_view, observer_elev,
                target_elev, ew_res, ns_res)
        else:
            out = viewshed_grid_los_sharded_banded(
                raster.data, mesh, y_view, x_view, observer_elev,
                target_elev, ew_res, ns_res)
    else:
        # large rasters: O(N * max_dim) batched line-of-sight (float32);
        # geometrically equivalent, may differ from the sweep at near-tie
        # cells (see kernels/viewshed.py)
        out = viewshed_grid_los(raster.data, y_view, x_view, observer_elev,
                                target_elev, ew_res, ns_res)
    return wrap_like(raster, out, raster.name)
