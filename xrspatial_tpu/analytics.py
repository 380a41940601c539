"""Composite terrain analytics.

TPU-native counterpart of reference ``xrspatial/analytics.py:6-87``
(``summarize_terrain``).  Unlike the reference, which calls slope/
curvature/aspect separately (three passes over the DEM), the TPU build
computes all three from a single fused neighborhood gather
(kernels/surface.py::surface_multi) — one HBM read for all outputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .utils import get_dataarray_resolution, to_jax, wrap_like
from .xrlib import DataArray, Dataset

__all__ = ["summarize_terrain", "terrain_pipeline"]


def _use_fused_pipeline(offsets) -> bool:
    """Gate for the single-pass mega-kernel (pallas_pipeline.py) —
    OPT-IN via XRSPATIAL_FUSED_PIPELINE=1.  Measured on the v5e at
    16k^2 (tools/exp_fused_pipeline3.py, one session): the 7-output
    fused kernel runs at ~315 GB/s (22.2 ms) vs the 2-way split's
    21.8 ms (surface pair 347 GB/s + focal-alone 466 GB/s) — with 7
    concurrent output streams the register allocator spills (67-89 MB
    of spill slots at larger tiles) and per-kernel bandwidth drops
    below the split's, despite 1 GB less HBM traffic.  A variant
    sharing the surface's sliced windows with the focal accumulation
    measured worse still (26.5 ms).  The split therefore stays the
    default; the fused kernel remains available (bit-exact, interpret-
    tested) for chips where the trade-off differs."""
    import os
    if os.environ.get("XRSPATIAL_FUSED_PIPELINE") != "1":
        return False
    from .kernels.pallas_pipeline import pipeline_supported
    return pipeline_supported(offsets)


def summarize_terrain(terrain: DataArray) -> Dataset:
    """Calculate slope, aspect, and curvature of a terrain in one fused pass.

    Returns a Dataset with variables named ``{terrain.name}-slope``,
    ``{terrain.name}-curvature``, ``{terrain.name}-aspect`` plus the
    original terrain, matching the reference output layout.
    """
    if terrain.name is None:
        raise NameError('Requires DataArray.name property to be set')

    cellsize_x, cellsize_y = get_dataarray_resolution(terrain)
    from .kernels.surface import surface_kernels
    outs = surface_kernels(to_jax(terrain), ("slope", "aspect", "curvature"),
                           cellsize_x, cellsize_y)

    ds = terrain.to_dataset()
    ds[f'{terrain.name}-slope'] = wrap_like(terrain, outs["slope"],
                                            f'{terrain.name}-slope')
    ds[f'{terrain.name}-curvature'] = wrap_like(terrain, outs["curvature"],
                                                f'{terrain.name}-curvature')
    ds[f'{terrain.name}-aspect'] = wrap_like(terrain, outs["aspect"],
                                             f'{terrain.name}-aspect')
    return ds


def terrain_pipeline(agg: DataArray,
                     surface=("slope", "hillshade"),
                     kernel=None,
                     stats_funcs=("mean", "max", "min", "std"),
                     azimuth: float = 225.0,
                     angle_altitude: float = 25.0) -> Dataset:
    """Surface products + focal statistics of one DEM in a single pass.

    Results are identical to calling ``slope``/``aspect``/``curvature``/
    ``hillshade`` and ``focal_stats`` separately; on TPU at scale with a
    radius-1 focal kernel the whole set is computed by ONE fused Pallas
    tile stream (kernels/pallas_pipeline.py) — the DEM is read from HBM
    once instead of once per op.  TPU-native addition (the reference runs
    each op as its own full pass; cf. analytics.py:6-87's per-op calls).

    Returns a Dataset with one variable per surface product plus
    ``focal_stats`` as a (stats, y, x) stack (same layout as
    ``focal.focal_stats``).
    """
    from .convolution import circle_kernel, custom_kernel
    from .focal import _STAT_NAMES, focal_stats
    from .kernels.surface import surface_kernels
    from .parallel.halo import get_raster_mesh

    if agg.ndim != 2:
        raise ValueError("`agg` must be 2D")
    for s in stats_funcs:
        if s not in _STAT_NAMES:
            raise ValueError(f"unknown stat {s!r}; supported: {_STAT_NAMES}")
    known = ("slope", "aspect", "curvature", "hillshade")
    for p in surface:
        if p not in known:
            raise ValueError(f"unknown surface product {p!r}; "
                             f"supported: {known}")
    if kernel is None:
        kernel = circle_kernel(1, 1, 1.5)
    kernel = custom_kernel(np.asarray(kernel))
    cellsize_x, cellsize_y = get_dataarray_resolution(agg)
    data = to_jax(agg)

    if get_raster_mesh(data) is None:
        from .kernels.surface import use_pallas_surface
        from .kernels.window import kernel_offsets

        offsets = kernel_offsets(kernel)
        if use_pallas_surface(data, tuple(surface)) and _use_fused_pipeline(
                offsets):
            # ONE Pallas tile stream for ALL outputs (surface products
            # as separate refs + the focal stack as one stacked ref):
            # the DEM is read from HBM once for the whole headline
            # workload (kernels/pallas_pipeline.py).  Opt-in only — on
            # the v5e it measured SLOWER than the 2-way split (see
            # _use_fused_pipeline).
            from .kernels.pallas_pipeline import pipeline_tiled
            import jax.numpy as jnp
            outs = pipeline_tiled(
                data, jnp.float32(cellsize_x), jnp.float32(cellsize_y),
                jnp.float32(azimuth), jnp.float32(angle_altitude),
                offsets, tuple(stats_funcs), tuple(surface))
            surf_outs = {p: outs[i] for i, p in enumerate(surface)}
            name = agg.name or "terrain"
            ds = agg.to_dataset(name=name)
            for p in surface:
                ds[f'{name}-{p}'] = wrap_like(agg, surf_outs[p],
                                              f'{name}-{p}')
            stacked = outs[len(surface)]
            fs = DataArray(stacked, dims=("stats",) + tuple(agg.dims),
                           name="focal_stats", attrs=dict(agg.attrs))
            for cname, cval in agg.coords.items():
                fs.coords[cname] = cval
            fs.coords["stats"] = DataArray(
                np.asarray(list(stats_funcs)), dims=("stats",),
                name="stats")
            ds["focal_stats"] = fs
            return ds
        # fused Pallas/XLA pass for the surface products only (on TPU at
        # scale surface_kernels lowers to the multi-output surface_tiled
        # kernel), focal_stats as its own pass
        surf_outs = surface_kernels(data, tuple(surface), cellsize_x,
                                    cellsize_y, azimuth, angle_altitude)
    else:
        # mesh-sharded input: per-product run_stencil dispatch keeps the
        # halo machinery engaged
        from .kernels.surface import run_surface_op
        surf_outs = {p: run_surface_op(p, data, cellsize_x, cellsize_y,
                                       azimuth, angle_altitude)
                     for p in surface}

    name = agg.name or "terrain"
    ds = agg.to_dataset(name=name)
    for p in surface:
        ds[f'{name}-{p}'] = wrap_like(agg, surf_outs[p], f'{name}-{p}')
    ds["focal_stats"] = focal_stats(
        agg, kernel, stats_funcs=list(stats_funcs)).rename("focal_stats")
    return ds
