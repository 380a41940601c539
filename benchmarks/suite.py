"""Per-op benchmark classes (reference benchmarks/benchmarks/*.py).

One class per op family, same names and ``time_*`` methods as the
reference ASV suite, collapsed onto the single JAX-device backend.
"""

from __future__ import annotations

import numpy as np

from .common import Benchmarking, get_dataarray


class Slope(Benchmarking):
    def __init__(self):
        from xrspatial_tpu import slope
        super().__init__(slope)

    def time_slope(self, nx):
        return self.time(nx)


class Aspect(Benchmarking):
    def __init__(self):
        from xrspatial_tpu import aspect
        super().__init__(aspect)

    def time_aspect(self, nx):
        return self.time(nx)


class Curvature(Benchmarking):
    def __init__(self):
        from xrspatial_tpu import curvature
        super().__init__(curvature)

    def time_curvature(self, nx):
        return self.time(nx)


class Hillshade(Benchmarking):
    def __init__(self):
        from xrspatial_tpu import hillshade
        super().__init__(hillshade)

    def time_hillshade(self, nx):
        return self.time(nx)

    def time_hillshade_shadows(self, nx):
        from xrspatial_tpu import hillshade
        return hillshade(self.agg, shadows=True)


class Quantile(Benchmarking):
    def time_quantile(self, nx):
        from xrspatial_tpu import quantile
        return quantile(self.agg, k=10)


class Reclassify(Benchmarking):
    def time_reclassify(self, nx):
        from xrspatial_tpu.classify import reclassify
        bins = list(np.linspace(-50, 150, 10))
        return reclassify(self.agg, bins=bins,
                          new_values=list(range(len(bins))))


class Focal(Benchmarking):
    def setup(self, nx):
        from xrspatial_tpu.convolution import custom_kernel
        super().setup(nx)
        self.kernel = custom_kernel(np.ones((5, 5)))

    def time_focal_stats(self, nx):
        from xrspatial_tpu.focal import focal_stats
        return focal_stats(self.agg, self.kernel,
                           stats_funcs=["mean", "max", "min", "std"])

    def time_hotspots(self, nx):
        from xrspatial_tpu.focal import hotspots
        return hotspots(self.agg, self.kernel)

    def time_mean(self, nx):
        from xrspatial_tpu.focal import mean
        return mean(self.agg)


class Multispectral(Benchmarking):
    def setup(self, nx):
        self.nir = get_dataarray((nx, nx), seed=1)
        self.red = get_dataarray((nx, nx), seed=2)
        self.blue = get_dataarray((nx, nx), seed=3)

    def time_ndvi(self, nx):
        from xrspatial_tpu import ndvi
        return ndvi(self.nir, self.red)

    def time_arvi(self, nx):
        from xrspatial_tpu.multispectral import arvi
        return arvi(self.nir, self.red, self.blue)

    def time_evi(self, nx):
        from xrspatial_tpu.multispectral import evi
        return evi(self.nir, self.red, self.blue)


class Proximity(Benchmarking):
    def setup(self, nx):
        import jax.numpy as jnp
        super().setup(nx)
        self.targets = self.agg.__class__(
            (jnp.asarray(self.agg.data) > 90).astype(jnp.float32),
            dims=("y", "x"))
        self.targets["y"] = np.asarray(self.agg["y"].data)
        self.targets["x"] = np.asarray(self.agg["x"].data)

    def time_proximity(self, nx):
        from xrspatial_tpu.proximity import proximity
        return proximity(self.targets)

    def time_proximity_great_circle(self, nx):
        # the reference parametrizes distance_metric over all three
        # metrics (benchmarks/proximity.py:9-14); the harness here
        # collapses params onto per-metric methods
        from xrspatial_tpu.proximity import proximity
        t = self.targets.copy()
        t["x"] = np.linspace(-170.0, 170.0, t.data.shape[1])
        t["y"] = np.linspace(80.0, -80.0, t.data.shape[0])
        return proximity(t, distance_metric="GREAT_CIRCLE")

    def time_proximity_manhattan(self, nx):
        from xrspatial_tpu.proximity import proximity
        return proximity(self.targets, distance_metric="MANHATTAN")

    def time_allocation(self, nx):
        from xrspatial_tpu.proximity import allocation
        return allocation(self.targets)

    def time_direction(self, nx):
        from xrspatial_tpu.proximity import direction
        return direction(self.targets)


class Viewshed(Benchmarking):
    def time_viewshed(self, nx):
        from xrspatial_tpu.viewshed import viewshed
        x = float(np.asarray(self.agg["x"].data)[nx // 3])
        y = float(np.asarray(self.agg["y"].data)[nx // 3])
        return viewshed(self.agg, x=x, y=y, observer_elev=10.0)


class Zonal(Benchmarking):
    def setup(self, nx):
        import jax.numpy as jnp
        super().setup(nx)
        zones = jnp.clip(jnp.floor_divide(
            jnp.asarray(self.agg.data) + 50.0, 20.0), 0, 7).astype(jnp.int32)
        self.zones = self.agg.__class__(zones, dims=("y", "x"))

    def time_stats(self, nx):
        from xrspatial_tpu.zonal import stats
        return stats(zones=self.zones, values=self.agg)

    def time_crosstab(self, nx):
        from xrspatial_tpu.zonal import crosstab
        import jax.numpy as jnp
        cats = self.agg.__class__(
            jnp.clip(jnp.floor_divide(jnp.asarray(self.agg.data), 25.0),
                     0, 3).astype(jnp.int32), dims=("y", "x"))
        return crosstab(zones=self.zones, values=cats)


class Perlin(Benchmarking):
    def time_perlin(self, nx):
        from xrspatial_tpu import perlin
        return perlin(self.agg)


class GenerateTerrain(Benchmarking):
    def time_generate_terrain(self, nx):
        from xrspatial_tpu import generate_terrain
        return generate_terrain(self.agg)


class AStarSearch(Benchmarking):
    params = ([64, 256],)

    def setup(self, nx):
        super().setup(nx)
        # pixel lookup derives the cell size from the coords; the DEM's
        # res=(1,1) attr (set for the surface ops) would contradict them
        self.agg.attrs = {}

    def time_a_star_search(self, nx):
        from xrspatial_tpu.pathfinding import a_star_search
        ys = np.asarray(self.agg["y"].data)
        xs = np.asarray(self.agg["x"].data)
        return a_star_search(self.agg, (ys[1], xs[1]),
                             (ys[-2], xs[-2]), barriers=[])


class Polygonize(Benchmarking):
    params = ([64, 256],)

    def time_polygonize(self, nx):
        import jax.numpy as jnp

        from xrspatial_tpu.experimental import polygonize
        masked = self.agg.__class__(
            (jnp.asarray(self.agg.data) > 50).astype(jnp.float32),
            dims=("y", "x"))
        return polygonize(masked)


class TerrainPipeline(Benchmarking):
    """TPU-native addition (no reference counterpart): the fused
    headline workload — surface pair + focal statistics in one pass
    (analytics.terrain_pipeline)."""

    def time_terrain_pipeline(self, nx):
        from xrspatial_tpu.analytics import terrain_pipeline
        return terrain_pipeline(self.agg, surface=("slope", "hillshade"),
                                stats_funcs=("mean", "max", "min", "std"))


ALL = [Slope, Aspect, Curvature, Hillshade, Quantile, Reclassify, Focal,
       Multispectral, Proximity, Viewshed, Zonal, Perlin, GenerateTerrain,
       AStarSearch, Polygonize, TerrainPipeline]
